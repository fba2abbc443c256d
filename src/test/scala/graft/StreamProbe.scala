package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** One-off diagnostic for the q170 replay harness: stage, run minhashStream,
  * print per-micro-batch durations from the progress log. Test scope. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val docs = s.read.parquet(s"$dir/documents.parquet")
    val base = lit(1700000000L)
    var t0 = System.nanoTime()
    def lap(label: String): Unit = {
      println(f"[probe] $label%-20s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      t0 = System.nanoTime()
    }
    val staged = docs
      .select(col("doc_id"),
        timestamp_seconds(base + (col("doc_id") % 2) * 10).as("ts"),
        col("text"))
      .unionByName(s.range(1).select(
        lit(-1L).as("doc_id"),
        timestamp_seconds(base + 1000000L).as("ts"),
        lit("zz yy xx ww vv uu flush sentinel").as("text")))
    val tmp = java.nio.file.Files.createTempDirectory("graft_probe_")
    try {
      staged.repartition(16).write.mode("overwrite").parquet(tmp.toString)
      lap("stage write")
      val stream = s.readStream.schema(staged.schema).parquet(tmp.toString)
      s.conf.set("spark.sql.shuffle.partitions", "8")
      val q = graft.ext.Dedup.minhashStream(stream, "doc_id", "text", "ts",
          delayThreshold = "1 second", windowDuration = "10 seconds")
        .writeStream.outputMode("append").format("memory").queryName("probe")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      lap("stream run")
      println(s"[probe] rows = ${s.table("probe").count()}")
      q.recentProgress.foreach { p =>
        println(s"[probe] batch ${p.batchId}: rows=${p.numInputRows} " +
          s"durationMs=${p.durationMs} stateRows=${
            p.stateOperators.map(o => o.numRowsTotal).mkString(",")}")
      }
    } finally graft.util.Fs.deleteRecursively(tmp)
    s.stop()
  }
}
