package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary probe main (removed before final round): native cosine
  * expression vs composable HOF reference — bit-identical check + timing. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val pairs = emb.select(col("vec_id").as("ia"), col("embedding").as("va"))
      .crossJoin(emb.where(col("vec_id") < 20).select(col("vec_id").as("ib"), col("embedding").as("vb")))

    val native = graft.ext.Similarity.cosine(col("va"), col("vb"))
    val hof = graft.ext.Similarity.cosineComposable(col("va"), col("vb"))
    val diff = pairs.select(native.as("n"), hof.as("h"))
      .where(col("n") =!= col("h") ||
        (isnan(col("n")) && !isnan(col("h"))) || (!isnan(col("n")) && isnan(col("h"))))
      .count()
    println(s"[probe] bit-mismatch count (expect 0): $diff")

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    time("native cosine warm")(noop(pairs.select(native.as("c"))))
    time("native cosine")(noop(pairs.select(native.as("c"))))
    time("hof cosine warm")(noop(pairs.select(hof.as("c"))))
    time("hof cosine")(noop(pairs.select(hof.as("c"))))

    pairs.select(native.as("c")).explain("formatted")
    spark.stop()
  }
}
