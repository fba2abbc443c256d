package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Test-scope stage profiler for the PPJoin pipeline: times each stage of
  * prefixFilteredJaccardPairs in isolation at sf0.1 so optimization effort
  * lands where the seconds are. */
object ProbePrefix {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"))
    // warm the session
    docs.groupBy(col("lang")).count().write.format("noop").mode("overwrite").save()
    for (round <- 1 to 2) {
      println(s"----- round $round -----")
      val minJaccard = 0.12
      val exploded = docs
        .withColumn("__words", split(col("text"), " "))
        .select(col("doc_id").as("__id"), col("lang"),
          explode(graft.ext.Dedup.shingles(col("text"), col("__words"))).as("__s0"))
      val posts = time("posts localCheckpoint") {
        exploded.where(col("lang").isNotNull && col("__s0").isNotNull)
          .select(col("__id"), col("lang"), xxhash64(col("__s0")).as("__s"))
          .distinct()
          .localCheckpoint(true)
      }
      val dfreq = posts.groupBy(col("lang"), col("__s")).agg(count(lit(1)).as("__df"))
      val byDoc = org.apache.spark.sql.expressions.Window.partitionBy(col("__id"))
      val globalOrder = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__id")).orderBy(col("__df"), col("__s"))
      val prefix = posts
        .withColumn("__n", count(lit(1)).over(byDoc))
        .join(dfreq, Seq("lang", "__s"))
        .withColumn("__pos", row_number().over(globalOrder))
        .where(col("__pos") <=
          col("__n") - ceil(lit(minJaccard) * col("__n") - lit(1e-9)) + 1)
      val prefixMat = time("prefix materialize") { prefix.localCheckpoint(true) }
      println(s"[probe]   posts=${posts.count()} prefix=${prefixMat.count()}")
      val pa = prefixMat.select(col("lang"), col("__s"),
        col("__id").as("id_a"), col("__n").as("na"))
      val pb = prefixMat.select(col("lang"), col("__s"),
        col("__id").as("id_b"), col("__n").as("nb"))
      val cands = pa.join(pb, Seq("lang", "__s"))
        .where(col("id_a") < col("id_b") &&
          col("na") >= col("nb") * lit(minJaccard) - lit(1e-9) &&
          col("nb") >= col("na") * lit(minJaccard) - lit(1e-9))
        .select(col("id_a"), col("id_b"), col("na"), col("nb"))
        .distinct()
      val candsMat = time("candidates") { cands.localCheckpoint(true) }
      println(s"[probe]   cands=${candsMat.count()}")
      time("verification") {
        candsMat
          .join(posts.select(col("__id").as("id_a"), col("__s")), "id_a")
          .join(posts.select(col("__id").as("id_b"), col("__s")), Seq("id_b", "__s"))
          .groupBy(col("id_a"), col("id_b"), col("na"), col("nb"))
          .agg(count(lit(1)).as("inter"))
          .select(col("id_a"), col("id_b"),
            (col("inter").cast("double") / (col("na") + col("nb") - col("inter"))).as("jaccard"))
          .where(col("jaccard") >= minJaccard)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
