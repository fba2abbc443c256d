package graft.io

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Dynamic partition pruning: when a partitioned fact table joins a
  * FILTERED dimension on the partition column, Spark injects a runtime
  * subquery filter into the fact scan so non-matching partitions are never
  * read — at 100 TB this is the difference between scanning one day and
  * scanning three years. Pinned here because it only fires when the plan
  * keeps the join key untransformed on the partition column; a cast or
  * expression wrapper silently disables it. */
class DppSpec extends SparkTestBase {
  import spark.implicits._

  test("join against a filtered dim prunes fact partitions at runtime") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp_").toString
    var dimDirToClean: Option[String] = None
    try {
      val fact = spark.range(10000).select(
        col("id").as("k"),
        (col("id") % 20).as("day"),
        (col("id") * 3 % 997).as("v"))
      Sinks.partitionedParquetAppend(fact, dir, Seq("day"))

      // Two conditions DPP silently requires, both verified failing here
      // when violated: (a) the dim key must match the partition column's
      // read-back type EXACTLY (INT — directory-inferred); a cast on the
      // partition column disables pruning. (b) the dim must be a real
      // source with a surviving Filter node — an in-memory LocalRelation
      // constant-folds its filter away and the rule sees no selective
      // predicate.
      val dimDir = java.nio.file.Files.createTempDirectory("graft_dpp_dim_").toString
      dimDirToClean = Some(dimDir)
      Seq((3, "a"), (7, "b")).toDF("d_day", "d_tag")
        .write.mode("overwrite").parquet(dimDir)
      val joined = spark.read.parquet(dir)
        .join(spark.read.parquet(dimDir).where(col("d_tag") === "a"),
          col("day") === col("d_day"))

      val plan = joined.queryExecution.executedPlan.toString
      plan should include("dynamicpruning")

      // end-to-end: result is exactly day 3's rows
      joined.count() shouldBe 500L
      joined.select(countDistinct(col("day"))).as[Long].head() shouldBe 1L
    } finally {
      graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(dir))
      dimDirToClean.foreach(d =>
        graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(d)))
    }
  }
}
