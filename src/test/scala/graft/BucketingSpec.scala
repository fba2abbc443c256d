package graft

import org.apache.spark.sql.functions._

/** Bucketing = pre-paid shuffle: tables bucketed on the join/agg key are
  * co-located at write time, so every later join or aggregation on that key
  * runs WITHOUT an exchange. At 100 TB this is the difference between
  * shuffling the fact table once per query and never — the spec pins the
  * no-Exchange plan, not just the answer. */
class BucketingSpec extends SparkTestBase {

  private def withNoBroadcast[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("join of two tables bucketed on the key has no shuffle exchange") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_id"), col("user_id"), col("value"))
    ev.write.mode("overwrite").format("parquet")
      .bucketBy(8, "user_id").saveAsTable("bk_a")
    ev.write.mode("overwrite").format("parquet")
      .bucketBy(8, "user_id").saveAsTable("bk_b")
    try withNoBroadcast {
      val joined = spark.table("bk_a").join(spark.table("bk_b"), "user_id")
      val plan = joined.queryExecution.executedPlan.toString
      plan should include("SortMergeJoin")
      (plan should not).include("Exchange hashpartitioning")
      joined.count() should be > 0L
    } finally {
      spark.sql("DROP TABLE IF EXISTS bk_a")
      spark.sql("DROP TABLE IF EXISTS bk_b")
    }
  }

  test("aggregation on the bucket key needs no exchange either") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_id"), col("user_id"))
    ev.write.mode("overwrite").format("parquet")
      .bucketBy(8, "user_id").saveAsTable("bk_agg")
    try {
      val agged = spark.table("bk_agg").groupBy("user_id").count()
      val plan = agged.queryExecution.executedPlan.toString
      (plan should not).include("Exchange hashpartitioning")
      agged.count() should be > 0L
    } finally spark.sql("DROP TABLE IF EXISTS bk_agg")
  }
}
