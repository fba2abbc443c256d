package graft.ext

import graft.SparkTestBase

class ProfilingSpec extends SparkTestBase {
  import spark.implicits._

  test("profile computes per-column nulls, distincts and ranges in one pass") {
    val df = Seq(
      (1L, Some("a"), Some(10.0)),
      (2L, None, Some(30.0)),
      (3L, Some("c"), None),
      (4L, Some("a"), Some(10.0))).toDF("id", "s", "v")
    val out = Profiling.profile(df, Seq("id", "s", "v"))
      .orderBy("column").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toSeq
    out shouldBe Seq(
      ("id", 4L, 0L, 4L, "1", "4"),
      ("s", 4L, 1L, 2L, "a", "c"),
      ("v", 4L, 1L, 2L, "10.0", "30.0"))
    an[IllegalArgumentException] should be thrownBy Profiling.profile(df, Nil)
  }

  test("profile is a single aggregation: one scan, no join, no repeated exchange") {
    val df = Seq((1L, "x")).toDF("id", "s")
    val plan = Profiling.profile(df, Seq("id", "s")).queryExecution.executedPlan.toString
    (plan should not).include("Join")
    // one final single-partition aggregate: at most one exchange pair
    plan.sliding("Exchange".length).count(_ == "Exchange") should be <= 2
  }
}
