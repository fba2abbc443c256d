package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class FunnelSpec extends SparkTestBase {
  import spark.implicits._

  private def steps3 = Seq(
    "a" -> (col("e") === "a"),
    "b" -> (col("e") === "b"),
    "c" -> (col("e") === "c"))

  test("full A→B→C completion, out-of-order arrival") {
    val df = Seq((1L, 30L, "c"), (1L, 10L, "a"), (1L, 20L, "b"))
      .toDF("k", "t", "e")
    val out = Funnel.funnelSteps(df, Seq("k"), "t", steps3)
      .as[(Long, Option[Long], Option[Long], Option[Long], Long)].collect().toSeq
    out shouldBe Seq((1L, Some(10L), Some(20L), Some(30L), 3L))
  }

  test("steps before their predecessor do not count; earliest VALID time wins") {
    // b at t=5 precedes the first a (t=10) → invalid; b at t=40 is the
    // earliest valid b even though a later a (t=20) exists
    val df = Seq((1L, 5L, "b"), (1L, 10L, "a"), (1L, 20L, "a"), (1L, 40L, "b"))
      .toDF("k", "t", "e")
    val out = Funnel.funnelSteps(df, Seq("k"), "t", steps3)
      .as[(Long, Option[Long], Option[Long], Option[Long], Long)].collect().toSeq
    out shouldBe Seq((1L, Some(10L), Some(40L), None, 2L))
  }

  test("equal timestamps do not advance the funnel (strict order)") {
    val df = Seq((1L, 10L, "a"), (1L, 10L, "b")).toDF("k", "t", "e")
    val out = Funnel.funnelSteps(df, Seq("k"), "t", steps3)
      .as[(Long, Option[Long], Option[Long], Option[Long], Long)].collect().toSeq
    out shouldBe Seq((1L, Some(10L), None, None, 1L))
  }

  test("keys fold independently; a key with no step-1 event is depth 0") {
    val df = Seq((1L, 10L, "a"), (2L, 10L, "b")).toDF("k", "t", "e")
    val out = Funnel.funnelSteps(df, Seq("k"), "t", steps3)
      .orderBy("k")
      .as[(Long, Option[Long], Option[Long], Option[Long], Long)].collect().toSeq
    out shouldBe Seq(
      (1L, Some(10L), None, None, 1L),
      (2L, None, None, None, 0L))
  }

  test("duplicate step names and reserved columns are rejected") {
    val df = Seq((1L, 10L, "a")).toDF("k", "t", "e")
    an[IllegalArgumentException] should be thrownBy
      Funnel.funnelSteps(df, Seq("k"), "t", Seq(
        "x" -> (col("e") === "a"), "x" -> (col("e") === "b")))
    val clash = Seq((1L, 10L, "a", 0L)).toDF("k", "t", "e", "t_x")
    an[IllegalArgumentException] should be thrownBy
      Funnel.funnelSteps(clash, Seq("k"), "t", Seq("x" -> (col("e") === "a")))
  }
}
