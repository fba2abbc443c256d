package graft.ext

import graft.SparkTestBase

class DiffSpec extends SparkTestBase {
  import spark.implicits._

  private val old = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
    .toDF("k", "name", "bal")

  test("classifies inserted / deleted / updated / unchanged") {
    val neu = Seq(
      (1L, "a", 10.0),   // unchanged
      (2L, "b", 99.0),   // updated (bal)
      (4L, "D", 40.0),   // updated (name)
      (5L, "e", 50.0))   // inserted; 3 deleted
      .toDF("k", "name", "bal")
    val out = Diff.snapshotDiff(old, neu, Seq("k"))
      .select("k", "change_type").as[(Long, String)].collect().toMap
    out shouldBe Map(
      1L -> "unchanged", 2L -> "updated", 3L -> "deleted",
      4L -> "updated", 5L -> "inserted")
  }

  test("null-safe comparison: null→null is unchanged, null↔value is updated") {
    val o = Seq((1L, Option.empty[String]), (2L, Some("x")), (3L, Option.empty[String]))
      .toDF("k", "v")
    val n = Seq((1L, Option.empty[String]), (2L, Option.empty[String]), (3L, Some("y")))
      .toDF("k", "v")
    val out = Diff.snapshotDiff(o, n, Seq("k"))
      .select("k", "change_type").as[(Long, String)].collect().toMap
    out shouldBe Map(1L -> "unchanged", 2L -> "updated", 3L -> "updated")
  }

  test("old_/new_ payload columns carry both sides for CDC emission") {
    val neu = Seq((2L, "b", 99.0), (5L, "e", 50.0)).toDF("k", "name", "bal")
    val rows = Diff.snapshotDiff(old, neu, Seq("k"))
      .where($"change_type" === "updated")
      .select("k", "old_bal", "new_bal").as[(Long, Double, Double)].collect().toSeq
    rows shouldBe Seq((2L, 20.0, 99.0))
    val ins = Diff.snapshotDiff(old, neu, Seq("k"))
      .where($"change_type" === "inserted")
      .select("k", "old_name", "new_name")
      .as[(Long, Option[String], Option[String])].collect().toSeq
    ins shouldBe Seq((5L, None, Some("e")))
  }

  test("mismatched schemas are rejected") {
    val n2 = Seq((1L, "a")).toDF("k", "name")
    an[IllegalArgumentException] should be thrownBy
      Diff.snapshotDiff(old, n2, Seq("k"))
  }
}
