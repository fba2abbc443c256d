package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.enrich.Enrich

class ScoreboardSpec extends SparkTestBase {
  import spark.implicits._

  test("latestPerGroup keeps exactly the first row per key by the given order") {
    val df = Seq(
      ("a", 1L, "x"), ("a", 3L, "y"), ("a", 2L, "z"),
      ("b", 7L, "p")).toDF("k", "t", "v")
    val out = Scoreboard.latestPerGroup(df, Seq("k"), Seq(col("t").desc))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    out.toSeq shouldBe Seq(("a", 3L, "y"), ("b", 7L, "p"))
  }

  test("latestPerGroupAgg (max_by form) agrees with the window form on tie-free data") {
    val df = Seq(
      ("a", 1L, 10L, "x"), ("a", 3L, 11L, "y"), ("a", 3L, 9L, "z"),
      ("b", 7L, 1L, "p")).toDF("k", "t", "uid", "v")
    val win = Scoreboard.latestPerGroup(df, Seq("k"), Seq(col("t").desc, col("uid").desc))
      .orderBy("k").collect().toSeq
    val agg = Scoreboard.latestPerGroupAgg(df, Seq("k"), Seq("t", "uid"))
      .orderBy("k").collect().toSeq
    agg shouldBe win
    agg.map(_.getString(3)) shouldBe Seq("y", "p")
  }

  test("locf carries the last non-null value forward, default before first") {
    val grid = Seq(
      ("a", 1, Some(10.0)), ("a", 2, None), ("a", 3, Some(30.0)), ("a", 4, None),
      ("b", 1, None), ("b", 2, Some(5.0))
    ).toDF("k", "t", "v")
    val out = Scoreboard.locf(grid, Seq("k"), "t", "v", lit(0.0))
      .orderBy("k", "t").collect().map(_.getDouble(2)).toSeq
    out shouldBe Seq(10.0, 10.0, 30.0, 30.0, 0.0, 5.0)
  }

  test("pivotMatrix produces one column per pivot value, zero-filled") {
    val df = Seq((1, "x"), (1, "x"), (1, "y"), (2, "y")).toDF("k", "p")
    val out = Scoreboard.pivotMatrix(df, "k", "p", Seq("x", "y", "z"), count(lit(1)))
      .orderBy("k").collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    out.toSeq shouldBe Seq((1, 2L, 1L, 0L), (2, 0L, 1L, 0L))
  }

  test("pivotMatrix zero-fills only pivot cells — a NULL row key is not rewritten to 0") {
    val df = Seq((Some(1), "x"), (None, "y"), (Some(0), "x")).toDF("k", "p")
    val out = Scoreboard.pivotMatrix(df, "k", "p", Seq("x", "y"), count(lit(1)))
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getInt(0)),
        r.getLong(1), r.getLong(2))).toSet
    // the NULL-key group survives as NULL, distinct from the real key 0
    out shouldBe Set((Some(1), 1L, 0L), (None, 0L, 1L), (Some(0), 1L, 0L))
  }

  test("pivotMatrix floor clamps negative cells like queries.sql's ELSE-0 arm") {
    val df = Seq((1, "x", -5.0), (1, "y", 3.0)).toDF("k", "p", "v")
    val out = Scoreboard.pivotMatrix(df, "k", "p", Seq("x", "y"),
      org.apache.spark.sql.functions.first(col("v")),
      floor = Some(lit(0.0))).collect().head
    (out.getDouble(1), out.getDouble(2)) shouldBe ((0.0, 3.0))
    // without the floor, the raw negative passes through
    Scoreboard.pivotMatrix(df, "k", "p", Seq("x", "y"),
      org.apache.spark.sql.functions.first(col("v")))
      .collect().head.getDouble(1) shouldBe -5.0
  }

  test("denseGrid is distinct(axis) × dim") {
    val facts = Seq((1, "i"), (1, "j"), (2, "k")).toDF("t", "junk")
    val dim = Seq("p1", "p2").toDF("player")
    Scoreboard.denseGrid(facts, "t", dim).count() shouldBe 4L
  }

  test("backfillName fills blank and whitespace names from the dimension, keeps others") {
    val facts = Seq(("S1", ""), ("S2", "  "), ("S3", "Keep"), ("S4", "")).toDF("steamId", "playerName")
    val dim = Seq(("S1", "Ada"), ("S2", "Bo")).toDF("steamId", "name")
    val out = Enrich.backfillName(facts, dim)
      .orderBy("steamId").collect().map(_.getAs[String]("playerName")).toSeq
    // S4 has no dimension row: name stays blank (reference leaves it empty too)
    out shouldBe Seq("Ada", "Bo", "Keep", "")
  }

  test("backfillName keeps non-blank names RAW (trim is only the blank test)") {
    val facts = Seq(("S1", "\tAda "), ("S2", "\t")).toDF("steamId", "playerName")
    val dim = Seq(("S1", "DimAda"), ("S2", "DimBo")).toDF("steamId", "name")
    val out = Enrich.backfillName(facts, dim)
      .orderBy("steamId").collect().map(_.getAs[String]("playerName")).toSeq
    // padded-but-real name passes through unmodified; tab-only name backfills
    out shouldBe Seq("\tAda ", "DimBo")
  }
}
