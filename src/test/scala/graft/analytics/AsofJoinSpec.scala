package graft.analytics

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def quotes(rows: (Long, Long, Double)*) = // (key, ts, px)
    rows.toDF("k", "qts", "px")
  private def trades(rows: (Long, Long)*) = // (key, ts)
    rows.toDF("k", "tts")

  test("attaches the greatest rightTs <= leftTs per key; no match ⇒ nulls") {
    val t = trades((1L, 10L), (1L, 25L), (1L, 5L), (2L, 10L))
    val q = quotes((1L, 7L, 1.0), (1L, 20L, 2.0), (2L, 30L, 9.0))
    val out = AsofJoin.asofJoin(t, col("tts"), q, col("qts"),
        keys = Seq("k"), rightCols = Seq("qts", "px"))
      .select("k", "tts", "qts", "px")
      .as[(Long, Long, Option[Long], Option[Double])].collect().sorted
    out shouldBe Array(
      (1L, 5L, None, None),             // before the first quote
      (1L, 10L, Some(7L), Some(1.0)),
      (1L, 25L, Some(20L), Some(2.0)),
      (2L, 10L, None, None))            // key 2's only quote is later
  }

  test("inclusive by default: a right row at exactly leftTs matches") {
    val out = AsofJoin.asofJoin(
        trades((1L, 10L)), col("tts"), quotes((1L, 10L, 5.0)), col("qts"),
        keys = Seq("k"), rightCols = Seq("px"))
      .select("px").as[Option[Double]].collect()
    out shouldBe Array(Some(5.0))
  }

  test("strict mode excludes the same-instant right row (no lookahead)") {
    val out = AsofJoin.asofJoin(
        trades((1L, 10L)), col("tts"),
        quotes((1L, 10L, 5.0), (1L, 9L, 4.0)), col("qts"),
        keys = Seq("k"), rightCols = Seq("px"), strict = true)
      .select("px").as[Option[Double]].collect()
    out shouldBe Array(Some(4.0))
  }

  test("left row count is preserved exactly (left-outer, never fan-out)") {
    val t = trades((1L, 10L), (1L, 10L), (1L, 11L)) // duplicate left rows stay
    val q = quotes((1L, 1L, 1.0), (1L, 2L, 2.0), (1L, 3L, 3.0))
    AsofJoin.asofJoin(t, col("tts"), q, col("qts"),
      keys = Seq("k"), rightCols = Seq("px")).count() shouldBe 3L
  }

  test("all left columns survive with their values; right columns appended") {
    val t = Seq((1L, 10L, "keep")).toDF("k", "tts", "tag")
    val out = AsofJoin.asofJoin(t, col("tts"), quotes((1L, 8L, 7.5)), col("qts"),
      keys = Seq("k"), rightCols = Seq("px"))
    out.columns.toSeq shouldBe Seq("k", "tts", "tag", "px")
    out.select("tag").as[String].collect() shouldBe Array("keep")
  }

  test("agrees with the brute-force correlated-subquery semantics") {
    // randomized-ish but deterministic fixture: 60 trades, 40 quotes, 3 keys
    val t = (1 to 60).map(i => ((i % 3).toLong, (i * 37 % 100).toLong))
    val q = (1 to 40).map(i => ((i % 3).toLong, (i * 53 % 100).toLong, i / 10.0))
    // unique (k, qts): keep max px per (k, ts) like the operator requires
    val qu = q.groupBy(x => (x._1, x._2)).map(_._2.maxBy(_._3)).toSeq
    val expected = t.map { case (k, ts) =>
      val m = qu.filter(x => x._1 == k && x._2 <= ts)
      (k, ts, if (m.isEmpty) None else Some(m.maxBy(_._2)._3))
    }.sorted
    val out = AsofJoin.asofJoin(
        t.toDF("k", "tts"), col("tts"),
        qu.toDF("k", "qts", "px"), col("qts"),
        keys = Seq("k"), rightCols = Seq("px"))
      .select("k", "tts", "px").as[(Long, Long, Option[Double])]
      .collect().toSeq.sorted
    out shouldBe expected
  }

  test("plans one shuffle + window, no nested-loop/cartesian join") {
    val plan = AsofJoin.asofJoin(
        trades((1L, 10L)), col("tts"), quotes((1L, 8L, 1.0)), col("qts"),
        keys = Seq("k"), rightCols = Seq("px"))
      .queryExecution.executedPlan.toString
    plan should not include "NestedLoop"
    plan should not include "CartesianProduct"
    plan should include("Window")
  }

  test("NULL equi-keys never match (SQL join semantics, not null-safe grouping)") {
    val t = Seq((Option(1L), 10L), (Option.empty[Long], 10L)).toDF("k", "tts")
    val q = Seq((Option(1L), 5L, 1.0), (Option.empty[Long], 5L, 9.0)).toDF("k", "qts", "px")
    val out = AsofJoin.asofJoin(t, col("tts"), q, col("qts"),
        keys = Seq("k"), rightCols = Seq("px"))
      .select("k", "px").as[(Option[Long], Option[Double])].collect().toSet
    // the null-key left row must NOT inherit the null-key right row's payload
    out shouldBe Set((Some(1L), Some(1.0)), (None, None))
  }

  test("rejects colliding right column names and empty keys") {
    val t = trades((1L, 1L))
    val q = quotes((1L, 1L, 1.0))
    an[IllegalArgumentException] should be thrownBy
      AsofJoin.asofJoin(t, col("tts"), q.withColumnRenamed("px", "tts"),
        col("qts"), keys = Seq("k"), rightCols = Seq("tts"))
    an[IllegalArgumentException] should be thrownBy
      AsofJoin.asofJoin(t, col("tts"), q, col("qts"),
        keys = Nil, rightCols = Seq("px"))
  }
}
