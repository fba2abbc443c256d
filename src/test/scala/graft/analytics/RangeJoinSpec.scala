package graft.analytics

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def points(rows: (Long, Long)*) = // (user, ts)
    rows.toDF("user_id", "ts")
  private def intervals(rows: (Long, Long, Long)*) = // (user, start, end)
    rows.toDF("user_id", "s", "e")

  test("matches points strictly inside [start, end) per key") {
    val p = points((1L, 5L), (1L, 10L), (1L, 19L), (1L, 20L), (2L, 10L))
    val iv = intervals((1L, 10L, 20L), (2L, 0L, 5L))
    val out = RangeJoin.bucketedIntervalJoin(
      p, col("ts"), iv, col("s"), col("e"), bucketWidth = 7L, keys = Seq("user_id"))
      .select("user_id", "ts", "s", "e").as[(Long, Long, Long, Long)]
      .collect().sorted
    // start inclusive (10), end exclusive (20 excluded); user 2's point is
    // outside its interval; user 1's ts=10,19 match.
    out shouldBe Array((1L, 10L, 10L, 20L), (1L, 19L, 10L, 20L))
  }

  test("no keys: pure interval containment, each pair emitted exactly once") {
    val p = Seq(3L, 8L, 15L).toDF("ts")
    val iv = Seq((0L, 16L), (8L, 9L)).toDF("s", "e") // overlapping intervals
    val out = RangeJoin.bucketedIntervalJoin(
      p, col("ts"), iv, col("s"), col("e"), bucketWidth = 4L)
      .select("ts", "s", "e").as[(Long, Long, Long)].collect().sorted
    // every point is in [0,16); ts=8 additionally in [8,9) → 4 pairs, no dups
    out shouldBe Array((3L, 0L, 16L), (8L, 0L, 16L), (8L, 8L, 9L), (15L, 0L, 16L))
  }

  test("interval ending exactly on a bucket boundary does not leak into the next bucket") {
    val p = Seq(8L).toDF("ts")
    val iv = Seq((0L, 8L)).toDF("s", "e") // end == 8 == bucket boundary, exclusive
    RangeJoin.bucketedIntervalJoin(
      p, col("ts"), iv, col("s"), col("e"), bucketWidth = 4L).count() shouldBe 0L
  }

  test("empty interval (start == end) matches nothing") {
    val p = Seq(5L).toDF("ts")
    val iv = Seq((5L, 5L)).toDF("s", "e")
    RangeJoin.bucketedIntervalJoin(
      p, col("ts"), iv, col("s"), col("e"), bucketWidth = 4L).count() shouldBe 0L
  }

  test("exact above 2^53: nanosecond-scale ticks keep integral bucketing") {
    val base = (1L << 54) + 1 // not representable as Double precisely
    val p = Seq(base).toDF("ts")
    val iv = Seq((base, base + 1), (base + 1, base + 2)).toDF("s", "e")
    val out = RangeJoin.bucketedIntervalJoin(
        p, col("ts"), iv, col("s"), col("e"), bucketWidth = 1L)
      .select("s").as[Long].collect()
    out shouldBe Array(base)
  }

  // `div` truncates toward zero (not floor), so bucket 0 spans both sides of
  // zero — still correct: bucketOf is monotonic, so a contained point's bucket
  // always lies within [bucketOf(start), bucketOf(end-1)].
  test("negative ticks bucket consistently across zero") {
    val p = Seq(-1L, -5L, 0L).toDF("ts")
    val iv = Seq((-6L, 1L)).toDF("s", "e")
    val out = RangeJoin.bucketedIntervalJoin(
        p, col("ts"), iv, col("s"), col("e"), bucketWidth = 4L)
      .select("ts").as[Long].collect().sorted
    out shouldBe Array(-5L, -1L, 0L)
  }

  test("plans as a shuffled equi-join, not a nested-loop/cartesian join") {
    val p = points((1L, 5L))
    val iv = intervals((1L, 0L, 10L))
    val plan = RangeJoin.bucketedIntervalJoin(
      p, col("ts"), iv, col("s"), col("e"), bucketWidth = 4L, keys = Seq("user_id"))
      .queryExecution.executedPlan.toString
    plan should not include "NestedLoop"
    plan should not include "CartesianProduct"
  }

  test("rejects non-positive bucketWidth") {
    val p = Seq(1L).toDF("ts")
    an[IllegalArgumentException] should be thrownBy
      RangeJoin.bucketedIntervalJoin(p, col("ts"), p, col("ts"), col("ts"), 0L)
  }

  // ---------------------------------------------------- intervalOverlapJoin

  private def overlapPairs(
      left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long)],
      width: Long): Array[(Long, Long, Long, Long)] = {
    val l = left.toDF("lid", "ls", "le")
    val r = right.toDF("rid", "rs", "re")
    RangeJoin.intervalOverlapJoin(
      l, col("ls"), col("le"), r, col("rs"), col("re"), bucketWidth = width)
      .select("lid", "rid", "ls", "rs").as[(Long, Long, Long, Long)]
      .collect().sorted
  }

  /** Brute-force reference: strict-inequality overlap on all pairs. */
  private def bruteOverlap(
      left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long)]): Array[(Long, Long, Long, Long)] =
    (for {
      (lid, ls, le) <- left
      (rid, rs, re) <- right
      if ls < re && rs < le
    } yield (lid, rid, ls, rs)).toArray.sorted

  test("overlap join matches brute force, each pair exactly once across many shared buckets") {
    // long intervals spanning many buckets (width 4) force multi-bucket
    // co-occupancy — the exactly-once first-bucket rule is what's on trial
    val left = Seq((1L, 0L, 40L), (2L, 10L, 14L), (3L, 35L, 36L))
    val right = Seq((10L, 5L, 50L), (11L, 13L, 20L), (12L, 40L, 44L))
    overlapPairs(left, right, width = 4L) shouldBe bruteOverlap(left, right)
  }

  test("touching intervals ([0,10) and [10,20)) do not overlap") {
    overlapPairs(Seq((1L, 0L, 10L)), Seq((2L, 10L, 20L)), width = 4L) shouldBe Array.empty
  }

  test("overlap join respects keys and plans as an equi-join") {
    val l = Seq((1L, 1L, 0L, 10L), (2L, 2L, 0L, 10L)).toDF("k", "lid", "ls", "le")
    val r = Seq((1L, 9L, 5L, 6L), (2L, 8L, 50L, 60L)).toDF("k", "rid", "rs", "re")
    val out = RangeJoin.intervalOverlapJoin(
      l, col("ls"), col("le"), r, col("rs"), col("re"),
      bucketWidth = 4L, keys = Seq("k"))
    out.select("k", "lid", "rid").as[(Long, Long, Long)].collect() shouldBe
      Array((1L, 1L, 9L)) // key 2's spans don't overlap
    val plan = out.queryExecution.executedPlan.toString
    (plan should not).include("NestedLoop")
    (plan should not).include("Cartesian")
  }
}
