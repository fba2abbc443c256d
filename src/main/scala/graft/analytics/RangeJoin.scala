package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) joins at scale.
  *
  * Spark has no native interval-join operator: a bare
  * `points JOIN intervals ON ts BETWEEN start AND end` has no equi-key, so
  * Catalyst plans a BroadcastNestedLoopJoin (or a cartesian product) — an
  * O(|points|·|intervals|) comparison sweep that is the single most common
  * way a timeseries pipeline falls over at scale.
  *
  * [[bucketedIntervalJoin]] restores an equi-key by quantizing time: every
  * interval is exploded to the fixed-width buckets it overlaps, every point
  * maps to exactly ONE bucket, and the join becomes a plain shuffled
  * equi-join on (keys…, bucket) followed by the exact containment filter.
  * Work drops to Σ_bucket |points_b|·|intervals_b| — linear in practice when
  * `bucketWidth` is chosen near the typical interval length (each interval
  * then explodes to ~2 buckets, and only co-bucketed rows are ever
  * compared). Each qualifying (point, interval) pair is emitted exactly
  * once — a point lives in one bucket, and an interval covers that bucket
  * at most once — so no dedup pass is needed.
  */
object RangeJoin {

  /** Inner-join `points` to every interval whose `[start, end)` contains
    * `ts`, optionally also equi-matching on shared `keys` columns (a
    * per-user/per-device range join). `ts`/`start`/`end` must be integral
    * (ticks: nanos, micros, seconds — any consistent unit); `bucketWidth`
    * is in the same unit. Point and interval column names must not collide
    * (rename before joining); `keys` are the shared equi columns.
    *
    * Scale notes: the exploded interval side grows by
    * ~(interval length / bucketWidth) rows per interval — pick bucketWidth
    * near the TYPICAL interval length, not the max. One very long interval
    * (a full-history window) explodes to many buckets; split such outliers
    * onto a broadcast path instead of shrinking every bucket. Skewed hot
    * buckets (all points in one hour) are ordinary join skew — AQE's skew
    * split handles them, exactly as for any other equi-join. */
  def bucketedIntervalJoin(
      points: DataFrame, ts: Column,
      intervals: DataFrame, start: Column, end: Column,
      bucketWidth: Long, keys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(!points.columns.contains("__bucket") && !intervals.columns.contains("__bucket"),
      "__bucket column name is reserved by bucketedIntervalJoin")
    // integral `div`, NOT `/`: double division rounds above 2^53, which
    // nanosecond epoch ticks exceed — a point on a bucket boundary would
    // land in the wrong bucket and silently miss its intervals. `div`
    // truncates toward zero rather than flooring, which is still correct:
    // truncation is monotonic, so a contained point's bucket always lies in
    // [bucketOf(start), bucketOf(end-1)] (bucket 0 is merely double-width).
    def bucketOf(c: Column): Column = call_function("div", c, lit(bucketWidth))
    // end is EXCLUSIVE: the last covered tick is end-1, so an interval
    // ending exactly on a bucket boundary does not explode into the next
    // bucket (and an empty interval start==end covers its start bucket
    // only, matching nothing after the containment filter).
    val ivb = intervals.withColumn("__bucket",
      explode(sequence(bucketOf(start), bucketOf(greatest(end - 1, start)))))
    val ptb = points.withColumn("__bucket", bucketOf(ts))
    ptb.join(ivb, keys :+ "__bucket")
      .where(ts >= start && ts < end)
      .drop("__bucket")
  }

  /** Interval-overlap join: every `left` interval `[ls, le)` paired with
    * every `right` interval `[rs, re)` it overlaps (`ls < re && rs < le` —
    * strictly-touching spans do NOT match), optionally equi-matched on
    * shared `keys`. The same bucket-quantization trick as
    * [[bucketedIntervalJoin]], with BOTH sides exploded; a pair co-occupies
    * every bucket their overlap covers, so to emit it exactly once the join
    * keeps only the FIRST shared bucket — the one containing the overlap's
    * start `max(ls, rs)` (both sides are proven to cover that tick, so the
    * pair is never lost). No dedup pass, no distinct.
    *
    * Same unit/width guidance as [[bucketedIntervalJoin]]; cost is
    * Σ_bucket |left_b|·|right_b|, never |left|·|right|. */
  def intervalOverlapJoin(
      left: DataFrame, ls: Column, le: Column,
      right: DataFrame, rs: Column, re: Column,
      bucketWidth: Long, keys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(!left.columns.contains("__bucket") && !right.columns.contains("__bucket"),
      "__bucket column name is reserved by intervalOverlapJoin")
    def bucketOf(c: Column): Column = call_function("div", c, lit(bucketWidth))
    val lb = left.withColumn("__bucket",
      explode(sequence(bucketOf(ls), bucketOf(greatest(le - 1, ls)))))
    val rb = right.withColumn("__bucket",
      explode(sequence(bucketOf(rs), bucketOf(greatest(re - 1, rs)))))
    lb.join(rb, keys :+ "__bucket")
      .where(ls < re && rs < le)
      .where(col("__bucket") === bucketOf(greatest(ls, rs)))
      .drop("__bucket")
  }
}
