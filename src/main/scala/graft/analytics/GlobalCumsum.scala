package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable GLOBAL running aggregation — the two-phase distributed scan that
  * replaces the `Window.orderBy(...)` -with-no-partition anti-pattern, whose
  * WindowExec moves the ENTIRE frame to a single partition (Spark warns "No
  * Partition Defined for Window operation"). That form is fine on a
  * dimension-sized frame; on a corpus-sized one it is the scale-killer.
  *
  * Shape: range-partition by the order key (equal keys never split across
  * partitions, so the partition id is a monotone function of the order), tag
  * rows with their physical partition id, reduce to ONE total per partition
  * (map-side combine), turn the P-row totals frame into exclusive
  * per-partition base offsets with a window that is single-partition by
  * PARTITION COUNT — bounded by cluster configuration, not by data — then
  * broadcast the offsets back and add them to each partition's local running
  * sum. Output values are bit-identical to the naive global window for any
  * associative exact sum (longs, decimals).
  *
  * Cost: two shuffles of the (already reduced) input — the range exchange
  * and the window's hash-by-pid clustering — versus the naive form's one
  * exchange into ONE partition. At scale the second narrow shuffle is noise;
  * the single-partition sort is a job-killer.
  *
  * Same caveat as any ordered window: the order should be total (tie rows
  * agree on their mutual "before" arbitrarily). */
object GlobalCumsum {

  /** Exclusive (strictly-before) global running sum of `value` in `order`:
    * the first row gets 0. `order` columns may carry sort direction
    * (`col("x").desc`). The pinned range exchange is registered with
    * [[graft.util.Caches]] — long-lived sessions call
    * `Caches.releaseAll()` once the result is fully materialized. */
  def cumsumBefore(
      df: DataFrame, order: Seq[Column], value: Column, out: String,
      numPartitions: Int = 0): DataFrame =
    core(df, order, value, out, numPartitions)._2

  /** Shared two-phase scan: returns the pinned ranged frame (for derived
    * scalars like ntile's total — reading it costs a cached scan, not a
    * re-scan of the unpersisted input) alongside the cumsum result. */
  private def core(
      df: DataFrame, order: Seq[Column], value: Column, out: String,
      numPartitions: Int): (DataFrame, DataFrame) = {
    require(order.nonEmpty, "cumsumBefore needs at least one order column")
    val p =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // MATERIALIZED ONCE, eagerly — correctness, not caching: the offsets
    // branch and the main pass below both consume the physical partition
    // ids of THIS range exchange, and a range exchange's sampled boundaries
    // are not re-execution-stable (two independent executions of the same
    // subtree can place boundary-adjacent rows in different partitions —
    // observed at sf0.1 as a nondeterministic off-by-a-few-docs drift).
    // Persist (lineage survives executor loss) + eager count pins one
    // layout for both consumers. The input should already be the REDUCED
    // (key, value) frame, so this holds the reduction, not the corpus.
    // Registered in Caches so runners release it post-materialization —
    // never unpersist before the consuming action completes.
    val ranged = graft.util.Caches.register(df
      .withColumn("__v", value)
      .repartitionByRange(p, order: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    ranged.count()
    val pidW = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged
      .groupBy(col("__pid")).agg(sum(col("__v")).as("__ptot"))
      .select(col("__pid"),
        coalesce(sum(col("__ptot")).over(pidW), lit(0)).as("__offset"))
    val localW = Window.partitionBy(col("__pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val result = ranged
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn(out,
        coalesce(sum(col("__v")).over(localW), lit(0)) + col("__offset"))
      .drop("__pid", "__v", "__offset")
    (ranged, result)
  }

  /** [[cumsumBefore]] plus per-group totals of `value`, BOTH derived from
    * the same pinned range exchange: the totals consumer reads the cached
    * reduced frame instead of re-executing the (possibly expensive) input
    * lineage — the single-pass guarantee for callers that need "global
    * cumsum + per-group base offsets" (per-split sequence packing, binned
    * offsets), where aggregating the unpersisted input a second time would
    * re-run everything upstream of it.
    *
    * @return (cumsum result as in [[cumsumBefore]],
    *         totals frame with columns `groupCols :+ totalOut`) */
  def cumsumBeforeWithTotals(
      df: DataFrame, order: Seq[Column], value: Column, out: String,
      groupCols: Seq[String], totalOut: String,
      numPartitions: Int = 0): (DataFrame, DataFrame) = {
    require(groupCols.nonEmpty, "cumsumBeforeWithTotals needs group columns")
    val (ranged, cum) = core(df, order, value, out, numPartitions)
    val totals = ranged
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("__v")).as(totalOut))
    (cum, totals)
  }

  /** Global 1-based row number in `order`, without a single-partition sort:
    * [[cumsumBefore]] of the constant 1, plus one. */
  def rowNumber(
      df: DataFrame, order: Seq[Column], out: String,
      numPartitions: Int = 0): DataFrame =
    cumsumBefore(df, order, lit(1L), out, numPartitions)
      .withColumn(out, col(out) + lit(1L))

  /** Exact `ntile(buckets)` in `order`, without a single-partition sort:
    * Spark's ntile semantics reconstructed arithmetically from the global
    * [[rowNumber]] and a broadcast one-row total — with n rows, the first
    * n % buckets buckets hold ⌈n/buckets⌉ rows, the rest ⌊n/buckets⌋
    * (when n < buckets the else-branch's /0 is unreachable: every row
    * falls in the remainder region). Bit-identical to
    * `ntile(b).over(Window.orderBy(order))` for any total order. */
  def ntile(
      df: DataFrame, order: Seq[Column], buckets: Int, out: String,
      numPartitions: Int = 0): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val b = lit(buckets.toLong)
    // rowNumber = cumsumBefore(1) + 1; the total row count is sum(__v) over
    // the ALREADY-PINNED ranged frame — one cached scan, not a second full
    // scan of the unpersisted input
    val (ranged, cum) = core(df, order, lit(1L), out, numPartitions)
    val total = ranged.agg(
      coalesce(sum(col("__v")), lit(0L)).cast("long").as("__gc_n"))
    val base = floor(col("__gc_n") / b)
    val rem = col("__gc_n") % b
    val cap = rem * (base + 1) // rows covered by the larger buckets
    cum.withColumn(out, col(out) + lit(1L))
      .crossJoin(broadcast(total))
      .withColumn(out,
        when(col(out) <= cap, floor((col(out) - 1) / (base + 1)) + 1)
          .otherwise(rem + floor((col(out) - cap - 1) / base) + 1)
          .cast("long"))
      .drop("__gc_n")
  }
}
