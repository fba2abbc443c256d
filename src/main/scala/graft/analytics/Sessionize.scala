package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the canonical large-scale event-log operator
  * (not in the reference, part of the training-pipeline extension surface).
  *
  * A new session starts when the gap to the previous event of the same key
  * exceeds `gap`. Plan shape: ONE shuffle on the key, then two window passes
  * over the same (key, time) sort order — Catalyst reuses the sort — and a
  * final partial-aggregated groupBy on (key, session). At 100 TB this scales
  * with the key cardinality like any windowed op; skewed keys (bot users with
  * millions of events) are the thing to watch — cap events per key upstream
  * or pre-split hot keys.
  *
  * Spark's native `session_window` gives the same semantics inside a
  * streaming-compatible groupBy; this relational form exists because (a) it
  * runs identically in DuckDB/any ANSI engine for the oracle, and (b) it
  * keeps the raw event-time type (here: nanosecond longs) without timestamp
  * truncation.
  */
object Sessionize {

  /** One row per (key, session): session ordinal (1-based per key), start/end
    * event times, event count.
    *
    * @param timeCol event-time column, any numeric/orderable type
    * @param gap     max intra-session gap, in `timeCol` units
    */
  def sessionize(df: DataFrame, keyCols: Seq[String], timeCol: String, gap: Long): DataFrame = {
    // NULLS LAST explicitly: Spark's default window order is NULLS FIRST
    // while the DuckDB oracle sorts NULLS LAST — null event times would
    // otherwise open a phantom leading session in one engine and append to
    // the final session in the other
    val timeAsc = col(timeCol).asc_nulls_last
    val byTime = Window.partitionBy(keyCols.map(col): _*).orderBy(timeAsc)
    val runningSession = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(timeAsc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col(timeCol), 1).over(byTime)
    val isNew = when(prev.isNull || col(timeCol) - prev > gap, 1L).otherwise(0L)
    df.withColumn("__new", isNew)
      .withColumn("session_id", sum(col("__new")).over(runningSession))
      .groupBy(keyCols.map(col) :+ col("session_id"): _*)
      .agg(
        min(col(timeCol)).as("start_time"),
        max(col(timeCol)).as("end_time"),
        count(lit(1)).as("n_events"))
  }

  /** Streaming twin of [[sessionize]] on Spark's native `session_window` —
    * the stateful, watermark-evicted form for a live feed. Works on batch
    * frames too (same plan minus state).
    *
    * Boundary semantics: `session_window`'s merge is INCLUSIVE at the
    * boundary (an event exactly `gap` after the previous one still merges —
    * pinned empirically in `SessionizeSpec`), which is exactly
    * [[sessionize]]'s relational `diff > gap` ⇒ new rule, so the two forms
    * agree everywhere and share oracles. Emits (keys…, start_time,
    * end_time, n_events) with event times in epoch µs; in streaming append
    * mode a session finalizes once the watermark passes its close.
    *
    * @param tsCol a TIMESTAMP column (the watermark column in streaming)
    * @param gap   e.g. "30 minutes" */
  def sessionWindows(
      df: DataFrame, keyCols: Seq[String], tsCol: String,
      gap: String): DataFrame =
    df.groupBy(
        session_window(col(tsCol), gap) +: keyCols.map(col): _*)
      .agg(
        min(unix_micros(col(tsCol))).as("start_time"),
        max(unix_micros(col(tsCol))).as("end_time"),
        count(lit(1)).as("n_events"))
      .select(keyCols.map(col) :+ col("start_time") :+
        col("end_time") :+ col("n_events"): _*)
}
