package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval coalescing (gap-and-islands) over keyed interval sets.
  *
  * The classic warehouse problem the reference's downstream SQL era solved
  * with quadratic self-joins: collapse overlapping-or-touching validity /
  * activity intervals per key into maximal merged spans. Here it is the
  * linear windowed form: one sort per key, O(1) window state, no self-join.
  */
object Intervals {

  /** Merge overlapping-or-touching closed intervals `[start, end]` per key.
    *
    * Shape: within each key, order by (start, end); a row STARTS a new island
    * iff its start exceeds the running max end of all previous rows (so
    * chained overlaps `[1,5] [2,9] [8,12]` merge transitively even though the
    * third interval does not overlap the first). The island id is then the
    * running count of island-starts, and each island aggregates to
    * `[min(start), max(end)]` with its member count.
    *
    * Scale: both window passes share ONE hash exchange + sort on the key
    * (same partitioning and ordering — Catalyst plans a single sort), the
    * running max/sum carry O(1) state per key, and the final aggregation is
    * a partial-combining hash agg. No nested loop, no self-join, no
    * per-key memory proportional to interval count. Rows where any key is
    * NULL form their own partition (SQL window semantics, identical in the
    * DuckDB oracle).
    *
    * NULL start/end caveat: the sort is pinned ASC NULLS FIRST (Spark's
    * default, made explicit below), so a NULL-start interval leads its key
    * and its end seeds the running max. Engines whose ASC default is NULLS
    * LAST (DuckDB, Postgres) island NULL-start rows DIFFERENTLY — feed only
    * non-null bounds when a cross-engine oracle must agree (the q74 catalog
    * query derives its bounds from a non-null timestamp).
    *
    * Output: key columns + `<startCol>` (island min-start), `<endCol>`
    * (island max-end), `n_merged` (intervals coalesced into the island). */
  def mergeIntervals(
      df: DataFrame, keys: Seq[String],
      startCol: String, endCol: String): DataFrame = {
    require(keys.nonEmpty, "mergeIntervals needs at least one key column")
    Seq("__brk", "__island").foreach { r =>
      require(!df.columns.contains(r), s"$r column name is reserved by mergeIntervals")
    }
    val byKey = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(startCol).asc_nulls_first, col(endCol).asc_nulls_first)
    val prevMaxEnd = max(col(endCol))
      .over(byKey.rowsBetween(Window.unboundedPreceding, -1))
    val flagged = df.withColumn(
      "__brk",
      when(prevMaxEnd.isNull || col(startCol) > prevMaxEnd, 1L).otherwise(0L))
    val islands = flagged.withColumn(
      "__island",
      sum(col("__brk")).over(byKey.rowsBetween(Window.unboundedPreceding, 0)))
    islands
      .groupBy((keys.map(col) :+ col("__island")): _*)
      .agg(
        min(col(startCol)).as(startCol),
        max(col(endCol)).as(endCol),
        count(lit(1)).as("n_merged"))
      .drop("__island")
  }
}
