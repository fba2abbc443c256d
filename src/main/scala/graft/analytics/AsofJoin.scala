package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic as-of (nearest-prior) join — the timeseries primitive behind
  * trade-to-quote matching, LOCF gap filling, and slowly-changing-dimension
  * lookups. For each left row, attach the single right row with the greatest
  * `rightTs <= leftTs` among rows sharing the equi `keys`.
  *
  * Spark has no native as-of operator, and the naive formulations both
  * collapse at scale: a correlated `LIMIT 1` subquery re-scans the right side
  * per left row, and a `BETWEEN`-style theta join plans a nested-loop sweep.
  * This implementation instead UNIONS the two sides with a sort tag and runs
  * ONE window pass per key: rows sort by (ts, tag) with right rows first at
  * ties, and a running `last(right_payload, ignoreNulls)` carries the most
  * recent right payload forward onto every left row. Cost is a single shuffle
  * on `keys` plus a per-partition sort — identical asymptotics to a
  * sort-merge join, with O(1) window state (the running-frame `last` never
  * buffers the partition).
  *
  * Scale notes: one partition per key value — a pathologically hot key
  * serializes through one task, exactly as any per-key sort would; pre-split
  * such keys upstream (e.g. coarse time-range the left side) if needed.
  * Right (keys, ts) pairs must be UNIQUE for a deterministic result —
  * pre-aggregate duplicates (`max_by`) first; the DuckDB/pandas `merge_asof`
  * engines impose the same requirement for the same reason.
  */
object AsofJoin {

  /** Left-outer as-of join. `leftTs`/`rightTs` must be mutually comparable
    * and totally ordered (integral ticks recommended); rows with no prior
    * right match keep null right columns. `rightCols` are the right-side
    * columns to carry — their names must not collide with left columns.
    * With `strict = true` the match is `rightTs < leftTs` (excludes
    * same-instant rows — the lookahead-safe variant for feature generation:
    * a feature computed AT trade time must not see the quote that arrives
    * on the same tick). */
  def asofJoin(
      left: DataFrame, leftTs: Column,
      right: DataFrame, rightTs: Column,
      keys: Seq[String], rightCols: Seq[String],
      strict: Boolean = false): DataFrame = {
    val leftCols = left.columns.toSeq
    require(keys.nonEmpty, "asofJoin needs at least one equi key")
    require(rightCols.nonEmpty, "asofJoin needs at least one right column to carry")
    val clash = rightCols.intersect(leftCols)
    require(clash.isEmpty, s"right columns collide with left columns: $clash — rename first")

    // Sort-tag order decides whether a right row at EXACTLY leftTs is
    // visible: inclusive ⇒ right first (0) so the running last() has already
    // absorbed it; strict ⇒ left first so it hasn't.
    val (lTag, rTag) = if (strict) (0, 1) else (1, 0)
    val l2 = left.select(
      keys.map(col) ++ Seq(
        leftTs.as("__ts"), lit(lTag).as("__tag"),
        struct(leftCols.map(col): _*).as("__l")): _*)
    // SQL equi-semantics: NULL keys never match. Window.partitionBy would
    // group null keys into one partition (null-safe equality), so a
    // null-key right row must never enter the union — left null-key rows
    // then sit in a partition with no right rows and correctly keep nulls.
    val r2 = right
      .where(keys.map(col(_).isNotNull).reduce(_ && _))
      .select(
        keys.map(col) ++ Seq(
          rightTs.as("__ts"), lit(rTag).as("__tag"),
          struct(rightCols.map(col): _*).as("__r")): _*)
    val u = l2.withColumn("__r", lit(null).cast(r2.schema("__r").dataType))
      .unionByName(r2.withColumn("__l", lit(null).cast(l2.schema("__l").dataType)))

    // Running frame (unbounded preceding → current row): Spark evaluates
    // last(ignoreNulls) incrementally, so window state is O(1) per key.
    // Left rows that tie on the full sort key all see the same preceding
    // right set and carry null __r themselves, so their mutual order is
    // irrelevant — the result is deterministic without a left tiebreak.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__tag") === lTag)
      .select(leftCols.map(c => col("__l").getField(c).as(c)) ++
        rightCols.map(c => col("__m").getField(c).as(c)): _*)
  }
}
