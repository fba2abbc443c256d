package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's downstream analytical query shapes (queries.sql:1-75,
  * SURVEY.md §2.4-2.6), generalized into reusable Spark operators. The
  * reference runs these as Postgres SQL for Grafana; here they are first-class
  * Catalyst plans over any DataFrame.
  */
object Scoreboard {

  /** Greatest-n-per-group / "latest stats per key" (reference queries.sql:5-13,
    * J1/A6): one row per `keys`, the one that sorts first by `order`.
    *
    * Implemented as `row_number` over a window — a single shuffle on the keys;
    * at 100 TB this beats the reference's self-join-with-MAX shape (two
    * shuffles + a join) and AQE handles key skew.
    */
  def latestPerGroup(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    // NOTE on ties: a non-total `order` keeps ONE arbitrary tied row (the
    // reference's self-join-with-MAX returns every tied row); append a
    // unique tiebreaker to `order` for run-to-run determinism
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Greatest-per-group as a `max_by` HASH AGGREGATION — for the common case
    * where "latest" is the lexicographic maximum of some columns (all
    * descending). Unlike the window form, partials combine map-side and
    * nothing is sorted: the exchange carries one candidate row per (key,
    * map partition) instead of every row. Requires `maxCols` to be
    * tie-free per key (include a unique id) — on a tie `max_by` keeps an
    * arbitrary row where the window form would pick deterministically. */
  def latestPerGroupAgg(df: DataFrame, keys: Seq[String], maxCols: Seq[String]): DataFrame = {
    val all = struct(df.columns.map(col): _*)
    val ord = struct(maxCols.map(col): _*)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(all, ord).as("__best"))
      .select(col("__best.*"))
  }

  /** Dense grid scaffold (reference queries.sql:31-33,50-51 — DISTINCT seconds
    * CROSS JOIN players): distinct values of `axisCol` × the whole `dim`.
    * The axis side is tiny after DISTINCT (time buckets), so Catalyst
    * broadcast-crosses it — no shuffle of the big side.
    */
  def denseGrid(facts: DataFrame, axisCol: String, dim: DataFrame): DataFrame =
    facts.select(col(axisCol)).distinct().crossJoin(dim)

  /** Last-value-carry-forward over a dense grid (reference queries.sql:42-49,
    * J5/W1): for each key, the last non-null `valueCol` at-or-before each grid
    * point, defaulting to `default`.
    *
    * The reference expresses this as a correlated scalar subquery with
    * `ORDER BY ... DESC LIMIT 1` per grid cell — O(cells × history) in
    * Postgres. Spark does not decorrelate LIMIT-1 subqueries, and a per-cell
    * loop would never scale; the equivalent plan is a single window pass:
    * `last(value, ignoreNulls) OVER (PARTITION BY key ORDER BY axis ROWS
    * UNBOUNDED PRECEDING)` — one shuffle, linear work.
    */
  def locf(
      grid: DataFrame,
      keys: Seq[String],
      axisCol: String,
      valueCol: String,
      default: Column): DataFrame = {
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(axisCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.withColumn(valueCol, coalesce(last(col(valueCol), ignoreNulls = true).over(w), default))
  }

  /** Key × pivot-column matrix (reference queries.sql:53-68, A7): the manual
    * `MAX(CASE WHEN id = k ...)` pivot, done with Spark's native `pivot` with
    * EXPLICIT pivot values — avoids the extra distinct-values job and keeps
    * the plan static (essential when the pivot set is known, as the
    * reference's player1..player10 is).
    */
  def pivotMatrix(
      df: DataFrame,
      rowKey: String,
      pivotCol: String,
      pivotValues: Seq[String],
      value: Column,
      floor: Option[Column] = None): DataFrame = {
    val base = df.groupBy(col(rowKey))
      .pivot(pivotCol, pivotValues)
      .agg(value)
      // fill only the pivot cells: a blanket fill would also rewrite a NULL
      // row key to 0, conflating that group with a real key 0
      .na.fill(0, pivotValues)
    // the reference's conditional-aggregation pivot MAXes each cell against
    // its ELSE 0 arm (queries.sql:55-64), clamping negatives to 0 — opt in
    // to that with floor = Some(lit(0.0))
    floor.fold(base)(fl =>
      base.select(col(rowKey) +: pivotValues.map(v => greatest(col(v), fl).as(v)): _*))
  }
}
