package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling — the health check a pipeline runs before and after
  * every transformation at scale: row count, per-column null counts,
  * distinct cardinalities, and value ranges, as ONE aggregation over ONE
  * scan (every statistic is a conditional aggregate of the same pass;
  * profiling 40 columns costs the same shuffle as profiling one).
  *
  * The result is tall — one row per profiled column — so downstream checks
  * (null-rate alerts, cardinality drift) are plain filters on the profile
  * table rather than schema-dependent column gymnastics.
  *
  * `count_distinct` here is EXACT (it participates in the single-pass
  * aggregate; fine up to high-cardinality columns, where the shuffle of the
  * per-column distinct sets dominates). At open-web scale swap in
  * `approx_count_distinct` — same plan shape, sketch-sized exchange — which
  * is why the column is named `n_distinct` rather than promising exactness
  * in the schema. */
object Profiling {

  /** Profile `cols` of `df`: (column, n_rows, n_null, n_distinct,
    * min_value, max_value) with the range endpoints rendered as strings so
    * heterogeneous column types share one schema. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        count(when(col(c).isNull, 1)).as(s"__null_$c"),
        count_distinct(col(c)).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    profileRows(one, cols)
  }

  /** Fixed-width histogram of `value` (optionally per group): bin index
    * `floor(value / width)`, one hash aggregation — the distribution view
    * `profile`'s min/max only hints at. Fixed (literal) width keeps the
    * result deterministic and engine-exact; derive the width from a
    * `profile` pass when it must adapt to the data. */
  def histogram(
      df: DataFrame, value: Column, width: Double,
      groupCols: Seq[String] = Nil): DataFrame = {
    require(width > 0, s"width must be positive, got $width")
    val bin = floor(value / lit(width)).as("bin") // floor already yields long
    df.groupBy(groupCols.map(col) :+ (bin: Column): _*)
      .agg(
        count(lit(1)).as("n"),
        min(value).cast("double").as("bin_min"),
        max(value).cast("double").as("bin_max"))
  }

  private def profileRows(one: DataFrame, cols: Seq[String]): DataFrame = {
    val rows = cols.map { c =>
      struct(
        lit(c).as("column"),
        col("__n").as("n_rows"),
        col(s"__null_$c").as("n_null"),
        col(s"__dist_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }
}
