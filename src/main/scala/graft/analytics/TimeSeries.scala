package graft.analytics

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState

/** Time-series smoothing (EWMA) — the running-metric shape a stream analyzer
  * (the reference's domain) applies to per-key measurements.
  *
  * EWMA is inherently sequential (`e_i = α·x_i + (1−α)·e_{i−1}`), which rules
  * out a map-side-combinable aggregate. Two shapes are provided:
  *
  *  - [[ewma]] (batch): per-key ordered fold over a collected array. Cost is
  *    linear per key but the whole history sits in one aggregation buffer —
  *    right when per-key history is bounded (a day of readings, a match of
  *    ticks). For unbounded keys, resample first (q60's grid) or use the
  *    streaming form.
  *  - [[ewmaStream]] (streaming): `mapGroupsWithState` carrying ONE double
  *    per key — the 100 TB form: state is O(keys), each micro-batch folds
  *    only its own points.
  *
  * With a dyadic α (0.5, 0.25, …) every step is exact IEEE arithmetic and
  * the left-to-right fold is bit-identical across the codegen'd expression,
  * the streaming fold, and DuckDB's seedless `list_reduce` (which seeds with
  * the first element — mirrored here by seeding the fold with `x_1`). */
object TimeSeries {

  /** Batch EWMA per key: points ordered by `orderCols` (must be a total
    * order per key for determinism), smoothed with weight `alpha` on the
    * new value. Returns one row per key: `n_points`, `ewma`. NULL values
    * poison a fold — filter them upstream. */
  def ewma(
      df: DataFrame, keys: Seq[String],
      orderCols: Seq[String], valueCol: String,
      alpha: Double): DataFrame = {
    require(keys.nonEmpty, "ewma needs at least one key column")
    require(orderCols.nonEmpty, "ewma needs an ordering — EWMA is order-sensitive")
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    Seq("__pts", "__vals", "__v").foreach { r =>
      require(!df.columns.contains(r), s"$r column name is reserved by ewma")
    }
    // struct sorts lexicographically by field position: order columns first,
    // value last, so array_sort yields the time order
    val pt = struct((orderCols.map(col) :+ col(valueCol).as("__v")): _*)
    val sorted = df
      .groupBy(keys.map(col): _*)
      .agg(array_sort(collect_list(pt)).as("__pts"))
      .withColumn("__vals", expr("transform(__pts, p -> p.__v)"))
    sorted.select(
      (keys.map(col) :+
        size(col("__vals")).cast("long").as("n_points") :+
        expr(
          s"""aggregate(slice(__vals, 2, size(__vals) - 1),
              element_at(__vals, 1),
              (acc, x) -> $alpha * x + ${1 - alpha} * acc)""").as("ewma")): _*)
  }

  /** One input point of the streaming form. */
  final case class Point(key: Long, t: Long, v: Double)
  /** Streaming state/output: running EWMA + points seen. */
  final case class EwmaState(key: Long, nPoints: Long, ewma: Double)

  /** Streaming EWMA: one double of state per key, updated per micro-batch in
    * event order (`t` must be monotone per key ACROSS batches for exact
    * batch-twin equality — the usual source-ordering contract; within a
    * batch the group is sorted here). Update mode; emits the running state
    * for every key touched by the batch. */
  def ewmaStream(points: Dataset[Point], alpha: Double): Dataset[EwmaState] = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    import org.apache.spark.sql.streaming.GroupStateTimeout
    points
      .groupByKey(_.key)(Encoders.scalaLong)
      .mapGroupsWithState[EwmaState, EwmaState](GroupStateTimeout.NoTimeout) {
        (key: Long, batch: Iterator[Point], state: GroupState[EwmaState]) =>
          val pts = batch.toSeq.sortBy(p => (p.t, p.v))
          val init = state.getOption
          val start = init.getOrElse(EwmaState(key, 0L, 0.0))
          val folded = pts.foldLeft(start) { (s, p) =>
            val e = if (s.nPoints == 0L) p.v else alpha * p.v + (1 - alpha) * s.ewma
            EwmaState(key, s.nPoints + 1, e)
          }
          state.update(folded)
          folded
      }(Encoders.product[EwmaState], Encoders.product[EwmaState])
  }
}
