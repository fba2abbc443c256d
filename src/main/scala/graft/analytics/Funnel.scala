package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Ordered funnel analysis: for each key, the earliest time each step of an
  * ordered step sequence was reached, where step i counts only STRICTLY
  * after the key's step-(i−1) time — the product-analytics staple
  * (view → click → purchase), generalized to any predicate sequence.
  *
  * Semantics note ("earliest valid" recursion): t_1 = min time matching
  * step 1; t_i = min time matching step i with t > t_{i−1}. A step never
  * reached leaves t_i (and all deeper steps) NULL. Equal timestamps do NOT
  * advance the funnel (strict >) — simultaneous events cannot prove order.
  *
  * Scale shape: every step is a full-frame windowed conditional min over
  * ONE hash exchange on the key — no per-step re-scan of the fact table, no
  * self-joins, state O(steps) per key. The final DISTINCT reuses the same
  * partitioning. (A running-min gate is unnecessary: `t > t_{i−1}` with
  * full-frame mins is equivalent — if the prior step's earliest time is
  * later than a candidate row, the strict inequality already rejects it.) */
object Funnel {

  /** One row per key: the key columns, `t_<step>` for each step (earliest
    * valid time, NULL if never reached), and `funnel_step` (number of
    * consecutive steps completed, 0..steps.length). */
  def funnelSteps(
      df: DataFrame, keys: Seq[String], timeCol: String,
      steps: Seq[(String, Column)]): DataFrame = {
    require(keys.nonEmpty, "funnelSteps needs at least one key column")
    require(steps.nonEmpty, "funnelSteps needs at least one step")
    val names = steps.map(_._1)
    require(names.distinct == names, s"step names must be unique, got $names")
    (names.map(n => s"t_$n") :+ "funnel_step").foreach { r =>
      require(!df.columns.contains(r), s"$r column name is reserved by funnelSteps")
    }
    val full = Window.partitionBy(keys.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val staged = steps.zipWithIndex.foldLeft(df) {
      case (acc, ((name, pred), i)) =>
        val gated =
          if (i == 0) pred
          else pred && col(timeCol) > col(s"t_${names(i - 1)}")
        acc.withColumn(s"t_$name", min(when(gated, col(timeCol))).over(full))
    }
    // fold shallow→deep so the DEEPEST reached step is the outermost when
    // (t_i non-null implies t_{i-1} non-null via the gating, so depth is
    // consecutive by construction)
    val depth = names.zipWithIndex.foldLeft(lit(0L)) {
      case (els, (name, idx)) =>
        when(col(s"t_$name").isNotNull, lit((idx + 1).toLong)).otherwise(els)
    }
    staged
      .select((keys.map(col) ++ names.map(n => col(s"t_$n")) :+
        depth.as("funnel_step")): _*)
      .distinct()
  }

  /** One input event of the streaming form: `steps(i)` = whether this event
    * satisfies step i's predicate (precompute with a `select` of the same
    * `Column` predicates the batch form takes). */
  final case class FunnelEvent(key: Long, t: Long, steps: Seq[Boolean])
  /** Streaming state/output: earliest valid time per step (None = step not
    * reached yet) and the funnel depth so far. */
  final case class FunnelState(key: Long, times: Seq[Option[Long]], funnelStep: Long)

  /** Streaming twin of [[funnelSteps]]: `mapGroupsWithState` carrying ONE
    * `Option[Long]` per funnel step per key — state is O(keys · steps)
    * regardless of stream length, the 100 TB form. Each micro-batch's
    * events are folded in event-time order; a slot is set at the first
    * (= earliest, given ordered input) event that matches the step's
    * predicate strictly after the previous step's time, and never moves
    * again. Equal timestamps don't advance the funnel, exactly like the
    * batch form.
    *
    * Exact batch-twin equality needs `t` monotone per key ACROSS
    * micro-batches (the usual source-ordering contract — within a batch
    * the group is sorted here): a step event that arrives before the
    * earlier-step event that would have validated it is dropped, because
    * replaying it would need unbounded per-key history. Update mode; emits
    * the running state for every key touched by the batch. */
  /** The shared per-batch fold of both streaming APIs: events in event-time
    * order (tie order within a sort key is irrelevant: strict > only
    * compares values, and a same-time later step can never fire), each
    * filling at most one step — an event uses the ALREADY-UPDATED earlier
    * slots, same as the batch recursion. Filled slots always form a prefix
    * (slot i requires slot i−1), so `funnelStep` = count of set slots and
    * is MONOTONE across batches — the multi-batch row selector. */
  private def foldBatch(
      key: Long, times: Array[Option[Long]],
      batch: Iterator[FunnelEvent], numSteps: Int): FunnelState = {
    batch.toSeq.sortBy(_.t).foreach { e =>
      require(e.steps.length == numSteps,
        s"event has ${e.steps.length} step flags, expected $numSteps")
      var i = 0
      while (i < numSteps) {
        if (times(i).isEmpty && e.steps(i) &&
            (i == 0 || times(i - 1).exists(_ < e.t)))
          times(i) = Some(e.t)
        i += 1
      }
    }
    FunnelState(key, times.toSeq, times.takeWhile(_.isDefined).length.toLong)
  }

  def funnelStream(
      events: Dataset[FunnelEvent], numSteps: Int): Dataset[FunnelState] = {
    require(numSteps > 0, s"numSteps must be positive, got $numSteps")
    events
      .groupByKey(_.key)(Encoders.scalaLong)
      .mapGroupsWithState[FunnelState, FunnelState](GroupStateTimeout.NoTimeout) {
        (key: Long, batch: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          val times = state.getOption.map(_.times.toArray)
            .getOrElse(Array.fill[Option[Long]](numSteps)(None))
          val out = foldBatch(key, times, batch, numSteps)
          state.update(out)
          out
      }(Encoders.product[FunnelState], Encoders.product[FunnelState])
  }

  /** [[funnelStream]] on the Spark 4 `transformWithState` API — identical
    * semantics (the same [[foldBatch]]), with what the modern API adds
    * operationally: typed NAMED state with optional store-managed TTL (the
    * expiry bound for unbounded key spaces — an abandoned funnel's state
    * is dropped by the store, no timer bookkeeping), and the RocksDB-backed
    * provider the API requires, so per-key state spills to executor disk
    * instead of heap — the 100 TB configuration. Requires
    * `spark.sql.streaming.stateStore.providerClass =
    * ...state.RocksDBStateStoreProvider` on the session running the query.
    * Same batch-twin contract as [[funnelStream]]: with `t` monotone per
    * key across micro-batches, the final state equals [[funnelSteps]] over
    * the union of all batches. */
  def funnelStreamTws(
      events: Dataset[FunnelEvent], numSteps: Int,
      ttl: Option[java.time.Duration] = None): Dataset[FunnelState] = {
    require(numSteps > 0, s"numSteps must be positive, got $numSteps")
    val timeMode =
      if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    implicit val stateEnc: org.apache.spark.sql.Encoder[FunnelState] =
      Encoders.product[FunnelState]
    events
      .groupByKey(_.key)(Encoders.scalaLong)
      .transformWithState(
        new FunnelProcessor(numSteps, ttl), timeMode, OutputMode.Update())
  }

  /** The [[funnelStreamTws]] processor: one named `ValueState[FunnelState]`
    * slot per key, folded with the exact [[foldBatch]] the legacy API uses. */
  private[analytics] class FunnelProcessor(
      numSteps: Int, ttl: Option[java.time.Duration])
      extends StatefulProcessor[Long, FunnelEvent, FunnelState] {
    @transient private var state: ValueState[FunnelState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[FunnelState]("funnelState",
        Encoders.product[FunnelState], ttl.fold(TTLConfig.NONE)(TTLConfig.apply))

    override def handleInputRows(
        key: Long, events: Iterator[FunnelEvent],
        timers: TimerValues): Iterator[FunnelState] = {
      val times =
        if (state.exists()) state.get().times.toArray
        else Array.fill[Option[Long]](numSteps)(None)
      val out = foldBatch(key, times, events, numSteps)
      state.update(out)
      Iterator.single(out)
    }
  }
}
