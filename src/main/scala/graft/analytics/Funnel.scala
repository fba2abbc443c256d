package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
}
