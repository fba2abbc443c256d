package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation patterns for hot keys at cluster scale.
  *
  * AQE's skew-join splitting handles most cases at runtime; these explicit
  * forms are for the places AQE cannot help: a single aggregation key so hot
  * that one task's partial state is itself the bottleneck, or deterministic
  * plans where runtime re-planning is disabled.
  */
object Skew {

  /** One decomposable aggregate: phase-1 runs on (keys, salt), phase-2
    * combines the partials per key. */
  final case class TwoPhase(
      out: String, in: String,
      phase1: Column => Column, phase2: Column => Column)

  object TwoPhase {
    def sumOf(out: String, in: String): TwoPhase =
      TwoPhase(out, in, sum(_), c => sum(c))
    def countOf(out: String, in: String): TwoPhase =
      TwoPhase(out, in, count(_), c => sum(c))
    def minOf(out: String, in: String): TwoPhase =
      TwoPhase(out, in, min(_), c => min(c))
    def maxOf(out: String, in: String): TwoPhase =
      TwoPhase(out, in, max(_), c => max(c))
  }

  /** Salted equi-join for hot join keys: the fact side gets a deterministic
    * content-derived salt in [0, salts); the dimension side is replicated
    * once per salt value (explode, not a driver loop). The join key becomes
    * (keys…, salt), spreading each hot key's fact rows over `salts` tasks
    * while every fact row still meets every matching dim row exactly once —
    * result-identical to the plain join, shuffle-skew-free by construction.
    *
    * Use when the dim side is too big to broadcast AND AQE's runtime skew
    * split is unavailable (deterministic plan requirements, stateful
    * streaming). Cost: the dim side shuffles `salts`× its size — keep
    * `salts` near the executor-count you need the hot key spread over.
    * Only left-rooted join types are valid: replicating the dim side would
    * duplicate its unmatched rows under right/full outer semantics. */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame, keys: Seq[String],
      saltSource: Column, salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(keys.nonEmpty, "saltedJoin needs at least one join key")
    val allowed = Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti")
    // normalize once and pass the NORMALIZED form to join — Spark itself
    // rejects space-separated forms like "left outer"
    val jt = joinType.toLowerCase.replace(" ", "_")
    require(allowed.contains(jt),
      s"saltedJoin supports left-rooted join types only, got $joinType")
    require(!fact.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "__salt column name is reserved by saltedJoin")
    val f = fact.withColumn("__salt", pmod(hash(saltSource), lit(salts)))
    val d = dim.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    f.join(d, keys :+ "__salt", jt).drop("__salt")
  }

  /** Two-phase (salted) aggregation: phase 1 aggregates on (keys, salt),
    * spreading each hot key over `salts` tasks; phase 2 combines partials
    * per key. The salt derives from stable row content (`saltSource`), not
    * `rand()`, so the plan is deterministic and retry-safe. Only valid for
    * decomposable aggregates (sum/count/min/max — see [[TwoPhase]]). */
  def saltedAggregate(
      df: DataFrame,
      keyCols: Seq[String],
      saltSource: Column,
      salts: Int,
      aggs: Seq[TwoPhase]): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(aggs.nonEmpty, "need at least one aggregate")
    val salted = df.withColumn("__salt", pmod(hash(saltSource), lit(salts)))
    val p1 = salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(
        aggs.head.phase1(col(aggs.head.in)).as(s"__p_${aggs.head.out}"),
        aggs.tail.map(a => a.phase1(col(a.in)).as(s"__p_${a.out}")): _*)
    p1
      .groupBy(keyCols.map(col): _*)
      .agg(
        aggs.head.phase2(col(s"__p_${aggs.head.out}")).as(aggs.head.out),
        aggs.tail.map(a => a.phase2(col(s"__p_${a.out}")).as(a.out)): _*)
  }
}
