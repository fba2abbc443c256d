package graft.ext

import graft.SparkTestBase

class ProfilingSpec extends SparkTestBase {
  import spark.implicits._

  test("profile computes per-column nulls, distincts and ranges in one pass") {
    val df = Seq(
      (1L, Some("a"), Some(10.0)),
      (2L, None, Some(30.0)),
      (3L, Some("c"), None),
      (4L, Some("a"), Some(10.0))).toDF("id", "s", "v")
    val out = Profiling.profile(df, Seq("id", "s", "v"))
      .orderBy("column").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toSeq
    out shouldBe Seq(
      ("id", 4L, 0L, 4L, "1", "4"),
      ("s", 4L, 1L, 2L, "a", "c"),
      ("v", 4L, 1L, 2L, "10.0", "30.0"))
    an[IllegalArgumentException] should be thrownBy Profiling.profile(df, Nil)
  }

  test("histogram bins by floor(value/width) with per-bin ranges") {
    import org.apache.spark.sql.functions._
    val df = Seq(("a", 5.0), ("a", 14.9), ("a", 15.1), ("b", 25.0)).toDF("g", "v")
    val out = Profiling.histogram(df, col("v"), 10.0, Seq("g"))
      .orderBy("g", "bin").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    out.toSeq shouldBe Seq(
      ("a", 0L, 1L, 5.0, 5.0),
      ("a", 1L, 2L, 14.9, 15.1),
      ("b", 2L, 1L, 25.0, 25.0))
    an[IllegalArgumentException] should be thrownBy
      Profiling.histogram(df, col("v"), 0.0)
    // the documented shape: ONE hash aggregation, no join
    val plan = Profiling.histogram(df, col("v"), 10.0, Seq("g"))
      .queryExecution.executedPlan.toString
    plan.contains("Join") shouldBe false
    plan.sliding("Exchange".length).count(_ == "Exchange") should be <= 2
  }

  test("profile plan: independent per-column aggregates, no join, no Expand") {
    val df = Seq((1L, "x")).toDF("id", "s")
    val plan = Profiling.profile(df, Seq("id", "s")).queryExecution.executedPlan.toString
    (plan should not).include("Join")
    // the whole point of the per-column shape: Catalyst's mixed
    // distinct/non-distinct aggregation would Expand every input row (k+1)×
    (plan should not).include("Expand")
    // two exchanges per column branch (groupBy shuffle + single-row fold)
    plan.sliding("Exchange".length).count(_ == "Exchange") should be <= 4
  }

  test("profile of an empty input reports 0 rows per column, not nulls") {
    val df = Seq((1L, "x")).toDF("id", "s").where(org.apache.spark.sql.functions.lit(false))
    val out = Profiling.profile(df, Seq("id", "s")).orderBy("column").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    out shouldBe Seq(("id", 0L, 0L, 0L), ("s", 0L, 0L, 0L))
  }
  test("exactPercentiles agrees with the percentile builtin to the last ulp") {
    import org.apache.spark.sql.functions._
    // odd and even group sizes, duplicate values, a fractional-position
    // percentile (0.3 is not dyadic) — the cases where blend-tree order shows
    val df = Seq(
      ("a", 3.0), ("a", 1.5), ("a", 2.25), ("a", 9.75), ("a", 4.5),
      ("b", 1.0), ("b", 1.0), ("b", 2.0), ("b", 7.0))
      .toDF("g", "x")
    val fast = Profiling.exactPercentiles(
        df, Seq("g"), "x", Seq("p30" -> 0.3, "p50" -> 0.5, "p75" -> 0.75))
      .orderBy("g")
      .select("g", "n", "p30", "p50", "p75")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    val builtin = df.groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        expr("percentile(x, 0.3)").as("p30"),
        expr("percentile(x, 0.5)").as("p50"),
        expr("percentile(x, 0.75)").as("p75"))
      .orderBy("g")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    fast shouldBe builtin
  }

  test("exactPercentiles agreement sweep: 200 random groups, edge sizes, p ∈ {0, .1, .3, .5, 1}") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(42)
    val rows = (0 until 200).flatMap { g =>
      // force the small-group edges into the first ids, random sizes after
      val size = if (g < 3) g + 1 else 1 + rnd.nextInt(40)
      (0 until size).map { _ =>
        // mix magnitudes and duplicates so interpolation brackets repeat values
        val v = rnd.nextInt(8) match {
          case 0 => 0.0
          case 1 => rnd.nextInt(5).toDouble // heavy duplicates
          case _ => (rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(6))
        }
        (s"g$g", v)
      }
    }
    val df = rows.toDF("g", "x").repartition(7)
    val ps = Seq("p0" -> 0.0, "p10" -> 0.1, "p30" -> 0.3, "p50" -> 0.5, "p100" -> 1.0)
    val fast = Profiling.exactPercentiles(df, Seq("g"), "x", ps)
      .orderBy("g").collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6))).toMap
    val builtin = df.groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        expr("percentile(x, 0.0)").as("p0"),
        expr("percentile(x, 0.1)").as("p10"),
        expr("percentile(x, 0.3)").as("p30"),
        expr("percentile(x, 0.5)").as("p50"),
        expr("percentile(x, 1.0)").as("p100"))
      .orderBy("g").collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6))).toMap
    fast.keySet shouldBe builtin.keySet
    // exact (last-ulp) equality, group by group for a readable failure
    fast.foreach { case (g, v) => withClue(g)(v shouldBe builtin(g)) }
  }

  test("exactPercentiles rejects out-of-range p and reserved columns") {
    import org.apache.spark.sql.functions.lit
    val df = Seq(("a", 1.0)).toDF("g", "x")
    an[IllegalArgumentException] should be thrownBy
      Profiling.exactPercentiles(df, Seq("g"), "x", Seq("p" -> 1.5))
    // a reserved name used as a KEY (it survives the projection) is rejected
    an[IllegalArgumentException] should be thrownBy
      Profiling.exactPercentiles(
        df.withColumn("__rn", lit(1)), Seq("g", "__rn"), "x", Seq("p" -> 0.5))
    // but an UNUSED input column named __rn is projected away before any
    // scratch column exists — it must NOT be rejected
    Profiling.exactPercentiles(
      df.withColumn("__rn", lit(1)), Seq("g"), "x", Seq("p" -> 0.5))
      .columns should contain("p")
  }

  test("exactPercentiles rejects name collisions that would duplicate output columns") {
    import org.apache.spark.sql.functions.lit
    val df = Seq(("a", 1.0)).toDF("g", "x")
    // input column named "n" collides with the emitted group-size column
    an[IllegalArgumentException] should be thrownBy
      Profiling.exactPercentiles(
        df.withColumn("n", lit(1)), Seq("g", "n"), "x", Seq("p50" -> 0.5))
    // percentile named "n" collides with the group-size column
    an[IllegalArgumentException] should be thrownBy
      Profiling.exactPercentiles(df, Seq("g"), "x", Seq("n" -> 0.5))
    // duplicate percentile names
    an[IllegalArgumentException] should be thrownBy
      Profiling.exactPercentiles(
        df, Seq("g"), "x", Seq("p50" -> 0.5, "p50" -> 0.9))
    // percentile name shadowing a key column
    an[IllegalArgumentException] should be thrownBy
      Profiling.exactPercentiles(df, Seq("g"), "x", Seq("g" -> 0.5))
    // a SURVIVING column colliding with generated scratch (__lo_<name>)
    an[IllegalArgumentException] should be thrownBy
      Profiling.exactPercentiles(
        df.withColumn("__lo_p50", lit(1)), Seq("g", "__lo_p50"), "x", Seq("p50" -> 0.5))
    // the same column is harmless when it does not survive the projection
    Profiling.exactPercentiles(
      df.withColumn("__lo_p50", lit(1)), Seq("g"), "x", Seq("p50" -> 0.5))
      .columns should contain("p50")
  }

  test("attritionReport: upset counts, mass, leading-prefix funnel depth, null=false") {
    val df = Seq(
      (1L, Some(true), Some(true), 10L),   // survives both → depth 2
      (2L, Some(true), Some(false), 20L),  // dies at stage 2 → depth 1
      (3L, Some(false), Some(true), 40L),  // dies at stage 1 → depth 0
      (4L, None, Some(true), 80L),         // null verdict counts as FALSE
      (5L, Some(true), Some(true), 160L)
    ).toDF("id", "v_a", "v_b", "chars")
    val out = Profiling.attritionReport(df, Seq("v_a", "v_b"), Some("chars"))
      .orderBy("v_a", "v_b").collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    out shouldBe Array(
      (false, true, 2L, 120L, 0),   // docs 3+4 (null folded to false)
      (true, false, 1L, 20L, 1),
      (true, true, 2L, 170L, 2))
    // without a mass column the schema is verdicts + n_docs + depth
    Profiling.attritionReport(df, Seq("v_a")).columns shouldBe
      Array("v_a", "n_docs", "funnel_depth")
    an[IllegalArgumentException] should be thrownBy
      Profiling.attritionReport(df, Seq.empty)
  }
}
