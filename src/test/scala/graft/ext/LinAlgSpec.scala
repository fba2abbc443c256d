package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class LinAlgSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 4
  private val rows: Seq[(Long, Array[Short])] = Seq(
    (0L, Array[Short](1, -2, 3, 0)),
    (0L, Array[Short](-1, 5, 2, 7)),
    (1L, Array[Short](0, 0, 0, 0)),
    (1L, Array[Short](127, -127, 1, -1)),
    (1L, Array[Short](64, 32, -16, 8)))

  /** Independent in-memory reference: per-key upper-triangle products. */
  private def reference: Map[(Long, Int, Int), (Long, Long)] = {
    val byKey = rows.groupBy(_._1)
    (for {
      (k, vs) <- byKey.toSeq
      i <- 1 to dim
      j <- i to dim
    } yield (k, i, j) ->
      ((vs.map(v => v._2(i - 1).toLong * v._2(j - 1)).sum, vs.size.toLong))).toMap
  }

  private def run(parts: Int): Map[(Long, Int, Int), (Long, Long)] = {
    val df = rows.toDF("label", "codes").repartition(parts)
    LinAlg.gramUpperTriangle(df, "label", "codes", dim)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1).toInt, r.getLong(2).toInt) ->
        ((r.getLong(3), r.getLong(4))))
      .toMap
  }

  test("gramUpperTriangle matches an in-memory fold, all (i <= j) cells present") {
    val got = run(parts = 3)
    got.keySet shouldBe reference.keySet
    got shouldBe reference
  }

  test("result is partitioning-invariant (exact BIGINT accumulation)") {
    run(parts = 1) shouldBe run(parts = 5)
  }

  test("covarianceUpperTriangle matches the exact-moment identity cov·n² = n·g − si·sj") {
    val df = rows.toDF("label", "codes").repartition(3)
    val got = LinAlg.covarianceUpperTriangle(df, "label", "codes", dim)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1).toInt, r.getLong(2).toInt) ->
        ((r.getAs[Long]("g"), r.getAs[Long]("si"), r.getAs[Long]("sj"),
          r.getAs[Long]("n"), r.getAs[Long]("cov_num"), r.getAs[Double]("cov"))))
      .toMap
    val byKey = rows.groupBy(_._1)
    for {
      (k, vs) <- byKey
      i <- 1 to dim
      j <- i to dim
    } {
      val g = vs.map(v => v._2(i - 1).toLong * v._2(j - 1)).sum
      val si = vs.map(_._2(i - 1).toLong).sum
      val sj = vs.map(_._2(j - 1).toLong).sum
      val n = vs.size.toLong
      val num = n * g - si * sj
      got((k, i, j)) shouldBe ((g, si, sj, n, num, num.toDouble / (n * n).toDouble))
    }
  }

  test("wrong-width vectors fail loudly instead of mis-indexing") {
    val df = Seq((0L, Array[Short](1, 2))).toDF("label", "codes")
    val e = intercept[Exception] {
      LinAlg.gramUpperTriangle(df, "label", "codes", dim).collect()
    }
    e.getMessage should include("aggregator built for dim")
  }

  test("null code vectors fail loudly (typed aggregates would silently SKIP them, shrinking n)") {
    val df = Seq((0L, Array[Short](1, 2, 3, 4)), (0L, null: Array[Short]))
      .toDF("label", "codes")
    val e = intercept[Exception] {
      LinAlg.gramUpperTriangle(df, "label", "codes", dim).collect()
    }
    e.getMessage should include("null code")
    val e2 = intercept[Exception] {
      LinAlg.covarianceUpperTriangle(df, "label", "codes", dim).collect()
    }
    e2.getMessage should include("null code")
  }

  test("codes outside int8 range are rejected (exactness bound assumes 127²)") {
    val df = Seq((0L, Array[Short](1, 300, 3, 4))).toDF("label", "codes")
    val e = intercept[Exception] {
      LinAlg.gramUpperTriangle(df, "label", "codes", dim).collect()
    }
    e.getMessage should include("outside int8 range")
  }

  test("perDimDrift: exact quantized sums, NULL sums for an empty side") {
    val base = Seq(
      (1L, Array(1.0f, -0.5f)),
      (2L, Array(0.25f, 0.5f))).toDF("id", "v")
    val delta = Seq((3L, Array(0.0f, 1.0f))).toDF("id", "v")
    val out = LinAlg.perDimDrift(base, delta, "v", scale = 1000)
      .orderBy("dim").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    // dim1: base q = 1000, 250 → 1250; delta q = 0 → shift 625.0 - 0.0
    // dim2: base q = floor(-500)= -500, 500 → 0; delta 1000 → 0 - 1000
    out shouldBe Seq(
      (1, 2L, 1L, 1250L, 0L, 625.0),
      (2, 2L, 1L, 0L, 1000L, -1000.0))
    // an empty side yields NULL sums/shift, never a fabricated zero
    val empty = LinAlg.perDimDrift(base, delta.where(lit(false)), "v")
      .orderBy("dim").collect()
    empty.foreach { r =>
      r.isNullAt(r.fieldIndex("sum_delta")) shouldBe true
      r.isNullAt(r.fieldIndex("shift_milli")) shouldBe true
    }
  }

  test("perDimDrift == driftFromStats over perDimQuantStats gauges (incl. ragged dims)") {
    // delta vectors are LONGER than base: dim 3 exists only on the delta
    // side, so the full-outer totality of driftFromStats is exercised
    val base = Seq((1L, Array(0.5f, -1.25f)), (2L, Array(1.5f, 0.75f)))
      .toDF("id", "v")
    val delta = Seq((3L, Array(0.25f, 2.0f, 4.0f)), (4L, Array(-0.5f, 1.0f, 8.0f)))
      .toDF("id", "v")
    val direct = LinAlg.perDimDrift(base, delta, "v")
      .orderBy("dim").collect()
    val composed = LinAlg.driftFromStats(
        LinAlg.perDimQuantStats(base, "v"),
        LinAlg.perDimQuantStats(delta, "v"))
      .orderBy("dim").collect()
    graft.util.Caches.releaseAll()
    composed.map(_.toSeq) shouldBe direct.map(_.toSeq)
    // the gauge itself is exact: dim 1 base sum = floor(.5*1000)+floor(1.5*1000)
    val g = LinAlg.perDimQuantStats(base, "v").orderBy("dim").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    g(0) shouldBe ((1, 2L, 2000L))
    g(1) shouldBe ((2, 2L, -500L)) // floor(-1.25*1000) = -1250, +750
  }

  test("powerIterationTop finds the dominant axis of a diagonal matrix") {
    // diag(100, 1): the dominant eigenvector is e1. Upper triangle input
    // shaped like covarianceUpperTriangle's (i, j, cov_num).
    val cov = Seq((1L, 1L, 100L), (1L, 2L, 0L), (2L, 2L, 1L))
      .toDF("i", "j", "cov_num")
    val v = LinAlg.powerIterationTop(cov, dim = 2, iters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    v.length shouldBe 2
    val m = v.toMap
    // starting from (1,1): component 2 decays by 100× per round vs
    // component 1 — after 4 rounds it is ~1e-8 of component 1
    m(1L) should be > 0L
    m(2L) shouldBe 0L
  }

  test("powerIterationTop renormalization keeps |v| within the exact bound") {
    // near-Long-max entries: S shrinks so the matvec provably fits
    val big = Long.MaxValue / 1000
    val cov = Seq((1L, 1L, big), (1L, 2L, big / 2), (2L, 2L, big))
      .toDF("i", "j", "cov_num")
    val v = LinAlg.powerIterationTop(cov, dim = 2, iters = 3)
      .collect().map(_.getLong(1))
    val s = math.min(100000L, (Long.MaxValue / 2) / (2L * big))
    all(v.map(math.abs)) should be <= s
  }

  test("powerIterationTop refuses a matrix with no integer headroom") {
    val cov = Seq((1L, 1L, Long.MaxValue / 2), (1L, 2L, 0L), (2L, 2L, 1L))
      .toDF("i", "j", "cov_num")
    val e = intercept[IllegalArgumentException] {
      LinAlg.powerIterationTop(cov, dim = 2, iters = 1)
    }
    e.getMessage should include("headroom")
  }

  test("powerIterationTop headroom guard survives dim*maxA Long overflow") {
    // maxA > Long.MaxValue/dim: the naive dim.toLong * maxA wraps negative,
    // which would clamp s to cap and let the matvec silently wrap BIGINT.
    // The division-ordered guard must refuse LOUDLY instead.
    val huge = Long.MaxValue / 32
    val cov = Seq((1L, 1L, huge), (1L, 64L, 0L), (64L, 64L, 1L))
      .toDF("i", "j", "cov_num")
    val e = intercept[IllegalArgumentException] {
      LinAlg.powerIterationTop(cov, dim = 64, iters = 1)
    }
    e.getMessage should include("headroom")
  }

  test("spectralOutlierScores: exact centering sums to zero, scores exact") {
    val codes = Seq(
      (1L, Array[Short](10, 0)), (2L, Array[Short](-10, 0)),
      (3L, Array[Short](0, 5)), (4L, Array[Short](4, -3)))
      .toDF("id", "codes")
    val out = LinAlg.spectralOutlierScores(codes, "id", "codes", Seq(100L, 1L))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // p = 100*c1 + c2; Σp = 1000 - 1000 + 5 + 397 = 402; centered = 4p - 402
    out.map(_._2).toSeq shouldBe Seq(1000L, -1000L, 5L, 397L)
    out.map(_._3).sum shouldBe 0L // exact mean-centering: Σ(n·p − Σp) = 0
    out.map(_._3).toSeq shouldBe Seq(4000L - 402L, -4000L - 402L, 20L - 402L, 1588L - 402L)
  }

  test("MaxExactCovarianceRows is the documented worst-case bound") {
    val n = LinAlg.MaxExactCovarianceRows
    // worst case is a saturated −128 code (GramUpperTriangle admits the
    // full int8 range): n²·128² must not overflow; (n+1)²·128² must
    assert(BigInt(n) * BigInt(n) * 128 * 128 <= BigInt(Long.MaxValue))
    assert(BigInt(n + 1) * BigInt(n + 1) * 128 * 128 > BigInt(Long.MaxValue))
  }
}
