package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GramUpperTriangle

/** Distributed exact linear algebra over quantized embedding columns —
  * the covariance/PCA scaffold of a 100 TB vector pipeline. */
object LinAlg {

  /** Largest per-key row count for which the covariance numerator
    * `n·Σxᵢxⱼ − Σxᵢ·Σxⱼ` is provably exact in BIGINT with worst-case
    * saturated int8 codes: floor(√(Long.MaxValue / 128²)). The bound uses
    * 128², not 127², because [[GramUpperTriangle]] admits the full int8
    * range including −128 — a key of saturated −128 codes reaches products
    * of 128², and a 127²-derived bound would pass the guard while n·g
    * silently wrapped Long for n in the ~186k-row gap between the two
    * bounds. */
  val MaxExactCovarianceRows: Long =
    math.sqrt(Long.MaxValue.toDouble / (128L * 128L)).toLong // 23_726_566

  /** Project (key, codes) for the Gram aggregation, failing LOUDLY on a
    * null code vector. Spark's typed-aggregate path SKIPS null inputs
    * (SQL aggregate null semantics), which would silently shrink `n` and
    * change every covariance — worse than a crash for a module whose
    * contract is bit-exactness. Filter or impute nulls upstream. */
  private def keyedCodes(
      df: DataFrame, keyCol: String, codesCol: String): DataFrame =
    df.select(col(keyCol).cast("long").as("k"),
      coalesce(col(codesCol).cast("array<smallint>"),
        raise_error(lit(s"LinAlg: column '$codesCol' contains a null code " +
          "vector; filter or impute nulls before aggregating"))).as("v"))

  /** Per-key Gram matrix (XᵀX upper triangle, 1-based `(i, j)` with
    * `i ≤ j`) over `array<tinyint>` code vectors (see
    * [[Quantize.int8Codes]]).
    *
    * One typed aggregation: each task multiply-accumulates its rows into a
    * dim·(dim+1)/2-slot BIGINT triangle ([[GramUpperTriangle]] — no
    * per-pair hashing, no exploded pair rows), buffers combine map-side,
    * and only |keys| buffer rows cross the exchange. The flat triangle
    * unpacks to (key, i, j, g, n) rows AFTER aggregation, on |keys|·tri
    * rows. Exact BIGINT products ⇒ bit-identical in any partitioning.
    */
  def gramUpperTriangle(
      df: DataFrame, keyCol: String, codesCol: String, dim: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val reduced = keyedCodes(df, keyCol, codesCol)
      .as[(Long, Array[Short])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new GramUpperTriangle(dim).toColumn.name("gram"))
      .toDF("k", "gram")
    // (i, j) labels for the flat row-major triangle, generated once per
    // OUTPUT row set (|keys|·tri), zipped positionally with the buffer
    val ij = expr(
      s"""flatten(transform(sequence(1, $dim), i ->
            transform(sequence(i, $dim), j -> struct(i, j))))""")
    reduced
      .select(col("k"), col("gram.n").as("n"),
        explode(arrays_zip(ij.as("ij"), col("gram.g").as("g"))).as("z"))
      .select(col("k"),
        col("z.ij.i").cast("long").as("i"),
        col("z.ij.j").cast("long").as("j"),
        col("z.g").as("g"), col("n"))
  }

  /** Per-key EXACT covariance matrix (population, upper triangle) over
    * int8 code vectors — the PCA/whitening input, from the SAME one-pass
    * aggregation as [[gramUpperTriangle]] (the buffer also carries Σxᵢ):
    * `cov·n² = n·Σxᵢxⱼ − Σxᵢ·Σxⱼ` stays in BIGINTs. Worst case
    * (saturated int8 codes, −128 included) each term is bounded by
    * n²·128², so the
    * BIGINT numerator is exact only to n ≈ 2^24.5 (≈2.4×10⁷ rows per
    * key); a runtime guard raises an error past that bound rather than
    * silently wrapping — shard oversized keys upstream (e.g. add a salt
    * column to the key and average the per-shard covariances weighted by
    * n) if a single key legitimately exceeds it. Within the bound the
    * matrix is bit-exact in any partitioning; the single final division
    * to `cov` is the only float op. */
  def covarianceUpperTriangle(
      df: DataFrame, keyCol: String, codesCol: String, dim: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val reduced = keyedCodes(df, keyCol, codesCol)
      .as[(Long, Array[Short])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new GramUpperTriangle(dim).toColumn.name("gram"))
      .toDF("k", "gram")
    val ij = expr(
      s"""flatten(transform(sequence(1, $dim), i ->
            transform(sequence(i, $dim), j -> struct(i, j))))""")
    reduced
      .select(col("k"), col("gram.n").as("n"), col("gram.s").as("s"),
        explode(arrays_zip(ij.as("ij"), col("gram.g").as("g"))).as("z"))
      .select(col("k"),
        col("z.ij.i").cast("long").as("i"),
        col("z.ij.j").cast("long").as("j"),
        col("z.g").as("g"),
        element_at(col("s"), col("z.ij.i")).as("si"),
        element_at(col("s"), col("z.ij.j")).as("sj"),
        col("n"))
      // n·g and si·sj are each ≤ n²·128² in magnitude (codes admit −128);
      // both stay below Long.MaxValue only while
      // n ≤ floor(√(2⁶³ / 128²)) = 23_726_566.
      .withColumn("cov_num",
        when(col("n") <= lit(LinAlg.MaxExactCovarianceRows),
          col("n") * col("g") - col("si") * col("sj"))
          .otherwise(raise_error(concat(
            lit("covarianceUpperTriangle: group size "), col("n"),
            lit(s" exceeds the exact-BIGINT bound ${LinAlg.MaxExactCovarianceRows}" +
              " (n²·128² would overflow Long); shard the key upstream")))))
      .withColumn("cov",
        col("cov_num").cast("double") / (col("n") * col("n")).cast("double"))
  }

  /** Per-dimension embedding drift between two corpus snapshots — the
    * model-input monitor that catches a silently shifted feature
    * distribution before training does. Values are quantized to
    * `floor(x·scale)` BIGINTs first so the per-snapshot sums are EXACT and
    * engine-independent (a raw double sum's addition order would drift
    * between engines); the two means divide once each at the end.
    *
    * Scale shape: one narrow posexplode per snapshot (dim, q) and ONE
    * 64-key hash aggregate with map-side partials — the exchange carries
    * dims × partitions rows regardless of corpus size.
    * @return (dim 1-based, n_base, n_delta, sum_base, sum_delta,
    *          shift_milli = mean_base − mean_delta in 1/scale units;
    *          sums/means are NULL for a side with no vectors) */
  /** The per-dimension drift GAUGE: (dim, count, exact quantized BIGINT
    * sum) — [[perDimDrift]]'s state, exposed so a STREAM can maintain it:
    * the sums are pure commutative BIGINT adds (the q211 count-min shape),
    * so this exact plan runs as a complete-mode streaming aggregation
    * whose state is one (count, sum) pair per dimension — dims × 1 rows,
    * never corpus-sized — and the live gauge decides index refit (q249's
    * trigger) without a batch job. Batch ≡ streaming by commutativity
    * (law-tested via [[driftFromStats]] identity; q257 replays it for
    * real). @return (dim 1-based int, n, sum_q) */
  def perDimQuantStats(df: DataFrame, vecCol: String,
      scale: Int = 1000): DataFrame = {
    require(scale > 0, s"scale must be positive, got $scale")
    df.select(posexplode(col(vecCol).cast("array<double>")).as(Seq("__p", "__x")))
      .select((col("__p") + 1).as("dim"),
        floor(col("__x") * scale).cast("long").as("__q"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("__q")).as("sum_q"))
  }

  /** Drift report from two gauge frames ([[perDimQuantStats]] of the base
    * snapshot and of the live side) — the last mile of the streaming
    * monitor, 2×dims rows of integer arithmetic plus the two final
    * divisions; identical to [[perDimDrift]] on the same inputs
    * (law-tested). Total over dims present on either side (full outer;
    * a missing side reports count 0 and NULL sum/shift — perDimDrift's
    * exact convention). */
  def driftFromStats(baseStats: DataFrame, deltaStats: DataFrame): DataFrame =
    baseStats
      .select(col("dim"), col("n").as("n_base"), col("sum_q").as("sum_base"))
      .join(deltaStats.select(col("dim"), col("n").as("n_delta"),
        col("sum_q").as("sum_delta")), Seq("dim"), "full_outer")
      .select(col("dim"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_delta"), lit(0L)).as("n_delta"),
        col("sum_base"), col("sum_delta"))
      .withColumn("shift_milli",
        col("sum_base").cast("double") / col("n_base") -
          col("sum_delta").cast("double") / col("n_delta"))

  def perDimDrift(
      base: DataFrame, delta: DataFrame, vecCol: String,
      scale: Int = 1000): DataFrame = {
    require(scale > 0, s"scale must be positive, got $scale")
    def quantized(df: DataFrame, isBase: Boolean) = df
      .select(posexplode(col(vecCol).cast("array<double>")).as(Seq("__p", "__x")))
      .select((col("__p") + 1).as("dim"),
        floor(col("__x") * scale).cast("long").as("__q"),
        lit(isBase).as("__b"))
    quantized(base, isBase = true).unionByName(quantized(delta, isBase = false))
      .groupBy(col("dim"))
      .agg(
        count(when(col("__b"), 1)).as("n_base"),
        count(when(!col("__b"), 1)).as("n_delta"),
        sum(when(col("__b"), col("__q"))).as("sum_base"),
        sum(when(!col("__b"), col("__q"))).as("sum_delta"))
      .withColumn("shift_milli",
        col("sum_base").cast("double") / col("n_base") -
          col("sum_delta").cast("double") / col("n_delta"))
  }

  /** Dominant-eigenvector POWER ITERATION over the exact integer
    * covariance numerator — the spectral step of a PCA/whitening pipeline
    * kept ENGINE-EXACT: the corpus-sized work is the one-pass
    * [[covarianceUpperTriangle]] aggregation upstream; the iteration here
    * runs on the dim²-row matrix frame entirely in BIGINT arithmetic, so
    * any engine replays it bit for bit (no float matvec drift, no libm).
    *
    * Each round: w = A·v (matrix join + hash agg — distributed, the
    * matrix never collects), then the integer renormalization
    * `v ← sign(w)·(|w| div (max|w| div S + 1))`, which bounds |v| ≤ S.
    * S = min(`cap`, (2⁶²−1) div max(1, dim·max|A|)) is chosen once from
    * the matrix so the NEXT matvec provably fits in BIGINT
    * (|Σ aᵢⱼvⱼ| ≤ dim·max|A|·S < 2⁶²); `require(S ≥ 2)` guards that bound
    * the way [[MaxExactCovarianceRows]] guards the covariance itself —
    * pre-scale the matrix upstream (e.g. divide cov_num by a power of
    * two) if a corpus legitimately trips it. The sign-split division
    * keeps Spark's truncating `div` and an oracle's floor `//` identical
    * by only ever dividing non-negative operands.
    *
    * `iters` is FIXED, not convergence-tested — the replayable-iteration
    * discipline of [[Similarity.lloydIntCentroids]]. Per round: one
    * metadata-sized max|w| action; lineage truncated per round.
    *
    * @param cov  ONE key's (i, j, cov_num) upper triangle, 1-based, as
    *             produced by [[covarianceUpperTriangle]]
    * @return (dim, v) — the integer-scaled dominant-eigenvector estimate */
  /** Spectral outlier scores — the Tran-et-al-style "spectral signatures"
    * data-poisoning audit, kept ENGINE-EXACT: every vector's int8 codes
    * project onto an INTEGER direction `v` (typically
    * [[powerIterationTop]]'s dominant eigenvector of the corpus
    * covariance), p = Σ codesᵢ·vᵢ in BIGINT, and the mean-centering is
    * the exact cross-multiplication `centered = n·p − Σp` (no division,
    * no floats). Outliers along the top principal direction — the
    * signature a poisoned/backdoored subpopulation leaves — are the
    * largest |centered|.
    *
    * Scale shape: `v` is model metadata (dim longs, one literal); the
    * projection folds per row inside the scan (zip_with + fold, no
    * shuffle); one metadata-sized stats aggregate broadcasts back.
    * Overflow: |p| ≤ dim·128·max|v| and |centered| ≤ 2n·max|p| — with
    * [[powerIterationTop]]'s |v| ≤ 10⁵ cap this holds in BIGINT to
    * n ≈ 10⁹ rows at dim 64.
    * @return (idCol, p, centered) */
  def spectralOutlierScores(df: DataFrame, idCol: String, codesCol: String,
      v: Seq[Long]): DataFrame = {
    require(v.nonEmpty, "spectralOutlierScores needs a non-empty direction")
    val y = col(codesCol).cast("array<long>")
    val proj = df.select(col(idCol),
      aggregate(zip_with(y, typedLit(v), (a, b) => a * b),
        lit(0L), (acc, x) => acc + x).as("p"))
    val st = proj.agg(count(lit(1)).as("__n"), sum(col("p")).as("__sp"))
    proj.crossJoin(broadcast(st))
      .select(col(idCol), col("p"),
        (col("p") * col("__n") - col("__sp")).as("centered"))
  }

  def powerIterationTop(cov: DataFrame, dim: Int, iters: Int,
      cap: Long = 100000L): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(cap >= 2, s"cap must be >= 2, got $cap")
    val spark = cov.sparkSession
    val upper = cov.select(col("i").cast("long").as("i"),
      col("j").cast("long").as("j"), col("cov_num").cast("long").as("x"))
    val a = upper.unionByName(upper.where(col("i") =!= col("j"))
      .select(col("j").as("i"), col("i").as("j"), col("x")))
      .localCheckpoint(true)
    val maxA = a.agg(coalesce(max(abs(col("x"))), lit(0L))).first().getLong(0)
    // Headroom division ordered so no intermediate product is formed:
    // dim.toLong * maxA itself overflows Long once maxA > Long.MaxValue/dim
    // (reachable — covarianceUpperTriangle admits |cov_num| near 2^63), and
    // a wrapped-negative product would clamp s to 1 and let the matvec wrap
    // silently instead of failing the require below.
    val s = math.min(cap,
      ((Long.MaxValue / 2) / dim) / math.max(1L, maxA))
    require(s >= 2,
      s"powerIterationTop: dim*max|A| = $dim*$maxA leaves no integer " +
        "headroom for an exact matvec — pre-scale the matrix upstream")
    var v = spark.range(1, dim + 1).select(col("id").as("dim"), lit(1L).as("v"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val w = a.join(v, a("j") === v("dim"))
        .groupBy(col("i"))
        .agg(sum(col("x") * col("v")).as("w"))
        .localCheckpoint(true) // consumed twice: the max gauge + the rescale
      val mxW = w.agg(coalesce(max(abs(col("w"))), lit(0L))).first().getLong(0)
      val dv = mxW / s + 1
      v = w.select(col("i").as("dim"),
        expr(s"CASE WHEN w < 0 THEN -(abs(w) div ${dv}L) " +
          s"ELSE abs(w) div ${dv}L END").as("v"))
        .localCheckpoint(true)
    }
    v.orderBy(col("dim"))
  }
}
