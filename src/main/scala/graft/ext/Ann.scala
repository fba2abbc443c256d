package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The ANN FACADE: one entry point over the similarity-search ladder, with
  * the method choice explicit and the measured-recall footguns fenced off.
  *
  * [[Similarity]] deliberately exposes every rung — brute force, one-table
  * sign-LSH, multi-probe LSH, IVF, PQ, residual IVFADC — because the recall
  * audits (q164/q191/q213) compare them head-to-head. A CALLER who just
  * wants "top-k neighbors, fast, with sane recall" should come through
  * here instead of picking a rung by name:
  *
  *  - `exact`           — [[Similarity.bruteForceTopK]]: one corpus scan,
  *                        bounded top-k reduction. The baseline and the
  *                        right answer until the corpus outgrows a scan.
  *  - `multiprobe_lsh`  — [[Similarity.multiProbeTopK]]: no training pass;
  *                        recall dialed by tables × bits × flips (≈ 0.87
  *                        at the defaults on the audit fixtures).
  *  - `ivf`             — [[Similarity.fitCentroids]] +
  *                        [[Similarity.ivfTopK]]: data-dependent lists,
  *                        one training pass, nprobe recall dial.
  *  - `ivfpq_residual`  — THE DEFAULT: the full Jégou-style IVFADC
  *                        ([[Similarity.ivfPqResidualTopK]]) with a
  *                        stride-sampled residual codebook — the index the
  *                        lifecycle/store/serve family (q237/q249/q252)
  *                        deploys, and the one that still works when the
  *                        vectors themselves no longer fit anywhere.
  *  - `sign_lsh`        — REFUSED unless `acceptLowRecall = true`:
  *                        [[Similarity.bucketedTopK]] is the calibration
  *                        STRAWMAN (recall@3 ≈ 0.03 on the q164 audit —
  *                        one 8-bit sign table recalls only same-bucket
  *                        hits). It exists to be measured against, not to
  *                        serve traffic, so defaulting into it is an error
  *                        by construction here.
  *
  * Output is normalized to (q_id, rank, n_id, score) — score descends
  * within each query (cosine for the exact/LSH/IVF rungs, negated
  * approximate squared distance for the ADC rung), rank 1-based with the
  * same tie rule every rung uses (score desc, lowest n_id).
  *
  * Scale shape: every rung broadcasts the (small, by ANN contract) query
  * set and scans/joins the corpus linearly — no rung here all-pairs the
  * corpus, so the facade never silently downgrades the 100 TB story.
  */
object Ann {

  val Methods: Seq[String] =
    Seq("exact", "multiprobe_lsh", "ivf", "ivfpq_residual", "sign_lsh")

  /** Top-k nearest neighbors of each query vector. See the object doc for
    * the method ladder; parameters beyond (queries, corpus, ids, k) are
    * per-method dials with audit-calibrated defaults.
    *
    * @param queries   (qIdCol, vecCol) — SMALL (broadcast by every rung)
    * @param corpus    (idCol, vecCol) — arbitrarily large
    * @param nlist     IVF coarse lists to FIT (ivf / ivfpq_residual)
    * @param iters     Lloyd iterations for the coarse fit
    * @param nprobe    lists probed per query (ivf / ivfpq_residual)
    * @param m         PQ subspaces; subDim dims each (ivfpq_residual) —
    *                  m·subDim must cover the vector dimension
    * @param stride    residual-codebook stride sample (ivfpq_residual)
    * @param tables/bits/flips  multi-probe LSH dials
    * @param acceptLowRecall  explicit opt-in for the `sign_lsh` strawman
    */
  def topK(queries: DataFrame, corpus: DataFrame,
      qIdCol: String, idCol: String, vecCol: String, k: Int,
      method: String = "ivfpq_residual",
      nlist: Int = 8, iters: Int = 3, nprobe: Int = 2,
      m: Int = 4, subDim: Int = 16, stride: Int = 50,
      tables: Int = 8, bits: Int = 7, flips: Int = 3,
      acceptLowRecall: Boolean = false): DataFrame = method match {
    case "exact" =>
      Similarity.bruteForceTopK(queries, corpus, qIdCol, idCol, vecCol, k)
        .select(col("q_id"), col("rank"), col("n_id"), col("sim").as("score"))
    case "multiprobe_lsh" =>
      Similarity.multiProbeTopK(queries, corpus, qIdCol, idCol, vecCol, k,
          tables, bits, flips)
        .select(col("q_id"), col("rank"), col("n_id"), col("sim").as("score"))
    case "ivf" =>
      val cents = Similarity.fitCentroids(corpus, idCol, vecCol, nlist, iters,
        cidCol = "cid", outVecCol = vecCol)
      Similarity.ivfTopK(queries, corpus, cents, qIdCol, idCol, "cid", vecCol,
          k, nprobe)
        .select(col("q_id"), col("rank"), col("n_id"), col("sim").as("score"))
    case "ivfpq_residual" =>
      val cents = Similarity.fitCentroids(corpus, idCol, vecCol, nlist, iters,
        cidCol = "cid", outVecCol = vecCol)
      val cb = Similarity.pqCodebookByStride(
        Similarity.residuals(corpus, cents, idCol, "cid", vecCol),
        idCol, "res", m, subDim, stride)
      Similarity.ivfPqResidualTopK(queries, corpus, cents, cb,
          qIdCol, idCol, "cid", vecCol, k, m, subDim, nprobe)
        .select(col("q_id"), col("rank"), col("n_id"), (-col("adist")).as("score"))
    case "sign_lsh" =>
      require(acceptLowRecall,
        "Ann.topK(method=\"sign_lsh\") is the single-table sign-LSH " +
        "calibration strawman — measured recall@3 ≈ 0.03 on the q164 audit " +
        "fixtures. It exists for recall calibration, not serving: pass " +
        "acceptLowRecall=true to run it anyway, or use one of " +
        "exact | multiprobe_lsh | ivf | ivfpq_residual.")
      Similarity.bucketedTopK(queries, corpus, qIdCol, idCol, vecCol, k)
        .select(col("q_id"), col("rank"), col("n_id"), col("sim").as("score"))
    case other => throw new IllegalArgumentException(
      s"unknown ANN method '$other' — one of: ${Methods.mkString(", ")}")
  }
}
