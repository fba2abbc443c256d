package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The [[Ann]] facade contract: each method name routes to its
  * [[Similarity]] rung with the output normalized to
  * (q_id, rank, n_id, score), the default is the deployable residual
  * IVFADC (not a strawman), and the low-recall `sign_lsh` rung refuses to
  * run without an explicit acknowledgement. */
class AnnFacadeSpec extends SparkTestBase {
  import spark.implicits._

  // 64 vectors, 64 dims (multi-probe needs tables·bits = 56, ivfpq needs
  // m·subDim = 64), deterministic and spread enough for distinct neighbors
  private lazy val corpus = (0 until 64).map { i =>
    (i.toLong, Array.tabulate(64)(j => (((i * 31 + j * 17) % 23) - 11).toFloat))
  }.toDF("id", "v")
  private lazy val queries = corpus.where(col("id") < 3)

  test("exact routing ≡ bruteForceTopK with score = cosine") {
    val facade = Ann.topK(queries, corpus, "id", "id", "v", k = 3,
      method = "exact").orderBy("q_id", "rank").collect()
    val direct = Similarity.bruteForceTopK(queries, corpus, "id", "id", "v", 3)
      .orderBy("q_id", "rank").collect()
    facade.map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))) shouldBe
      direct.map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
  }

  test("default method is residual IVFADC and emits the normalized schema") {
    val out = Ann.topK(queries, corpus, "id", "id", "v", k = 3,
      nlist = 4, iters = 2, m = 4, subDim = 16, stride = 7)
    out.columns.toSeq shouldBe Seq("q_id", "rank", "n_id", "score")
    val rows = out.orderBy("q_id", "rank").collect()
    rows.map(_.getLong(0)).distinct.sorted shouldBe Array(0L, 1L, 2L)
    // score descends within each query (negated approximate distance)
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      val scores = g.sortBy(_.getInt(1)).map(_.getDouble(3))
      scores.zip(scores.tail).foreach { case (a, b) => a should be >= b }
    }
  }

  test("sign_lsh refuses without acceptLowRecall, runs with it") {
    val e = intercept[IllegalArgumentException] {
      Ann.topK(queries, corpus, "id", "id", "v", k = 3, method = "sign_lsh")
    }
    e.getMessage should include("strawman")
    e.getMessage should include("acceptLowRecall")
    noException should be thrownBy Ann.topK(queries, corpus, "id", "id", "v",
      k = 3, method = "sign_lsh", acceptLowRecall = true).collect()
  }

  test("mmrRerank: first pick is the relevance top-1, later picks diversify") {
    // two tight clusters near the query + one moderately relevant outlier:
    // pure relevance ranks the second cluster-A doc ahead of the outlier,
    // MMR (λ=1/2) must NOT — the near-duplicate's penalty sinks it
    val docs = Seq(
      (1L, Array(1.00f, 0.00f, 0f, 0f)), // query
      (2L, Array(0.99f, 0.10f, 0f, 0f)), // cluster A, most relevant
      (3L, Array(0.98f, 0.12f, 0f, 0f)), // cluster A, near-dup of 2
      (4L, Array(0.50f, -0.866f, 0f, 0f)) // outlier, moderate relevance,
                                          // low sim to cluster A
    ).toDF("id", "v")
    val out = Similarity.mmrRerank(docs.where(col("id") === 1), docs,
        "id", "id", "v", k = 3, m = 3)
      .orderBy("rank").collect().map(r => (r.getInt(1), r.getLong(2)))
    out.head shouldBe (1, 2L) // = bruteForceTopK rank 1
    out(1) shouldBe (2, 4L)   // diversified past the near-dup
    out(2) shouldBe (3, 3L)
  }

  test("mmrRerank emits all candidates when the pool is smaller than k") {
    val docs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)), (3L, Array(0.0f, 1.0f))
    ).toDF("id", "v")
    val out = Similarity.mmrRerank(docs.where(col("id") === 1), docs,
      "id", "id", "v", k = 5, m = 5).collect()
    out.length shouldBe 2 // only two non-self candidates exist
  }

  test("ivf at nprobe >= nlist is EXACT: reproduces bruteForceTopK verbatim") {
    // every list probed → the candidate set is the whole corpus and the
    // scores are the same native cosine with the same tie rule — the
    // exact-equivalence law the q280 index-arm flagship relies on
    val ivf = Ann.topK(queries, corpus, "id", "id", "v", k = 5,
        method = "ivf", nlist = 4, iters = 2, nprobe = 4)
      .orderBy("q_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val exact = Ann.topK(queries, corpus, "id", "id", "v", k = 5,
        method = "exact")
      .orderBy("q_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    ivf shouldBe exact
  }

  test("hybridRrfTopKPrepared: the ivf arm at nprobe = nlist serves the default arm's answers") {
    val docs = Seq(
      (0L, "spark joins fast tables"), (1L, "fast spark scans"),
      (2L, "slow table scans join"),   (3L, "spark spark spark fast"),
      (4L, "join the fast table"),     (5L, "scans join tables")
    ).toDF("doc_id", "text")
    val emb = docs.select(col("doc_id").as("vec_id"),
      transform(sequence(lit(1), lit(8)),
        i => ((col("vec_id") * 31 + i * 7) % 13 - 6).cast("float")).as("embedding"))
    val qs = docs.where(col("doc_id") < 2)
      .select(col("doc_id").as("q_id"), col("text"))
      .join(emb.select(col("vec_id").as("q_id"), col("embedding")), Seq("q_id"))
    val hc = TextAnalysis.prepareHybridCorpus(
      docs, "doc_id", "text", emb, "vec_id", "embedding")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("q_id", "rank").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    canon(TextAnalysis.hybridRrfTopKPrepared(hc, qs, kArm = 4, kOut = 3,
      nTerms = 2, annMethod = "ivf", annNlist = 2, annIters = 2,
      annNprobe = 2)) shouldBe
      canon(TextAnalysis.hybridRrfTopKPrepared(hc, qs, kArm = 4, kOut = 3,
        nTerms = 2))
  }

  test("mmrSelect survives an all-NaN remainder (zero-norm candidate)") {
    // a zero embedding's cosine is 0/0 = NaN; once it is the only
    // remaining candidate every score is NaN, no argmax wins, and the
    // selection must stop with fewer than k picks instead of indexing -1
    val corpus = Seq(
      (10L, Array(1.0f, 0.0f)), (11L, Array(0.0f, 0.0f))
    ).toDF("id", "v")
    val cands = Seq((1L, 10L, 0.9), (1L, 11L, 0.5)).toDF("q_id", "n_id", "rel")
    val out = Similarity.mmrSelect(cands, corpus, "id", "v", k = 2)
      .orderBy("rank").collect()
    out.length shouldBe 1 // the zero-norm candidate is never picked
    out.head.getLong(2) shouldBe 10L
  }

  test("mmrSelectSdc: code-only diversification follows the MMR law on a hand-checked fixture") {
    // one sub, three codewords at known points: sdc dists
    // d(0,1)=9, d(0,2)=16, d(1,2)=25
    val cb = Seq((0, 0L, Array(0.0, 0.0)), (0, 1L, Array(3.0, 0.0)),
      (0, 2L, Array(0.0, 4.0))).toDF("sub", "cid", "c_vec")
    val index = Seq((10L, Seq(0L)), (11L, Seq(1L)), (12L, Seq(2L)))
      .toDF("n_id", "codes")
    val cands = Seq((1L, 10L, 1.0), (1L, 11L, 0.8), (1L, 12L, 0.6))
      .toDF("q_id", "n_id", "rel")
    val out = Similarity.mmrSelectSdc(cands, index, cb, k = 3, m = 1, subDim = 2)
      .orderBy("rank").collect()
    // pick1 = max rel (10); pick2: 11 scores 0.4+9/2, 12 scores 0.3+16/2 → 12;
    // pick3: 11 at 0.4 + min(9,25)/2
    out.map(r => (r.getInt(1), r.getLong(2))) shouldBe
      Array((1, 10L), (2, 12L), (3, 11L))
    out.map(_.getDouble(3)) shouldBe
      Array(1.0 / 2, 0.6 / 2 + 16.0 / 2, 0.8 / 2 + 9.0 / 2)
    // k beyond the pool emits the whole pool, never crashes
    Similarity.mmrSelectSdc(cands, index, cb, k = 9, m = 1, subDim = 2)
      .count() shouldBe 3L
  }

  test("unknown method fails loudly with the ladder listed") {
    val e = intercept[IllegalArgumentException] {
      Ann.topK(queries, corpus, "id", "id", "v", k = 3, method = "hnsw")
    }
    e.getMessage should include("ivfpq_residual")
  }
}
