package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextAnalysis.hash48

/** Deterministic sampling for reproducible training-data pipelines.
  *
  * Random `df.sample()` is the wrong tool at 100 TB: it is seed- and
  * partitioning-dependent (a repartition changes the sample), unrepeatable
  * across engines, and samples ROWS — tearing apart row-groups that belong
  * together (the lineitems of one order, the chunks of one document). Both
  * operators here key the decision on a content hash instead:
  *
  *  - stable under reruns, cluster size, partitioning, and engine (the
  *    48-bit md5 prefix is replicated exactly by the DuckDB oracle);
  *  - sample-by-KEY: every row of a selected key survives together;
  *  - monotone: the 5% sample is a subset of the 10% sample (hash < p
  *    nests), so growing a training subset never resamples old data;
  *  - pure filter / window — no extra shuffle for [[hashSample]] (it
  *    evaluates inside the scan's codegen stage and pushes no skew
  *    anywhere), one keyed exchange for [[balancedSample]].
  */
object Sampling {

  /** Keep every row whose `key` hashes into the lowest `pct` percent of the
    * 48-bit hash space (mod-100 buckets). Keyed: all rows sharing a key are
    * kept or dropped together. */
  def hashSample(df: DataFrame, key: Column, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100, s"pct must be in [0,100], got $pct")
    df.where(hash48(key.cast("string")) % 100 < pct)
  }

  /** Deterministic training-mix: union several sources, each thinned to its
    * percentage via [[hashSample]] on its own key. Inherits hashSample's
    * guarantees — rerun-stable, nested when weights grow, key groups stay
    * whole — so a 30/70 web/code mix is exactly reproducible and can be
    * dialed up without resampling what a smaller mix already selected.
    * Sources must be union-compatible by name. */
  def weightedMix(sources: Seq[(DataFrame, Column, Int)]): DataFrame = {
    require(sources.nonEmpty, "weightedMix needs at least one source")
    sources.map { case (df, key, pct) => hashSample(df, key, pct) }
      .reduce(_ unionByName _)
  }

  /** Per-class sampling rates: keep `pct(class)` percent of each class's
    * keys (classes absent from the map keep `defaultPct`). The workhorse for
    * rebalancing a crawl corpus — e.g. keep 100% of low-resource languages
    * but 5% of English — with every [[hashSample]] guarantee intact per
    * class: rerun/engine/partitioning-stable, key groups whole, nested when
    * any class's rate grows, and still a pure scan-stage filter (the class
    * column just selects which threshold the row's hash bucket is compared
    * to — no shuffle, no per-class pass). */
  def stratifiedSample(df: DataFrame, classCol: Column, key: Column,
      pct: Map[String, Int], defaultPct: Int = 0): DataFrame = {
    require((defaultPct +: pct.values.toSeq).forall(p => p >= 0 && p <= 100),
      s"percentages must be in [0,100], got $pct default=$defaultPct")
    val threshold = pct.toSeq.sortBy(_._1).foldLeft(lit(defaultPct)) {
      case (acc, (cls, p)) => when(classCol === cls, lit(p)).otherwise(acc)
    }
    df.where(hash48(key.cast("string")) % 100 < threshold)
  }

  /** Deterministic train/val/test split: assigns each row a `split` label by
    * which mod-100 bucket its key's 48-bit content hash lands in, with the
    * splits owning consecutive bucket ranges in the order given (80/10/10 ⇒
    * buckets [0,80), [80,90), [90,100)). Same guarantees as [[hashSample]]
    * (whose bucket math this shares): rerun/engine/partitioning-independent,
    * key groups land in ONE split (no leakage of a document's chunks across
    * train and test), and pure per-row codegen — no shuffle, no state.
    * Growing a split only re-labels rows at range boundaries, and because
    * `hashSample(pct)` selects buckets [0,pct), a hash-sampled subset is
    * always a subset of the FIRST split when its percentage ≥ pct.
    * Percentages must sum to 100 so every row is labeled. */
  def assignSplit(df: DataFrame, key: Column, splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty, "assignSplit needs at least one split")
    require(splits.forall(_._2 > 0), s"split percentages must be positive, got $splits")
    require(splits.map(_._2).sum == 100,
      s"split percentages must sum to 100, got ${splits.map(_._2).sum}")
    val bucket = hash48(key.cast("string")) % 100
    val cum = splits.scanLeft(0)(_ + _._2).tail
    val chain = splits.zip(cum).dropRight(1)
      .foldLeft(Option.empty[Column]) { case (acc, ((nm, _), cut)) =>
        Some(acc.fold(when(bucket < cut, lit(nm)))(_.when(bucket < cut, lit(nm))))
      }
    df.withColumn("split", chain.fold(lit(splits.last._1))(_.otherwise(lit(splits.last._1))))
  }

  /** Class-balanced downsample: at most `n` rows per class, chosen in
    * deterministic pseudorandom order (by id-hash, id tie-break) so the
    * per-class pick is unbiased w.r.t. storage order but exactly
    * reproducible. Adds `sample_rank` (1-based within class).
    *
    * Scale note: the row_number window sorts each class partition; for
    * billion-row classes pre-thin with [[hashSample]] first (keep ~10·n/|c|
    * percent) so the sort input is O(n), then rank the survivors. */
  def balancedSample(df: DataFrame, classCols: Seq[String], id: Column, n: Int): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val w = Window.partitionBy(classCols.map(col): _*)
      .orderBy(hash48(id.cast("string")), id)
    df.withColumn("sample_rank", row_number().over(w))
      .where(col("sample_rank") <= n)
  }

  /** Systematic probability-proportional-to-size (PPS) sampling: documents
    * are laid out on a global weight axis in deterministic pseudorandom
    * order (id-hash, id tie-break — unbiased w.r.t. storage order, exactly
    * reproducible), and every `step`-th weight unit selects the document it
    * falls inside. A document of weight w is hit
    * `⌊(cum+w−1)/step⌋ − ⌊(cum−1)/step⌋` times — ≥1 guaranteed when
    * w ≥ step, proportional to w below it — the classic systematic PPS
    * design (Madow 1949) with a fixed origin instead of a random start, so
    * the draw is a pure function of the corpus. The natural weights are
    * token counts (sampling docs ∝ training cost) or quantized
    * quality×tokens scores.
    *
    * Unlike [[hashSample]] (uniform over KEYS) this samples ∝ weight with
    * NO per-key randomness at all: collisionless, exact sample mass
    * (selections = ⌊W/step⌋±1 always — a Bernoulli design's variance is
    * zero here), and integer-only arithmetic end to end, so the oracle
    * replays it exactly.
    *
    * Scale shape: the weight axis comes from [[graft.analytics.GlobalCumsum]]'s
    * two-phase scan — range exchange + per-partition offsets, never a
    * single-partition window — and everything after is per-row arithmetic.
    * The shifted `(x+step) div step` form keeps every dividend non-negative
    * so truncating and flooring division agree in every engine.
    *
    * Output: input columns + `cum_before` (exclusive weight prefix) +
    * `pps_count` (0 = not drawn; ≥2 = a mega-doc spanning multiple steps —
    * repeat-weight it or cap downstream). Weights must be non-negative
    * (ENFORCED in the data path — a negative weight raises, naming the id);
    * zero-weight rows are never drawn. */
  def ppsSystematicSample(
      df: DataFrame, id: Column, weight: Column, step: Long): DataFrame = {
    require(step > 0, s"step must be positive, got $step")
    // in-path guard (the Packing.manifest discipline): a negative weight
    // would silently shift the cumulative axis and skew every later doc's
    // draw — fail loudly naming the offending id instead
    val guardedW = when(weight >= 0, weight.cast("long"))
      .otherwise(raise_error(concat(
        lit("ppsSystematicSample: negative weight for id "),
        id.cast("string"))))
    val cum = graft.analytics.GlobalCumsum.cumsumBefore(
      df.withColumn("__ph", hash48(id.cast("string")))
        .withColumn("__w", guardedW),
      Seq(col("__ph"), id), col("__w"), "cum_before")
    // `div` = integral division; both dividends are ≥ step−1 ≥ 0 (shifted
    // by +step), so truncation and floor agree — and stay exact at any
    // scale, where a double-division round-trip could round across a
    // multiple and miscount by one
    cum
      .withColumn("pps_count", expr(
        s"((cum_before + __w - 1 + $step) div $step) - " +
          s"((cum_before - 1 + $step) div $step)"))
      .drop("__ph", "__w")
  }

  /** Deterministic fractional-epoch mixing — the UPSAMPLING dual of
    * [[weightedMix]]: each source is replicated to `epochsPct/100` epochs
    * (250 = 2.5 epochs), where every key gets ⌊pct/100⌋ full copies and the
    * hash-lowest `pct mod 100` percent of keys get one more — the standard
    * pretraining-mixture shape (high-quality sources weighted past one
    * epoch, bulk crawl under it; cf. the published GPT-3 / LLaMA data-mix
    * tables). Emits `epoch_copy` (1-based) so downstream shuffling/packing
    * can interleave copies rather than concatenate epochs.
    *
    * Every [[hashSample]] guarantee carries over, per copy: the draw is a
    * pure function of (key, pct) — rerun/partitioning/engine-stable — and
    * MONOTONE in pct: raising a source's weight only ADDS copies (the
    * bucket set for pct mod 100 nests, and crossing an integer epoch turns
    * the 99% partial into a full copy), so growing a mix never invalidates
    * data an earlier run already trained on. Replication is a generated
    * per-row array explode — no shuffle, no join, scan-stage codegen. */
  def epochMix(sources: Seq[(DataFrame, Column, Int)]): DataFrame = {
    require(sources.nonEmpty, "epochMix needs at least one source")
    require(sources.forall(_._3 >= 0),
      s"epoch percentages must be non-negative, got ${sources.map(_._3)}")
    sources.map { case (df, key, pct) =>
      val copies = lit(pct / 100) +
        when(hash48(key.cast("string")) % 100 < lit(pct % 100), 1).otherwise(0)
      // guard: sequence(1, 0) would DESCEND [1, 0], not return empty
      df.withColumn("epoch_copy",
        explode(when(copies >= 1, sequence(lit(1), copies))
          .otherwise(array().cast("array<int>"))))
    }.reduce(_ unionByName _)
  }

  /** Token-budget-capped corpus selection: per group, documents are ranked
    * by descending `score` (ties by `id` ascending) and the MAXIMAL PREFIX
    * whose token sum fits `budgetTokens` is kept — the quality-first
    * selection a curation pipeline runs when each domain or source gets a
    * fixed token allowance. With positive token counts the prefix sum is
    * monotone, so `kept = (cum_before + tokens ≤ budget)` IS the maximal
    * prefix: once a doc misfits, every later (lower-scored) doc misfits.
    *
    * Scale shape: one KEYED window per group (partitionBy(groupCols) — the
    * exchange is the group key, never a global sort); deterministic under
    * any partitioning because the order key (score desc, id) is total.
    * Adds `cum_before_tokens` and `kept`. */
  def budgetCappedSelection(
      df: DataFrame, groupCols: Seq[String], id: Column,
      tokens: Column, score: Column, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(score.desc, id)
    df
      .withColumn("__t", tokens.cast("long"))
      .withColumn("cum_before_tokens",
        coalesce(sum(col("__t")).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("kept", col("cum_before_tokens") + col("__t") <= budgetTokens)
      .drop("__t")
  }

  /** DSIR-style hashed n-gram importance scoring (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): score every
    * raw-pool document by how much more its hashed-bigram profile looks
    * like the TARGET corpus than like the raw pool itself, so the top of
    * the ranking is the raw data worth keeping.
    *
    * Features are word bigrams hashed into `buckets` buckets with the
    * shared 48-bit md5 prefix (engine-reproducible). Per bucket g the
    * add-one-smoothed evidence is the exact BIGINT cross-difference
    *
    *   w_g = (c_t[g]+1)·(N_r+B) − (c_r[g]+1)·(N_t+B)
    *
    * (positive iff the smoothed target rate c_t[g]/N_t exceeds the smoothed
    * raw rate — the same sign as the paper's log p_t(g)/p_r(g), linearized
    * so the gate stays EXACT integer arithmetic; the production swap back
    * to log-ratio scores is a one-line change where approximate FP ranking
    * is acceptable). A document's score is Σ_g c_doc[g]·w_g.
    *
    * Scale shape: one explode+reduce pass over each corpus; the per-doc
    * bucket-count frame feeds BOTH the raw totals and the scoring join, so
    * it is Caches-pinned (two uncached consumers would each re-scan the
    * corpus); the B-row weight table and the 1-row totals are broadcast.
    * Nothing wider than (docs × distinct buckets per doc) ever shuffles.
    * BIGINT headroom: |w_g| ≤ (N_t+B)·(N_r+B) and scores sum ≤ tokens/doc
    * of those, so ~1e18 overflows only past ~10^8-token corpora per side —
    * at that scale swap the two totals factors to DECIMAL(38,0) or return
    * to log-space doubles.
    *
    * Output: one row per raw doc (`idCol`, n_grams, score) — docs with <2
    * words carry n_grams=0, score=0. */
  def dsirScores(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 64): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val ws = col("__ws")
    def bucketCounts(df: DataFrame): DataFrame = df
      .where(col(textCol).isNotNull)
      .select(col(idCol), TextAnalysis.words(col(textCol)).as("__ws"))
      .where(size(ws) >= 2)
      .select(col(idCol),
        explode(transform(sequence(lit(1), size(ws) - 1), i =>
          concat_ws(" ", element_at(ws, i), element_at(ws, i + 1)))).as("__g"))
      .select(col(idCol), (hash48(col("__g")) % buckets).as("__b"))
      .groupBy(col(idCol), col("__b")).agg(count(lit(1)).as("__c"))
    // consumed twice (raw totals + scoring join) — pin the reduced frame
    val rawCounts = graft.util.Caches.register(bucketCounts(raw)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val tCounts = bucketCounts(target)
      .groupBy(col("__b")).agg(sum(col("__c")).as("__ct"))
    val rCounts = rawCounts
      .groupBy(col("__b")).agg(sum(col("__c")).as("__cr"))
    val totals = tCounts.agg(sum(col("__ct")).as("__nt"))
      .crossJoin(rCounts.agg(sum(col("__cr")).as("__nr")))
    // B rows at most: full outer over the two count tables (a bucket can
    // appear in only one corpus), then the exact cross-difference weight
    val weights = tCounts.join(rCounts, Seq("__b"), "full_outer")
      .crossJoin(broadcast(totals))
      .select(col("__b"),
        ((coalesce(col("__ct"), lit(0L)) + 1L) * (coalesce(col("__nr"), lit(0L)) + buckets) -
         (coalesce(col("__cr"), lit(0L)) + 1L) * (coalesce(col("__nt"), lit(0L)) + buckets))
          .as("__w"))
    val per = rawCounts.join(broadcast(weights), Seq("__b"))
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("n_grams"), sum(col("__c") * col("__w")).as("score"))
    raw.select(col(idCol))
      .join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("score"), lit(0L)).as("score"))
  }

  /** Top-k selection over [[dsirScores]] output (or any scored frame):
    * flags the k best rows by (`score` desc, `id` asc). The winner set is
    * computed as orderBy+limit — Spark plans a DISTRIBUTED partial top-k
    * (TakeOrderedAndProject), never a global single-partition sort — and
    * joined back as a broadcast of k ids. Deterministic: the order key is
    * total. Adds boolean `selected`. */
  def selectTopK(scored: DataFrame, id: Column, score: Column, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val winners = scored.orderBy(score.desc, id).limit(k)
      .select(id.as("__sel_id")).withColumn("__sel", lit(true))
    scored.join(broadcast(winners), id === col("__sel_id"), "left")
      .withColumn("selected", coalesce(col("__sel"), lit(false)))
      .drop("__sel_id", "__sel")
  }

  /** Cluster-balanced (diversity) sampling: an equal per-cluster quota,
    * picked deterministically — within each cluster the `quota` rows with
    * the smallest (hash48(id), id) survive, so the sample is rerun- and
    * partitioning-stable and spreads coverage across the embedding space
    * instead of letting one dense topic dominate (the
    * cluster-then-sample selection step of diversity-aware training-data
    * pipelines; clusters typically come from
    * [[Similarity.lloydInt]]/[[Similarity.assignToCentroids]]).
    *
    * Scale shape: one keyed window whose `row_number ≤ quota` filter
    * collapses to the per-group WindowGroupLimit pushdown — each group
    * keeps a quota-sized heap, no full per-cluster sort materializes.
    * Monotone in quota: the quota-8 sample is a prefix of the quota-16
    * sample per cluster. Adds `pick_rank` (1-based within cluster). */
  def clusterBalanced(df: DataFrame, idCol: String, clusterCol: String,
      quota: Int): DataFrame = {
    require(quota > 0, s"quota must be positive, got $quota")
    val w = Window.partitionBy(col(clusterCol))
      .orderBy(hash48(col(idCol).cast("string")), col(idCol))
    df.withColumn("pick_rank", row_number().over(w))
      .where(col("pick_rank") <= quota)
  }
}
