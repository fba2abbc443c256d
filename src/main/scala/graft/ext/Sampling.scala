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
}
