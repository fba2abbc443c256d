package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.analytics.GlobalCumsum

/** Sequence packing — laying a token stream of variable-length documents
  * into fixed-width training examples. All offsets come from
  * [[GlobalCumsum]]'s two-phase scan (never a single-partition window), and
  * example-level products explode each doc only to the examples it TOUCHES
  * (n_docs + n_examples rows, never tokens) — the invariants that make the
  * family safe at corpus scale. Catalog gates: q145 (offsets), q179
  * (manifest), q186 (length-binned packing).
  *
  * Contract: `tokensCol` is a positive long per doc; `idCol` is unique and
  * defines the pack order (docs are laid out in ascending id). */
object Packing {

  /** Per-doc pack offsets: the exclusive global running token sum
    * (`cum_before`) in ascending `idCol` order. Downstream arithmetic
    * (`cum_before div T` = first example touched, `% T` = offset within
    * it) is pure projection. */
  def offsets(df: DataFrame, idCol: String, tokensCol: String): DataFrame =
    GlobalCumsum.cumsumBefore(
      df, Seq(col(idCol)), col(tokensCol), "cum_before")

  /** Example-level manifest over a frame that already carries
    * `cum_before`: which docs fill each `exampleTokens`-wide example, and
    * how full it is. A doc spanning an example boundary counts in every
    * example it touches; `n_tokens_filled` is exact boundary-clipped
    * coverage, so interior examples sum to exactly `exampleTokens`.
    * `extraKeys` prefix the grouping (e.g. a length-bin column whose
    * offsets restart at 0 per bin). */
  def manifest(
      withOffsets: DataFrame, idCol: String, tokensCol: String,
      exampleTokens: Long, extraKeys: Seq[String] = Nil): DataFrame = {
    require(exampleTokens > 0,
      s"exampleTokens must be positive, got $exampleTokens")
    val keys = (extraKeys :+ "example_id").map(col)
    withOffsets
      // integer div needs expr(); the operands are re-aliased to fixed safe
      // names first so a tokensCol needing quoting (spaces, dots) can never
      // splice into the SQL string as something else. The contract says
      // "positive long per doc" — enforce it IN the data path (a guard
      // column would be pruned): a zero/negative count would make the
      // example `sequence` end before it starts, silently dropping the doc
      // from the manifest (or throwing an opaque sequence error) instead
      // of naming the offender.
      .withColumn("__pk_tok",
        when(col(tokensCol) > 0, col(tokensCol))
          .otherwise(raise_error(concat(
            lit("Packing.manifest: non-positive token count "),
            coalesce(col(tokensCol).cast("string"), lit("NULL")),
            lit(s" for $idCol="),
            coalesce(col(idCol).cast("string"), lit("NULL"))))
            .cast("long")))
      .withColumn("example_id", explode(sequence(
        expr(s"cum_before div ${exampleTokens}L"),
        expr(s"(cum_before + __pk_tok - 1) div ${exampleTokens}L"))))
      .drop("__pk_tok")
      .groupBy(keys: _*)
      .agg(
        count(lit(1)).as("n_docs"),
        min(col(idCol)).as("first_doc"),
        max(col(idCol)).as("last_doc"),
        sum(least(col("cum_before") + col(tokensCol),
              (col("example_id") + 1) * exampleTokens) -
            greatest(col("cum_before"), col("example_id") * exampleTokens))
          .as("n_tokens_filled"))
  }

  /** Fixed-width packing of PER-DOCUMENT TOKEN-ID SEQUENCES — the payload
    * form of [[offsets]]/[[manifest]] (which reason about counts): lay the
    * corpus token stream, doc after doc in ascending `idCol`, into
    * `exampleTokens`-wide training examples and emit one row per token
    * with its (example, in-example position) address. A doc spanning an
    * example boundary contributes its tokens to every example it touches —
    * exact concatenate-then-chunk semantics, no padding.
    *
    * Scale shape: one [[GlobalCumsum]] two-phase pass over doc-level rows
    * for the offsets, then a pure posexplode projection — per-token rows
    * exist only AFTER the cumsum (token payloads never shuffle; the
    * explode is scan-stage work wherever the consumer lands). Grouping to
    * (example_id, ids array) is [[packedExamples]] — one hash agg away.
    *
    * @param df (`idCol`, `idsCol` array<int>) — one row per doc
    * @return (example_id, pos, `idCol`, token_id) — pos ∈ [0, exampleTokens) */
  def packTokens(df: DataFrame, idCol: String, idsCol: String,
      exampleTokens: Long): DataFrame = {
    require(exampleTokens > 0,
      s"exampleTokens must be positive, got $exampleTokens")
    val withOff = offsets(
      df.withColumn("__pt_n", size(col(idsCol)).cast("long"))
        .where(col("__pt_n") > 0),
      idCol, "__pt_n")
    withOff
      .select(col(idCol), col("cum_before"),
        posexplode(col(idsCol)).as(Seq("__tp", "token_id")))
      .withColumn("__g", col("cum_before") + col("__tp"))
      .select(expr(s"__g div ${exampleTokens}L").as("example_id"),
        (col("__g") % exampleTokens).as("pos"),
        col(idCol), col("token_id"))
  }

  /** [[packTokens]] folded to one row per example: the id array in stream
    * order plus its fill count (every example except possibly the last
    * holds exactly `exampleTokens` ids). */
  def packedExamples(df: DataFrame, idCol: String, idsCol: String,
      exampleTokens: Long): DataFrame =
    packTokens(df, idCol, idsCol, exampleTokens)
      .groupBy(col("example_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("token_id")))),
        s => s.getField("token_id")).as("token_ids"))
      .select(col("example_id"),
        size(col("token_ids")).cast("long").as("n_tokens"), col("token_ids"))

  /** [[packedExamples]] plus per-example DOCUMENT BOUNDARIES — the
    * metadata a trainer needs for attention masking (tokens must not
    * attend across the docs packed into one example): `doc_starts(k)` is
    * the in-example position of the first token of the k-th document
    * segment, `doc_ids(k)` its source doc. A doc's tokens are contiguous
    * in the stream by construction, so boundaries are exactly the
    * positions where the owning doc changes. ONE hash agg (the
    * [[packTokens]] rows fold once; boundaries derive from the sorted
    * struct array with index HOFs — the sorted array is materialized as a
    * column first, never recomputed per element).
    * @return (example_id, n_tokens, token_ids array<int>,
    *         doc_starts array<long>, doc_ids array) */
  def packedExamplesWithBoundaries(df: DataFrame, idCol: String,
      idsCol: String, exampleTokens: Long): DataFrame =
    packTokens(df, idCol, idsCol, exampleTokens)
      .groupBy(col("example_id"))
      .agg(array_sort(collect_list(
        struct(col("pos"), col(idCol).as("__doc"), col("token_id")))).as("__st"))
      .withColumn("token_ids", transform(col("__st"), s => s.getField("token_id")))
      .withColumn("__docs", transform(col("__st"), s => s.getField("__doc")))
      .withColumn("doc_starts",
        transform(
          filter(sequence(lit(0), size(col("__st")) - 1), i =>
            (i === 0) || element_at(col("__docs"), i + 1) =!= element_at(col("__docs"), i)),
          i => i.cast("long")))
      .withColumn("doc_ids",
        transform(col("doc_starts"), p => element_at(col("__docs"), p.cast("int") + 1)))
      .select(col("example_id"),
        size(col("token_ids")).cast("long").as("n_tokens"),
        col("token_ids"), col("doc_starts"), col("doc_ids"))

  /** Fill-in-the-middle transform in PSM order (Bavarian et al. 2022,
    * "Efficient Training of Language Models to Fill in the Middle") — the
    * data-side op that teaches a causal LM to infill: a document's id
    * sequence splits at exact integer points `p1 = (n·midStartPct) div
    * 100`, `p2 = (n·midEndPct) div 100` and re-emits as
    * `[PRE] prefix [SUF] suffix [MID] middle`, so the middle is predicted
    * LAST with both sides visible. Sentinels are caller-allocated ids
    * (immediately after the vocab, the byte-fallback discipline). Docs
    * failing `transformPred` pass through unchanged — the paper applies
    * FIM at a rate, not universally. Pure per-row projection: no shuffle,
    * no state, streaming-legal; downstream packing treats the result like
    * any id array.
    * @return df with `fim_ids` (array<int>) replacing nothing — original
    *         columns kept */
  def fimPsm(df: DataFrame, idsCol: String,
      preId: Int, sufId: Int, midId: Int,
      midStartPct: Int, midEndPct: Int,
      transformPred: Column): DataFrame = {
    require(0 <= midStartPct && midStartPct <= midEndPct && midEndPct <= 100,
      s"need 0 <= midStartPct <= midEndPct <= 100, got $midStartPct/$midEndPct")
    df.withColumn("__n", size(col(idsCol)))
      .withColumn("__p1", expr(s"(__n * $midStartPct) div 100"))
      .withColumn("__p2", expr(s"(__n * $midEndPct) div 100"))
      // empty-doc guard (promptMasked discipline): slicing an empty ids
      // array would still emit the three sentinels — a sentinels-only
      // "document" no trainer wants; token-less docs pass through unchanged
      .withColumn("fim_ids", when(col("__n") > 0 && transformPred,
        concat(
          array(lit(preId)),
          slice(col(idsCol), lit(1), col("__p1")),
          array(lit(sufId)),
          slice(col(idsCol), col("__p2") + 1, col("__n") - col("__p2")),
          array(lit(midId)),
          slice(col(idsCol), col("__p1") + 1, col("__p2") - col("__p1"))))
        .otherwise(col(idsCol)))
      .drop("__n", "__p1", "__p2")
  }

  /** Per-token SFT loss mask fused onto the id array: the first
    * `promptPct` percent of each doc's tokens (the "prompt") get mask 0 —
    * excluded from the loss — and the rest mask 1, by exact integer
    * cross-multiplication `i·100 < n·promptPct` (0-based i), so the
    * boundary is engine-exact. Emits `masked` as array<struct<token_id,
    * mask>>, which [[packTokens]] lays out like any payload — the mask
    * rides the same packing arithmetic as the ids (one transform, no
    * second pass, no join). Per-row projection; the size is materialized
    * once (never recomputed per element). */
  def promptMasked(df: DataFrame, idsCol: String, promptPct: Int): DataFrame = {
    require(0 <= promptPct && promptPct <= 100,
      s"promptPct must be in [0, 100], got $promptPct")
    df.withColumn("__n", size(col(idsCol)))
      // empty-doc guard: sequence(0, -1) would DESCEND and zip_with would
      // null-pad — an empty ids array must mask to an empty array
      .withColumn("masked", when(col("__n") > 0, zip_with(
        col(idsCol),
        sequence(lit(0), col("__n") - 1),
        (id, i) => struct(id.as("token_id"),
          when(i * 100 < col("__n") * promptPct, lit(0)).otherwise(lit(1))
            .as("mask"))))
        .otherwise(expr("CAST(array() AS array<struct<token_id:int,mask:int>>)")))
      .drop("__n")
  }

  /** Padded-batch manifest — the SFT-style packing discipline where
    * documents stay ATOMIC (no concatenate-then-chunk: each example is one
    * padded doc) and batches pad every member to the batch maximum:
    * docs sort by (`tokensCol`, `idCol`) via the exact [[GlobalCumsum]]
    * row number (never a single-partition sort), group into consecutive
    * `batchDocs`-sized batches, and each batch reports its exact integer
    * padding economics — `padding_waste = n_docs·max_len − total_tokens`
    * is the token mass a trainer burns on pad tokens. Length-sorting is
    * the whole point: random batching wastes O(max−mean) per doc, sorted
    * batching collapses the in-batch spread. One ranged exchange (the
    * cumsum spine) + one hash agg keyed by batch id.
    * @return (batch_id, n_docs, first_doc, last_doc, min_len, max_len,
    *         total_tokens, padding_waste) */
  def paddedBatchManifest(df: DataFrame, idCol: String, tokensCol: String,
      batchDocs: Int): DataFrame = {
    require(batchDocs > 0, s"batchDocs must be positive, got $batchDocs")
    GlobalCumsum.rowNumber(
        df.select(col(idCol), col(tokensCol)),
        Seq(col(tokensCol), col(idCol)), "__rn")
      .withColumn("batch_id", expr(s"(__rn - 1) div ${batchDocs}L"))
      .groupBy(col("batch_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col(idCol)).as("first_doc"),
        max(col(idCol)).as("last_doc"),
        min(col(tokensCol)).cast("long").as("min_len"),
        max(col(tokensCol)).cast("long").as("max_len"),
        sum(col(tokensCol)).cast("long").as("total_tokens"))
      .withColumn("padding_waste",
        col("n_docs") * col("max_len") - col("total_tokens"))
  }

  /** Length-binned pack offsets (sorted batching): docs are ntile'd into
    * `bins` quantile bins by (`tokensCol`, `idCol`) — so same-bin docs have
    * near-uniform lengths and padding-to-longest waste collapses — then
    * `cum_before` restarts at 0 within each bin. The in-bin offset is the
    * ONE global token cumsum over (bin, id) minus broadcast per-bin bases:
    * no per-bin window, no second corpus sort. Output adds `bin` and
    * `cum_before`. */
  def binnedOffsets(
      df: DataFrame, idCol: String, tokensCol: String, bins: Int): DataFrame = {
    val binned = GlobalCumsum.ntile(
      df, Seq(col(tokensCol), col(idCol)), bins, "bin")
    // cumsum AND per-bin totals off ONE pinned range exchange — a separate
    // `binned.groupBy` would re-run the whole ntile subtree for the base frame
    val (cum, binTotals) = GlobalCumsum.cumsumBeforeWithTotals(
      binned, Seq(col("bin"), col(idCol)), col(tokensCol), "__g",
      Seq("bin"), "__bt")
    val binW = org.apache.spark.sql.expressions.Window.orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offs = binTotals
      .withColumn("__bb", coalesce(sum(col("__bt")).over(binW), lit(0L)))
      .select(col("bin"), col("__bb"))
    cum.join(broadcast(offs), "bin")
      .withColumn("cum_before", col("__g") - col("__bb"))
      .drop("__g", "__bb")
  }
}
