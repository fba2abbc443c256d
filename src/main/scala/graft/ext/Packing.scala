package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

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

  /** First-fit-decreasing bin packing of ATOMIC documents into fixed
    * `budget`-token bins — the third packing discipline real SFT pipelines
    * run next to concat-then-chunk ([[packTokens]]: docs split, zero
    * padding) and padded batches ([[paddedBatchManifest]]: docs atomic,
    * one doc per example row): docs stay whole AND multiple docs share one
    * fixed-budget example, trading a little per-bin slack for no splits
    * and no per-doc padding.
    *
    * Deterministic FFD order: the EXACT global (length desc, id asc) rank
    * via the [[GlobalCumsum]] two-phase spine (no single-partition sort),
    * then each consecutive run of `groupDocs` ranks packs INDEPENDENTLY —
    * bins never span groups. That grouping is what makes the discipline
    * 100 TB-honest: a global first-fit scan is inherently sequential (bin
    * k's load depends on every earlier doc), so production packers bound
    * the sequential horizon; each group is an isolated ≤`groupDocs`-doc
    * packing problem, all groups pack in parallel, and FFD's waste
    * guarantee holds per group. The per-group loop is genuinely
    * data-dependent iteration (the [[Bpe.tokenizeWordRank]]
    * justification), so it runs typed over the grouped rows; everything
    * around it — rank, group key, manifests — stays relational. Exchanges:
    * the rank's ranged repartition + ONE hash partition on the group key.
    *
    * First-fit rule per group, docs in (length desc, id asc) order: a doc
    * goes to the LOWEST-indexed bin whose load + n ≤ budget, else opens a
    * new bin. A doc longer than `budget` therefore opens a bin alone and
    * overflows it — flagged by fill > budget in [[ffdBinManifest]], never
    * an error (truncation policy is the caller's). Non-positive token
    * counts fail loudly ([[manifest]] discipline).
    *
    * @return one row per doc: (`idCol`, n_tokens, grp, bin) — bin is the
    *         0-based index within grp; (grp, bin) is the global bin key */
  def ffdPack(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long, groupDocs: Int = 4096): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(groupDocs > 0, s"groupDocs must be positive, got $groupDocs")
    val checked = df.withColumn("__fp_n",
      when(col(tokensCol) > 0, col(tokensCol).cast("long"))
        .otherwise(raise_error(concat(
          lit("Packing.ffdPack: non-positive token count "),
          coalesce(col(tokensCol).cast("string"), lit("NULL")),
          lit(s" for $idCol="),
          coalesce(col(idCol).cast("string"), lit("NULL"))))
          .cast("long")))
    val ranked = GlobalCumsum.rowNumber(
        checked.select(col(idCol), col("__fp_n")),
        Seq(col("__fp_n").desc, col(idCol)), "__rn")
      .select(
        expr(s"(__rn - 1) div ${groupDocs}L").as("grp"),
        ((col("__rn") - 1) % groupDocs).as("rnk"),
        col(idCol), col("__fp_n"))
    val outSchema = StructType(Seq(
      ranked.schema(idCol),
      StructField("n_tokens", LongType, nullable = false),
      StructField("grp", LongType, nullable = false),
      StructField("bin", IntegerType, nullable = false)))
    ranked
      .groupByKey(_.getLong(0))(Encoders.scalaLong)
      .flatMapGroups { (g: Long, it: Iterator[Row]) =>
        // ≤ groupDocs rows by construction — bounded, never data-sized
        val docs = it.toArray.sortBy(_.getLong(1))
        val loads = scala.collection.mutable.ArrayBuffer.empty[Long]
        docs.iterator.map { r =>
          val n = r.getLong(3)
          var b = 0
          var placed = -1
          while (placed < 0 && b < loads.length) {
            if (loads(b) + n <= budget) { loads(b) += n; placed = b }
            b += 1
          }
          if (placed < 0) { loads += n; placed = loads.length - 1 }
          Row(r.get(2), n, g, placed)
        }
      }(Encoders.row(outSchema))
  }

  /** Bin-level manifest over [[ffdPack]] rows: per (grp, bin) the doc
    * count, exact fill, and slack `budget − fill` (negative exactly when
    * one over-budget doc owns the bin). One hash agg. */
  def ffdBinManifest(packed: DataFrame, budget: Long): DataFrame =
    packed.groupBy(col("grp"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("fill"))
      .withColumn("slack", lit(budget) - col("fill"))

  /** The WASTE LEDGER: four packing disciplines costed over the SAME docs
    * in one report — the number a pipeline owner actually decides with.
    * Slots are what the trainer allocates, payload what it uses:
    * - concat_chunk: `ceil(total / exampleTokens)` FIXED-width examples,
    *   zero padding anywhere but the final tail — minimal waste, but docs
    *   SPLIT across examples (`docs_split` counts them; that is its
    *   price, not waste).
    * - padded_fixed: docs atomic, ONE doc per `exampleTokens`-wide
    *   example — what fixed-context training costs WITHOUT a packer.
    * - ffd: [[ffdPack]] bins of `exampleTokens` capacity — docs atomic,
    *   FIXED-width examples, waste is the per-bin slack. FFD never opens
    *   more bins than docs, so its waste is ≤ padded_fixed's by
    *   construction (law-tested) — this pair is the packer's honest
    *   before/after.
    * - padded_batches: [[paddedBatchManifest]] with `batchDocs`
    *   length-sorted docs per batch padded to the batch max. Its pad mass
    *   is small BUT its examples are VARIABLE-width (each batch has its
    *   own max) — only a trainer that accepts per-batch sequence lengths
    *   can spend these slots; it is NOT feasible at a fixed context
    *   length, so compare it to the fixed-width rows only with that
    *   caveat.
    * All counts integral; the one ratio divides last. */
  def packingWasteLedger(df: DataFrame, idCol: String, tokensCol: String,
      exampleTokens: Long, batchDocs: Int, groupDocs: Int = 4096): DataFrame = {
    // eager multi-consumer pin (three disciplines re-scan it)
    val docs = graft.util.Caches.pin(
      df.select(col(idCol), col(tokensCol).cast("long").as("__n"))
        .where(col("__n") > 0))
    val concat0 = docs
      .agg(sum(col("__n")).as("payload"), count(lit(1)).as("n_docs"))
      .select(lit("concat_chunk").as("discipline"),
        expr(s"(payload + ${exampleTokens}L - 1) div ${exampleTokens}L")
          .as("n_examples"),
        col("payload"),
        // docs whose token run crosses an example boundary — the split count
        lit(0L).as("docs_split"), col("n_docs"))
    // exact split count needs the offsets, not just the total
    val concatSplit = offsets(docs, idCol, "__n")
      .select((expr(s"cum_before div ${exampleTokens}L") =!=
        expr(s"(cum_before + __n - 1) div ${exampleTokens}L")).cast("long").as("__sp"))
      .agg(sum(col("__sp")).as("docs_split"))
    val concat = concat0.drop("docs_split").crossJoin(broadcast(concatSplit))
      .select(col("discipline"), col("n_examples"),
        (col("n_examples") * exampleTokens).as("slot_tokens"),
        col("payload").as("payload_tokens"), col("docs_split"))
    val padded = paddedBatchManifest(docs, idCol, "__n", batchDocs)
      .agg(count(lit(1)).as("n_examples"),
        sum(col("n_docs") * col("max_len")).as("slot_tokens"),
        sum(col("total_tokens")).as("payload_tokens"))
      .select(lit("padded_batches").as("discipline"), col("n_examples"),
        col("slot_tokens"), col("payload_tokens"), lit(0L).as("docs_split"))
    val paddedFixed = docs
      .agg(count(lit(1)).as("n_examples"), sum(col("__n")).as("payload_tokens"))
      .select(lit("padded_fixed").as("discipline"), col("n_examples"),
        (col("n_examples") * exampleTokens).as("slot_tokens"),
        col("payload_tokens"), lit(0L).as("docs_split"))
    val ffd = ffdBinManifest(
        ffdPack(docs, idCol, "__n", exampleTokens, groupDocs), exampleTokens)
      .agg(count(lit(1)).as("n_examples"), sum(col("fill")).as("payload_tokens"))
      .select(lit("ffd").as("discipline"), col("n_examples"),
        (col("n_examples") * exampleTokens).as("slot_tokens"),
        col("payload_tokens"), lit(0L).as("docs_split"))
    concat.unionByName(padded).unionByName(paddedFixed).unionByName(ffd)
      .withColumn("waste_tokens", col("slot_tokens") - col("payload_tokens"))
      .withColumn("waste_pct",
        col("waste_tokens").cast("double") / col("slot_tokens").cast("double"))
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
