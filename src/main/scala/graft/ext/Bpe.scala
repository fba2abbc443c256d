package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary learning and application (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword Units") —
  * the tokenizer-training stage of an LLM data pipeline, distributed the
  * way the textbook algorithm already wants to be: over the WORD-FREQUENCY
  * dictionary, not the raw corpus. One corpus scan builds (word, count);
  * every merge iteration then touches only the dict (O(vocabulary) rows —
  * even a multilingual web crawl's word dict is billions at most, a frame
  * Spark aggregates without ceremony), so corpus size pays exactly one
  * pass no matter how many merges are learned.
  *
  * Symbol streams are encoded as delimited strings: every symbol is
  * wrapped in single `sep` characters and symbols are concatenated, so a
  * word's encoding is `|t||h||e||>|` (eow marker `>` is a symbol like any
  * other, per the paper). The merge of pair (a, b) is then the PLAIN
  * string replacement `|a||b|` → `|ab|` — leftmost, non-overlapping,
  * sequential, which is precisely BPE's greedy merge semantics, and
  * identical in Spark and DuckDB (`replace` in both engines scans
  * left-to-right and resumes AFTER the replacement), so the whole
  * training loop is replayable by the oracle. Delimiters double between
  * symbols (`||`) exactly so that adjacent merge sites stay matchable:
  * with single separators the trailing `|` of one match would consume the
  * leading `|` of the next and plain replace would skip every second
  * occurrence.
  *
  * The per-iteration argmax (ONE row: best pair by count desc, then
  * lexicographic) is collected to the driver — the k-means discipline: a
  * scalar per iteration, never the data. Each iteration's dict is
  * `localCheckpoint`ed: persist alone does NOT truncate lineage, and a
  * k-deep chain of nested cached plans makes analysis + codegen cost grow
  * superlinearly (measured: step 13 of a 500k-word dict jumped 1 s → 60 s
  * under persist; flat ~1 s/step checkpointed). Checkpoint blocks are
  * weakly referenced, so stale iterations are reclaimed by the
  * ContextCleaner without bookkeeping. On a real cluster swap for a
  * reliable `checkpoint` — localCheckpoint blocks die with an executor.
  *
  * Requires `sep` and the eow marker to be absent from the corpus
  * alphabet (enforced in the data path with `raise_error` naming the
  * offending word — a silent collision would corrupt merge boundaries).
  */
object Bpe {

  val Sep = "|"
  val Eow = ">"

  /** (word, cnt, sym) dict off one corpus scan; `sym` is the delimited
    * initial encoding: each character a symbol, plus the eow symbol. */
  private[ext] def wordDict(df: DataFrame, textCol: String): DataFrame =
    df.where(col(textCol).isNotNull)
      .select(explode(TextAnalysis.words(col(textCol))).as("word"))
      .where(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn("sym", encodeWord(col("word"), Nil))

  /** Adjacent-pair counts over a dict's symbol streams: split each stream
    * back to symbols (strip the outer delimiters, split on the doubled
    * inner one), zip neighbors, weight by word count. Map-side partials
    * collapse in-dict repeats; the exchange carries (pair, partial). */
  private[ext] def pairCounts(dict: DataFrame): DataFrame = {
    val syms = split(
      expr("substring(sym, 2, length(sym) - 2)"), "\\|\\|").as("__s")
    dict
      .select(col("cnt"), syms)
      .where(size(col("__s")) >= 2)
      .select(col("cnt"), explode(transform(
        sequence(lit(1), size(col("__s")) - 1),
        i => struct(element_at(col("__s"), i).as("l"),
          element_at(col("__s"), i + 1).as("r")))).as("__p"))
      .groupBy(col("__p.l").as("l"), col("__p.r").as("r"))
      .agg(sum(col("cnt")).as("c"))
  }

  /** Learn `merges` BPE merge operations; returns the merge table
    * (step, left, right, merged, pair_count) — `merges` rows, or fewer if
    * the dict runs out of pairs first. Deterministic: the argmax breaks
    * ties by count desc, then (left, right) lexicographic. */
  def learnMerges(df: DataFrame, textCol: String, merges: Int): DataFrame = {
    require(merges > 0, s"merges must be positive, got $merges")
    val spark = df.sparkSession
    var dict = wordDict(df, textCol).localCheckpoint(true)
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= merges && !exhausted) {
      val best = pairCounts(dict)
        .orderBy(col("c").desc, col("l"), col("r")).limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        val merged = l + r
        learned += ((step, l, r, merged, c))
        dict = dict
          .withColumn("sym", replace(col("sym"),
            lit(s"$Sep$l$Sep$Sep$r$Sep"), lit(s"$Sep$merged$Sep")))
          .localCheckpoint(true) // truncate: plan depth stays ONE merge
        step += 1
      }
    }
    import spark.implicits._
    learned.toSeq.toDF("step", "left", "right", "merged", "pair_count")
  }

  /** [[learnMerges]] in BATCHED rounds — the standard distributed-BPE
    * batching that cuts driver round trips `batch`×: each round counts
    * pairs ONCE, collects the top `batch` candidates (count desc, then
    * (l, r) lexicographic — the sequential argmax order), and greedily
    * ACCEPTS a candidate only if neither of its symbols appears among the
    * symbols OR merged results of a higher-ranked pair already accepted
    * this round; otherwise it DEFERS to a later round. Deferral is what
    * keeps the round sound: two pairs sharing a symbol compete for the
    * same occurrences, so the lower-ranked one's count is stale the
    * moment the higher-ranked replace runs (and a pair whose side equals
    * an earlier pair's OUTPUT would match occurrences that replace just
    * created). Accepted pairs are symbol-disjoint, so their delimited
    * replaces touch disjoint sites and commute — the round applies them
    * as ONE chained-replace projection over the dict.
    *
    * Exact-sequential equivalence holds when each round's acceptances
    * don't interact AND no merge-created pair overtakes the next
    * acceptance's count (spec-tested both ways: an equality fixture and a
    * divergence fixture); `batch = 1` is [[learnMerges]] exactly. The
    * recorded `pair_count` of a non-first acceptance is its count at the
    * START of the round — the number the argmax actually ranked on.
    *
    * Returns (step, round, left, right, merged, pair_count); `step` is
    * the global application order ([[applyMerges]]-compatible), `round`
    * the counting round that accepted it. */
  def learnMergesBatched(df: DataFrame, textCol: String, merges: Int,
      batch: Int): DataFrame = {
    require(merges > 0, s"merges must be positive, got $merges")
    require(batch > 0, s"batch must be positive, got $batch")
    val spark = df.sparkSession
    var dict = wordDict(df, textCol).localCheckpoint(true)
    val learned =
      scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String, String, String, Long)]
    var round = 1
    var exhausted = false
    while (learned.size < merges && !exhausted) {
      // fetch the full batch of candidates even when fewer merges remain:
      // a deferral must be able to let the NEXT-ranked candidate in, and a
      // pool clamped to the remaining-merge count would starve it
      val top = pairCounts(dict)
        .orderBy(col("c").desc, col("l"), col("r")).limit(batch).collect()
      if (top.isEmpty) exhausted = true
      else {
        val room = merges - learned.size
        val blocked = scala.collection.mutable.Set.empty[String]
        val accepted =
          scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        top.foreach { r =>
          val (l, rt, c) = (r.getString(0), r.getString(1), r.getLong(2))
          if (accepted.size < room && !blocked(l) && !blocked(rt)) {
            accepted += ((l, rt, c))
            blocked ++= Seq(l, rt, l + rt)
          }
        }
        accepted.foreach { case (l, r, c) =>
          learned += ((learned.size + 1, round, l, r, l + r, c))
        }
        dict = dict
          .withColumn("sym", accepted.foldLeft(col("sym")) {
            case (acc, (l, r, _)) =>
              replace(acc, lit(s"$Sep$l$Sep$Sep$r$Sep"), lit(s"$Sep${l + r}$Sep"))
          })
          .localCheckpoint(true) // truncate: plan depth stays ONE round
        round += 1
      }
    }
    import spark.implicits._
    learned.toSeq.toDF("step", "round", "left", "right", "merged", "pair_count")
  }

  /** The delimited encoding of one word column, with `merges` applied in
    * order as a single nested-replace expression chain. */
  private[ext] def encodeWord(word: Column, merges: Seq[(String, String)]): Column = {
    // same fail-loudly contract as wordDict: a reserved char in the input
    // would silently corrupt merge boundaries and symbol counts
    val guarded = when(word.contains(Sep) || word.contains(Eow),
      raise_error(concat(lit("Bpe: word contains a reserved delimiter: "), word)))
      .otherwise(word)
    val enc0 = concat(regexp_replace(guarded, "(.)", s"\\$Sep$$1\\$Sep"),
      lit(s"$Sep$Eow$Sep"))
    merges.foldLeft[Column](enc0) { case (acc, (l, r)) =>
      replace(acc, lit(s"$Sep$l$Sep$Sep$r$Sep"), lit(s"$Sep${l + r}$Sep"))
    }
  }

  /** Symbol count of a delimited encoding = half its delimiter count:
    * every symbol carries exactly two `sep`s in the delimited form. */
  private[ext] def symCount(encoded: Column): Column =
    ((length(encoded) - length(replace(encoded, lit(Sep), lit("")))) / 2)
      .cast("long")

  /** Tokenize a corpus with an ALREADY-LEARNED merge list, applied in
    * order. The k merges compose into ONE nested-replace projection —
    * a single codegen'd corpus pass, no iteration jobs, no shuffle beyond
    * the final per-doc count. Emits (`idCol`, n_words, n_tokens) where
    * n_tokens counts post-merge symbols INCLUDING each word's eow marker
    * (the paper's symbol space). Null-text docs are excluded. */
  def applyMerges(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val nSyms = symCount(encodeWord(col("__w"), merges))
    df.where(col(textCol).isNotNull)
      .select(col(idCol), explode(TextAnalysis.words(col(textCol))).as("__w"))
      .where(col("__w") =!= "")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(nSyms).as("n_tokens"))
  }

  /** [[applyMerges]] as a PURE PER-ROW PROJECTION — no explode, no
    * shuffle, no state: the word array is materialized once per row (the
    * HOF-lambda discipline) and the per-word symbol counts fold inside the
    * row. Exactly the shape a STREAMING tokenizer needs (tokenize-on-
    * ingest is a stateless map over the document stream once the merge
    * table is learned offline), and result-identical to the grouped form
    * on any batch frame. */
  def tokenizeRowwise(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame =
    df.where(col(textCol).isNotNull)
      .withColumn("__ws",
        filter(TextAnalysis.words(col(textCol)), w => w =!= ""))
      .where(size(col("__ws")) > 0) // grouped-form parity: no-word docs emit nothing
      .select(col(idCol),
        size(col("__ws")).cast("long").as("n_words"),
        aggregate(col("__ws"), lit(0L),
          (acc, w) => acc + symCount(encodeWord(w, merges))).as("n_tokens"))

  /** The tokenization itself, as strings: one row per (distinct word,
    * token position) with the post-merge token — the vocabulary-sized
    * lookup table a tokenizer service serves (token counts are audits;
    * THIS is the artifact that encodes text). One distinct-word pass, one
    * nested-replace chain, one split+posexplode; `token_idx` is 0-based
    * and the eow marker appears as its own final token. */
  def tokenTable(df: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    df.where(col(textCol).isNotNull)
      .select(explode(TextAnalysis.words(col(textCol))).as("word"))
      .where(col("word") =!= "")
      .distinct()
      .withColumn("__enc", encodeWord(col("word"), merges))
      .select(col("word"),
        posexplode(split(expr("substring(__enc, 2, length(__enc) - 2)"), "\\|\\|"))
          .as(Seq("token_idx", "token")))
  }

  /** [[applyMerges]] driven by a freshly-learned table — the end-to-end
    * train-then-tokenize convenience; the merge table is vocabulary-scale
    * metadata (k rows), so collecting it to the driver is the contract,
    * not a compromise. */
  def learnAndTokenize(df: DataFrame, idCol: String, textCol: String,
      merges: Int): DataFrame = {
    val table = learnMerges(df, textCol, merges)
      .orderBy(col("step"))
      .collect()
      .map(r => (r.getString(1), r.getString(2)))
      .toSeq
    applyMerges(df, idCol, textCol, table)
  }

  /** The id-assigned vocabulary over a tokenized corpus: every post-merge
    * token ranked by (corpus occurrence count desc, token asc) —
    * frequency rank is the id space real tokenizers ship (low ids = hot
    * tokens) — with `token_id` = rank − 1 (0-based, dense). Counts are
    * exact: per-word token multiplicity weighted by the word-dict count,
    * so the corpus pays ONE scan (the word dict) no matter the alphabet.
    * The rank is a [[graft.analytics.GlobalCumsum]] global row number —
    * never a single-partition sort, though the vocabulary is
    * metadata-scale by contract.
    * @return (token_id int, token, cnt) */
  def vocab(df: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val enc = wordDict(df, textCol)
      .withColumn("sym", encodeWord(col("word"), merges))
    val counts = enc
      .select(col("cnt"), explode(split(
        expr("substring(sym, 2, length(sym) - 2)"), "\\|\\|")).as("token"))
      .groupBy(col("token")).agg(sum(col("cnt")).as("cnt"))
    graft.analytics.GlobalCumsum
      .rowNumber(counts, Seq(col("cnt").desc, col("token")), "token_id")
      .select((col("token_id") - 1).cast("int").as("token_id"),
        col("token"), col("cnt"))
  }

  /** word → ordered token-ID array under a learned (merges, vocab) pair —
    * the serving artifact of a trained tokenizer (the [[tokenTable]] with
    * ids resolved and positions folded into one array per word). One
    * distinct-word pass; the vocab join broadcasts (vocabulary-scale by
    * contract). Join is INNER: by construction every token a corpus word
    * produces exists in a vocab trained on the same corpus; for
    * out-of-corpus serving, train vocab on the union or handle OOV
    * upstream. */
  def wordTokenIds(df: DataFrame, textCol: String,
      merges: Seq[(String, String)], vocabDf: DataFrame): DataFrame =
    tokenTable(df, textCol, merges)
      .join(broadcast(vocabDf.select(col("token"), col("token_id"))), Seq("token"))
      .groupBy(col("word"))
      .agg(transform(
        array_sort(collect_list(struct(col("token_idx"), col("token_id")))),
        s => s.getField("token_id")).as("ids"))

  /** [[tokenIds]] as a PURE PER-ROW PROJECTION — the streaming
    * tokenize-to-ids shape: the merge table AND the vocabulary ship as
    * literals (both are model metadata — the token space is alphabet +
    * merges, vocabulary-scale by construction), so resolving a document
    * to its id sequence needs no join, no aggregation, no state. Each
    * word encodes through the nested-replace chain and its tokens look up
    * in the literal map; an out-of-vocabulary token fails loudly (cannot
    * happen when the vocab was trained on a superset of the stream's
    * alphabet — the production OOV path is a byte-fallback vocab, not a
    * silent null). Result-identical to [[tokenIds]] on any batch frame
    * (law-tested). */
  def tokenIdsRowwise(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], vocab: Map[String, Int]): DataFrame = {
    require(vocab.nonEmpty, "tokenIdsRowwise needs a non-empty vocabulary")
    val vm = typedLit(vocab)
    def idsOfWord(w: Column): Column = {
      val enc = encodeWord(w, merges)
      transform(split(enc.substr(lit(2), length(enc) - 2), "\\|\\|"),
        t => coalesce(element_at(vm, t),
          raise_error(concat(lit("Bpe: out-of-vocabulary token: "), t))
            .cast("int")))
    }
    df.where(col(textCol).isNotNull)
      .withColumn("__ws",
        filter(TextAnalysis.words(col(textCol)), w => w =!= ""))
      .where(size(col("__ws")) > 0)
      .withColumn("token_ids", flatten(transform(col("__ws"), idsOfWord(_))))
      .select(col(idCol), size(col("token_ids")).cast("long").as("n_tokens"),
        col("token_ids"))
  }

  /** Detokenization — ids back to text: per doc, the id sequence resolves
    * through the INVERSE vocabulary (a literal map, model metadata —
    * no join, no state, streamable), tokens concatenate, and eow markers
    * become word boundaries. `detokenize(tokenIds(text))` reproduces
    * `text` with single spaces — runs of spaces are the tokenizer's one
    * documented loss (empty words are filtered at encode time) — which is
    * exactly what q239's round-trip oracle pins. An unknown id fails
    * loudly. Input is (`idCol`, `idsCol` array<int>). */
  def detokenize(df: DataFrame, idCol: String, idsCol: String,
      vocab: Map[String, Int]): DataFrame = {
    require(vocab.nonEmpty, "detokenize needs a non-empty vocabulary")
    val inv = typedLit(vocab.map { case (t, i) => i -> t })
    df.select(col(idCol),
      rtrim(translate(
        concat_ws("", transform(col(idsCol), i =>
          coalesce(element_at(inv, i),
            raise_error(concat(lit("Bpe: unknown token id: "),
              i.cast("string")))))),
        Eow, " ")).as("text_rebuilt"))
  }

  /** Per-document token-ID sequences — the last mile between tokenizer
    * training and sequence packing: a training pipeline ships id ARRAYS,
    * not token counts. Each doc's words resolve through the
    * [[wordTokenIds]] artifact (one hash join keyed by word — per-doc
    * payloads never shuffle more than their own ids) and the per-word id
    * arrays flatten in (word position, token position) order. Documents
    * with no words emit nothing ([[applyMerges]] parity); `n_tokens` =
    * size(token_ids) matches [[applyMerges]]'s count by construction
    * (law-tested).
    * @return (`idCol`, n_tokens long, token_ids array<int>) */
  def tokenIds(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], vocabDf: DataFrame): DataFrame = {
    val wt = wordTokenIds(df, textCol, merges, vocabDf)
    df.where(col(textCol).isNotNull)
      .select(col(idCol),
        posexplode(TextAnalysis.words(col(textCol))).as(Seq("__wp", "__w")))
      .where(col("__w") =!= "")
      .join(wt.withColumnRenamed("word", "__w"), Seq("__w"))
      .groupBy(col(idCol))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("__wp"), col("ids")))),
        s => s.getField("ids"))).as("token_ids"))
      .select(col(idCol), size(col("token_ids")).cast("long").as("n_tokens"),
        col("token_ids"))
  }
}
