package graft.ext

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

/** WordPiece-style tokenization (the BERT family's greedy
  * longest-match-first subword scheme) — the second production tokenizer
  * family next to [[Bpe]]: where BPE applies a learned MERGE sequence,
  * WordPiece segments each word against a piece VOCABULARY, always taking
  * the longest vocabulary piece that matches at the current position,
  * with continuation pieces spelled `##piece`.
  *
  * The vocabulary here is derived deterministically from the corpus
  * (occurrence-weighted substring counts, top-K per side + every single
  * character for totality) rather than likelihood-trained — the point of
  * the module is the APPLY semantics and its engine-exact replay; swap in
  * any externally trained piece list through the same sets.
  *
  * Scale shape: everything runs over the DISTINCT WORD DICTIONARY
  * ([[Bpe]]'s one-scan discipline — the corpus pays one explode+count no
  * matter the alphabet); the piece vocabulary is model metadata (top-K +
  * alphabet), broadcast once per executor; the greedy loop is bounded by
  * word length and runs as a typed mapPartitions because a
  * data-dependent longest-match loop is inexpressible as a fixed
  * Catalyst expression (the [[Bpe.RankPathMaxMerges]] argument).
  */
object Wordpiece {

  /** Marker emitted for a word (suffix) the vocabulary cannot cover —
    * unreachable when the vocabulary was derived from the same corpus
    * (every character of every dict word is a single-char piece by
    * construction), reachable for out-of-corpus words. */
  val Unk = "[UNK]"

  /** The distinct word dictionary (word, occurrence cnt) — the one corpus
    * scan every stage here works from. */
  def wordDict(df: DataFrame, textCol: String): DataFrame =
    df.where(col(textCol).isNotNull)
      .select(explode(TextAnalysis.words(col(textCol))).as("word"))
      .where(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** The derived piece vocabulary: for each side, the `topK`
    * occurrence-weighted substrings of length ≥ 2 (count desc, piece asc)
    * plus EVERY single character seen on that side (word-initial
    * characters for `init`, characters at positions ≥ 2 for `cont`) so
    * tokenization of the source corpus is total.
    * @return (side 'init'|'cont', piece, cnt) */
  def vocab(df: DataFrame, textCol: String,
      maxLen: Int = 4, topK: Int = 50): DataFrame = {
    require(maxLen >= 1, s"maxLen must be >= 1, got $maxLen")
    require(topK >= 0, s"topK must be >= 0, got $topK")
    val dict = wordDict(df, textCol)
    val w = col("word")
    val init = dict
      .select(col("cnt"), explode(transform(
        sequence(lit(1), least(lit(maxLen), length(w))),
        l => w.substr(lit(1), l))).as("piece"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("cnt"))
    // sequence(2, n) REVERSES when n < 2 — keep single-char words out
    val cont = dict.where(length(w) >= 2)
      .select(col("cnt"), explode(flatten(transform(
        sequence(lit(2), length(w)),
        p => transform(
          sequence(lit(1), least(lit(maxLen), length(w) - p + 1)),
          l => w.substr(p, l))))).as("piece"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("cnt"))
    def pick(c: DataFrame, side: String) = c
      .where(length(col("piece")) >= 2)
      .orderBy(col("cnt").desc, col("piece")).limit(topK)
      .unionByName(c.where(length(col("piece")) === 1))
      .select(lit(side).as("side"), col("piece"), col("cnt"))
    pick(init, "init").unionByName(pick(cont, "cont"))
  }

  /** The ONE greedy longest-match-first loop both the dictionary and
    * rowwise forms apply — shared so the `rowwise ≡ stitched` law is
    * structural, not tested-against. At each position the longest piece
    * (≤ maxLen) from the side's set wins (initial pieces bare,
    * continuation pieces matched bare and EMITTED as `##piece`). On a
    * miss:
    *  - `charFallback = false` (the classic dead-end): emit one [[Unk]]
    *    piece and stop — the word's tail is lost.
    *  - `charFallback = true` (the total serving form, mirroring
    *    [[Bpe]]'s byte fallback): emit the single character itself
    *    (`c` / `##c`) and continue, so concatenating the pieces with
    *    `##` stripped ALWAYS reproduces the word — a live stream keeps
    *    full fidelity on out-of-corpus words. */
  private[graft] def segmentWord(word: String, init: Set[String],
      cont: Set[String], maxLen: Int,
      charFallback: Boolean = false): List[String] = {
    val out = List.newBuilder[String]
    var pos = 0; var dead = false
    while (pos < word.length && !dead) {
      val first = pos == 0
      val set = if (first) init else cont
      var l = math.min(maxLen, word.length - pos)
      while (l >= 1 && !set.contains(word.substring(pos, pos + l))) l -= 1
      if (l < 1 && !charFallback) { out += Unk; dead = true }
      else {
        val take = math.max(l, 1) // l < 1 here only under charFallback
        val sub = word.substring(pos, pos + take)
        out += (if (first) sub else "##" + sub)
        pos += take
      }
    }
    out.result()
  }

  /** Greedy longest-match-first segmentation of every distinct corpus
    * word against piece sets (initial pieces bare, continuation pieces
    * matched bare and EMITTED as `##piece`). A word whose remainder
    * matches nothing emits one [[Unk]] piece and stops — unless
    * `charFallback` (see [[segmentWord]]).
    * @return (word, piece_idx 0-based, piece) */
  def tokenTableWith(df: DataFrame, textCol: String,
      initPieces: Set[String], contPieces: Set[String],
      maxLen: Int, charFallback: Boolean = false): DataFrame = {
    require(maxLen >= 1, s"maxLen must be >= 1, got $maxLen")
    val spark = df.sparkSession
    val initB = spark.sparkContext.broadcast(initPieces)
    val contB = spark.sparkContext.broadcast(contPieces)
    val schema = StructType(Seq(
      StructField("word", StringType, nullable = true),
      StructField("piece_idx", IntegerType, nullable = false),
      StructField("piece", StringType, nullable = true)))
    wordDict(df, textCol).select(col("word")).mapPartitions { it =>
      val init = initB.value; val cont = contB.value
      it.flatMap { r =>
        val word = r.getString(0)
        segmentWord(word, init, cont, maxLen, charFallback)
          .zipWithIndex.map { case (p, i) => Row(word, i, p) }
      }
    }(Encoders.row(schema)).toDF()
  }

  /** Rowwise greedy segmentation of whole documents — the SERVING form:
    * per row, whitespace words segment in order against the broadcast
    * piece sets and the pieces flatten to one (id, pos, piece) row per
    * piece with a per-document running position. STATELESS per row, so
    * it runs unchanged on a STREAMING DataFrame (the q238/q245 rowwise
    * discipline); the model rides a broadcast, never the plan.
    * @return (idCol long, pos 0-based int, piece) */
  def tokenizeRowwise(df: DataFrame, idCol: String, textCol: String,
      initPieces: Set[String], contPieces: Set[String],
      maxLen: Int, charFallback: Boolean = false): DataFrame = {
    require(maxLen >= 1, s"maxLen must be >= 1, got $maxLen")
    val spark = df.sparkSession
    val initB = spark.sparkContext.broadcast(initPieces)
    val contB = spark.sparkContext.broadcast(contPieces)
    val schema = StructType(Seq(
      StructField(idCol, org.apache.spark.sql.types.LongType, nullable = true),
      StructField("pos", IntegerType, nullable = false),
      StructField("piece", StringType, nullable = true)))
    df.where(col(textCol).isNotNull)
      .select(col(idCol).cast("long"), col(textCol))
      .mapPartitions { it =>
        val init = initB.value; val cont = contB.value
        it.flatMap { r =>
          val id = r.getLong(0)
          val words = r.getString(1).split(" ").iterator.filter(_.nonEmpty)
          val out = Seq.newBuilder[Row]
          var gpos = 0
          words.foreach { word =>
            segmentWord(word, init, cont, maxLen, charFallback).foreach { p =>
              out += Row(id, gpos, p); gpos += 1
            }
          }
          out.result()
        }
      }(Encoders.row(schema)).toDF()
  }

  /** Occurrence-weighted fertility (pieces per word) of the vocabulary
    * derived at `topK` — the economics gauge a tokenizer choice is made
    * on: how many pieces the average word occurrence costs as the
    * vocabulary shrinks. One row: (top_k, n_words, n_pieces, fertility).
    * Counts are exact BIGINTs; the one division is last. */
  def fertility(df: DataFrame, textCol: String,
      maxLen: Int, topK: Int): DataFrame = {
    val dict = wordDict(df, textCol)
    val pieces = tokenTable(df, textCol, maxLen, topK)
      .groupBy(col("word")).agg(count(lit(1)).as("__np"))
    dict.join(pieces, Seq("word"))
      .agg(sum(col("cnt")).as("n_words"),
        sum(col("cnt") * col("__np")).as("n_pieces"))
      .select(lit(topK).as("top_k"), col("n_words"), col("n_pieces"),
        (col("n_pieces").cast("double") / col("n_words")).as("fertility"))
  }

  /** [[vocab]] + [[tokenTableWith]] end to end: derive the piece
    * vocabulary from the corpus and segment its word dictionary. The
    * piece sets are model metadata (topK + alphabet per side), collected
    * by contract — the [[Bpe.learnAndTokenize]] shape. */
  def tokenTable(df: DataFrame, textCol: String,
      maxLen: Int = 4, topK: Int = 50): DataFrame = {
    val v = vocab(df, textCol, maxLen, topK)
      .select(col("side"), col("piece")).collect()
    val init = v.collect { case r if r.getString(0) == "init" => r.getString(1) }.toSet
    val cont = v.collect { case r if r.getString(0) == "cont" => r.getString(1) }.toSet
    tokenTableWith(df, textCol, init, cont, maxLen)
  }
}
