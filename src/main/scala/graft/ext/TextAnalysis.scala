package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: language
  * ID, quality scoring, token counting, document fingerprinting. All pure
  * Catalyst expressions (no UDFs) — they run inside codegen, scale linearly
  * with the scan, and need no shuffle at all (per-row), so 100 TB is just
  * more partitions.
  */
object TextAnalysis {

  /** Deterministic 48-bit hash of a string, shared with the DuckDB oracles:
    * the first 12 hex digits of md5, as a BIGINT (always positive, < 2^48 —
    * headroom for `(a*h+b) % p` permutation arithmetic without 64-bit
    * overflow). */
  def hash48(c: Column): Column =
    expr_hash48(c)

  private def expr_hash48(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 12), 16, 10).cast("long")

  /** SQL-text form of [[hash48]] for use inside higher-order-function lambdas. */
  def hash48Sql(e: String): String =
    s"CAST(conv(substr(md5(CAST($e AS BINARY)),1,12),16,10) AS BIGINT)"

  /** Whitespace tokens. */
  def words(c: Column): Column = split(c, " ")

  /** BPE-ish regex token count: runs of letters, runs of digits, or single
    * other non-space characters — the standard pre-tokenizer shape. */
  def regexTokenCount(textCol: String): Column =
    expr(s"size(regexp_extract_all($textCol, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))")

  /** Shared stopword list (quality + language scoring). */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  /** Quality-scoring columns over a text column: token count, distinct-token
    * ratio, stopword ratio, average word length. Integer-valued arithmetic
    * until the final double divisions, so results are bit-deterministic. */
  def qualityColumns(textCol: String, nCharsCol: String): Seq[Column] = {
    val w = words(col(textCol))
    val nWords = size(w).cast("long")
    val nDistinct = size(array_distinct(w)).cast("long")
    val stopArr = array(stopwords.map(lit): _*)
    val nStop = size(filter(w, x => array_contains(stopArr, x))).cast("long")
    Seq(
      nWords.as("n_words"),
      nDistinct.as("n_distinct"),
      nStop.as("n_stopwords"),
      (nDistinct.cast("double") / nWords).as("distinct_ratio"),
      (nStop.cast("double") / nWords).as("stopword_ratio"),
      ((col(nCharsCol) - (nWords - 1)).cast("double") / nWords).as("avg_word_len"))
  }

  /** N-gram-heuristic language ID: score marker-token hits per language and
    * take the argmax (ties broken by language code order). Marker lists are a
    * deterministic heuristic profile, not a model — at 100 TB this is a
    * per-row codegen'd expression with zero state. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and"),
    "de" -> Seq("der", "die", "das", "und"),
    "es" -> Seq("el", "la", "los", "que"),
    "fr" -> Seq("le", "la", "les", "et"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4"))

  def langScores(textCol: String): Seq[Column] = {
    val w = words(col(textCol))
    langMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      val arr = array(markers.map(lit): _*)
      size(filter(w, x => array_contains(arr, x))).cast("long").as(s"score_$lang")
    }
  }

  /** Predicted language = argmax score, ties → lexicographically first code,
    * all-zero → "und" (undetermined). */
  def predictedLang(textCol: String): Column = {
    val scored = langMarkers.toSeq.sortBy(_._1)
    val best = scored.map { case (lang, markers) =>
      val arr = array(markers.map(lit): _*)
      struct(size(filter(words(col(textCol)), x => array_contains(arr, x))).as("s"), lit(lang).as("l"))
    }
    // greatest(struct) picks max score; for equal scores the LATER language
    // code wins under struct comparison, so compare on (score, reversed code)
    // is avoided by folding left with strict > (first wins ties).
    val folded = best.reduceLeft { (acc, c) =>
      when(c.getField("s") > acc.getField("s"), c).otherwise(acc)
    }
    when(folded.getField("s") > 0, folded.getField("l")).otherwise(lit("und"))
  }

  /** Content fingerprint: md5 of the lowercased text — exact-dup key. */
  def fingerprintExact(c: Column): Column = md5(lower(c).cast("binary"))

  /** Bag-of-words fingerprint: md5 over the sorted distinct lowercased tokens —
    * catches reorderings/duplicated-word edits (near-dup key). */
  def fingerprintBag(c: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(split(lower(c), " ")))).cast("binary"))
}
