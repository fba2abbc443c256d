package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextAnalysis.{hash48Sql, stopwords}

/** Deduplication operators for training-data pipelines, each designed for the
  * 100 TB path:
  *
  *  - exact:   hash-groupBy on the content key — one shuffle, map-side partial
  *             aggregation, AQE handles skew.
  *  - MinHash+LSH: shingle → k permuted min-hashes → band buckets → bucket
  *             equi-join. The join key (band, signature) replaces the O(n²)
  *             pair space with near-linear bucket joins; per-doc state is a
  *             fixed 16-long signature regardless of document size.
  *  - SimHash: 48-bit signature per doc, near-dups = small hamming distance;
  *             banding the bits gives the same bucket-join scale path.
  *  - n-gram Jaccard: exact verification of candidate pairs (run AFTER
  *             LSH blocking at scale; the all-pairs form here is for small
  *             blocked groups).
  *
  * All signature math is deterministic, expression-only, and mirrored 1:1 in
  * the DuckDB oracle SQL (SparkEntry.oracleSql).
  */
object Dedup {

  /** Exact dedup: one surviving (minimal) id per distinct key; groups with
    * duplicates are reported with their cardinality. */
  def exactDupGroups(df: DataFrame, idCol: String, key: Column): DataFrame =
    df.groupBy(key.as("dup_key"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** 3-word shingles (1-based element_at to mirror DuckDB list indexing);
    * documents shorter than 3 words fall back to the whole text as a single
    * shingle (Spark's `sequence(1,0)` would DESCEND, DuckDB's would be empty —
    * both sides guard explicitly). */
  def shingleSql(textExpr: String): String =
    s"""CASE WHEN size(split($textExpr, ' ')) >= 3
       |  THEN transform(sequence(1, size(split($textExpr, ' ')) - 2),
       |       i -> concat_ws(' ', element_at(split($textExpr, ' '), i),
       |                           element_at(split($textExpr, ' '), i + 1),
       |                           element_at(split($textExpr, ' '), i + 2)))
       |  ELSE array($textExpr) END""".stripMargin

  val MinhashPrime = 2147483647L // 2^31 - 1; (a*h48 + b) stays < 2^63

  /** MinHash signature columns mh_0..mh_{numPerm-1} for a text column.
    * Permutation p: h ↦ (a_p·h + b_p) mod P with a_p = 2p+1, b_p = 10007p+1. */
  def minhashCols(textExpr: String, numPerm: Int): Seq[Column] = {
    val hashes = s"transform(__shingles, s -> ${hash48Sql("s")})"
    (0 until numPerm).map { p =>
      val a = 2L * p + 1
      val b = 10007L * p + 1
      expr(s"array_min(transform($hashes, h -> ($a * h + $b) % $MinhashPrime))").as(s"mh_$p")
    }
  }

  /** Doc → MinHash signature (numPerm minhashes). */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String, numPerm: Int = 16): DataFrame =
    df.withColumn("__shingles", expr(shingleSql(textCol)))
      .select(col(idCol) +: minhashCols(textCol, numPerm): _*)

  /** LSH candidate pairs: split the signature into `bands` bands of
    * numPerm/bands rows, bucket-join docs sharing any band signature.
    * Returns distinct (id_a, id_b) with id_a < id_b. */
  def minhashCandidatePairs(
      df: DataFrame, idCol: String, textCol: String,
      numPerm: Int = 16, bands: Int = 4): DataFrame = {
    val rows = numPerm / bands
    val sigs = minhashSignatures(df, idCol, textCol, numPerm)
    val bandCols = (0 until bands).map { b =>
      val sig = concat_ws("-", (0 until rows).map(r => col(s"mh_${b * rows + r}")): _*)
      struct(lit(b).as("band"), sig.as("sig"))
    }
    val buckets = sigs
      .select(col(idCol), explode(array(bandCols: _*)).as("bk"))
      .select(col(idCol), col("bk.band").as("band"), col("bk.sig").as("sig"))
    val a = buckets.as("a")
    val b = buckets.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
  }

  /** 48-bit SimHash over the word bag: bit b is set iff
    * Σ_words (±1 by word-hash bit b) > 0. Pure nested higher-order
    * expressions — no UDF, no shuffle. */
  def simhash(textExpr: String, bits: Int = 48): Column = {
    val wordHashes = s"transform(split($textExpr, ' '), w -> ${hash48Sql("w")})"
    expr(
      s"""aggregate(sequence(0, ${bits - 1}), CAST(0 AS BIGINT), (acc, b) ->
         |  acc + CASE WHEN aggregate($wordHashes, CAST(0 AS BIGINT),
         |                  (s, h) -> s + (2 * (shiftright(h, b) & 1) - 1)) > 0
         |             THEN shiftleft(CAST(1 AS BIGINT), b) ELSE CAST(0 AS BIGINT) END)
         |""".stripMargin)
  }

  /** Exact pairwise n-gram Jaccard similarity within blocking groups.
    * `blockCols` bound the pair space (at scale: feed LSH candidates instead). */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      blockCols: Seq[String], minJaccard: Double): DataFrame = {
    val withShingles = df.select(
      (col(idCol) +: blockCols.map(col)) :+
        array_distinct(expr(shingleSql(textCol))).as("sh"): _*)
    val a = withShingles.as("a")
    val b = withShingles.as("b")
    val joinCond = blockCols
      .map(c => col(s"a.$c") === col(s"b.$c"))
      .reduce(_ && _) && col(s"a.$idCol") < col(s"b.$idCol")
    val inter = size(array_intersect(col("a.sh"), col("b.sh"))).cast("long")
    val uni = (size(col("a.sh")) + size(col("b.sh"))).cast("long") - inter
    a.join(b, joinCond)
      .select(
        col(s"a.$idCol").as("id_a"),
        col(s"b.$idCol").as("id_b"),
        (inter.cast("double") / uni).as("jaccard"))
      .where(col("jaccard") >= minJaccard)
  }
}
