package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class WordpieceSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "unhappy unhappy unfit fit happy"),
    (2L, "fit unfit happy a")).toDF("doc_id", "text")

  test("greedy longest-match-first with explicit piece sets") {
    val out = Wordpiece.tokenTableWith(docs, "text",
        initPieces = Set("un", "unha", "fit", "happy", "a", "u", "h", "f"),
        contPieces = Set("ppy", "fit", "happy", "p", "y", "t", "i", "n", "a", "h"),
        maxLen = 4)
      .orderBy("word", "piece_idx").collect()
      .groupBy(_.getString(0)).map { case (w, rs) =>
        w -> rs.sortBy(_.getInt(1)).map(_.getString(2)).toSeq }
    // 'unhappy': longest initial match is 'unha' (len 4 beats 'un'),
    // then the longest continuation 'ppy' (beats the singles)
    out("unhappy") shouldBe Seq("unha", "##ppy")
    out("unfit") shouldBe Seq("un", "##fit")
    // maxLen = 4 caps the match: 'happy' (len 5) can never match whole,
    // even though it sits in the piece set
    out("happy") shouldBe Seq("h", "##a", "##ppy")
    out("a") shouldBe Seq("a")
  }

  test("a corpus-derived vocabulary tokenizes its own corpus totally, round-trip exact") {
    val out = Wordpiece.tokenTable(docs, "text", maxLen = 4, topK = 10)
      .orderBy("word", "piece_idx").collect()
    out.map(_.getString(2)) should not contain Wordpiece.Unk
    val rebuilt = out.groupBy(_.getString(0)).map { case (w, rs) =>
      w -> rs.sortBy(_.getInt(1)).map(_.getString(2).stripPrefix("##")).mkString }
    rebuilt.foreach { case (w, r) => r shouldBe w }
  }

  test("an uncoverable word emits one [UNK] and stops") {
    val oov = Seq((1L, "zzz")).toDF("doc_id", "text")
    val out = Wordpiece.tokenTableWith(oov, "text",
        initPieces = Set("a"), contPieces = Set("a"), maxLen = 4)
      .collect().map(r => (r.getInt(1), r.getString(2)))
    out.toSeq shouldBe Seq((0, Wordpiece.Unk))
  }

  test("tokenizeRowwise ≡ per-word segmentation stitched in word order") {
    val init = Set("un", "unha", "fit", "a", "u", "h", "f")
    val cont = Set("ppy", "fit", "p", "y", "t", "i", "n", "a", "h")
    val rows = Wordpiece.tokenizeRowwise(docs, "doc_id", "text", init, cont, maxLen = 4)
      .where(col("doc_id") === 1L)
      .orderBy("pos").collect().map(r => (r.getInt(1), r.getString(2)))
    // "unhappy unhappy unfit fit happy" — positions run across words
    rows.map(_._2).toSeq shouldBe Seq(
      "unha", "##ppy", "unha", "##ppy", "un", "##fit", "fit",
      "h", "##a", "##ppy")
    rows.map(_._1).toSeq shouldBe (0 until 10)
  }

  test("charFallback makes segmentation TOTAL: OOV words round-trip losslessly") {
    // 'zzz' is uncoverable by the piece sets; the dead-end form drops its
    // tail, the fallback form emits raw chars and concatenates back
    val oov = Seq((1L, "zzz fit azb")).toDF("doc_id", "text")
    val init = Set("a", "fit", "f")
    val cont = Set("fit", "i", "t", "b")
    val out = Wordpiece.tokenizeRowwise(oov, "doc_id", "text", init, cont,
        maxLen = 4, charFallback = true)
      .orderBy("pos").collect().map(_.getString(2))
    out should not contain Wordpiece.Unk
    // 'azb': 'a' matches init, 'z' falls back as '##z', 'b' matches cont
    out.toSeq shouldBe Seq("z", "##z", "##z", "fit", "a", "##z", "##b")
    // lossless: strip ## and concatenate per word ≡ the source words
    val table = Wordpiece.tokenTableWith(oov, "text", init, cont,
        maxLen = 4, charFallback = true)
      .orderBy("word", "piece_idx").collect()
    val rebuilt = table.groupBy(_.getString(0)).map { case (w, rs) =>
      w -> rs.sortBy(_.getInt(1)).map(_.getString(2).stripPrefix("##")).mkString }
    rebuilt.foreach { case (w, r) => r shouldBe w }
  }

  test("segmentWord is the ONE loop: rowwise ≡ stitched holds structurally for both modes") {
    val init = Set("un", "fit", "a", "u", "h", "f")
    val cont = Set("ppy", "fit", "p", "y", "t", "i", "n", "a", "h")
    for (fb <- Seq(false, true)) {
      val viaTable = Wordpiece.tokenTableWith(docs, "text", init, cont,
          maxLen = 4, charFallback = fb)
        .orderBy("word", "piece_idx").collect()
        .groupBy(_.getString(0)).map { case (w, rs) =>
          w -> rs.sortBy(_.getInt(1)).map(_.getString(2)).toList }
      viaTable.foreach { case (w, pieces) =>
        Wordpiece.segmentWord(w, init, cont, 4, fb) shouldBe pieces
      }
    }
  }

  test("vocab: singles always present, multi-char pieces capped at topK per side") {
    val v = Wordpiece.vocab(docs, "text", maxLen = 4, topK = 2).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val initSingles = v.collect { case ("init", p) if p.length == 1 => p }.toSet
    initSingles shouldBe Set("u", "f", "h", "a") // first chars of the dict
    v.count { case (s, p) => s == "init" && p.length >= 2 } shouldBe 2
    v.count { case (s, p) => s == "cont" && p.length >= 2 } shouldBe 2
  }
}
