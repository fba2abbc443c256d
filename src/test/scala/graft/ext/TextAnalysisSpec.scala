package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  test("qualityColumns on a known sentence") {
    val text = "the cat and the hat" // 5 words, 4 distinct, 2 stopwords
    val df = Seq((text, text.length.toLong)).toDF("text", "n_chars")
    val r = df.select(TextAnalysis.qualityColumns("text", "n_chars"): _*).collect().head
    r.getLong(r.fieldIndex("n_words")) shouldBe 5L
    r.getLong(r.fieldIndex("n_distinct")) shouldBe 4L
    r.getLong(r.fieldIndex("n_stopwords")) shouldBe 3L // the, and, the
    r.getDouble(r.fieldIndex("distinct_ratio")) shouldBe 0.8
    r.getDouble(r.fieldIndex("stopword_ratio")) shouldBe 0.6
    // avg word len: (19 chars - 4 spaces) / 5 words = 3.0
    r.getDouble(r.fieldIndex("avg_word_len")) shouldBe 3.0
  }

  test("predictedLang picks the argmax language, und when no markers hit") {
    val df = Seq(
      "the quick fox and a dog of war",  // en markers
      "der hund und die katze",          // de markers
      "xyzzy plugh",                     // nothing
      "le chat the dog le la les et"     // fr wins 4 hits vs en 1
    ).toDF("text")
    val out = df.select(TextAnalysis.predictedLang("text")).as[String].collect().toSeq
    out shouldBe Seq("en", "de", "und", "fr")
  }

  test("predictedLang breaks score ties by first language code") {
    // "la" is a marker for both es and fr; score 1-1 -> es (first alphabetically among tied)
    val out = Seq("la paloma").toDF("text")
      .select(TextAnalysis.predictedLang("text")).as[String].collect().head
    out shouldBe "es"
  }

  test("regexTokenCount: letter runs, digit runs, single others") {
    val df = Seq("abc12 de!").toDF("text")
    // tokens: abc, 12, de, ! -> 4
    df.select(TextAnalysis.regexTokenCount("text")).collect().head.getInt(0) shouldBe 4
  }

  test("fingerprintBag is order- and duplication-insensitive, fingerprintExact is not") {
    val df = Seq(
      ("b a a c", "a b c shuffled"),
      ("a b c", "original")).toDF("text", "tag")
    val bags = df.select(TextAnalysis.fingerprintBag(col("text"))).as[String].collect()
    bags(0) shouldBe bags(1)
    val exact = df.select(TextAnalysis.fingerprintExact(col("text"))).as[String].collect()
    exact(0) should not be exact(1)
  }

  test("hash48 equals first 12 hex digits of md5 as a long") {
    val got = Seq("abc").toDF("s")
      .select(TextAnalysis.hash48(col("s"))).collect().head.getLong(0)
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest("abc".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    got shouldBe java.lang.Long.parseLong(hex, 16)
  }
}
