package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class QuantizeSpec extends SparkTestBase {
  import spark.implicits._

  test("int8 quantization: codes bounded, error bounded by scale/2, exact at extremes") {
    val df = Seq((1L, Array(1.0f, -0.5f, 0.25f, 0.0f))).toDF("id", "v")
    val scale = Quantize.int8Scale(col("v"))
    val out = df.select(
      scale.as("scale"),
      Quantize.int8Codes(col("v"), scale).as("codes"),
      Quantize.maxAbsError(col("v"), Quantize.int8Codes(col("v"), scale), scale).as("err"))
      .collect().head
    val s = out.getDouble(0)
    s shouldBe (1.0 / 127.0 +- 1e-15)
    val codes = out.getSeq[Byte](1)
    codes.head shouldBe 127.toByte // max element is exact
    codes(3) shouldBe 0.toByte
    all(codes.map(_.toInt.abs)) should be <= 127
    out.getDouble(2) should be <= s / 2 + 1e-15
  }

  test("zero vector quantizes to scale 0 and all-zero codes without NaN") {
    val df = Seq((1L, Array(0.0f, 0.0f))).toDF("id", "v")
    val scale = Quantize.int8Scale(col("v"))
    val out = df.select(scale, Quantize.int8Codes(col("v"), scale)).collect().head
    out.getDouble(0) shouldBe 0.0
    out.getSeq[Byte](1).toSeq shouldBe Seq(0.toByte, 0.toByte)
  }

  test("dequantized reconstruction keeps cosine close to 1 on real-ish vectors") {
    val rnd = new scala.util.Random(3)
    val df = (1L to 20L).map(i => (i, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
      .toDF("id", "v")
    val scale = Quantize.int8Scale(col("v"))
    val codes = Quantize.int8Codes(col("v"), scale)
    val cosines = df.select(
      Similarity.cosine(col("v"), Quantize.dequantize(codes, scale))).collect()
      .map(_.getDouble(0))
    all(cosines) should be >= 0.999
  }
}
