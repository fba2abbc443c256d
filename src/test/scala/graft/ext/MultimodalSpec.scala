package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ext.Multimodal.{DecodedImage, MediaRow}

/** The REAL image codec path (javax.imageio — PNG encode/decode round
  * trips losslessly, so decoded features are exactly the generation
  * formula) plus its corrupt-payload skip-and-flag contract. The stub
  * codec family (audio/video) is covered in PipelineSpec. */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def formulaSum(id: Long, w: Int, h: Int): Long =
    (for (y <- 0 until h; x <- 0 until w)
      yield Multimodal.synthPixel(id, x, y).toLong).sum

  test("PNG encode → ImageIO decode round trip returns the exact pixel formula") {
    val bytes = Multimodal.synthPngBytes(7L, 5, 4)
    // a real PNG: magic header present
    (bytes(1) & 0xff, bytes(2) & 0xff, bytes(3) & 0xff) shouldBe ((0x50, 0x4e, 0x47))
    val d = Multimodal.decodeImage(MediaRow(7L, bytes, "image/png"))
    d shouldBe DecodedImage(7L, decodeOk = true, 5, 4, 1, formulaSum(7L, 5, 4))
  }

  test("undecodable payloads flag instead of failing the batch") {
    Multimodal.decodeImage(MediaRow(1L, "notanimage".getBytes("UTF-8"), "image/png")) shouldBe
      DecodedImage(1L, decodeOk = false, 0, 0, 0, 0L)
    Multimodal.decodeImage(MediaRow(2L, Array.empty[Byte], "image/png")) shouldBe
      DecodedImage(2L, decodeOk = false, 0, 0, 0, 0L)
    // truncated real PNG (header survives, data does not): still a flag row
    val truncated = Multimodal.synthPngBytes(3L, 6, 6).take(20)
    Multimodal.decodeImage(MediaRow(3L, truncated, "image/png")).decodeOk shouldBe false
  }

  test("distributed synthesize → decode matches the formula per row, payloads dropped") {
    val specs = (0L until 20L).map(i =>
      (i, 4 + (i % 5).toInt, 3 + (i % 4).toInt)).toDF("id", "w", "h")
    val out = Multimodal.decodeImages(Multimodal.synthesizePngs(specs).toDF())
      .orderBy("id").collect()
    out should have size 20
    out.foreach { d =>
      val (w, h) = (4 + (d.id % 5).toInt, 3 + (d.id % 4).toInt)
      d shouldBe DecodedImage(d.id, decodeOk = true, w, h, 1, formulaSum(d.id, w, h))
    }
    // feature rows carry no payload column — nothing heavy can shuffle
    out.head.productArity shouldBe 6
  }

  test("real resize: decode → NN resample → re-encode → decode returns the exact index mapping") {
    val src = MediaRow(11L, Multimodal.synthPngBytes(11L, 8, 6), "image/png")
    val r = Multimodal.resizeImageNearest(src, 4, 3)
    (r.width, r.height) shouldBe ((4, 3))
    val d = Multimodal.decodeImage(MediaRow(r.id, r.payload, r.mimeType))
    val expected = (for (y <- 0 until 3; x <- 0 until 4)
      yield Multimodal.synthPixel(11L, x * 8 / 4, y * 6 / 3).toLong).sum
    d shouldBe DecodedImage(11L, decodeOk = true, 4, 3, 1, expected)
    // corrupt source flags through, never throws
    Multimodal.resizeImageNearest(
      MediaRow(12L, "junk".getBytes("UTF-8"), "image/png"), 4, 3).width shouldBe 0
    an[IllegalArgumentException] should be thrownBy
      Multimodal.resizeImageNearest(src, 0, 3)
  }
}
