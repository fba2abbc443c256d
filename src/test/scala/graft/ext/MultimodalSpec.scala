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

  test("WAV encode → AudioSystem decode round trip returns the exact sample formula") {
    import Multimodal._
    val wav = synthWavBytes(7L, 300, 16000)
    val d = decodeWav(MediaRow(7L, wav, "audio/wav"))
    d.decodeOk shouldBe true
    (d.sampleRate, d.nChannels, d.bitsPerSample, d.nSamples) shouldBe ((16000, 1, 16, 300L))
    val samples = (0L until 300L).map(i => synthSample(7L, i))
    d.peakAbs shouldBe samples.map(s => math.abs(s.toLong)).max
    d.sumAbs shouldBe samples.map(s => math.abs(s.toLong)).sum
    // corrupt payload flags, never throws
    decodeWav(MediaRow(8L, "junk".getBytes("UTF-8"), "audio/wav")).decodeOk shouldBe false
    decodeWav(MediaRow(9L, Array.empty[Byte], "audio/wav")).decodeOk shouldBe false
  }

  test("frameEnergies: exact per-frame energy, ragged tail, corrupt emits nothing") {
    import Multimodal._
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val media = Seq(
      MediaRow(1L, synthWavBytes(1L, 300, 8000), "audio/wav"),
      MediaRow(2L, "junk".getBytes("UTF-8"), "audio/wav")).toDF()
    val frames = frameEnergies(media, 128).collect().sortBy(f => (f.id, f.frameIndex))
    frames.map(_.id).distinct.toSeq shouldBe Seq(1L) // corrupt emitted nothing
    frames.map(_.nSamples).toSeq shouldBe Seq(128L, 128L, 44L) // ragged tail exact
    val samples = (0L until 300L).map(i => math.abs(synthSample(1L, i).toLong))
    frames.map(_.sumAbs).toSeq shouldBe Seq(
      samples.slice(0, 128).sum, samples.slice(128, 256).sum, samples.slice(256, 300).sum)
    an[IllegalArgumentException] should be thrownBy frameEnergies(media, 0)
  }

  test("averageHash: exact, deterministic, in-JVM-replayable; corrupt flags") {
    import Multimodal._
    // independent in-JVM replay of the aHash arithmetic from the formula
    def refHash(id: Long, w: Int, h: Int, tweak: Boolean): (Long, Long) = {
      def px(x: Int, y: Int) = {
        val b = synthPixel(id, x, y)
        if (tweak && x == 0 && y == 0) (b + 1) % 256 else b
      }
      val cs = new Array[Long](64); val cp = new Array[Long](64)
      var ts = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val k = (y * 8 / h) * 8 + x * 8 / w
        cs(k) += px(x, y); cp(k) += 1; ts += px(x, y)
      }
      val tp = w.toLong * h
      var hi = 0L; var lo = 0L
      for (k <- 0 until 64 if cs(k) * tp > ts * cp(k))
        if (k < 32) hi |= 1L << (31 - k) else lo |= 1L << (63 - k)
      (hi, lo)
    }
    def variantPng(id: Long, w: Int, h: Int, tweak: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w) {
        val b = synthPixel(id, x, y)
        img.getRaster.setSample(x, y, 0,
          if (tweak && x == 0 && y == 0) (b + 1) % 256 else b)
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    for (id <- 1L to 8L; (w, h) <- Seq((8, 8), (10, 9), (5, 7), (12, 11))) {
      val got = averageHash(MediaRow(id, variantPng(id, w, h, tweak = false), "image/png"))
      withClue(s"id=$id ${w}x$h") {
        (got.hashHi, got.hashLo) shouldBe refHash(id, w, h, tweak = false)
        got.hashOk shouldBe true
        // both halves fit 32 unsigned bits (the oracle-engine contract)
        got.hashHi should (be >= 0L and be < (1L << 32))
        got.hashLo should (be >= 0L and be < (1L << 32))
      }
      // exact duplicate payload ⇒ identical hash
      val again = averageHash(MediaRow(id + 100, variantPng(id, w, h, tweak = false), "image/png"))
      (again.hashHi, again.hashLo) shouldBe ((got.hashHi, got.hashLo))
    }
    averageHash(MediaRow(1L, "junk".getBytes("UTF-8"), "image/png")).hashOk shouldBe false
  }

  test("imageDupPairs: banded join == brute force at hamming <= 3; corrupt matches nothing") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val specs = (0L until 60L).map(i =>
      Multimodal.SynthVariantSpec(i, i / 2, (8 + (i / 2) % 5).toInt,
        (8 + (i / 2) % 4).toInt, i % 2 == 1)).toDF()
    val media = Multimodal.synthesizePngVariants(specs).toDF()
      .withColumn("payload",
        when(col("id") % 25 === 0, lit("junk".getBytes("UTF-8")))
          .otherwise(col("payload")))
    val hashes = Multimodal.averageHashes(media).toDF().cache()
    val banded = Dedup.imageDupPairs(hashes, "id", "hashHi", "hashLo", 3)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // brute force over the ok rows
    val ok = hashes.where(col("hashOk")).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("hashHi"), r.getAs[Long]("hashLo")))
    val brute = (for {
      (ia, hia, loa) <- ok; (ib, hib, lob) <- ok if ia < ib
      d = java.lang.Long.bitCount(hia ^ hib) + java.lang.Long.bitCount(loa ^ lob)
      if d <= 3
    } yield (ia, ib, d.toLong)).sortBy(t => (t._1, t._2)).toSeq
    hashes.unpersist()
    banded shouldBe brute
    // corrupt ids (0, 25, 50) appear in no pair
    banded.flatMap(t => Seq(t._1, t._2)).toSet.intersect(Set(0L, 25L, 50L)) shouldBe empty
    an[IllegalArgumentException] should be thrownBy
      Dedup.imageDupPairs(hashes, "id", "hashHi", "hashLo", 4)
  }
}
