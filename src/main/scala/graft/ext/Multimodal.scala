package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column handling: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata alongside. The Spark-side plumbing —
  * schema, partition sizing, batch shape — is real. Codecs: PNG/JPEG decode
  * is REAL ([[decodeImage]], the JDK's own `javax.imageio` — no external
  * libraries), as are the perceptual hash ([[averageHash]]) and the WAV/PCM
  * audio family ([[decodeWav]]/[[frameEnergies]], the JDK's own
  * `javax.sound.sampled`); [[synthPngBytes]]/[[synthWavBytes]] generate
  * deterministic fixture payloads whose decoded features an oracle can
  * recompute arithmetically. The remaining STUBs are the formats whose
  * codecs genuinely don't exist in this environment — compressed
  * audio (mp3/ogg/aac) and video containers; at deployment, swap
  * `stubDecode` / `stubResize` / `stubFrameSample` for those codecs
  * keeping the signatures.
  *
  * Scale notes: payloads dominate row size, so (a) never shuffle the binary
  * column — derive features first, then drop it; (b) size
  * `spark.sql.files.maxPartitionBytes` so a partition of payloads fits the
  * executor; (c) feature extraction is mapPartitions-batched, amortizing any
  * codec init per partition, not per row.
  */
object Multimodal {

  // ImageIO by default spools EVERY read through a disk-cache temp file —
  // pure overhead (create + write + delete per image, and tmp-dir
  // contention in a long session: measured 2-3× per-image decode cost
  // late in a full bench run) for byte-array payloads that are already in
  // memory. GLOBAL EFFECT: `setUseCache(false)` mutates the JVM-wide
  // ImageIO default, affecting any other ImageIO user in the same JVM
  // (their reads switch to in-heap buffers too — a performance change,
  // not a behavior change). It is therefore NOT an object-init side
  // effect: the lazy guard below runs exactly once, the first time one of
  // THIS object's codec helpers actually touches ImageIO, and every
  // ImageIO call here routes through [[imageIoRead]]/[[imageIoWritePng]]
  // so the guard cannot be bypassed.
  private lazy val imageIoNoDiskCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** All ImageIO reads in this object go through here: forces the one-time
    * disk-cache disable, then decodes the in-memory payload. Returns null
    * on any undecodable payload (NonFatal, not just IOException: ImageIO
    * plugins throw RuntimeExceptions — CMMException,
    * IllegalArgumentException, … — on malformed-but-recognized payloads,
    * and the contract is that a corrupt blob flags, never kills a batch). */
  private def imageIoRead(payload: Array[Byte]): java.awt.image.BufferedImage = {
    imageIoNoDiskCache
    try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    catch { case scala.util.control.NonFatal(_) => null }
  }

  /** All ImageIO writes in this object go through here (same guard). */
  private def imageIoWritePng(img: java.awt.image.BufferedImage,
      out: java.io.OutputStream): Unit = {
    imageIoNoDiskCache
    javax.imageio.ImageIO.write(img, "png", out)
  }

  final case class MediaRow(id: Long, payload: Array[Byte], mimeType: String)
  final case class MediaFeatures(
      id: Long, mimeType: String, nBytes: Long,
      width: Int, height: Int, brightness: Double)

  /** Wrap a string column as a binary payload column + typed metadata —
    * the ingest shape for media blobs arriving through any source. */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String, mime: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      // a null/missing blob becomes an EMPTY payload: the typed MediaRow
      // encoder rejects nulls, and the codec stubs (like any real codec
      // batch) must not NPE mid-partition on one bad row
      coalesce(col(payloadCol).cast("binary"), lit(Array.empty[Byte])).as("payload"),
      lit(mime).as("mimeType"))
      .where(col("id").isNotNull) // an unidentifiable blob has no join key

  /** ==== STUB ==== deterministic fake decoder standing in for a real codec.
    * Derives "width/height/brightness" purely from byte statistics so tests
    * are reproducible. A real implementation decodes `payload` with an image
    * library; ONLY this function changes. */
  def stubDecode(row: MediaRow): MediaFeatures = {
    val n = row.payload.length
    var sum = 0L
    var i = 0
    while (i < n) { sum += (row.payload(i) & 0xff); i += 1 }
    MediaFeatures(
      id = row.id,
      mimeType = row.mimeType,
      nBytes = n.toLong,
      width = 1 + (n % 64),
      height = 1 + (n % 48),
      brightness = if (n == 0) 0.0 else sum.toDouble / n)
  }

  /** Partition-batched feature extraction: the real plumbing (encoders, batch
    * iteration, payload dropped from the output so downstream stages shuffle
    * only small feature rows). */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows => rows.map(stubDecode) }
  }

  final case class ResizedMedia(
      id: Long, mimeType: String, width: Int, height: Int, payload: Array[Byte])
  final case class FrameSample(id: Long, frameIndex: Int, payload: Array[Byte])

  /** ==== STUB ==== resize: a real implementation decodes, scales, and
    * re-encodes; the stub derives a deterministic payload of the target
    * geometry from the source bytes so downstream schema/partitioning/size
    * behavior is exercised honestly (output rows shrink to ~w·h bytes — the
    * property that matters for shuffle planning). */
  def stubResize(row: MediaRow, w: Int, h: Int): ResizedMedia = {
    val out = new Array[Byte](math.max(1, w * h / 8))
    var i = 0
    while (i < out.length) {
      out(i) = if (row.payload.isEmpty) 0 else row.payload(i % row.payload.length)
      i += 1
    }
    ResizedMedia(row.id, row.mimeType, w, h, out)
  }

  /** ==== STUB ==== frame sampling: a real implementation seeks n key frames;
    * the stub slices the payload into n deterministic chunks. 1→n row
    * generation through the typed API (`flatMap`), the real shape of a
    * video-frame extractor. */
  def stubFrameSample(row: MediaRow, n: Int): Iterator[FrameSample] = {
    val len = row.payload.length
    (0 until n).iterator.map { k =>
      val from = if (n == 0) 0 else (len.toLong * k / n).toInt
      val until = (len.toLong * (k + 1) / n).toInt
      FrameSample(row.id, k, java.util.Arrays.copyOfRange(row.payload, from, until))
    }
  }

  /** Partition-batched resize over the media table — payload-in, payload-out,
    * codec init amortized per partition. */
  def resize(media: DataFrame, w: Int, h: Int): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map(stubResize(_, w, h)))
  }

  /** Partition-batched frame sampling (1→n rows per media payload). */
  def sampleFrames(media: DataFrame, n: Int): Dataset[FrameSample] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.flatMap(stubFrameSample(_, n)))
  }

  /** Pure-expression metadata projection (no decode): byte length, head bytes
    * as hex, first byte — oracle-comparable, used by SparkEntry. */
  def metadataColumns(payloadExpr: String): Seq[org.apache.spark.sql.Column] = Seq(
    expr(s"CAST(octet_length(CAST($payloadExpr AS BINARY)) AS BIGINT)").as("n_bytes"),
    expr(s"hex(CAST(substr($payloadExpr, 1, 4) AS BINARY))").as("head_hex"),
    expr(s"CAST(ascii($payloadExpr) AS BIGINT)").as("first_byte"))

  // ------------------------------------------------- REAL codec (javax.imageio)

  final case class SynthSpec(id: Long, w: Int, h: Int)
  final case class DecodedImage(
      id: Long, decodeOk: Boolean, width: Int, height: Int,
      nBands: Int, pxSum: Long)

  /** Grayscale pixel formula the synthetic PNGs carry — FIXED so an oracle
    * can recompute the decoded pixel sum arithmetically:
    * px(id, x, y) = (id·31 + x·7 + y·13) mod 256. PNG is lossless, so the
    * encode→decode round trip returns these exact values. */
  def synthPixel(id: Long, x: Int, y: Int): Int =
    (((id * 31 + x * 7 + y * 13) % 256) + 256).toInt % 256

  /** Encode one deterministic grayscale PNG via the JDK's ImageIO — a real
    * codec, no external libraries. */
  def synthPngBytes(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, synthPixel(id, x, y)); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    imageIoWritePng(img, out)
    out.toByteArray
  }

  /** Partition-batched synthetic-PNG generation: (id, w, h) specs → media
    * rows with REAL image payloads. The fixture seam for the decode gate —
    * at deployment, payloads arrive from the ingest tier instead. */
  def synthesizePngs(specs: DataFrame): Dataset[MediaRow] = {
    val spark = specs.sparkSession
    import spark.implicits._
    specs.as[SynthSpec].mapPartitions(_.map(s =>
      MediaRow(s.id, synthPngBytes(s.id, s.w, s.h), "image/png")))
  }

  /** REAL image decode (the deployment replacement for [[stubDecode]],
    * same partition-batched shape): ImageIO sniffs and decodes the payload;
    * an undecodable payload yields a `decodeOk = false` row with zeroed
    * features instead of failing the batch — the skip-and-flag behavior a
    * production media pipeline needs, since one corrupt blob must never
    * kill a 100 TB scan. Output rows carry only small features (the
    * payload is dropped before any shuffle). */
  def decodeImage(row: MediaRow): DecodedImage = {
    val img = imageIoRead(row.payload)
    if (img == null) DecodedImage(row.id, decodeOk = false, 0, 0, 0, 0L)
    else {
      val (w, h) = (img.getWidth, img.getHeight)
      val raster = img.getRaster
      val bands = raster.getNumBands
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var b = 0
          while (b < bands) { sum += raster.getSample(x, y, b); b += 1 }
          x += 1
        }
        y += 1
      }
      DecodedImage(row.id, decodeOk = true, w, h, bands, sum)
    }
  }

  /** Partition-batched real decode over a media table (ImageIO init and
    * reader lookup amortize per partition, not per row). */
  def decodeImages(media: DataFrame): Dataset[DecodedImage] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map(decodeImage))
  }

  /** REAL image resize (the deployment replacement for [[stubResize]]):
    * ImageIO decode → explicit nearest-neighbor resample → PNG re-encode.
    * The source index mapping is exact integer arithmetic —
    * `sx = (x·srcW) div dstW` — so an oracle can recompute every resized
    * pixel from the generation formula; interpolating resizers (bilinear,
    * Lanczos) would be deployment-quality but not arithmetic-replayable.
    * Undecodable payloads flag (`resizeOk = false`, empty payload) instead
    * of failing the batch. Grayscale output (band 0) — the fixture model;
    * a multi-band deployment widens the inner loop, nothing else. */
  def resizeImageNearest(row: MediaRow, dw: Int, dh: Int): ResizedMedia = {
    require(dw > 0 && dh > 0, s"target geometry must be positive, got ${dw}x$dh")
    val img = imageIoRead(row.payload)
    if (img == null) ResizedMedia(row.id, row.mimeType, 0, 0, Array.empty[Byte])
    else {
      val (sw, sh) = (img.getWidth, img.getHeight)
      val src = img.getRaster
      val out = new java.awt.image.BufferedImage(
        dw, dh, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val dst = out.getRaster
      var y = 0
      while (y < dh) {
        val sy = y * sh / dh
        var x = 0
        while (x < dw) { dst.setSample(x, y, 0, src.getSample(x * sw / dw, sy, 0)); x += 1 }
        y += 1
      }
      val bytes = new java.io.ByteArrayOutputStream()
      imageIoWritePng(out, bytes)
      ResizedMedia(row.id, "image/png", dw, dh, bytes.toByteArray)
    }
  }

  /** Partition-batched real resize over a media table — decode, resample,
    * re-encode per row with codec init amortized per partition. Output
    * payloads shrink to the target geometry (the property that matters for
    * shuffle planning downstream). */
  def resizeImages(media: DataFrame, dw: Int, dh: Int): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map(resizeImageNearest(_, dw, dh)))
  }

  final case class ImageHash(id: Long, hashOk: Boolean, hashHi: Long, hashLo: Long)

  /** REAL perceptual average-hash (aHash — the standard 8×8, 64-bit image
    * fingerprint near-dup pipelines index): ImageIO decode → pixels binned
    * onto an 8×8 grid by the exact integer mapping `g = p·8 div extent`
    * (sub-8px images leave some cells empty; an empty cell is a 0 bit) →
    * bit k set iff its cell mean exceeds the image mean, decided by integer
    * CROSS-MULTIPLICATION `cellSum·totalPx > totalSum·cellPx` so the hash
    * is bit-exact and an oracle can replay it from the pixel formula (the
    * q214 discipline; safe while pixels ≤ ~1.9e8 — cellSum·totalPx ≤
    * 255·px², far above any in-memory ImageIO frame). The 64 bits pack
    * row-major (gy, gx), MSB-first, as two NON-NEGATIVE 32-bit halves —
    * full signed-64 packing would overflow the oracle engine's left shift.
    * Undecodable payloads flag `hashOk = false` (zero hash) instead of
    * failing the batch. Grayscale band 0 — the fixture model. */
  def averageHash(row: MediaRow): ImageHash = {
    val img = imageIoRead(row.payload)
    if (img == null) ImageHash(row.id, hashOk = false, 0L, 0L)
    else {
      val (w, h) = (img.getWidth, img.getHeight)
      val raster = img.getRaster
      val cellSum = new Array[Long](64)
      val cellPx = new Array[Long](64)
      var totalSum = 0L
      var y = 0
      while (y < h) {
        val gy = y * 8 / h
        var x = 0
        while (x < w) {
          val k = gy * 8 + x * 8 / w
          val p = raster.getSample(x, y, 0)
          cellSum(k) += p
          cellPx(k) += 1
          totalSum += p
          x += 1
        }
        y += 1
      }
      val totalPx = w.toLong * h
      var hi = 0L
      var lo = 0L
      var k = 0
      while (k < 64) {
        if (cellSum(k) * totalPx > totalSum * cellPx(k)) {
          if (k < 32) hi |= 1L << (31 - k) else lo |= 1L << (63 - k)
        }
        k += 1
      }
      ImageHash(row.id, hashOk = true, hi, lo)
    }
  }

  /** Partition-batched perceptual hashing over a media table (codec init
    * amortized per partition; payloads never leave the scan stage — the
    * output is 3 small columns per image). */
  def averageHashes(media: DataFrame): Dataset[ImageHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map(averageHash))
  }

  // ------------------------------------------- REAL audio codec (javax.sound)

  final case class AudioSpec(id: Long, nSamples: Int, sampleRate: Int)
  final case class DecodedAudio(
      id: Long, decodeOk: Boolean, sampleRate: Int, nChannels: Int,
      bitsPerSample: Int, nSamples: Long, peakAbs: Long, sumAbs: Long)
  final case class FrameEnergy(id: Long, frameIndex: Long, nSamples: Long, sumAbs: Long)

  /** PCM sample formula the synthetic WAVs carry — FIXED so an oracle can
    * recompute every decoded feature arithmetically:
    * s(id, i) = ((id·31 + i·7) mod 65536) − 32768. WAV/PCM is lossless,
    * so the encode→decode round trip returns these exact values. */
  def synthSample(id: Long, i: Long): Int =
    ((((id * 31 + i * 7) % 65536) + 65536) % 65536 - 32768).toInt

  /** Encode one deterministic 16-bit PCM mono WAV via the JDK's own audio
    * codec (`javax.sound.sampled.AudioSystem` — the audio twin of
    * javax.imageio; no external libraries). */
  def synthWavBytes(id: Long, nSamples: Int, sampleRate: Int): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val s = synthSample(id, i)
      pcm(2 * i) = (s & 0xff).toByte          // little-endian
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false) // signed, little-endian
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Partition-batched synthetic-WAV generation — the audio fixture seam
    * (at deployment, payloads arrive from the ingest tier instead). */
  def synthesizeWavs(specs: DataFrame): Dataset[MediaRow] = {
    val spark = specs.sparkSession
    import spark.implicits._
    specs.as[AudioSpec].mapPartitions(_.map(s =>
      MediaRow(s.id, synthWavBytes(s.id, s.nSamples, s.sampleRate), "audio/wav")))
  }

  /** Decode a WAV payload to its 16-bit PCM samples via AudioSystem, or
    * null when the payload is not decodable audio — shared by the feature
    * and framing paths. */
  private def wavSamples(payload: Array[Byte]): (javax.sound.sampled.AudioFormat, Array[Int]) = {
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      // NonFatal for the decodeImage reason: SPI parsers can throw
      // RuntimeExceptions on malformed-but-recognized containers
      catch { case scala.util.control.NonFatal(_) => null }
    if (ais == null) (null, null)
    else {
      val fmt = ais.getFormat
      // a header that parses can still front truncated/misaligned frames
      val bytes =
        try ais.readAllBytes()
        catch { case scala.util.control.NonFatal(_) => null }
      if (bytes == null) return (null, null)
      // fixture model: 16-bit signed little-endian PCM (the canonical WAV);
      // other encodings flag as undecodable rather than mis-read
      if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian ||
          fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
        (null, null)
      else {
        val n = bytes.length / 2
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          out(i) = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toInt
          i += 1
        }
        (fmt, out)
      }
    }
  }

  /** REAL audio decode (the deployment replacement for [[stubDecode]] on
    * audio payloads): AudioSystem parses the container and the features
    * are exact integers — sample count, peak |s|, Σ|s| — so an oracle can
    * replay them from the generation formula. Undecodable payloads flag
    * (`decodeOk = false`) instead of failing the batch; compressed
    * formats (mp3/ogg/aac) remain a documented deployment boundary — the
    * JDK codec handles the PCM container family. */
  def decodeWav(row: MediaRow): DecodedAudio = {
    val (fmt, samples) = wavSamples(row.payload)
    if (samples == null) DecodedAudio(row.id, decodeOk = false, 0, 0, 0, 0L, 0L, 0L)
    else {
      var peak = 0L
      var sum = 0L
      var i = 0
      while (i < samples.length) {
        val a = math.abs(samples(i).toLong)
        if (a > peak) peak = a
        sum += a
        i += 1
      }
      DecodedAudio(row.id, decodeOk = true, fmt.getSampleRate.toInt,
        fmt.getChannels, fmt.getSampleSizeInBits, samples.length.toLong, peak, sum)
    }
  }

  /** Partition-batched real audio decode (codec init amortized per
    * partition; payloads dropped before any shuffle). */
  def decodeWavs(media: DataFrame): Dataset[DecodedAudio] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map(decodeWav))
  }

  /** REAL audio framing (the deployment replacement for
    * [[stubFrameSample]] on audio): fixed-width analysis frames with
    * exact integer energy (Σ|s| per frame — the VAD/segmentation
    * primitive). 1→n typed flatMap; a ragged final frame keeps its true
    * sample count. Undecodable payloads emit nothing (their flag lives on
    * the [[decodeWav]] path). */
  def frameEnergies(media: DataFrame, frameSamples: Int): Dataset[FrameEnergy] = {
    require(frameSamples > 0, s"frameSamples must be positive, got $frameSamples")
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.flatMap { row =>
      val (_, samples) = wavSamples(row.payload)
      if (samples == null) Iterator.empty
      else (0 until (samples.length + frameSamples - 1) / frameSamples)
        .iterator.map { f =>
          val from = f * frameSamples
          val until = math.min(samples.length, from + frameSamples)
          var sum = 0L
          var i = from
          while (i < until) { sum += math.abs(samples(i).toLong); i += 1 }
          FrameEnergy(row.id, f.toLong, (until - from).toLong, sum)
        }
    })
  }

  final case class SynthVariantSpec(
      id: Long, pxId: Long, w: Int, h: Int, tweak: Boolean)

  /** Synthetic-PNG VARIANTS: payload pixels come from `pxId`'s formula
    * (several ids sharing a pxId are exact duplicates), and `tweak` bumps
    * pixel (0,0) by one grey level (mod 256) — a controlled near-duplicate.
    * The fixture seam for the perceptual-hash dedup gate: every derived
    * value stays arithmetically replayable. */
  def synthesizePngVariants(specs: DataFrame): Dataset[MediaRow] = {
    val spark = specs.sparkSession
    import spark.implicits._
    specs.as[SynthVariantSpec].mapPartitions(_.map { s =>
      val img = new java.awt.image.BufferedImage(
        s.w, s.h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < s.h) {
        var x = 0
        while (x < s.w) {
          val base = synthPixel(s.pxId, x, y)
          val p = if (s.tweak && x == 0 && y == 0) (base + 1) % 256 else base
          raster.setSample(x, y, 0, p)
          x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      imageIoWritePng(img, out)
      MediaRow(s.id, out.toByteArray, "image/png")
    })
  }
}
