package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column handling: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata alongside. The Spark-side plumbing —
  * schema, partition sizing, batch shape — is real; the codec step is a
  * clearly-marked deterministic STUB (no image/audio libraries exist in this
  * environment; at deployment, swap `stubDecode` for a real codec keeping the
  * same signature).
  *
  * Scale notes: payloads dominate row size, so (a) never shuffle the binary
  * column — derive features first, then drop it; (b) size
  * `spark.sql.files.maxPartitionBytes` so a partition of payloads fits the
  * executor; (c) feature extraction is mapPartitions-batched, amortizing any
  * codec init per partition, not per row.
  */
object Multimodal {

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
}
