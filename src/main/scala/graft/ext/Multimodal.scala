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
      col(payloadCol).cast("binary").as("payload"),
      lit(mime).as("mimeType"))

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

  /** Pure-expression metadata projection (no decode): byte length, head bytes
    * as hex, first byte — oracle-comparable, used by SparkEntry. */
  def metadataColumns(payloadExpr: String): Seq[org.apache.spark.sql.Column] = Seq(
    expr(s"CAST(octet_length(CAST($payloadExpr AS BINARY)) AS BIGINT)").as("n_bytes"),
    expr(s"hex(CAST(substr($payloadExpr, 1, 4) AS BINARY))").as("head_hex"),
    expr(s"CAST(ascii($payloadExpr) AS BIGINT)").as("first_byte"))
}
