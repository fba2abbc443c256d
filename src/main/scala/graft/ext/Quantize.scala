package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar int8 quantization for embedding columns — the standard storage
  * path for web-scale vector corpora: 4× smaller than float32 (16× smaller
  * than the float64 they expand to in compute), which at 100 TB of
  * embeddings is the difference between one cluster and four.
  *
  * Symmetric per-vector scheme: `scale = max|vᵢ| / 127`,
  * `qᵢ = round(vᵢ / scale)` ∈ [-127, 127], dequantized as `qᵢ·scale`.
  * Everything is expression-only (codegen'd, per-row, no shuffle) and uses
  * only arithmetic both engines define identically (round half away from
  * zero, strict left-to-right double folds), so quantization is bit-exact
  * against the DuckDB oracle. A zero vector quantizes to scale 0 and an
  * all-zero code array.
  */
object Quantize {

  /** Per-vector scale: max|vᵢ|/127 (0.0 for a zero/empty vector). */
  def int8Scale(v: Column): Column =
    coalesce(
      array_max(transform(v.cast("array<double>"), x => abs(x))), lit(0.0)) / lit(127.0)

  /** Quantized codes as `array<tinyint>`; all zeros when scale is 0. */
  def int8Codes(v: Column, scale: Column): Column =
    when(scale === 0.0,
      transform(v.cast("array<double>"), _ => lit(0).cast("tinyint")))
      .otherwise(
        transform(v.cast("array<double>"), x => round(x / scale).cast("tinyint")))

  /** Dequantized vector: `qᵢ·scale` as array<double>. */
  def dequantize(codes: Column, scale: Column): Column =
    transform(codes, q => q.cast("double") * scale)

  /** Max absolute reconstruction error against an ALREADY-dequantized
    * column — project [[dequantize]] once and share it between this and the
    * fidelity cosine; rebuilding it per consumer doubles the O(d) work. */
  def reconError(v: Column, deq: Column): Column =
    coalesce(
      array_max(zip_with(v.cast("array<double>"), deq, (x, d) => abs(x - d))),
      lit(0.0))

  /** Max absolute reconstruction error over the vector — bounded by
    * scale/2 by construction; surfacing it per row makes the quality/size
    * trade-off measurable instead of assumed. One-shot convenience: on hot
    * paths use [[reconError]] with a shared dequantized column. */
  def maxAbsError(v: Column, codes: Column, scale: Column): Column =
    reconError(v, dequantize(codes, scale))
}
