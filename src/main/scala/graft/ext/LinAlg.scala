package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GramUpperTriangle

/** Distributed exact linear algebra over quantized embedding columns —
  * the covariance/PCA scaffold of a 100 TB vector pipeline. */
object LinAlg {

  /** Per-key Gram matrix (XᵀX upper triangle, 1-based `(i, j)` with
    * `i ≤ j`) over `array<tinyint>` code vectors (see
    * [[Quantize.int8Codes]]).
    *
    * One typed aggregation: each task multiply-accumulates its rows into a
    * dim·(dim+1)/2-slot BIGINT triangle ([[GramUpperTriangle]] — no
    * per-pair hashing, no exploded pair rows), buffers combine map-side,
    * and only |keys| buffer rows cross the exchange. The flat triangle
    * unpacks to (key, i, j, g, n) rows AFTER aggregation, on |keys|·tri
    * rows. Exact BIGINT products ⇒ bit-identical in any partitioning.
    */
  def gramUpperTriangle(
      df: DataFrame, keyCol: String, codesCol: String, dim: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val reduced = df
      .select(col(keyCol).cast("long").as("k"),
        col(codesCol).cast("array<smallint>").as("v"))
      .as[(Long, Array[Short])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new GramUpperTriangle(dim).toColumn.name("gram"))
      .toDF("k", "gram")
    // (i, j) labels for the flat row-major triangle, generated once per
    // OUTPUT row set (|keys|·tri), zipped positionally with the buffer
    val ij = expr(
      s"""flatten(transform(sequence(1, $dim), i ->
            transform(sequence(i, $dim), j -> struct(i, j))))""")
    reduced
      .select(col("k"), col("gram.n").as("n"),
        explode(arrays_zip(ij.as("ij"), col("gram.g").as("g"))).as("z"))
      .select(col("k"),
        col("z.ij.i").cast("long").as("i"),
        col("z.ij.j").cast("long").as("j"),
        col("z.g").as("g"), col("n"))
  }
}
