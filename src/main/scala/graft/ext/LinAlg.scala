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

  /** Per-key EXACT covariance matrix (population, upper triangle) over
    * int8 code vectors — the PCA/whitening input, from the SAME one-pass
    * aggregation as [[gramUpperTriangle]] (the buffer also carries Σxᵢ):
    * `cov·n² = n·Σxᵢxⱼ − Σxᵢ·Σxⱼ` stays in BIGINTs (bounded by n²·127²,
    * overflow-safe to n ≈ 2³⁴ rows per key), so the matrix is bit-exact in
    * any partitioning; the single final division to `cov` is the only
    * float op. */
  def covarianceUpperTriangle(
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
    val ij = expr(
      s"""flatten(transform(sequence(1, $dim), i ->
            transform(sequence(i, $dim), j -> struct(i, j))))""")
    reduced
      .select(col("k"), col("gram.n").as("n"), col("gram.s").as("s"),
        explode(arrays_zip(ij.as("ij"), col("gram.g").as("g"))).as("z"))
      .select(col("k"),
        col("z.ij.i").cast("long").as("i"),
        col("z.ij.j").cast("long").as("j"),
        col("z.g").as("g"),
        element_at(col("s"), col("z.ij.i")).as("si"),
        element_at(col("s"), col("z.ij.j")).as("sj"),
        col("n"))
      .withColumn("cov_num", col("n") * col("g") - col("si") * col("sj"))
      .withColumn("cov",
        col("cov_num").cast("double") / (col("n") * col("n")).cast("double"))
  }
}
