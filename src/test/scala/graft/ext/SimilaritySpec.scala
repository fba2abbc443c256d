package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private val eps = 1e-12

  test("native cosine matches hand-computed values") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f), 0.0),        // orthogonal
      (Array(1.0f, 2.0f), Array(2.0f, 4.0f), 1.0),        // parallel
      (Array(1.0f, 0.0f), Array(-1.0f, 0.0f), -1.0),      // opposite
      (Array(3.0f, 4.0f), Array(4.0f, 3.0f), 24.0 / 25.0) // 24/(5*5)
    ).toDF("a", "b", "expected")
    val rows = df.select(
      Similarity.cosine(col("a"), col("b")).as("got"), col("expected")).collect()
    rows.foreach(r => r.getDouble(0) shouldBe (r.getDouble(1) +- eps))
  }

  test("native cosine is bit-identical to the composable HOF form") {
    val vecs = (1 to 50).map(i => (i.toLong, Array.tabulate(16)(j => ((i * 31 + j * 7) % 13 - 6).toFloat)))
    val df = vecs.toDF("id", "v")
    val pairs = df.select(col("id").as("ia"), col("v").as("va"))
      .crossJoin(df.select(col("id").as("ib"), col("v").as("vb")))
    val diff = pairs.select(
      Similarity.cosine(col("va"), col("vb")).as("n"),
      Similarity.cosineComposable(col("va"), col("vb")).as("h"))
      .where(col("n") =!= col("h") &&
        !(isnan(col("n")) && isnan(col("h")))).count()
    diff shouldBe 0L
  }

  test("bruteForceTopK returns k best neighbors, excluding self, ranked") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)),
      (4L, Array(-1.0f, 0.0f))).toDF("id", "v")
    val out = Similarity.bruteForceTopK(df.where(col("id") === 1), df, "id", "id", "v", 2)
      .orderBy("rank").collect().map(r => (r.getInt(r.fieldIndex("rank")), r.getLong(r.fieldIndex("n_id"))))
    out.toSeq shouldBe Seq((1, 2L), (2, 3L))
  }

  test("bucketedTopK only scores same-bucket candidates") {
    val df = Seq(
      (1L, Array(1.0f, 1.0f)),   // bucket 3 (both positive)
      (2L, Array(0.5f, 2.0f)),   // bucket 3
      (3L, Array(-1.0f, 1.0f))   // bucket 2
    ).toDF("id", "v")
    val out = Similarity.bucketedTopK(df.where(col("id") === 1), df, "id", "id", "v", 5, bits = 2)
      .collect().map(r => r.getLong(r.fieldIndex("n_id"))) // candidates actually scored
    out.toSeq shouldBe Seq(2L)
  }

  test("multiProbeTopK recalls a neighbor whose lowest-margin sign bit differs") {
    // id=2 is nearly parallel to the query but its tiny second component has
    // the opposite sign → different single-table bucket (bucketedTopK misses
    // it); the margin |0.01| is the lowest of the table, so the 1-flip probe
    // recovers it
    val df = Seq(
      (1L, Array(1.0f, 0.01f)),
      (2L, Array(1.0f, -0.01f)),
      (3L, Array(-1.0f, 1.0f))).toDF("id", "v")
    val q = df.where(col("id") === 1)
    val missed = Similarity.bucketedTopK(q, df, "id", "id", "v", 5, bits = 2)
      .collect().map(_.getLong(2))
    missed should not contain 2L
    val got = Similarity.multiProbeTopK(q, df, "id", "id", "v", 5,
      tables = 1, bits = 2, flips = 1)
      .collect().map(r => r.getLong(r.fieldIndex("n_id")))
    got should contain(2L)
  }

  test("multiProbeTopK never ranks a candidate twice across tables/probes") {
    // every vector lands in the same bucket of BOTH tables, and the flip
    // probes re-hit existing buckets — each neighbor must still appear once
    val df = Seq(
      (1L, Array(1.0f, 1.0f, 1.0f, 1.0f)),
      (2L, Array(0.9f, 1.1f, 1.0f, 1.0f)),
      (3L, Array(1.1f, 0.9f, 1.0f, 1.0f))).toDF("id", "v")
    val out = Similarity.multiProbeTopK(df.where(col("id") === 1), df, "id", "id", "v", 10,
      tables = 2, bits = 2, flips = 2)
      .collect().map(r => r.getLong(r.fieldIndex("n_id")))
    out.toSeq.sorted shouldBe Seq(2L, 3L)
  }

  test("multiProbeTopK with tables=1, flips=0 degenerates to the single-bucket candidate set") {
    val df = Seq(
      (1L, Array(1.0f, 1.0f)),
      (2L, Array(0.5f, 2.0f)),
      (3L, Array(-1.0f, 1.0f))).toDF("id", "v")
    val out = Similarity.multiProbeTopK(df.where(col("id") === 1), df, "id", "id", "v", 5,
      tables = 1, bits = 2, flips = 0)
      .collect().map(r => r.getLong(r.fieldIndex("n_id")))
    out.toSeq shouldBe Seq(2L)
  }

  test("cosineDupPairs finds within-bucket pairs above threshold, id_a < id_b") {
    val df = Seq(
      (1L, Array(1.0f, 1.0f)),
      (2L, Array(1.0f, 0.9f)),  // near-dup of 1, same bucket
      (3L, Array(-1.0f, -1.0f)) // different bucket entirely
    ).toDF("id", "v")
    val out = Similarity.cosineDupPairs(df, "id", "v", threshold = 0.9, bits = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    out shouldBe Seq((1L, 2L))
  }

  test("native cosine handles length mismatch via common-prefix dot, full norms") {
    val df = Seq((Array(1.0, 0.0, 3.0), Array(1.0, 0.0))).toDF("a", "b")
    val got = df.select(Similarity.cosine(col("a"), col("b"))).collect().head.getDouble(0)
    got shouldBe (1.0 / (math.sqrt(10.0) * 1.0) +- eps)
  }

  test("NaN similarities rank deterministically first, like a descending sort") {
    // corpus contains a zero vector (cosine = 0/0 = NaN); NaN sorts ABOVE
    // all finite values in a desc sort, and the bounded aggregator must
    // agree no matter the partition/merge order
    val df = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 0.0f))).toDF("id", "v")
    val out = Similarity.bruteForceTopK(df.where(col("id") === 1), df, "id", "id", "v", 2)
      .orderBy("rank").collect().map(r => r.getLong(r.fieldIndex("n_id")))
    out.toSeq shouldBe Seq(3L, 2L) // NaN candidate first, then best finite
  }

  test("non-integral id types fall back to the window ranking path") {
    val df = Seq(
      ("a", Array(1.0f, 0.0f)),
      ("b", Array(0.9f, 0.1f)),
      ("c", Array(0.0f, 1.0f))).toDF("id", "v")
    val out = Similarity.bruteForceTopK(df.where(col("id") === "a"), df, "id", "id", "v", 2)
      .orderBy("rank").collect().map(r => r.getString(r.fieldIndex("n_id")))
    out.toSeq shouldBe Seq("b", "c")
  }

  test("native cosine accepts mixed nullability (literal array vs column)") {
    // a literal array is containsNull=false, a read column usually true —
    // the type check must only care about the element type
    val df = Seq(Tuple1(Array(Some(3.0), Some(4.0)))).toDF("v") // containsNull=true
    val got = df.select(
      Similarity.cosine(col("v"), array(lit(3.0), lit(4.0)))).collect().head.getDouble(0)
    got shouldBe (1.0 +- 1e-12)
  }

  test("zero vector yields NaN (0/0), not an error") {
    val df = Seq((Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
    df.select(Similarity.cosine(col("a"), col("b"))).collect().head.getDouble(0).isNaN shouldBe true
  }
}
