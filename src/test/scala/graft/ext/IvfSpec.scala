package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class IvfSpec extends SparkTestBase {
  import spark.implicits._

  // two well-separated clusters around (1,0) and (0,1)
  private def corpus = Seq(
    (1L, Array(1.0f, 0.00f)), (2L, Array(0.99f, 0.05f)), (3L, Array(0.98f, 0.10f)),
    (11L, Array(0.0f, 1.00f)), (12L, Array(0.05f, 0.99f)), (13L, Array(0.10f, 0.98f))
  ).toDF("id", "v")

  test("ivfTopK with nprobe=1 searches only the query's own cluster") {
    val centroids = Seq((100L, Array(1.0f, 0.0f)), (200L, Array(0.0f, 1.0f)))
      .toDF("cid", "v")
    val out = Similarity.ivfTopK(
      corpus.where(col("id") === 1), corpus, centroids,
      "id", "id", "cid", "v", k = 5, nprobe = 1)
      .orderBy("rank").collect().map(r => r.getLong(r.fieldIndex("n_id")))
    // every neighbor comes from cluster A; cluster B never scanned
    out.toSeq shouldBe Seq(2L, 3L)
  }

  test("ivfTopK with nprobe=2 reaches the second cluster too") {
    val centroids = Seq((100L, Array(1.0f, 0.0f)), (200L, Array(0.0f, 1.0f)))
      .toDF("cid", "v")
    val out = Similarity.ivfTopK(
      corpus.where(col("id") === 1), corpus, centroids,
      "id", "id", "cid", "v", k = 5, nprobe = 2)
      .collect().map(r => r.getLong(r.fieldIndex("n_id"))).toSet
    out shouldBe Set(2L, 3L, 11L, 12L, 13L)
  }

  test("ivf ranks agree with brute force when nprobe covers all lists") {
    val centroids = Seq((100L, Array(1.0f, 0.0f)), (200L, Array(0.0f, 1.0f)))
      .toDF("cid", "v")
    val ivf = Similarity.ivfTopK(
      corpus.where(col("id") === 2), corpus, centroids,
      "id", "id", "cid", "v", k = 3, nprobe = 2)
      .orderBy("rank").collect().map(r => (r.getInt(r.fieldIndex("rank")), r.getLong(r.fieldIndex("n_id"))))
    val bf = Similarity.bruteForceTopK(
      corpus.where(col("id") === 2), corpus, "id", "id", "v", 3)
      .orderBy("rank").collect().map(r => (r.getInt(r.fieldIndex("rank")), r.getLong(r.fieldIndex("n_id"))))
    ivf.toSeq shouldBe bf.toSeq
  }

  test("fitCentroids recovers well-separated clusters and feeds ivfTopK directly") {
    // three tight direction-clusters in 3-d
    val data = Seq(
      (1L, Array(1.0f, 0.02f, 0.01f)), (2L, Array(0.99f, 0.05f, 0.02f)),
      (3L, Array(0.98f, 0.01f, 0.06f)), (4L, Array(1.0f, 0.04f, 0.03f)),
      (11L, Array(0.02f, 1.0f, 0.01f)), (12L, Array(0.05f, 0.98f, 0.03f)),
      (13L, Array(0.01f, 0.99f, 0.05f)),
      (21L, Array(0.03f, 0.02f, 1.0f)), (22L, Array(0.01f, 0.05f, 0.99f))
    ).toDF("id", "v")
    val cents = Similarity.fitCentroids(data, "id", "v", k = 3, iters = 4,
      cidCol = "cid", outVecCol = "v")
    cents.count() shouldBe 3L
    // each fitted centroid points dominantly along a distinct axis
    val axes = cents.collect().map { r =>
      val v = r.getSeq[Double](1)
      v.indexOf(v.max)
    }.sorted.toSeq
    axes shouldBe Seq(0, 1, 2)
    // end-to-end: the fitted table IS a valid ivfTopK quantizer, and with
    // nprobe=1 a cluster-1 query only sees cluster-1 neighbors
    val out = Similarity.ivfTopK(
      data.where(col("id") === 1), data, cents,
      "id", "id", "cid", "v", k = 8, nprobe = 1)
      .collect().map(r => r.getLong(r.fieldIndex("n_id"))).toSet
    out shouldBe Set(2L, 3L, 4L)
  }
}
