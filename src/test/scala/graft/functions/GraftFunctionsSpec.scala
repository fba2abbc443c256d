package graft.functions

import org.apache.spark.sql.SparkSessionExtensions

import graft.SparkTestBase

class GraftFunctionsSpec extends SparkTestBase {

  test("registered SQL functions evaluate through spark.sql") {
    GraftFunctions.register(spark)
    val r = spark.sql("""
      SELECT
        cosine_similarity(array(1.0, 0.0), array(0.0, 1.0)) AS orth,
        cosine_similarity(array(1.0, 2.0), array(2.0, 4.0)) AS par,
        dot_product(array(1.0, 2.0, 3.0), array(4.0, 5.0, 6.0)) AS dot
    """).collect().head
    r.getDouble(0) shouldBe 0.0
    r.getDouble(1) shouldBe (1.0 +- 1e-12)
    r.getDouble(2) shouldBe 32.0
  }

  test("SQL surface casts float arrays implicitly (embedding columns)") {
    GraftFunctions.register(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb.createOrReplaceTempView("emb_fn_spec")
    try {
      val r = spark.sql(
        "SELECT cosine_similarity(embedding, embedding) AS self FROM emb_fn_spec LIMIT 3")
        .collect()
      r.foreach(_.getDouble(0) shouldBe (1.0 +- 1e-12))
    } finally spark.catalog.dropTempView("emb_fn_spec")
  }

  test("wrong arity is rejected with a named error") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT cosine_similarity(array(1.0))").collect()
    }
    e.getMessage should include("cosine_similarity")
  }

  test("config-time extension injects the same descriptors without error") {
    noException should be thrownBy new GraftExtensions().apply(new SparkSessionExtensions)
  }

  test("graft_hash48 from SQL equals the engine's hash (first 12 md5 hex digits)") {
    GraftFunctions.register(spark)
    val got = spark.sql("SELECT graft_hash48('abc')").collect().head.getLong(0)
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest("abc".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    got shouldBe java.lang.Long.parseLong(hex, 16)
    // and it is the same hash the Column API uses
    import spark.implicits._
    val viaCol = Seq("abc").toDF("s")
      .select(graft.ext.TextAnalysis.hash48(org.apache.spark.sql.functions.col("s")))
      .collect().head.getLong(0)
    got shouldBe viaCol
  }
}
