package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ext.Skew.TwoPhase

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  test("saltedAggregate equals the direct aggregation (sum/count/min/max)") {
    val df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val direct = df.groupBy(col("event_type"))
      .agg(
        sum(col("user_id")).as("s"), count(lit(1)).as("n"),
        min(col("event_id")).as("mn"), max(col("event_id")).as("mx"))
      .orderBy("event_type").collect().toSeq
    val salted = Skew.saltedAggregate(
      df, Seq("event_type"), col("event_id"), salts = 8,
      Seq(
        TwoPhase.sumOf("s", "user_id"), TwoPhase.countOf("n", "event_id"),
        TwoPhase.minOf("mn", "event_id"), TwoPhase.maxOf("mx", "event_id")))
      .orderBy("event_type").collect().toSeq
    salted shouldBe direct
  }

  test("saltedJoin inner equals the plain join, salt column dropped") {
    val fact = Seq((1L, 10L), (1L, 11L), (2L, 20L), (3L, 30L)).toDF("k", "fv")
    val dim = Seq((1L, "a"), (2L, "b"), (2L, "b2"), (4L, "d")).toDF("k", "dv")
    val plain = fact.join(dim, Seq("k")).collect().map(_.toSeq).toSeq
    val salted = Skew.saltedJoin(fact, dim, Seq("k"), col("fv"), salts = 4)
    salted.columns.toSeq shouldBe Seq("k", "fv", "dv")
    salted.collect().map(_.toSeq).toSeq should contain theSameElementsAs plain
  }

  test("saltedJoin left keeps unmatched fact rows with null dim columns") {
    val fact = Seq((1L, 10L), (9L, 90L)).toDF("k", "fv")
    val dim = Seq((1L, "a")).toDF("k", "dv")
    val out = Skew.saltedJoin(fact, dim, Seq("k"), col("fv"), salts = 3, "left")
      .orderBy("k").collect().map(r => (r.getLong(0), Option(r.getString(2)))).toSeq
    out shouldBe Seq((1L, Some("a")), (9L, None))
  }

  test("saltedJoin semi/anti partition the fact side exactly") {
    val fact = Seq((1L, 10L), (2L, 20L), (9L, 90L)).toDF("k", "fv")
    val dim = Seq((1L, "a"), (2L, "b")).toDF("k", "dv")
    val semi = Skew.saltedJoin(fact, dim, Seq("k"), col("fv"), 4, "left_semi")
      .select("k").as[Long].collect().sorted
    val anti = Skew.saltedJoin(fact, dim, Seq("k"), col("fv"), 4, "left_anti")
      .select("k").as[Long].collect().sorted
    semi shouldBe Array(1L, 2L)
    anti shouldBe Array(9L)
  }

  test("saltedJoin refuses right-rooted join types and reserved columns") {
    val df = Seq((1L, 1L)).toDF("k", "v")
    an[IllegalArgumentException] should be thrownBy
      Skew.saltedJoin(df, df.withColumnRenamed("v", "w"), Seq("k"), col("v"), 4, "full_outer")
    an[IllegalArgumentException] should be thrownBy
      Skew.saltedJoin(df.withColumn("__salt", lit(1)),
        df.withColumnRenamed("v", "w"), Seq("k"), col("v"), 4)
  }

  test("phase 1 spreads a hot key over the salt space") {
    val hot = Seq.fill(1000)(("HOT", 1L)) ++ Seq(("cold", 2L))
    val df = hot.toDF("k", "v").withColumn("row", monotonically_increasing_id())
    val p1Groups = df
      .withColumn("__salt", pmod(hash(col("row")), lit(8)))
      .groupBy("k", "__salt").count()
      .where(col("k") === "HOT").count()
    p1Groups should be > 1L // the hot key's work is split across salts
  }
}
