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
