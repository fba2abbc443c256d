package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class IntervalsSpec extends SparkTestBase {
  import spark.implicits._

  test("chained overlaps merge transitively; gaps split islands") {
    // [1,5] [2,9] [8,12] chain into one island even though [8,12] does not
    // touch [1,5]; [20,25] stands alone.
    val df = Seq(("a", 1L, 5L), ("a", 2L, 9L), ("a", 8L, 12L), ("a", 20L, 25L))
      .toDF("k", "s", "e")
    val out = Intervals.mergeIntervals(df, Seq("k"), "s", "e")
      .orderBy("s").as[(String, Long, Long, Long)].collect().toSeq
    out shouldBe Seq(("a", 1L, 12L, 3L), ("a", 20L, 25L, 1L))
  }

  test("touching closed intervals merge; adjacent-with-gap-1 do not") {
    val df = Seq(("a", 1L, 5L), ("a", 5L, 8L), ("a", 10L, 11L))
      .toDF("k", "s", "e")
    val out = Intervals.mergeIntervals(df, Seq("k"), "s", "e")
      .orderBy("s").as[(String, Long, Long, Long)].collect().toSeq
    out shouldBe Seq(("a", 1L, 8L, 2L), ("a", 10L, 11L, 1L))
  }

  test("a contained interval never extends its island") {
    val df = Seq(("a", 1L, 100L), ("a", 10L, 20L), ("a", 101L, 102L))
      .toDF("k", "s", "e")
    val out = Intervals.mergeIntervals(df, Seq("k"), "s", "e")
      .orderBy("s").as[(String, Long, Long, Long)].collect().toSeq
    out shouldBe Seq(("a", 1L, 100L, 2L), ("a", 101L, 102L, 1L))
  }

  test("keys partition independently; identical spans in different keys never merge") {
    val df = Seq(("a", 1L, 5L), ("b", 1L, 5L), ("b", 3L, 7L)).toDF("k", "s", "e")
    val out = Intervals.mergeIntervals(df, Seq("k"), "s", "e")
      .orderBy("k", "s").as[(String, Long, Long, Long)].collect().toSeq
    out shouldBe Seq(("a", 1L, 5L, 1L), ("b", 1L, 7L, 2L))
  }

  test("merged output is itself merge-stable (idempotence)") {
    val df = graft.util.EventTime
      .tsToLongNanos(spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
      .select(col("user_id"),
        expr("ts div 1000").as("s"),
        (expr("ts div 1000") + lit(900000000L)).as("e"))
    val once = Intervals.mergeIntervals(df, Seq("user_id"), "s", "e")
    val twice = Intervals.mergeIntervals(once.drop("n_merged"), Seq("user_id"), "s", "e")
    val a = once.select("user_id", "s", "e").orderBy("user_id", "s").collect().toSeq
    val b = twice.select("user_id", "s", "e").orderBy("user_id", "s").collect().toSeq
    b shouldBe a
    // and islands really are disjoint with positive gaps per key
    val bad = once.as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).values.flatMap { ivs =>
        ivs.sortBy(_._2).sliding(2).collect {
          case Array(p, n) if n._2 <= p._3 => (p, n)
        }
      }
    bad shouldBe empty
  }

  test("reserved column names are rejected") {
    val df = Seq(("a", 1L, 2L, 0L)).toDF("k", "s", "e", "__island")
    an[IllegalArgumentException] should be thrownBy
      Intervals.mergeIntervals(df, Seq("k"), "s", "e")
  }
}
