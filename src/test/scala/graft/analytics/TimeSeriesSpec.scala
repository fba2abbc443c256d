package graft.analytics

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.analytics.TimeSeries.{EwmaState, Point}

class TimeSeriesSpec extends SparkTestBase {
  import spark.implicits._

  test("batch ewma folds in time order with the first value as seed") {
    // values 1,2,3 at α=0.5: e=1 → 1.5 → 2.25; rows arrive out of order
    val df = Seq((1L, 30L, 3.0), (1L, 10L, 1.0), (1L, 20L, 2.0))
      .toDF("k", "t", "v")
    val out = TimeSeries.ewma(df, Seq("k"), Seq("t"), "v", 0.5)
      .as[(Long, Long, Double)].collect().toSeq
    out shouldBe Seq((1L, 3L, 2.25))
  }

  test("keys fold independently; a single point is its own ewma") {
    val df = Seq((1L, 1L, 4.0), (2L, 1L, 8.0), (2L, 2L, 0.0)).toDF("k", "t", "v")
    val out = TimeSeries.ewma(df, Seq("k"), Seq("t"), "v", 0.5)
      .orderBy("k").as[(Long, Long, Double)].collect().toSeq
    out shouldBe Seq((1L, 1L, 4.0), (2L, 2L, 4.0))
  }

  test("streaming ewma across micro-batches equals the batch fold (twin law)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Point]
    val q = TimeSeries.ewmaStream(mem.toDS(), 0.5)
      .writeStream.outputMode("update").format("memory")
      .queryName("ewma_stream_spec").start()
    try {
      mem.addData(Point(1L, 10L, 1.0), Point(1L, 20L, 2.0), Point(2L, 10L, 8.0))
      q.processAllAvailable()
      mem.addData(Point(1L, 30L, 3.0)) // continues from carried state
      q.processAllAvailable()
      val finalRows = spark.table("ewma_stream_spec").as[EwmaState]
        .collect().groupBy(_.key).map { case (k, rs) => k -> rs.maxBy(_.nPoints) }
      finalRows(1L) shouldBe EwmaState(1L, 3L, 2.25)
      finalRows(2L) shouldBe EwmaState(2L, 1L, 8.0)
      // twin: the batch form over the union of all batches agrees
      val batch = TimeSeries.ewma(
        Seq((1L, 10L, 1.0), (1L, 20L, 2.0), (1L, 30L, 3.0), (2L, 10L, 8.0))
          .toDF("k", "t", "v"),
        Seq("k"), Seq("t"), "v", 0.5)
        .orderBy("k").as[(Long, Long, Double)].collect().toSeq
      batch shouldBe Seq((1L, 3L, 2.25), (2L, 1L, 8.0))
    } finally {
      q.stop()
      spark.catalog.dropTempView("ewma_stream_spec")
    }
  }

  test("invalid alpha and missing ordering are rejected") {
    val df = Seq((1L, 1L, 1.0)).toDF("k", "t", "v")
    an[IllegalArgumentException] should be thrownBy
      TimeSeries.ewma(df, Seq("k"), Seq("t"), "v", 0.0)
    an[IllegalArgumentException] should be thrownBy
      TimeSeries.ewma(df, Seq("k"), Seq.empty, "v", 0.5)
  }
}
