package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Watermarked event-time tumbling windows through REAL Structured Streaming
  * (append mode: a window only emits once the watermark passes its end). */
class WindowedStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("tumbling window with watermark emits closed windows and drops late data") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Double)]
    val agged = mem.toDF().toDF("t", "v")
      .withWatermark("t", "10 minutes")
      .groupBy(window(col("t"), "10 minutes").as("w"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"))
      .select(col("w.start").as("w_start"), col("n"), col("sum_v"))
    val q = agged.writeStream.outputMode("append").format("memory")
      .queryName("window_spec").start()
    try {
      // window [10:00,10:10): two rows; then advance event time far enough
      // that the watermark (max event time - 10 min) closes it
      mem.addData((ts(1), 1.0), (ts(5), 2.0))
      q.processAllAvailable()
      mem.addData((ts(35), 5.0)) // watermark -> 10:25, closes [10:00,10:10)
      q.processAllAvailable()
      // this event is 24 min behind the watermark: MUST be dropped
      mem.addData((ts(1), 100.0))
      q.processAllAvailable()
      mem.addData((ts(59), 7.0)) // watermark -> 10:49, closes [10:30,10:40)
      q.processAllAvailable()

      val rows = spark.table("window_spec")
        .orderBy("w_start").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2)))
      rows.toSeq shouldBe Seq(
        (ts(0), 2L, 3.0), // late row NOT counted
        (ts(30), 1L, 5.0))
    } finally {
      q.stop()
      spark.catalog.dropTempView("window_spec")
    }
  }

  test("hopping window assigns each event to size/slide windows, closes on watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Double)]
    // 10-minute windows every 5 minutes: every event lands in exactly 2
    val agged = mem.toDF().toDF("t", "v")
      .withWatermark("t", "5 minutes")
      .groupBy(window(col("t"), "10 minutes", "5 minutes").as("w"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"))
      .select(col("w.start").as("w_start"), col("n"), col("sum_v"))
    val q = agged.writeStream.outputMode("append").format("memory")
      .queryName("hop_spec").start()
    try {
      mem.addData((ts(7), 1.0), (ts(8), 2.0)) // windows [10:00,10:10) and [10:05,10:15)
      q.processAllAvailable()
      mem.addData((ts(40), 9.0)) // watermark -> 10:35: closes both early windows
      q.processAllAvailable()
      val rows = spark.table("hop_spec")
        .orderBy("w_start").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2)))
      rows.toSeq shouldBe Seq(
        (ts(0), 2L, 3.0),  // [10:00,10:10) — both events
        (ts(5), 2L, 3.0))  // [10:05,10:15) — both events again (overlap)
    } finally {
      q.stop()
      spark.catalog.dropTempView("hop_spec")
    }
  }
}
