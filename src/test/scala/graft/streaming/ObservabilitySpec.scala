package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException

import graft.SparkTestBase

class ObservabilitySpec extends SparkTestBase {
  import spark.implicits._

  test("observeBatch computes exact inline metrics during the action's single pass") {
    val df = Seq((1L, 10.0), (2L, -5.0), (3L, 7.5)).toDF("id", "v")
    var rows = 0L
    val m = Observability.observeBatch(df, "gate",
      Seq(count(lit(1)).as("n"), sum(col("v")).as("total"),
        count(when(col("v") < 0, 1)).as("n_negative"))) { observed =>
      rows = observed.count()
    }
    rows shouldBe 3L
    m("n") shouldBe 3L
    m("total") shouldBe 12.5
    m("n_negative") shouldBe 1L
  }

  test("guardedForeachBatch halts the query when a batch violates the invariant") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val written = scala.collection.mutable.ArrayBuffer[Long]()
    val q = mem.toDS().toDF("v").writeStream
      .outputMode("append")
      .foreachBatch(Observability.guardedForeachBatch(
        metrics = Seq(count(when(col("v") < 0, 1)).as("n_negative")),
        invariant = m => m("n_negative") == 0L) { (df, _) =>
        written.synchronized { written ++= df.select("v").as[Long].collect() }
      })
      .start()
    try {
      mem.addData(1L, 2L, 3L) // clean batch: passes
      q.processAllAvailable()
      written.toSet shouldBe Set(1L, 2L, 3L)

      mem.addData(4L, -9L) // poisoned batch: guard must fail the query
      val e = intercept[StreamingQueryException] { q.processAllAvailable() }
      e.getCause.getMessage should include("invariant violated")
      // the write ran before the guard (metrics ride the write's pass);
      // idempotentJdbcAppend's replay-delete is what reverses it on restart
      written.toSet shouldBe Set(1L, 2L, 3L, 4L, -9L)
    } finally q.stop()
  }

  test("streaming observed metrics arrive in progress events via the collector") {
    val collector = new Observability.ObservedMetricsCollector("stream_gate")
    spark.streams.addListener(collector)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val q = mem.toDS().toDF("v")
      .observe("stream_gate", count(lit(1)).as("n"), sum(col("v")).as("total"))
      .writeStream.outputMode("append").format("noop").start()
    try {
      mem.addData(5L, 6L, 7L)
      q.processAllAvailable()
      val metric = collector.collected.find(_.getAs[Long]("n") == 3L)
      metric.isDefined shouldBe true
      metric.get.getAs[Long]("total") shouldBe 18L
    } finally {
      q.stop()
      spark.streams.removeListener(collector)
    }
  }
}
