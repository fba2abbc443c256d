package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Stream-stream joins and streaming session windows through REAL Structured
  * Streaming — the two stateful shapes (beyond keyed mapGroupsWithState) a
  * scale pipeline leans on. Both are bounded-state by construction: the
  * watermark + time-range condition lets Spark evict join state, and session
  * windows close (and emit) once the watermark passes gap-timeout. */
class StreamJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("watermarked stream-stream join matches kills to damages within a time bound") {
    implicit val sqlCtx = spark.sqlContext
    val kills = MemoryStream[(String, Timestamp)]
    val dmgs = MemoryStream[(String, Timestamp, Long)]
    // time-range condition (damage within 5 min AFTER the kill) + watermarks
    // on both sides = evictable join state, the only shape that is safe on an
    // unbounded stream
    val joined = kills.toDF().toDF("k_steam", "k_t").withWatermark("k_t", "10 minutes")
      .join(
        dmgs.toDF().toDF("d_steam", "d_t", "amount").withWatermark("d_t", "10 minutes"),
        expr("k_steam = d_steam AND d_t >= k_t AND d_t <= k_t + interval 5 minutes"))
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ssjoin_spec").start()
    try {
      kills.addData(("S1", ts(0)), ("S2", ts(0)))
      dmgs.addData(("S1", ts(3), 40L)) // in range
      dmgs.addData(("S1", ts(9), 60L)) // out of range (> 5 min after kill)
      dmgs.addData(("S3", ts(3), 10L)) // no matching kill
      q.processAllAvailable()

      val rows = spark.table("ssjoin_spec")
        .select("k_steam", "amount").as[(String, Long)].collect().toSeq
      rows shouldBe Seq(("S1", 40L))
    } finally {
      q.stop()
      spark.catalog.dropTempView("ssjoin_spec")
    }
  }

  test("left-outer stream-stream join null-pads unmatched rows once the watermark closes them") {
    // The outer variant is WHY the watermark is mandatory: an unmatched left
    // row can only be emitted (with null right columns) once the watermark
    // proves no matching right row can still arrive. Before that point the
    // row sits in join state; a batch join would emit it immediately.
    implicit val sqlCtx = spark.sqlContext
    val kills = MemoryStream[(String, Timestamp)]
    val dmgs = MemoryStream[(String, Timestamp, Long)]
    val joined = kills.toDF().toDF("k_steam", "k_t").withWatermark("k_t", "10 minutes")
      .join(
        dmgs.toDF().toDF("d_steam", "d_t", "amount").withWatermark("d_t", "10 minutes"),
        expr("k_steam = d_steam AND d_t >= k_t AND d_t <= k_t + interval 5 minutes"),
        "left_outer")
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ssjoin_outer_spec").start()
    try {
      kills.addData(("S1", ts(0)), ("S2", ts(0)))
      dmgs.addData(("S1", ts(3), 40L)) // S1 matches; S2 never will
      q.processAllAvailable()
      // inner match emits as soon as both sides are present…
      spark.table("ssjoin_outer_spec")
        .where(col("amount").isNotNull)
        .select("k_steam").as[String].collect().toSeq shouldBe Seq("S1")
      // …but S2's null-padded row needs the GLOBAL watermark (min over both
      // inputs) past k_t + 5min + 10min — so BOTH streams must advance
      kills.addData(("S9k", ts(40)))
      dmgs.addData(("S9", ts(40), 1L))
      q.processAllAvailable()
      q.processAllAvailable() // one more cycle: eviction emits on the NEXT batch
      val unmatched = spark.table("ssjoin_outer_spec")
        .where(col("amount").isNull)
        .select("k_steam").as[String].collect().toSeq
      unmatched shouldBe Seq("S2")
    } finally {
      q.stop()
      spark.catalog.dropTempView("ssjoin_outer_spec")
    }
  }

  test("streaming session window groups activity by gap and closes on watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    val sessions = mem.toDF().toDF("steamId", "t")
      .withWatermark("t", "10 minutes")
      .groupBy(col("steamId"), session_window(col("t"), "5 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("steamId"), col("w.start").as("s_start"), col("n_events"))
    val q = sessions.writeStream.outputMode("append").format("memory")
      .queryName("session_spec").start()
    try {
      // one session: 10:00, 10:03, 10:06 (gaps < 5 min merge); then a gap
      mem.addData(("S1", ts(0)), ("S1", ts(3)), ("S1", ts(6)))
      q.processAllAvailable()
      // event at 10:30 starts a NEW session and pushes the watermark to
      // 10:20 > 10:11 (first session's close), so the first session emits
      mem.addData(("S1", ts(30)))
      q.processAllAvailable()
      mem.addData(("S1", ts(59))) // close the 10:30 session too
      q.processAllAvailable()

      val rows = spark.table("session_spec")
        .orderBy("s_start").collect()
        .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
      rows.toSeq shouldBe Seq(
        ("S1", ts(0), 3L),  // merged session of three events
        ("S1", ts(30), 1L))
    } finally {
      q.stop()
      spark.catalog.dropTempView("session_spec")
    }
  }
}
