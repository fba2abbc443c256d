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

  test("batch ewma maxPoints guard: oversized keys fail loudly, bounded keys pass") {
    val df = (1 to 10).map(i => (1L, i.toLong, i.toDouble)).toDF("k", "t", "v")
    // at the bound: fine
    TimeSeries.ewma(df, Seq("k"), Seq("t"), "v", 0.5, maxPoints = 10)
      .collect() should have size 1
    // past the bound: a diagnosable error pointing at the streaming twin,
    // not a silent multi-GB buffer
    val e = intercept[Exception] {
      TimeSeries.ewma(df, Seq("k"), Seq("t"), "v", 0.5, maxPoints = 9).collect()
    }
    e.getMessage should include("ewmaStream")
    an[IllegalArgumentException] should be thrownBy
      TimeSeries.ewma(df, Seq("k"), Seq("t"), "v", 0.5, maxPoints = 0)
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

  // --------------------------------------------------------- spike twins

  private val spikeDays: Seq[(String, Long, Long)] = Seq(
    // key a: quiet baseline then a 10× day 13 (with a day-gap before it),
    // then quiet again — the gap must not slide the RANGE baseline
    ("a", 1L, 10L), ("a", 2L, 12L), ("a", 3L, 9L), ("a", 4L, 11L),
    ("a", 5L, 10L), ("a", 6L, 10L), ("a", 7L, 11L), ("a", 8L, 10L),
    ("a", 9L, 9L), ("a", 10L, 10L), ("a", 11L, 11L), ("a", 13L, 100L),
    ("a", 14L, 10L),
    // key b: too little history — warm-up guard keeps everything quiet
    ("b", 1L, 5L), ("b", 2L, 500L))

  test("batch spikeDetect flags the 10x day and respects warm-up + gaps") {
    val out = TimeSeries.spikeDetect(
        spikeDays.toDF("key", "day", "cnt"), Seq("key"), "day", "cnt")
      .where(col("is_spike"))
      .select("key", "day").as[(String, Long)].collect().toSeq
    out shouldBe Seq(("a", 13L))
  }

  test("streaming spikeStream across micro-batches equals batch spikeDetect (twin law)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.analytics.TimeSeries.DayPoint
    val mem = MemoryStream[DayPoint]
    val q = TimeSeries.spikeStream(mem.toDS())
      .writeStream.outputMode("update").format("memory")
      .queryName("spike_stream_spec").start()
    try {
      val (first, second) = spikeDays.partition(_._2 <= 7)
      mem.addData(first.map(p => DayPoint(p._1, p._2, p._3)): _*)
      q.processAllAvailable()
      mem.addData(second.map(p => DayPoint(p._1, p._2, p._3)): _*)
      q.processAllAvailable()
      val streamed = spark.table("spike_stream_spec")
        .select("key", "day", "cnt", "trailSum", "trailDays", "isSpike")
        .as[(String, Long, Long, Long, Long, Boolean)].collect().toSeq.sorted
      val batch = TimeSeries.spikeDetect(
          spikeDays.toDF("key", "day", "cnt"), Seq("key"), "day", "cnt")
        .select("key", "day", "cnt", "trail_sum", "trail_days", "is_spike")
        .as[(String, Long, Long, Long, Long, Boolean)].collect().toSeq.sorted
      streamed shouldBe batch
    } finally {
      q.stop()
      spark.catalog.dropTempView("spike_stream_spec")
    }
  }

  // ------------------------------------------- transformWithState parity

  private def withRocksDb[T](f: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f
    finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("transformWithState ewma equals the legacy API across micro-batches (RocksDB)") {
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val mem = MemoryStream[Point]
      val q = TimeSeries.ewmaStreamTws(mem.toDS(), 0.5)
        .writeStream.outputMode("update").format("memory")
        .queryName("ewma_tws_spec").start()
      try {
        // the exact legacy twin-law scenario — both APIs must agree
        mem.addData(Point(1L, 10L, 1.0), Point(1L, 20L, 2.0), Point(2L, 10L, 8.0))
        q.processAllAvailable()
        mem.addData(Point(1L, 30L, 3.0))
        q.processAllAvailable()
        val finalRows = spark.table("ewma_tws_spec").as[EwmaState]
          .collect().groupBy(_.key).map { case (k, rs) => k -> rs.maxBy(_.nPoints) }
        finalRows(1L) shouldBe EwmaState(1L, 3L, 2.25)
        finalRows(2L) shouldBe EwmaState(2L, 1L, 8.0)
      } finally {
        q.stop()
        spark.catalog.dropTempView("ewma_tws_spec")
      }
    }
  }

  test("transformWithState spike (MapState baseline) equals batch spikeDetect (RocksDB)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.analytics.TimeSeries.DayPoint
    withRocksDb {
      val mem = MemoryStream[DayPoint]
      val q = TimeSeries.spikeStreamTws(mem.toDS())
        .writeStream.outputMode("update").format("memory")
        .queryName("spike_tws_spec").start()
      try {
        // three batches so the MapState delta writeback (evictions across
        // the day-13 gap) is exercised across state-store commits
        val (first, rest) = spikeDays.partition(_._2 <= 7)
        val (second, third) = rest.partition(_._2 <= 11)
        Seq(first, second, third).foreach { part =>
          mem.addData(part.map(p => DayPoint(p._1, p._2, p._3)): _*)
          q.processAllAvailable()
        }
        val streamed = spark.table("spike_tws_spec")
          .select("key", "day", "cnt", "trailSum", "trailDays", "isSpike")
          .as[(String, Long, Long, Long, Long, Boolean)].collect().toSeq.sorted
        val batch = TimeSeries.spikeDetect(
            spikeDays.toDF("key", "day", "cnt"), Seq("key"), "day", "cnt")
          .select("key", "day", "cnt", "trail_sum", "trail_days", "is_spike")
          .as[(String, Long, Long, Long, Long, Boolean)].collect().toSeq.sorted
        streamed shouldBe batch
      } finally {
        q.stop()
        spark.catalog.dropTempView("spike_tws_spec")
      }
    }
  }

  test("spike TWS with TTL enabled still equals batch spikeDetect (within-TTL parity)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.analytics.TimeSeries.DayPoint
    // TTL far above the test's wall clock, so nothing expires: the gate is
    // that the ProcessingTime time-mode + per-entry TTL config changes NO
    // result within the TTL window. (Actual expiry is wall-clock-driven and
    // cannot be pinned deterministically in a unit test — the writeback
    // policy that makes expiry safe for active series is unit-tested below.)
    // NOTE: under TimeMode.ProcessingTime the engine keeps scheduling
    // batches for timer/TTL housekeeping, and `processAllAvailable` never
    // observes the settled state it waits for (it livelocks) — so this test
    // POLLS the sink for the expected row count instead. Each input point
    // emits exactly one update-mode row, so the expected count is exact.
    withRocksDb {
      val mem = MemoryStream[DayPoint]
      val q = TimeSeries.spikeStreamTws(
          mem.toDS(), ttl = Some(java.time.Duration.ofHours(1)))
        .writeStream.outputMode("update").format("memory")
        .queryName("spike_ttl_spec")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("500 milliseconds"))
        .start()
      try {
        def awaitRows(n: Long): Unit = {
          val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
          while (spark.table("spike_ttl_spec").count() < n) {
            if (System.nanoTime() > deadline)
              fail(s"sink never reached $n rows (TTL-mode stream stalled)")
            Thread.sleep(200)
          }
        }
        val (first, rest) = spikeDays.partition(_._2 <= 7)
        mem.addData(first.map(p => DayPoint(p._1, p._2, p._3)): _*)
        awaitRows(first.size.toLong)
        mem.addData(rest.map(p => DayPoint(p._1, p._2, p._3)): _*)
        awaitRows(spikeDays.size.toLong)
        val streamed = spark.table("spike_ttl_spec")
          .select("key", "day", "cnt", "trailSum", "trailDays", "isSpike")
          .as[(String, Long, Long, Long, Long, Boolean)].collect().toSeq.sorted
        val batch = TimeSeries.spikeDetect(
            spikeDays.toDF("key", "day", "cnt"), Seq("key"), "day", "cnt")
          .select("key", "day", "cnt", "trail_sum", "trail_days", "is_spike")
          .as[(String, Long, Long, Long, Long, Boolean)].collect().toSeq.sorted
        streamed shouldBe batch
      } finally {
        q.stop()
        spark.catalog.dropTempView("spike_ttl_spec")
      }
    }
  }

  test("MapState writeback policy: delta without TTL, full refresh with TTL") {
    val before = Map(1L -> 10L, 2L -> 20L, 3L -> 30L)
    val after = Map(2L -> 20L, 3L -> 31L, 4L -> 40L) // 1 evicted, 2 same, 3 changed, 4 new
    // no TTL: per-entry delta — unchanged entry 2 is NOT rewritten
    val (rm, up) = TimeSeries.mapStateWriteback(before, after, refreshAll = false)
    rm.toSet shouldBe Set(1L)
    up.toMap shouldBe Map(3L -> 31L, 4L -> 40L)
    // TTL: every surviving entry rewritten, renewing its per-entry TTL
    // clock — otherwise an ACTIVE series' stable older days would expire
    // out from under it (trail_sum silently shrinking vs batch)
    val (rmT, upT) = TimeSeries.mapStateWriteback(before, after, refreshAll = true)
    rmT.toSet shouldBe Set(1L)
    upT.toMap shouldBe after
  }
}
