package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class FunnelSpec extends SparkTestBase {
  import spark.implicits._

  private def steps3 = Seq(
    "a" -> (col("e") === "a"),
    "b" -> (col("e") === "b"),
    "c" -> (col("e") === "c"))

  test("full A→B→C completion, out-of-order arrival") {
    val df = Seq((1L, 30L, "c"), (1L, 10L, "a"), (1L, 20L, "b"))
      .toDF("k", "t", "e")
    val out = Funnel.funnelSteps(df, Seq("k"), "t", steps3)
      .as[(Long, Option[Long], Option[Long], Option[Long], Long)].collect().toSeq
    out shouldBe Seq((1L, Some(10L), Some(20L), Some(30L), 3L))
  }

  test("steps before their predecessor do not count; earliest VALID time wins") {
    // b at t=5 precedes the first a (t=10) → invalid; b at t=40 is the
    // earliest valid b even though a later a (t=20) exists
    val df = Seq((1L, 5L, "b"), (1L, 10L, "a"), (1L, 20L, "a"), (1L, 40L, "b"))
      .toDF("k", "t", "e")
    val out = Funnel.funnelSteps(df, Seq("k"), "t", steps3)
      .as[(Long, Option[Long], Option[Long], Option[Long], Long)].collect().toSeq
    out shouldBe Seq((1L, Some(10L), Some(40L), None, 2L))
  }

  test("equal timestamps do not advance the funnel (strict order)") {
    val df = Seq((1L, 10L, "a"), (1L, 10L, "b")).toDF("k", "t", "e")
    val out = Funnel.funnelSteps(df, Seq("k"), "t", steps3)
      .as[(Long, Option[Long], Option[Long], Option[Long], Long)].collect().toSeq
    out shouldBe Seq((1L, Some(10L), None, None, 1L))
  }

  test("keys fold independently; a key with no step-1 event is depth 0") {
    val df = Seq((1L, 10L, "a"), (2L, 10L, "b")).toDF("k", "t", "e")
    val out = Funnel.funnelSteps(df, Seq("k"), "t", steps3)
      .orderBy("k")
      .as[(Long, Option[Long], Option[Long], Option[Long], Long)].collect().toSeq
    out shouldBe Seq(
      (1L, Some(10L), None, None, 1L),
      (2L, None, None, None, 0L))
  }

  test("streaming funnel across micro-batches equals the batch form (twin law)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import Funnel.{FunnelEvent, FunnelState}
    implicit val sqlCtx = spark.sqlContext
    def ev(k: Long, t: Long, e: String) =
      FunnelEvent(k, t, Seq(e == "a", e == "b", e == "c"))
    val mem = MemoryStream[FunnelEvent]
    val q = Funnel.funnelStream(mem.toDS(), 3)
      .writeStream.outputMode("update").format("memory")
      .queryName("funnel_stream_spec").start()
    try {
      // b@5 precedes the first a → invalid forever (batch agrees)
      mem.addData(ev(1L, 5L, "b"), ev(1L, 10L, "a"))
      q.processAllAvailable()
      // c@30 while b unreached → invalid; b@40 is the earliest valid b
      mem.addData(ev(1L, 20L, "a"), ev(1L, 30L, "c"), ev(1L, 40L, "b"))
      q.processAllAvailable()
      mem.addData(ev(1L, 50L, "c")) // completes; state carried across batches
      q.processAllAvailable()
      val last = spark.table("funnel_stream_spec").as[FunnelState]
        .collect().maxBy(_.funnelStep)
      last shouldBe FunnelState(1L, Seq(Some(10L), Some(40L), Some(50L)), 3L)
      // twin: the batch form over the union of all batches agrees
      val batch = Seq((1L, 5L, "b"), (1L, 10L, "a"), (1L, 20L, "a"),
          (1L, 30L, "c"), (1L, 40L, "b"), (1L, 50L, "c")).toDF("k", "t", "e")
      val out = Funnel.funnelSteps(batch, Seq("k"), "t", steps3)
        .as[(Long, Option[Long], Option[Long], Option[Long], Long)].collect().toSeq
      out shouldBe Seq((1L, Some(10L), Some(40L), Some(50L), 3L))
    } finally {
      q.stop()
      spark.catalog.dropTempView("funnel_stream_spec")
    }
  }

  test("same-timestamp events cannot fill two consecutive steps in one batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import Funnel.{FunnelEvent, FunnelState}
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[FunnelEvent]
    val q = Funnel.funnelStream(mem.toDS(), 2)
      .writeStream.outputMode("update").format("memory")
      .queryName("funnel_stream_ties").start()
    try {
      // one event satisfying BOTH steps, plus a same-time step-2 event:
      // step 1 fills at t=10, step 2 needs t > 10 so neither can fire
      mem.addData(
        FunnelEvent(1L, 10L, Seq(true, true)),
        FunnelEvent(1L, 10L, Seq(false, true)))
      q.processAllAvailable()
      val last = spark.table("funnel_stream_ties").as[FunnelState].collect().head
      last shouldBe FunnelState(1L, Seq(Some(10L), None), 1L)
    } finally {
      q.stop()
      spark.catalog.dropTempView("funnel_stream_ties")
    }
  }

  test("transformWithState funnel equals the legacy API across micro-batches (RocksDB)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import Funnel.{FunnelEvent, FunnelState}
    implicit val sqlCtx = spark.sqlContext
    def ev(k: Long, t: Long, e: String) =
      FunnelEvent(k, t, Seq(e == "a", e == "b", e == "c"))
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[FunnelEvent]
    val q = Funnel.funnelStreamTws(mem.toDS(), 3)
      .writeStream.outputMode("update").format("memory")
      .queryName("funnel_tws_spec").start()
    try {
      // the exact scenario of the legacy twin-law test — both APIs must
      // carry identical semantics batch by batch
      mem.addData(ev(1L, 5L, "b"), ev(1L, 10L, "a"))
      q.processAllAvailable()
      mem.addData(ev(1L, 20L, "a"), ev(1L, 30L, "c"), ev(1L, 40L, "b"))
      q.processAllAvailable()
      mem.addData(ev(1L, 50L, "c"), ev(2L, 60L, "a"))
      q.processAllAvailable()
      val rows = spark.table("funnel_tws_spec").as[FunnelState].collect()
      rows.filter(_.key == 1L).maxBy(_.funnelStep) shouldBe
        FunnelState(1L, Seq(Some(10L), Some(40L), Some(50L)), 3L)
      rows.filter(_.key == 2L).maxBy(_.funnelStep) shouldBe
        FunnelState(2L, Seq(Some(60L), None, None), 1L)
    } finally {
      q.stop()
      spark.catalog.dropTempView("funnel_tws_spec")
      prevProv.fold(spark.conf.unset(provKey))(spark.conf.set(provKey, _))
    }
  }

  test("duplicate step names and reserved columns are rejected") {
    val df = Seq((1L, 10L, "a")).toDF("k", "t", "e")
    an[IllegalArgumentException] should be thrownBy
      Funnel.funnelSteps(df, Seq("k"), "t", Seq(
        "x" -> (col("e") === "a"), "x" -> (col("e") === "b")))
    val clash = Seq((1L, 10L, "a", 0L)).toDF("k", "t", "e", "t_x")
    an[IllegalArgumentException] should be thrownBy
      Funnel.funnelSteps(clash, Seq("k"), "t", Seq("x" -> (col("e") === "a")))
  }
}
