package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.PlayerStatsRow
import graft.core.stats.PlayerStatsEngine
import graft.ext.Multimodal

/** End-to-end: raw CSV lines → parse → union → stateful stats → memory sink,
  * plus the control plane and the multimodal plumbing. */
class PipelineSpec extends SparkTestBase {
  import spark.implicits._

  test("full pipeline from raw kill+damage lines equals the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val killLines = MemoryStream[String]
    val damageLines = MemoryStream[String]

    val stats = Pipeline.playerStats(
      killLines.toDS().toDF("value"), damageLines.toDS().toDF("value"))
    val q = stats.writeStream.outputMode("update").format("memory")
      .queryName("pipeline_spec").start()
    try {
      //          0  1tick 2rnd 3killer 4kid 5 6 7victim 8vid 9 10 11assist 12aid
      killLines.addData(
        "x,1280,1,Ada,S1,x,x,Bo,S2,x,x,,",
        "x,1408,1,Bo,S2,x,x,Ada,S1,x,x,0,S3")
      //            0  1tick 2rnd 3 4 5old 6new 7 8 9damager 10
      damageLines.addData(
        "x,1280,1,x,x,100,60,x,x,S1,x",
        "x,1408,1,x,x,60,0,x,x,S2,x")
      q.processAllAvailable()

      // latest snapshot per key = max CUMULATIVE counters (monotone across
      // batches), NOT max second — `second` is batch-scoped, so a later
      // batch carrying only earlier-game events emits a smaller second
      val streamed = spark.table("pipeline_spec")
        .as[PlayerStatsRow].collect()
        .groupBy(_.steamId)
        .map(_._2.maxBy(r => r.kills + r.deaths + r.assists + r.damage))
        .toSeq.sortBy(_.steamId)

      // Ada: 1 kill, 1 death, 40 dmg; Bo: 1 kill, 1 death, 60 dmg
      streamed.map(r => (r.steamId, r.playerName, r.kills, r.deaths, r.damage)) shouldBe
        Seq(("S1", "Ada", 1L, 1L, 40L), ("S2", "Bo", 1L, 1L, 60L))
      streamed.foreach(_.kdRatio shouldBe 1.0)
    } finally {
      q.stop()
      spark.catalog.dropTempView("pipeline_spec")
    }
  }

  test("StreamController start is idempotent, stop reports state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val builds = new AtomicInteger(0)
    val controller = new StreamController(() => {
      builds.incrementAndGet()
      mem.toDS().writeStream.format("noop").start()
    })
    controller.status shouldBe "Stopped"
    controller.start() shouldBe "Started"
    controller.status shouldBe "Running"
    controller.start() shouldBe "Already running"
    builds.get() shouldBe 1
    controller.stop() shouldBe "Stopped"
    controller.status shouldBe "Stopped"
    controller.stop() shouldBe "Not running"
  }

  test("orchestrator sequences dim-load -> query -> producer, and reverses on stop") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val log = scala.collection.mutable.ArrayBuffer[String]()
    val controller = new StreamController(() => {
      log += "query-start"
      mem.toDS().writeStream.format("noop").start()
    })
    val orch = new PipelineOrchestrator(
      loadDimension = () => log += "dim-load",
      controller = controller,
      producerStart = () => log += "producer-start",
      producerStop = () => log += "producer-stop")
    orch.status shouldBe "Stopped"
    orch.start() shouldBe "Started"
    orch.start() shouldBe "Already running" // no double dim-load / producer hit
    orch.stop() shouldBe "Stopped"
    orch.stop() shouldBe "Not running"
    log.toSeq shouldBe Seq("dim-load", "query-start", "producer-start", "producer-stop")
  }

  test("HTTP control plane drives the orchestrator end-to-end over real sockets") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val log = scala.collection.mutable.ArrayBuffer[String]()
    val controller = new StreamController(() => {
      log += "query-start"
      mem.toDS().writeStream.format("noop").start()
    })
    val orch = new PipelineOrchestrator(
      loadDimension = () => log += "dim-load",
      controller = controller,
      producerStart = () => log += "producer-start",
      producerStop = () => log += "producer-stop")
    val http = new HttpControlPlane(orch, port = 0) // ephemeral port
    http.start()
    try {
      val base = s"http://127.0.0.1:${http.boundPort}"
      def call(method: String, path: String): (Int, String) = {
        val conn = new java.net.URL(base + path).openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestMethod(method)
        val code = conn.getResponseCode
        val in = if (code >= 400) conn.getErrorStream else conn.getInputStream
        val body = new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        conn.disconnect()
        (code, body)
      }
      call("GET", "/api/status") shouldBe ((200, "Stopped"))
      call("POST", "/api/stream/start") shouldBe ((200, "Started"))
      call("GET", "/api/status") shouldBe ((200, "Running"))
      // idempotent start straight from the reference's guard
      call("POST", "/api/stream/start") shouldBe ((200, "Already running"))
      call("POST", "/api/stream/stop") shouldBe ((200, "Stopped"))
      call("GET", "/api/status") shouldBe ((200, "Stopped"))
      call("POST", "/api/stream/stop") shouldBe ((200, "Not running"))
      // verb discipline: status is GET-only, lifecycle is POST-only
      call("POST", "/api/status")._1 shouldBe 405
      call("GET", "/api/stream/start")._1 shouldBe 405
      // path discipline: the JDK server prefix-matches contexts, so an
      // unmatched suffix must 404 — NOT start the pipeline (regression:
      // /api/stream/startle used to run the start handler)
      call("POST", "/api/stream/startle")._1 shouldBe 404
      call("GET", "/api/status/anything")._1 shouldBe 404
      call("GET", "/api/status") shouldBe ((200, "Stopped")) // still stopped
      // the full reference ordering ran exactly once
      log.toSeq shouldBe
        Seq("dim-load", "query-start", "producer-start", "producer-stop")
    } finally http.shutdown()
  }

  test("HTTP control plane surfaces orchestrator failures as 500, not hangs") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val controller = new StreamController(() =>
      mem.toDS().writeStream.format("noop").start())
    val orch = new PipelineOrchestrator(
      () => (), controller, producerStart = () => sys.error("producer down"))
    val http = new HttpControlPlane(orch, port = 0)
    http.start()
    try {
      val conn = new java.net.URL(
        s"http://127.0.0.1:${http.boundPort}/api/stream/start").openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.getResponseCode shouldBe 500
      val body = new String(conn.getErrorStream.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      body should include("producer down")
      conn.disconnect()
      // rollback held: the failed start left nothing running
      controller.status shouldBe "Stopped"
    } finally http.shutdown()
  }

  test("multimodal: binary payload plumbing and deterministic stub features") {
    val df = Seq((7L, "abcd")).toDF("id", "payload")
    val media = Multimodal.asMediaTable(df, "id", "payload", "image/fake")
    media.schema("payload").dataType.typeName shouldBe "binary"
    val feats = Multimodal.extractFeatures(media).collect()
    feats should have size 1
    val f = feats.head
    f.id shouldBe 7L
    f.nBytes shouldBe 4L
    f.width shouldBe 5   // 1 + 4 % 64
    f.height shouldBe 5  // 1 + 4 % 48
    f.brightness shouldBe ((97 + 98 + 99 + 100) / 4.0)
  }

  test("orchestrator failure paths: producer errors never strand the query") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val controller = new StreamController(() =>
      mem.toDS().writeStream.format("noop").start())
    // start: producer fails -> query is rolled back, status Stopped
    val failingStart = new PipelineOrchestrator(
      () => (), controller, producerStart = () => sys.error("producer down"))
    an[Exception] should be thrownBy failingStart.start()
    controller.status shouldBe "Stopped"
    // stop: producer fails -> query still stops, failure surfaces after
    val failingStop = new PipelineOrchestrator(
      () => (), controller, producerStop = () => sys.error("producer down"))
    failingStop.start() shouldBe "Started"
    an[Exception] should be thrownBy failingStop.stop()
    controller.status shouldBe "Stopped"
  }

  test("multimodal: null payloads become empty blobs, null ids are dropped") {
    val df = Seq(
      (Some(1L), Some("abc")),
      (Some(2L), None), // null blob: must not NPE in the codec stubs
      (None, Some("xyz")) // no id: no join key, dropped
    ).toDF("id", "payload")
    val media = Multimodal.asMediaTable(df, "id", "payload", "image/fake")
    val feats = Multimodal.extractFeatures(media).orderBy("id").collect()
    feats.map(_.id).toSeq shouldBe Seq(1L, 2L)
    feats.find(_.id == 2L).get.nBytes shouldBe 0L
  }

  test("multimodal resize emits target geometry with bounded payload size") {
    val df = Seq((1L, "abcdefgh" * 100)).toDF("id", "payload")
    val media = Multimodal.asMediaTable(df, "id", "payload", "image/fake")
    val out = Multimodal.resize(media, 16, 16).collect().head
    (out.width, out.height) shouldBe ((16, 16))
    out.payload.length shouldBe 32 // 16*16/8 — rows shrink for downstream shuffles
    // deterministic: same input -> same bytes
    Multimodal.resize(media, 16, 16).collect().head.payload.toSeq shouldBe out.payload.toSeq
  }

  test("multimodal frame sampling is 1->n with payload fully partitioned") {
    val df = Seq((1L, "0123456789")).toDF("id", "payload")
    val media = Multimodal.asMediaTable(df, "id", "payload", "video/fake")
    val frames = Multimodal.sampleFrames(media, 3).collect().sortBy(_.frameIndex)
    frames.map(_.frameIndex).toSeq shouldBe Seq(0, 1, 2)
    frames.flatMap(_.payload).map(_.toChar).mkString shouldBe "0123456789"
  }

  test("multimodal metadata columns are pure expressions over the payload") {
    val df = Seq(("7", "abcd")).toDF("doc_id", "text")
    val r = df.select(Multimodal.metadataColumns("text"): _*).collect().head
    r.getLong(r.fieldIndex("n_bytes")) shouldBe 4L
    r.getString(r.fieldIndex("head_hex")) shouldBe "61626364"
    r.getLong(r.fieldIndex("first_byte")) shouldBe 97L
  }
}
