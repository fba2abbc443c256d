package graft.core.stats

import scala.util.Random

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

import graft.SparkTestBase
import graft.core.{Event, PlayerState, PlayerStatsRow}

class PlayerStatsEngineSpec extends SparkTestBase {
  import spark.implicits._

  private def ev(
      player: String, steamId: String, typ: String,
      second: Long = 0L, amount: Long = 0L, round: Long = 1L): Event =
    Event(player, steamId, typ, second, amount, round)

  // ------------------------------------------------------------ pure fold

  test("fold counts each event type and accumulates damage") {
    val s = Seq(
      ev("A", "S1", "kill"), ev("A", "S1", "kill"), ev("A", "S1", "death"),
      ev("A", "S1", "assist"), ev("", "S1", "damage", amount = 40),
      ev("", "S1", "damage", amount = 2)
    ).foldLeft(PlayerState.empty)(_.fold(_))
    (s.kills, s.deaths, s.assists, s.damage) shouldBe ((2L, 1L, 1L, 42L))
  }

  test("fold keeps the MAX non-blank name — order-insensitive") {
    val events = Seq(
      ev("Bob", "S1", "kill"), ev("", "S1", "damage", amount = 1),
      ev("Zed", "S1", "kill"), ev("Amy", "S1", "kill"), ev("  ", "S1", "kill"))
    val perms = Seq(events, events.reverse, Random.shuffle(events))
    val names = perms.map(_.foldLeft(PlayerState.empty)(_.fold(_)).lastName)
    names.distinct shouldBe Seq("Zed")
  }

  test("fold name order equals Spark's binary (UTF-8) max for supplementary-plane names") {
    // UTF-16 code-unit order would keep U+E000; UTF-8 byte order (Spark's
    // binary collation, used by the batch twin's max()) keeps the emoji
    val names = Seq("\uE000", new String(Character.toChars(0x1F600)))
    val folded = names.map(n => ev(n, "S1", "kill"))
      .foldLeft(PlayerState.empty)(_.fold(_)).lastName
    val sparkMax = names.toDF("n")
      .agg(org.apache.spark.sql.functions.max("n")).collect().head.getString(0)
    folded shouldBe sparkMax
  }

  test("tab-only names are blank in BOTH the fold and the batch twin (Java-trim charset)") {
    // Spark's default trim strips only spaces; the batch twin must use the
    // fold's exact blank set (all chars <= U+0020) or a "\t" name would be
    // kept by one path and dropped by the other
    val folded = Seq(ev("\t", "S1", "kill"), ev("Ada", "S1", "kill"))
      .foldLeft(PlayerState.empty)(_.fold(_))
    folded.lastName shouldBe "Ada"
    val batch = PlayerStatsEngine.batchPlayerStats(
      Seq(ev("\t", "S1", "kill"), ev("Ada", "S1", "kill")).toDF())
      .select("playerName").collect().map(_.getString(0)).toSeq
    batch shouldBe Seq("Ada")
    // a key that ONLY ever saw blank-ish names emits "" in both paths
    Seq(ev("\t", "S2", "kill")).foldLeft(PlayerState.empty)(_.fold(_)).lastName shouldBe ""
    PlayerStatsEngine.batchPlayerStats(Seq(ev("\t", "S2", "kill")).toDF())
      .select("playerName").collect().map(_.getString(0)).toSeq shouldBe Seq("")
  }

  test("batch twin clamps second/round at 0 like the fold's accumulators") {
    // reference inits second/currentRound to 0 — all-negative inputs emit 0
    val events = Seq(ev("Ada", "S1", "kill").copy(second = -5L, round = -3L)).toDF()
    val row = PlayerStatsEngine.batchPlayerStats(events).collect().head
    row.getAs[Long]("second") shouldBe 0L
    // dpr divides by the clamped round: 0 damage / 0 round = NaN, not -0.0
    row.getAs[Double]("damagePerRound").isNaN shouldBe true
  }

  test("whitespace-only names are blank (isBlank semantics) and never stored") {
    val s = Seq(ev("  ", "S1", "kill"), ev("", "S1", "death"))
      .foldLeft(PlayerState.empty)(_.fold(_))
    s.lastName shouldBe ""
  }

  test("kd rule: deaths==0 yields kills, not infinity") {
    PlayerStatsRow.kd(3, 0) shouldBe 3.0
    PlayerStatsRow.kd(3, 2) shouldBe 1.5
    PlayerStatsRow.kd(0, 0) shouldBe 0.0
  }

  test("dpr rule: unguarded Java division (round 0 => Inf/NaN, faithfully)") {
    PlayerStatsRow.dpr(10, 4) shouldBe 2.5
    PlayerStatsRow.dpr(10, 0).isPosInfinity shouldBe true
    PlayerStatsRow.dpr(0, 0).isNaN shouldBe true
  }

  // -------------------------------------------- update fn via TestGroupState

  test("update emits cumulative counters with batch-scoped second/round") {
    val st = TestGroupState.create[PlayerState](
      Optional.of(PlayerState(5, 2, 1, 100, "Ada")),
      GroupStateTimeout.NoTimeout, 0L, Optional.empty[Long], hasTimedOut = false)
    val row = PlayerStatsEngine.update(
      "S1",
      Iterator(ev("Ada", "S1", "kill", second = 30, round = 4),
        ev("", "S1", "damage", second = 31, amount = 50, round = 5)),
      st)
    row.kills shouldBe 6L
    row.damage shouldBe 150L
    row.second shouldBe 31L          // max of THIS batch only
    row.damagePerRound shouldBe 30.0 // 150 / 5 (batch-scoped round)
    row.kdRatio shouldBe 3.0
    st.get.kills shouldBe 6L
  }

  test("timed-out key removes state and emits nothing") {
    val st = TestGroupState.create[PlayerState](
      Optional.of(PlayerState(5, 2, 1, 100, "Ada")),
      GroupStateTimeout.ProcessingTimeTimeout, 1000L, Optional.empty[Long], hasTimedOut = true)
    val out = PlayerStatsEngine.updateExpiring(
      GroupStateTimeout.ProcessingTimeTimeout, 60000L)("S1", Iterator.empty, st)
    out shouldBe empty
    st.isRemoved shouldBe true
  }

  test("non-timed-out call re-arms the processing-time timer") {
    val st = TestGroupState.create[PlayerState](
      Optional.empty[PlayerState], GroupStateTimeout.ProcessingTimeTimeout, 1000L,
      Optional.empty[Long], hasTimedOut = false)
    val out = PlayerStatsEngine.updateExpiring(
      GroupStateTimeout.ProcessingTimeTimeout, 60000L)(
      "S1", Iterator(ev("Ada", "S1", "kill")), st)
    out.toSeq should have size 1
    st.getTimeoutTimestampMs.isPresent() shouldBe true
  }

  // ------------------------------------ streaming vs batch twin equivalence

  test("streaming final state equals batch twin regardless of batch split") {
    implicit val sqlCtx = spark.sqlContext
    val batch1 = Seq(
      ev("Ada", "S1", "kill", second = 1, round = 1),
      ev("", "S2", "damage", second = 2, amount = 30, round = 1))
    val batch2 = Seq(
      ev("Ada", "S1", "death", second = 60, round = 2),
      ev("Bo", "S2", "kill", second = 61, round = 2),
      ev("", "S1", "damage", second = 62, amount = 7, round = 2))

    val mem = MemoryStream[Event]
    val q = PlayerStatsEngine.statefulPlayerStats(mem.toDS())
      .writeStream.outputMode("update").format("memory")
      .queryName("stats_spec").start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()

      // last emitted row per key == batch twin over the concatenated events
      // (cumulative counters are the monotone selector; `second` is
      // batch-scoped and can shrink across batches)
      val streamed = spark.table("stats_spec")
        .as[PlayerStatsRow].collect()
        .groupBy(_.steamId)
        .map { case (_, rows) =>
          rows.maxBy(r => r.kills + r.deaths + r.assists + r.damage)
        }
        .toSeq.sortBy(_.steamId)
      val twin = PlayerStatsEngine
        .batchPlayerStats((batch1 ++ batch2).toDF())
        .as[PlayerStatsRow].collect().toSeq.sortBy(_.steamId)
      streamed shouldBe twin
    } finally {
      q.stop()
      spark.catalog.dropTempView("stats_spec")
    }
  }

  // ------------------------------- transformWithState (Spark 4 TWS) twin

  /** Run `body` with the RocksDB state store provider the TWS operator
    * requires, restoring the previous provider afterwards. */
  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("transformWithState twin equals batch twin regardless of batch split") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val batch1 = Seq(
        ev("Ada", "S1", "kill", second = 1, round = 1),
        ev("", "S2", "damage", second = 2, amount = 30, round = 1))
      val batch2 = Seq(
        ev("Ada", "S1", "death", second = 60, round = 2),
        ev("Bo", "S2", "kill", second = 61, round = 2),
        ev("", "S1", "damage", second = 62, amount = 7, round = 2))
      val mem = MemoryStream[Event]
      val q = PlayerStatsEngine.statefulPlayerStatsTws(mem.toDS())
        .writeStream.outputMode("update").format("memory")
        .queryName("stats_tws_spec").start()
      try {
        mem.addData(batch1: _*)
        q.processAllAvailable()
        mem.addData(batch2: _*)
        q.processAllAvailable()
        val streamed = spark.table("stats_tws_spec")
          .as[PlayerStatsRow].collect()
          .groupBy(_.steamId)
          .map { case (_, rows) =>
            rows.maxBy(r => r.kills + r.deaths + r.assists + r.damage)
          }
          .toSeq.sortBy(_.steamId)
        val twin = PlayerStatsEngine
          .batchPlayerStats((batch1 ++ batch2).toDF())
          .as[PlayerStatsRow].collect().toSeq.sortBy(_.steamId)
        streamed shouldBe twin
      } finally {
        q.stop()
        spark.catalog.dropTempView("stats_tws_spec")
      }
    }
  }

  test("transformWithState warm start resumes counters from the snapshot") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val snapshot = Seq("S1" -> PlayerState(5, 2, 1, 100, "Ada")).toDS()
      val mem = MemoryStream[Event]
      val q = PlayerStatsEngine
        .statefulPlayerStatsTws(mem.toDS(), initial = Some(snapshot))
        .writeStream.outputMode("update").format("memory")
        .queryName("stats_tws_warm").start()
      try {
        mem.addData(
          ev("Ada", "S1", "kill", second = 30, round = 4),
          ev("Bo", "S9", "kill", second = 30, round = 4))
        q.processAllAvailable()
        val rows = spark.table("stats_tws_warm")
          .as[PlayerStatsRow].collect().sortBy(_.steamId)
        rows.map(_.steamId).toSeq shouldBe Seq("S1", "S9")
        rows(0).kills shouldBe 6L   // 5 from the snapshot + 1 new
        rows(0).damage shouldBe 100L
        rows(0).kdRatio shouldBe 3.0
        rows(1).kills shouldBe 1L   // fresh key: snapshot untouched
      } finally {
        q.stop()
        spark.catalog.dropTempView("stats_tws_warm")
      }
    }
  }
}
