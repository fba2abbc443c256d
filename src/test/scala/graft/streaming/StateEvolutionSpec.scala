package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  StreamingQueryException, TimeMode, TimerValues, Trigger, TTLConfig, ValueState}

import graft.SparkTestBase

/** STATE SCHEMA EVOLUTION across a checkpointed restart — the operational
  * capability `transformWithState` adds over `mapGroupsWithState` (the
  * PlayerStatsEngine scaladoc names it; this spec proves it): a deployment
  * that adds a field to its streaming state type must NOT have to discard
  * months of accumulated state. Spark 4's TWS supports it when the state
  * rows are stored under the AVRO encoding
  * (`spark.sql.streaming.stateStore.encodingFormat = avro`): Avro's
  * reader/writer-schema resolution fills an added `Option` field with null
  * on first read of a pre-evolution row. The default `unsaferow` encoding
  * is positional bytes with no schema resolution, so the same restart must
  * be REFUSED loudly rather than misread old state — both sides proven.
  */
object StateEvolutionSpec {
  case class CountV1(count: Long)
  /** V1 plus an ADDED field — `Option` so Avro schema resolution has a
    * null default for rows written by V1. */
  case class CountV2(count: Long, maxSeen: Option[Long])

  /** Per-key event counter over (key, value) rows — the V1 deployment. */
  class CounterV1 extends StatefulProcessor[Long, (Long, Long), (Long, Long)] {
    @transient private var state: ValueState[CountV1] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[CountV1]("count",
        Encoders.product[CountV1], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
        timers: TimerValues): Iterator[(Long, Long)] = {
      var s = if (state.exists()) state.get() else CountV1(0L)
      rows.foreach(_ => s = CountV1(s.count + 1))
      state.update(s)
      Iterator.single((key, s.count))
    }
  }

  /** The EVOLVED deployment: same state slot name, state type grew a
    * field. Counters must carry over from V1 rows; the new field starts
    * at its null default for pre-evolution keys. */
  class CounterV2
      extends StatefulProcessor[Long, (Long, Long), (Long, Long, Long)] {
    @transient private var state: ValueState[CountV2] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[CountV2]("count",
        Encoders.product[CountV2], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
        timers: TimerValues): Iterator[(Long, Long, Long)] = {
      var s = if (state.exists()) state.get() else CountV2(0L, None)
      rows.foreach { case (_, v) =>
        s = CountV2(s.count + 1,
          Some(math.max(s.maxSeen.getOrElse(Long.MinValue), v)))
      }
      state.update(s)
      Iterator.single((key, s.count, s.maxSeen.getOrElse(-1L)))
    }
  }
}

class StateEvolutionSpec extends SparkTestBase {
  import spark.implicits._
  import StateEvolutionSpec._

  private def rmrf(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.deleteIfExists(f))

  private val provKey = "spark.sql.streaming.stateStore.providerClass"
  private val encKey = "spark.sql.streaming.stateStore.encodingFormat"

  /** Run one AvailableNow pass of `proc` over the (key, value) parquet
    * rows at `src`, appending output to `out` (fresh dir per version —
    * the OUTPUT schema evolves with the processor too). */
  private def runOnce[O: org.apache.spark.sql.Encoder](
      proc: StatefulProcessor[Long, (Long, Long), O],
      src: Path, ckpt: Path, out: String): Unit = {
    val schema = Seq.empty[(Long, Long)].toDF("_1", "_2").schema
    val q = spark.readStream.schema(schema).parquet(src.toString)
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(proc, TimeMode.None(), OutputMode.Update())
      .toDF()
      .writeStream
      .foreachBatch((df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          _: Long) => graft.io.Sinks.parquetAppend(df, out))
      .outputMode("update")
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  private def withStateConfs(encoding: String)(body: => Unit): Unit = {
    val prevProv = spark.conf.getOption(provKey)
    val prevEnc = spark.conf.getOption(encKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(encKey, encoding)
    try body
    finally {
      prevProv.fold(spark.conf.unset(provKey))(spark.conf.set(provKey, _))
      prevEnc.fold(spark.conf.unset(encKey))(spark.conf.set(encKey, _))
    }
  }

  test("avro encoding: an added Option field carries V1 counters across restart") {
    val src = Files.createTempDirectory("graft_ev_src_")
    val ckpt = Files.createTempDirectory("graft_ev_ckpt_")
    val out1 = Files.createTempDirectory("graft_ev_out1_")
    val out2 = Files.createTempDirectory("graft_ev_out2_")
    try withStateConfs("avro") {
      // V1 deployment: two events for key 1 → count 2 in V1 state rows
      Seq((1L, 10L), (1L, 20L)).toDF("_1", "_2")
        .coalesce(1).write.mode("append").parquet(src.toString)
      runOnce(new CounterV1, src, ckpt, out1.toString)
      spark.read.parquet(out1.toString).as[(Long, Long)]
        .collect().toSeq shouldBe Seq((1L, 2L))

      // EVOLVED deployment, same checkpoint: the V1 state row reads back
      // with maxSeen = null (Avro reader-schema default), the counter
      // continues — a restart that wiped state would report count 1
      Seq((1L, 5L)).toDF("_1", "_2")
        .coalesce(1).write.mode("append").parquet(src.toString)
      runOnce(new CounterV2, src, ckpt, out2.toString)
      spark.read.parquet(out2.toString).as[(Long, Long, Long)]
        .collect().toSeq shouldBe Seq((1L, 3L, 5L))
    } finally { rmrf(src); rmrf(ckpt); rmrf(out1); rmrf(out2) }
  }

  test("unsaferow encoding: the same evolution is refused, not misread") {
    val src = Files.createTempDirectory("graft_ev2_src_")
    val ckpt = Files.createTempDirectory("graft_ev2_ckpt_")
    val out1 = Files.createTempDirectory("graft_ev2_out1_")
    val out2 = Files.createTempDirectory("graft_ev2_out2_")
    try withStateConfs("unsaferow") {
      Seq((1L, 10L)).toDF("_1", "_2")
        .coalesce(1).write.mode("append").parquet(src.toString)
      runOnce(new CounterV1, src, ckpt, out1.toString)
      Seq((1L, 5L)).toDF("_1", "_2")
        .coalesce(1).write.mode("append").parquet(src.toString)
      // positional bytes cannot resolve a widened schema: the restart
      // must fail the schema-compatibility check, never return wrong rows
      intercept[StreamingQueryException] {
        runOnce(new CounterV2, src, ckpt, out2.toString)
      }
    } finally { rmrf(src); rmrf(ckpt); rmrf(out1); rmrf(out2) }
  }
}
