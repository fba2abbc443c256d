package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupStateTimeout, Trigger}

import graft.core.Event
import graft.core.stats.PlayerStatsEngine

/** Temporary probe main (removed before final round): drive the
  * timeout-enabled stateful path through the public API with a real
  * MemoryStream; print per-second progress to diagnose batch latency. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val mem = MemoryStream[Event]
    val stats = PlayerStatsEngine.statefulPlayerStats(
      mem.toDS(), GroupStateTimeout.ProcessingTimeTimeout, timeoutMs = 2000L)
    val q = stats.writeStream.outputMode("update").format("memory")
      .queryName("probe_timeout")
      .trigger(Trigger.ProcessingTime("500 milliseconds"))
      .start()

    mem.addData(
      Event("Alice", "S1", "kill", 10L, 0L, 1L),
      Event("", "S1", "damage", 11L, 40L, 1L),
      Event("Bob", "S2", "death", 12L, 0L, 1L))
    var sentBatch2 = false
    (1 to 30).foreach { i =>
      Thread.sleep(1000)
      val p = q.lastProgress
      val bid = if (p == null) -1L else p.batchId
      println(s"[probe] t=${i}s batchId=$bid active=${q.isActive} " +
        s"rows=${spark.table("probe_timeout").count()}")
      if (bid >= 0 && !sentBatch2) {
        // batch 1 done: S2 goes idle; S1 gets one more kill after the
        // 2s timeout has lapsed, so the same batch that folds S1 also
        // fires S2's timer (state removed, no bogus row emitted).
        Thread.sleep(2500)
        mem.addData(Event("Alice", "S1", "kill", 20L, 0L, 2L))
        sentBatch2 = true
      }
    }
    println("[probe] final table (expect: S1 rows with kills=1 then kills=2; S2 only the batch-1 row):")
    spark.table("probe_timeout").orderBy("steamId", "second").show(false)
    q.stop()
    spark.stop()
  }
}
