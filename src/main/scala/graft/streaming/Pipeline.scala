package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.core.{Event, PlayerStatsRow}
import graft.core.parse.GameLogParser
import graft.core.stats.PlayerStatsEngine

/** End-to-end streaming pipeline + control plane (reference §2.10, §3).
  *
  * Dataflow (reference SparkStreamingService.java:101-106):
  *   kill lines → parse (P2) ─┐
  *                            union (U1) → stateful stats (A1-A5) → sink (S4)
  *   damage lines → parse (P3)┘
  *
  * The reference wires this inside a Spring service with REST start/stop
  * (MainController.java:29-61); here the control plane is a plain library —
  * capabilities, not Spring, are the requirement (SURVEY.md §7.1.7).
  */
object Pipeline {

  /** Build the full logical plan from two raw line streams (streaming or
    * batch — the plan is identical, which is what makes the batch twin an
    * oracle for the streaming path). */
  def playerStats(killLines: DataFrame, damageLines: DataFrame): Dataset[PlayerStatsRow] = {
    val spark = killLines.sparkSession
    import spark.implicits._
    val kills = GameLogParser.parseKillLines(killLines)
    val damages = GameLogParser.parseDamageLines(damageLines)
    // unionByName: schema-safe bag union (reference uses positional union)
    val events = kills.unionByName(damages).as[Event]
    PlayerStatsEngine.statefulPlayerStats(events)
  }
}

/** Start/stop/status control plane mirroring MainController.java:29-61:
  * idempotent start, stop, "Running"/"Stopped" status. */
final class StreamController(build: () => StreamingQuery) {
  private val running = new AtomicReference[Option[StreamingQuery]](None)

  /** Idempotent-if-running, like the reference's guard (MainController.java:31). */
  def start(): String = synchronized {
    running.get() match {
      case Some(q) if q.isActive => "Already running"
      case _ =>
        running.set(Some(build()))
        "Started"
    }
  }

  def stop(): String = synchronized {
    running.get() match {
      case Some(q) if q.isActive =>
        // release the handle even when stop() throws (e.g. a stop timeout):
        // a query we can no longer control must not keep reporting
        // "Running" forever and block every restart — the reference makes
        // the same call, swallowing stop errors and clearing its flag
        // (SparkStreamingService.java:110-121)
        try q.stop()
        finally running.set(None)
        "Stopped"
      case _ => "Not running"
    }
  }

  def status: String =
    if (running.get().exists(_.isActive)) "Running" else "Stopped"
}

/** The reference's full start/stop ORDERING (MainController.java:29-56,
  * SURVEY.md §3.1/§3.3), abstracted over transport:
  *
  *   start: load dimension → start Spark query → start the upstream
  *          producer (so no events flow before the query is listening);
  *   stop:  stop the producer FIRST, then the query (drain direction).
  *
  * The reference reaches its dimension service and producer over HTTP; here
  * they are injected functions — same lifecycle, any transport. Start is
  * idempotent-if-running like the reference's guard (:31). */
final class PipelineOrchestrator(
    loadDimension: () => Unit,
    controller: StreamController,
    producerStart: () => Unit = () => (),
    producerStop: () => Unit = () => ()) {

  def start(): String = synchronized {
    if (controller.status == "Running") "Already running"
    else {
      loadDimension()
      val r = controller.start()
      // a dead producer must not leave a half-started pipeline behind: the
      // query would look "Running" forever with no events and retries would
      // bounce off the idempotency guard without ever starting the producer
      try producerStart()
      catch { case e: Throwable => controller.stop(); throw e }
      r
    }
  }

  def stop(): String = synchronized {
    if (controller.status != "Running") "Not running"
    else {
      // always stop the query, even if the producer callback fails — the
      // caller asked for the pipeline to be DOWN; surface the producer
      // failure afterwards. If the query stop ALSO fails, rethrow that with
      // the producer failure attached as suppressed rather than losing it.
      val producerFailure =
        try { producerStop(); None }
        catch { case e: Throwable => Some(e) }
      val r =
        try controller.stop()
        catch { case qe: Throwable =>
          producerFailure.foreach(qe.addSuppressed)
          throw qe
        }
      producerFailure.foreach(throw _)
      r
    }
  }

  def status: String = controller.status
}
