package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Thin HTTP facade over [[PipelineOrchestrator]] — the one reference
  * behavior a user could literally `curl` (MainController.java:29-61):
  *
  *   - `POST /api/stream/start` → orchestrator.start()
  *   - `POST /api/stream/stop`  → orchestrator.stop()
  *   - `GET  /api/status`       → orchestrator.status
  *
  * Built on the JDK's own HttpServer, so the library gains the surface
  * without a web framework: every lifecycle rule (idempotent start,
  * dim-load → query → producer ordering, drain-direction stop, rollback on
  * producer failure) lives in the orchestrator and is already spec-pinned —
  * this class only translates HTTP verbs and never re-implements state.
  *
  * Bind with `port = 0` for an ephemeral port (tests, parallel pipelines);
  * `boundPort` reports the actual binding. Control operations are rare and
  * orchestrator methods are synchronized, so requests run on the server's
  * dispatch thread — no executor pool to size or leak.
  */
final class HttpControlPlane(orchestrator: PipelineOrchestrator, port: Int = 8080) {
  private val server = HttpServer.create(new InetSocketAddress(port), 0)

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "text/plain; charset=utf-8")
    ex.sendResponseHeaders(code, bytes.length)
    try ex.getResponseBody.write(bytes)
    finally ex.close()
  }

  private def handle(ex: HttpExchange, path: String, method: String)(
      action: => String): Unit =
    // JDK HttpServer routes by longest PREFIX match, so without the exact
    // path check /api/stream/startle would reach — and run — the start
    // handler; unmatched suffixes must 404, not execute lifecycle actions
    if (ex.getRequestURI.getPath != path) respond(ex, 404, "Not Found")
    else if (ex.getRequestMethod != method) respond(ex, 405, "Method Not Allowed")
    else
      try respond(ex, 200, action)
      catch {
        // an orchestrator failure (producer down, query stop timeout) is a
        // server-side error; the body carries the message, mirroring the
        // plain-text contract of the 200 path. getMessage is null for bare
        // NPE-style exceptions — fall back to the class name — and the 500
        // respond itself can fail if the 200 path died AFTER headers went
        // out (client disconnect mid-write): those two modes —
        // headers-already-sent (IllegalStateException) and socket I/O —
        // stay quiet; anything else is a genuine respond bug and must
        // surface, not vanish into a blanket swallow
        case e: Throwable =>
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
          try respond(ex, 500, s"Error: $msg")
          catch {
            // if sendResponseHeaders itself threw, respond's finally never
            // ran — close here or the connection leaks (close is idempotent)
            case _: IllegalStateException | _: java.io.IOException => ex.close()
          }
      }

  server.createContext("/api/stream/start",
    (ex: HttpExchange) => handle(ex, "/api/stream/start", "POST")(orchestrator.start()))
  server.createContext("/api/stream/stop",
    (ex: HttpExchange) => handle(ex, "/api/stream/stop", "POST")(orchestrator.stop()))
  server.createContext("/api/status",
    (ex: HttpExchange) => handle(ex, "/api/status", "GET")(orchestrator.status))
  server.setExecutor(null)

  def start(): Unit = server.start()
  def boundPort: Int = server.getAddress.getPort
  def shutdown(): Unit = server.stop(0)
}
