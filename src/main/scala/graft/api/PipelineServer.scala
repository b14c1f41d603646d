package graft.api

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import graft.load.Reports

/** Minimal HTTP front-end mirroring the reference's run API
  * (backend/app/api/endpoints/pipeline.py + pipeline_service.py):
  *
  *   POST /pipeline/run            artifact-driven run request -> {run_id}
  *   GET  /pipeline/status/{id}    RunStatus JSON
  *   GET  /pipeline/results/{id}   results contract (404 until complete)
  *   GET  /pipeline/history        all runs
  *
  * Built on the JDK's HttpServer (zero extra dependencies — the engine
  * classpath is Spark-only); JSON via the shared snake_case report
  * serializer. The WebSocket progress push of the reference maps to
  * status polling here; the progress/stage-flag contract is identical.
  */
class PipelineServer(service: PipelineService, port: Int = 0) {

  private val server = HttpServer.create(new InetSocketAddress(port), 0)

  def start(): Int = {
    server.createContext("/pipeline", new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        try route(ex)
        catch {
          case e: Exception => send(ex, 500, s"""{"error": "${e.getMessage}"}""")
        } finally ex.close()
    })
    server.setExecutor(null)
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = server.stop(0)

  private def route(ex: HttpExchange): Unit = {
    val path = ex.getRequestURI.getPath
    (ex.getRequestMethod, path.split("/").filter(_.nonEmpty).toList) match {
      case ("POST", List("pipeline", "run")) =>
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val runId = service.createRun(RunRequestJson.parse(body))
        send(ex, 200, s"""{"run_id": "$runId"}""")
      case ("GET", List("pipeline", "status", id)) =>
        service.getStatus(id) match {
          case Some(st) => send(ex, 200, Reports.toJson(st))
          case None => send(ex, 404, """{"error": "run not found"}""")
        }
      case ("GET", List("pipeline", "results", id)) =>
        service.getResults(id) match {
          case Some(res) => send(ex, 200, Reports.toJson(res))
          case None => send(ex, 404, """{"error": "results not available"}""")
        }
      case ("GET", List("pipeline", "history")) =>
        send(ex, 200, Reports.toJson(service.history))
      case _ =>
        send(ex, 404, """{"error": "unknown route"}""")
    }
  }

  private def send(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
  }
}
