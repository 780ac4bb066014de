package graft.metrics

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** K4: the /metrics HTTP endpoint (reference: start_http_server(:8000),
  * kafka_overwatch/overwatch.py:49-56) — JDK built-in server, no
  * dependencies. The handler serves whatever exposition document the
  * scheduler last rendered; rendering happens on the scan cadence, not
  * per request, so scrapes never trigger Spark jobs.
  */
final class MetricsHttpServer(port: Int) {
  @volatile private var body: String = "# graft: no scan completed yet\n"
  private val server = HttpServer.create(new InetSocketAddress(port), 0)

  server.createContext("/metrics", new HttpHandler {
    override def handle(x: HttpExchange): Unit = {
      val bytes = body.getBytes(UTF_8)
      x.getResponseHeaders.add("Content-Type",
        "text/plain; version=0.0.4; charset=utf-8")
      x.sendResponseHeaders(200, bytes.length)
      val os = x.getResponseBody
      try os.write(bytes) finally os.close()
    }
  })
  server.setExecutor(null)

  def start(): MetricsHttpServer = { server.start(); this }
  def update(exposition: String): Unit = body = exposition
  def boundPort: Int = server.getAddress.getPort
  def stop(): Unit = server.stop(0)
}
