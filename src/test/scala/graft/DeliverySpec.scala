package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8
import graft.app.{GraftConfig, Notifications}
import graft.report.RemotePut

/** Live-delivery halves of K3/K5: webhook publish over real HTTP,
  * retrying remote put over the Hadoop FileSystem API, and the config
  * plumbing that wires channels to clusters. */
class DeliverySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("config parses notification channels and validates references") {
    val c = GraftConfig.parse(
      """notification_channels:
        |  webhook:
        |    hooks:
        |      url: http://localhost:9/x
        |clusters:
        |  prod:
        |    reporting_config:
        |      notification_channels: [hooks]
        |""".stripMargin)
    assert(c.notificationChannels === Seq(app.WebhookChannelConfig("hooks", "http://localhost:9/x")))
    assert(c.clusters.head.reporting.notificationChannels === Seq("hooks"))
    intercept[IllegalArgumentException](GraftConfig.parse(
      "clusters:\n  c1:\n    reporting_config:\n      notification_channels: [missing]\n"))
  }

  test("webhook channel POSTs the rendered default+email message as JSON") {
    val received = new java.util.concurrent.atomic.AtomicReference[String]()
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("localhost", 0), 0)
    srv.createContext("/hook", (ex: com.sun.net.httpserver.HttpExchange) => {
      received.set(new String(ex.getRequestBody.readAllBytes(), UTF_8))
      ex.sendResponseHeaders(200, 2)
      ex.getResponseBody.write("ok".getBytes(UTF_8))
      ex.close()
    })
    srv.start()
    try {
      val ch = new Notifications.WebhookChannel("hooks",
        s"http://localhost:${srv.getAddress.getPort}/hook")
      Notifications.notifyReport(Seq(ch), "c1", "2023-11-14T22:16:20Z",
        "file:///tmp/report.json")
      val body = received.get()
      assert(body.contains(""""subject": "Kafka usage report - c1""""))
      assert(body.contains(""""default": "Kafka overwatch usage report for c1"""))
      assert(body.contains(""""email": "Hello,"""))
      assert(body.contains("file:///tmp/report.json"))
    } finally srv.stop(0)
  }

  test("remote put lands bytes at a scheme-qualified destination") {
    val dir = java.nio.file.Files.createTempDirectory("graft-remote")
    val dest = s"file://$dir/sub/report.json"
    RemotePut.put("""{"ok": true}""".getBytes(UTF_8), dest)
    assert(new String(java.nio.file.Files.readAllBytes(
      dir.resolve("sub/report.json")), UTF_8) === """{"ok": true}""")
  }

  test("retrying: backs off between failures, surfaces the last error") {
    var calls = 0
    var sleeps = Vector.empty[Long]
    val got = RemotePut.retrying(attempts = 5, baseMs = 100L, sleeper = sleeps :+= _) {
      () =>
        calls += 1
        if (calls < 3) throw new RuntimeException(s"boom $calls")
        "done"
    }
    assert(got === "done" && calls === 3)
    assert(sleeps === Vector(RemotePut.backoffMs(1, 100L), RemotePut.backoffMs(2, 100L)))
    assert(sleeps(1) > sleeps(0)) // exponential schedule
    val ex = intercept[java.io.IOException](
      RemotePut.retrying(attempts = 2, baseMs = 1L, sleeper = _ => ()) { () =>
        throw new RuntimeException("always")
      })
    assert(ex.getCause.getMessage === "always")
  }

  test("report tick uploads remotely and notifies the configured channels") {
    val out = java.nio.file.Files.createTempDirectory("graft-app-delivery").toString
    val remote = java.nio.file.Files.createTempDirectory("graft-remote-out")
    val rec = new Notifications.RecordingChannel("rec")
    val cfg = app.ClusterConfig("c1",
      reporting = app.ReportingConfig(outputDirectory = s"file://$remote"))
    graft.app.GraftApp.runCluster(spark, cfg, TestSpark.Sf0001, out, ticks = 1,
      channels = Seq(rec))
    assert(java.nio.file.Files.exists(remote.resolve("report_c1.json")))
    assert(rec.published.size === 1)
    val msg = rec.published.head
    assert(msg.subject === "Kafka usage report - c1")
    assert(msg.bodies.keySet === Set("default", "email"))
    assert(msg.bodies("default").contains(s"file://$remote/report_c1.json"))
  }
}
