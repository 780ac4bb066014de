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

  test("config parses sns + smtp channels with the reference's field names") {
    val c = GraftConfig.parse(
      """notification_channels:
        |  sns:
        |    alerts:
        |      topic_arn: arn:aws:sns:eu-west-1:123456789012:reports
        |      role_arn: arn:aws:iam::123456789012:role/publisher
        |      ignore_errors: true
        |  smtp:
        |    mail:
        |      host: mail.example.com
        |      port: 2525
        |      mail_from: overwatch@example.com
        |      mail_to: [ops@example.com, data@example.com]
        |clusters:
        |  prod:
        |    reporting_config:
        |      notification_channels: [alerts, mail]
        |""".stripMargin)
    assert(c.snsChannels === Seq(app.SnsChannelConfig("alerts",
      "arn:aws:sns:eu-west-1:123456789012:reports",
      Some("arn:aws:iam::123456789012:role/publisher"), ignoreErrors = true)))
    assert(c.smtpChannels === Seq(app.SmtpChannelConfig("mail",
      "mail.example.com", 2525, "overwatch@example.com",
      Seq("ops@example.com", "data@example.com"))))
    // sns without topic_arn fails; duplicate names across kinds fail
    intercept[IllegalArgumentException](GraftConfig.parse(
      "notification_channels:\n  sns:\n    bad: {}\n"))
    intercept[IllegalArgumentException](GraftConfig.parse(
      """notification_channels:
        |  webhook:
        |    dup: {url: http://x/y}
        |  sns:
        |    dup: {topic_arn: arn:aws:sns:x:1:t}
        |""".stripMargin))
  }

  test("sns channel publishes ONE MessageStructure=json message per report") {
    val t = new Notifications.RecordingSnsTransport
    val ch = new Notifications.SnsChannel("alerts", "arn:aws:sns:x:1:t", t)
    Notifications.notifyReport(Seq(ch), "c1", "2023-11-14T22:16:20Z",
      "s3://bucket/report.json")
    assert(t.published.size === 1)
    val (arn, subject, message, structure) = t.published.head
    assert(arn === "arn:aws:sns:x:1:t")
    assert(subject === "Kafka usage report - c1")
    assert(structure === Some("json")) // the reference's dict publish path
    assert(message.contains(""""default": "Kafka overwatch usage report for c1"""))
    assert(message.contains(""""email": "Hello,"""))
    assert(message.contains("s3://bucket/report.json"))
  }

  test("sns channel: publish failures are swallowed, bad messages honor ignore_errors") {
    val failing = new Notifications.RecordingSnsTransport
    failing.failWith = Some(new RuntimeException("sns down"))
    // transport failure: logged + swallowed (the reference's ClientError path)
    new Notifications.SnsChannel("a", "arn:x", failing)
      .publish(Notifications.Message("s", Map("default" -> "d")))
    // missing "default" body: invalid for MessageStructure=json
    val strict = new Notifications.SnsChannel("a", "arn:x",
      new Notifications.RecordingSnsTransport, ignoreErrors = false)
    intercept[IllegalArgumentException](
      strict.publish(Notifications.Message("s", Map("email" -> "e"))))
    val lax = new Notifications.SnsChannel("a", "arn:x",
      new Notifications.RecordingSnsTransport, ignoreErrors = true)
    lax.publish(Notifications.Message("s", Map("email" -> "e"))) // no throw
  }

  test("aws sns transport fails fast and clearly without the sdk") {
    // absence simulated via the forName seam (contract stubs put real
    // aws-sdk FQNs on the test classpath)
    val t = new Notifications.AwsSnsTransport() {
      override protected def forName(n: String): Class[_] =
        throw new ClassNotFoundException(n)
    }
    val e = intercept[IllegalStateException](t.publish("arn:x", "s", "m", None))
    assert(e.getMessage.contains("aws sdk is not on the classpath"))
  }

  test("smtp channel speaks rfc5321 and delivers the email body") {
    val transcript = new java.util.concurrent.LinkedBlockingQueue[String]()
    val server = new java.net.ServerSocket(0)
    val worker = new Thread(() => {
      val s = server.accept()
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(s.getInputStream))
      val out = new java.io.PrintWriter(s.getOutputStream, true)
      def reply(l: String): Unit = { out.print(l + "\r\n"); out.flush() }
      reply("220 test ESMTP")
      var inData = false
      var line = in.readLine()
      while (line != null) {
        transcript.put(line)
        if (inData) { if (line == ".") { inData = false; reply("250 queued") } }
        else line.split(" ", 2).head.toUpperCase match {
          case "HELO" => reply("250 hi")
          case "MAIL" | "RCPT" => reply("250 ok")
          case "DATA" => inData = true; reply("354 go")
          case "QUIT" => reply("221 bye"); s.close()
          case _ => reply("500 what")
        }
        line = if (s.isClosed) null else in.readLine()
      }
    })
    worker.start()
    try {
      val ch = new Notifications.SmtpChannel("mail", "localhost",
        server.getLocalPort, "overwatch@example.com",
        Seq("ops@example.com", "data@example.com"))
      Notifications.notifyReport(Seq(ch), "c1", "2023-11-14T22:16:20Z",
        "file:///tmp/report.json")
      worker.join(5000)
      val lines = new java.util.ArrayList[String]()
      transcript.drainTo(lines)
      val t = lines.toArray(Array.empty[String]).toSeq
      assert(t.contains("MAIL FROM:<overwatch@example.com>"))
      assert(t.contains("RCPT TO:<ops@example.com>"))
      assert(t.contains("RCPT TO:<data@example.com>"))
      assert(t.contains("Subject: Kafka usage report - c1"))
      assert(t.exists(_.startsWith("Hello,"))) // the email body, not default
      assert(t.contains("."))
    } finally server.close()
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
