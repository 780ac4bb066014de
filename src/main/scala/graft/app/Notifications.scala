package graft.app

/** K5/F9: usage-report notifications. The reference renders Jinja2
  * templates (default + email) with the cluster name and report URL and
  * posts the per-type message dict to SNS channels resolved from config
  * (kafka_overwatch/notifications/aws_sns/__init__.py:82-152). Here the
  * rendering is a `${var}` template, a Message carries one body per
  * message type (the reference's MessageStructure=json dict), and
  * delivery is a channel interface with a live HTTP webhook
  * implementation — an SNS/SMTP publisher is another Channel impl in a
  * deployment; tests observe the recording channel and a local HTTP
  * server.
  */
object Notifications {

  /** subject + one rendered body per message type ("default", "email"). */
  final case class Message(subject: String, bodies: Map[String, String])

  trait Channel {
    def publish(message: Message): Unit
    def name: String
  }

  final class RecordingChannel(val name: String) extends Channel {
    val published = scala.collection.mutable.ArrayBuffer.empty[Message]
    def publish(message: Message): Unit = published += message
  }

  private[app] def jsonEsc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** Live delivery over HTTP POST: the message as a small JSON document
    * (same payload shape as the SNS publish: subject + per-type bodies). */
  final class WebhookChannel(val name: String, url: String,
                             timeoutMillis: Int = 5000) extends Channel {
    def publish(message: Message): Unit = {
      val bodies = message.bodies.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""${jsonEsc(k)}": "${jsonEsc(v)}"""" }
        .mkString("{", ", ", "}")
      val payload =
        s"""{"subject": "${jsonEsc(message.subject)}", "bodies": $bodies}"""
      val conn = new java.net.URI(url).toURL.openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setConnectTimeout(timeoutMillis)
      conn.setReadTimeout(timeoutMillis)
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/json")
      val out = conn.getOutputStream
      try out.write(payload.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      val code = conn.getResponseCode
      conn.getInputStream.readAllBytes()
      if (code >= 300)
        throw new java.io.IOException(s"webhook $name returned HTTP $code")
    }
  }

  /** The one AWS call of the SNS channel, behind a seam: tests record it,
    * [[AwsSnsTransport]] binds it to the real SDK. */
  trait SnsTransport {
    def publish(topicArn: String, subject: String, message: String,
                messageStructure: Option[String]): Unit
  }

  final class RecordingSnsTransport extends SnsTransport {
    val published =
      scala.collection.mutable.ArrayBuffer.empty[(String, String, String, Option[String])]
    var failWith: Option[Exception] = None
    def publish(topicArn: String, subject: String, message: String,
                messageStructure: Option[String]): Unit = {
      failWith.foreach(throw _)
      published += ((topicArn, subject, message, messageStructure))
    }
  }

  /** K5: the SNS channel — per-type bodies as ONE publish with
    * MessageStructure=json, the reference's exact wire contract
    * (notifications/aws_sns/__init__.py:82-98: a dict message is
    * json.dumps'ed and published with MessageStructure="json"; SNS then
    * routes the "email" body to email subscribers and "default"
    * elsewhere). Publish failures are logged and swallowed like the
    * reference's ClientError handler (:99-104); `ignoreErrors` guards
    * message-construction failures the way the reference's
    * ignore_errors guards template rendering (:126-151). */
  final class SnsChannel(val name: String, topicArn: String,
                         transport: SnsTransport, ignoreErrors: Boolean = false)
      extends Channel {
    def publish(message: Message): Unit =
      try {
        // SNS rejects MessageStructure=json without a "default" key
        if (!message.bodies.contains("default"))
          throw new IllegalArgumentException(
            s"sns.$name: MessageStructure=json requires a 'default' body")
        val json = message.bodies.toSeq.sortBy(_._1)
          .map { case (k, v) => s""""${jsonEsc(k)}": "${jsonEsc(v)}"""" }
          .mkString("{", ", ", "}")
        try transport.publish(topicArn, message.subject, json, Some("json"))
        catch {
          case e: Exception => System.err.println(
            s"sns.$name - Failed to send notification to $topicArn: $e")
        }
      } catch {
        case e: IllegalArgumentException if ignoreErrors =>
          System.err.println(s"sns.$name - $e (ignore_errors)")
      }
  }

  /** [[SnsTransport]] over AWS SDK v2, bound REFLECTIVELY (the engine
    * ships no AWS dependency; a deployment adds sdk sns [+ sts when
    * assuming a role] to the classpath — same pattern as the reflective
    * kafka-clients binding). Role assumption mirrors the reference's
    * optional role_arn session (aws_sns/__init__.py:58-66). */
  class AwsSnsTransport(roleArn: Option[String] = None) extends SnsTransport {
    /** Classloading seam — overridable in tests (see KafkaAdminApi). */
    protected def forName(n: String): Class[_] = Class.forName(n)
    private def cls(n: String): Class[_] =
      try forName(n)
      catch {
        case e: ClassNotFoundException => throw new IllegalStateException(
          s"aws sdk is not on the classpath (while loading $n); add " +
            "software.amazon.awssdk:sns (+ :sts for role_arn) to publish " +
            "to SNS — the engine itself carries no AWS dependency", e)
      }
    private def call(t: AnyRef, name: String, args: AnyRef*): AnyRef = {
      val m = t.getClass.getMethods
        .find(m => m.getName == name && m.getParameterCount == args.length)
        .getOrElse(throw new NoSuchMethodException(s"${t.getClass}.$name/${args.length}"))
      m.setAccessible(true)
      m.invoke(t, args: _*)
    }
    private def createStatic(className: String): AnyRef =
      cls(className).getMethod("create").invoke(null)

    private lazy val client: AnyRef = roleArn match {
      case None => createStatic("software.amazon.awssdk.services.sns.SnsClient")
      case Some(arn) =>
        val sts = createStatic("software.amazon.awssdk.services.sts.StsClient")
        val assumeReq = call(call(call(
          cls("software.amazon.awssdk.services.sts.model.AssumeRoleRequest")
            .getMethod("builder").invoke(null),
          "roleArn", arn), "roleSessionName", "KafkaOverwatch"), "build")
        val provider = call(call(call(
          cls("software.amazon.awssdk.services.sts.auth.StsAssumeRoleCredentialsProvider")
            .getMethod("builder").invoke(null),
          "stsClient", sts), "refreshRequest", assumeReq), "build")
        val builder = cls("software.amazon.awssdk.services.sns.SnsClient")
          .getMethod("builder").invoke(null)
        call(call(builder, "credentialsProvider", provider), "build")
    }

    def publish(topicArn: String, subject: String, message: String,
                messageStructure: Option[String]): Unit = {
      var b = cls("software.amazon.awssdk.services.sns.model.PublishRequest")
        .getMethod("builder").invoke(null)
      b = call(b, "topicArn", topicArn)
      b = call(b, "subject", subject)
      b = call(b, "message", message)
      messageStructure.foreach(ms => b = call(b, "messageStructure", ms))
      call(client, "publish", call(b, "build"))
    }
  }

  /** SMTP delivery of the "email" body — a minimal RFC 5321 client over a
    * plain socket (HELO/MAIL/RCPT/DATA with dot-stuffing), so the channel
    * is live-testable against a local server the way the webhook channel
    * is. The reference reaches email subscribers through SNS's email
    * protocol; a direct SMTP channel covers deployments without SNS. */
  final class SmtpChannel(val name: String, host: String, port: Int,
                          mailFrom: String, mailTo: Seq[String],
                          timeoutMillis: Int = 5000) extends Channel {
    def publish(message: Message): Unit = {
      require(mailTo.nonEmpty, s"smtp.$name: at least one recipient required")
      val body = message.bodies.getOrElse("email",
        message.bodies.getOrElse("default", ""))
      val socket = new java.net.Socket()
      try {
        socket.connect(new java.net.InetSocketAddress(host, port), timeoutMillis)
        socket.setSoTimeout(timeoutMillis)
        val in = new java.io.BufferedReader(new java.io.InputStreamReader(
          socket.getInputStream, java.nio.charset.StandardCharsets.US_ASCII))
        val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
          socket.getOutputStream, java.nio.charset.StandardCharsets.US_ASCII))
        def send(cmd: String): Unit = { out.write(cmd); out.write("\r\n"); out.flush() }
        def expect(ok: Int*): Unit = {
          var line = in.readLine()
          // multi-line replies: "250-..." continues, "250 ..." ends
          while (line != null && line.length >= 4 && line.charAt(3) == '-')
            line = in.readLine()
          val code = Option(line).filter(_.length >= 3)
            .map(_.substring(0, 3).toInt).getOrElse(-1)
          if (!ok.contains(code))
            throw new java.io.IOException(
              s"smtp.$name: expected ${ok.mkString("/")}, got '$line'")
        }
        expect(220)
        send("HELO graft"); expect(250)
        send(s"MAIL FROM:<$mailFrom>"); expect(250)
        mailTo.foreach { r => send(s"RCPT TO:<$r>"); expect(250, 251) }
        send("DATA"); expect(354)
        val headers = Seq(
          s"From: $mailFrom",
          s"To: ${mailTo.mkString(", ")}",
          s"Subject: ${message.subject}",
          "")
        (headers ++ body.split("\n", -1).toSeq).foreach { l =>
          send(if (l.startsWith(".")) "." + l else l) // dot-stuffing
        }
        send("."); expect(250)
        send("QUIT")
      } finally socket.close()
    }
  }

  val DefaultTemplate: String =
    "Kafka overwatch usage report for ${cluster_name} generated at ${timestamp}." +
      " Report available at ${report_url}."
  val EmailTemplate: String =
    "Hello,\n\nThe Kafka usage report for cluster ${cluster_name}" +
      " (generated ${timestamp}) is available at ${report_url}.\n"

  /** F9: `${var}` substitution; unknown variables fail loudly. */
  def render(template: String, vars: Map[String, String]): String =
    raw"\$$\{([a-z_]+)\}".r.replaceAllIn(template, m =>
      scala.util.matching.Regex.quoteReplacement(
        vars.getOrElse(m.group(1),
          throw new IllegalArgumentException(s"unbound template var ${m.group(1)}"))))

  /** Post-report hook: render BOTH message types (reference
    * usage_report_messages_templates) + fan out to every channel. */
  def notifyReport(channels: Seq[Channel], clusterName: String,
                   timestamp: String, reportUrl: String): Unit = {
    val vars = Map("cluster_name" -> clusterName, "timestamp" -> timestamp,
      "report_url" -> reportUrl)
    val msg = Message(
      subject = s"Kafka usage report - $clusterName",
      bodies = Map(
        "default" -> render(DefaultTemplate, vars),
        "email" -> render(EmailTemplate, vars)))
    channels.foreach(_.publish(msg))
  }
}
