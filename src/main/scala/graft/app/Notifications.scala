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

  /** Live delivery over HTTP POST: the message as a small JSON document.
    * The sandbox-honest stand-in for the reference's SNS publish (same
    * payload shape: subject + per-type bodies). */
  final class WebhookChannel(val name: String, url: String,
                             timeoutMillis: Int = 5000) extends Channel {
    private def jsonEsc(s: String): String =
      s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }

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
