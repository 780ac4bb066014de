package graft.app

/** K5/F9: usage-report notifications. The reference renders Jinja2
  * templates (default + email) with the cluster name and report URL and
  * posts to SNS channels resolved from config
  * (kafka_overwatch/notifications/aws_sns/__init__.py:82-152). Here the
  * rendering is a `${var}` template and delivery is a channel interface —
  * a deployment plugs an SNS/SMTP/webhook publisher in; tests observe a
  * recording channel.
  */
object Notifications {

  final case class Message(subject: String, body: String)

  trait Channel {
    def publish(message: Message): Unit
    def name: String
  }

  final class RecordingChannel(val name: String) extends Channel {
    val published = scala.collection.mutable.ArrayBuffer.empty[Message]
    def publish(message: Message): Unit = published += message
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

  /** Post-report hook: render + fan out to every configured channel. */
  def notifyReport(channels: Seq[Channel], clusterName: String,
                   timestamp: String, reportUrl: String): Unit = {
    val vars = Map("cluster_name" -> clusterName, "timestamp" -> timestamp,
      "report_url" -> reportUrl)
    val msg = Message(
      subject = s"Kafka usage report - $clusterName",
      body = render(DefaultTemplate, vars))
    channels.foreach(_.publish(msg))
  }
}
