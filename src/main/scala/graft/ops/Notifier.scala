package graft.ops

import java.nio.charset.StandardCharsets

/** Alert delivery for hunt completion and cron-query hits — the viewer's
  * notifier registry (reference: notifiers/provider.notifme.js slack /
  * twilio / email providers registered under `api.register`, alerts
  * issued via `notifierAPIs.issueAlert`, viewer/viewer.js:1496-1560).
  *
  * The provider surface is a single `notify(title, message)`; provider
  * selection is per hunt / per cron query, exactly like the reference's
  * `hunt.notifier` name. In this sandbox the real transports are a log
  * line and a JSON webhook POST (the slack-webhook shape — the only
  * provider whose transport is plain HTTP); tests use [[Notifier.Memory]].
  *
  * Delivery failures never fail the job that triggered them (the
  * reference's `issueAlert` continues the process regardless) — they are
  * swallowed after `maxRetries`.
  */
trait Notifier extends Serializable {
  def notify(title: String, message: String): Unit
}

object Notifier {

  /** Stderr logging provider — the zero-config default. */
  case object Log extends Notifier {
    def notify(title: String, message: String): Unit =
      System.err.println(s"NOTIFY [$title] $message")
  }

  /** Collects alerts in memory — the test double. */
  final class Memory extends Notifier {
    val alerts = new scala.collection.mutable.ArrayBuffer[(String, String)]
    def notify(title: String, message: String): Unit =
      synchronized { alerts += ((title, message)) }
  }

  /** Incoming-webhook provider: POSTs `{"text": "*title*\nmessage"}` —
    * the slack webhook body the reference's notifme provider sends
    * (provider.notifme.js `slackWebhookUrl`). JDK HttpURLConnection
    * only, best-effort with bounded retry.
    */
  final case class Webhook(url: String, maxRetries: Int = 2) extends Notifier {
    def notify(title: String, message: String): Unit = {
      val body = s"""{"text": ${jsonString(s"*$title*\n$message")}}"""
        .getBytes(StandardCharsets.UTF_8)
      var attempt = 0
      var done = false
      while (!done && attempt <= maxRetries) {
        attempt += 1
        try {
          val conn = new java.net.URL(url).openConnection()
            .asInstanceOf[java.net.HttpURLConnection]
          conn.setRequestMethod("POST")
          conn.setRequestProperty("Content-Type", "application/json")
          conn.setDoOutput(true)
          conn.setConnectTimeout(5000)
          conn.setReadTimeout(10000)
          val out = conn.getOutputStream
          try out.write(body) finally out.close()
          val code = conn.getResponseCode
          conn.disconnect()
          done = code >= 200 && code < 300
        } catch { case _: Exception => () }
      }
    }
  }

  /** Minimal JSON string escaping (quotes, backslash, control chars). */
  private[graft] def jsonString(s: String): String = {
    val b = new StringBuilder("\"")
    s.foreach {
      case '"'           => b.append("\\\"")
      case '\\'          => b.append("\\\\")
      case '\n'          => b.append("\\n")
      case '\r'          => b.append("\\r")
      case '\t'          => b.append("\\t")
      case c if c < 0x20 => b.append(f"\\u${c.toInt}%04x")
      case c             => b.append(c)
    }
    b.append("\"").toString
  }
}
