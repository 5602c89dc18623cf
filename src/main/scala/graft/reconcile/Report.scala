package graft.reconcile

import org.apache.spark.sql.DataFrame

/** Report delivery seam — the engine twin of the reference's emailed
  * report END STATE (reference: Raptor.py:656-682 builds a MIME message
  * with the HTML body and ships it over SMTP, Raptor.py:161-268). The
  * transport is deliberately pluggable: the engine renders a bounded
  * HTML body and hands `(subject, html)` to whatever carrier the
  * deployment wires in — SMTP, a chat webhook, or the file-based default
  * below. Keeping the seam this narrow means no mail dependency in the
  * engine and a hermetically testable contract. */
trait ReportSink {
  def deliver(subject: String, html: String): Unit
}

/** File-backed default sink: each delivery lands as a self-contained
  * HTML document under `dir` (subject as the title), named by a
  * filesystem-safe slug of the subject — the audit-trail twin of the
  * reference's inbox. Same-subject deliveries overwrite (one current
  * report per subject, like re-running the reference's email job). */
final class FileReportSink(dir: String) extends ReportSink {
  private[reconcile] def slug(subject: String): String = {
    val s = subject.toLowerCase.map(c =>
      if (c.isLetterOrDigit) c else '_').replaceAll("_+", "_")
      .stripPrefix("_").stripSuffix("_")
    if (s.isEmpty) "report" else s.take(80)
  }
  def deliver(subject: String, html: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val doc =
      s"""<!DOCTYPE html>
         |<html><head><meta charset="utf-8"><title>${Report.escapeHtml(subject)}</title></head>
         |<body><h2>${Report.escapeHtml(subject)}</h2>
         |$html
         |</body></html>""".stripMargin
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, slug(subject) + ".html"), doc)
  }
}

/** SMTP transport for the report seam — the reference's actual end
  * state (Raptor.py:656-682: MIME message over smtplib). Speaks plain
  * RFC 5321 over a socket (EHLO / MAIL FROM / RCPT TO / DATA / QUIT) —
  * no mail dependency — and ships the HTML as a base64
  * `text/html; charset=utf-8` MIME part, which sidesteps dot-stuffing
  * and line-length limits entirely. Non-ASCII subjects go as RFC 2047
  * encoded-words. Round-tripped against an in-test socket SMTP server
  * in ReportPopulationSpec (subject, recipients, decoded body). */
final class SmtpReportSink(host: String, port: Int, from: String,
                           recipients: Seq[String]) extends ReportSink {
  require(recipients.nonEmpty, "SmtpReportSink needs at least one recipient")

  private def encodedSubject(s: String): String =
    if (s.forall(c => c >= 32 && c < 127)) s
    else "=?utf-8?B?" + java.util.Base64.getEncoder
      .encodeToString(s.getBytes("UTF-8")) + "?="

  private[graft] def mimeMessage(subject: String, html: String): String = {
    val b64 = java.util.Base64.getMimeEncoder(76, "\r\n".getBytes("US-ASCII"))
      .encodeToString(html.getBytes("UTF-8"))
    s"From: <$from>\r\n" +
      s"To: ${recipients.map(r => s"<$r>").mkString(", ")}\r\n" +
      s"Subject: ${encodedSubject(subject)}\r\n" +
      "MIME-Version: 1.0\r\n" +
      "Content-Type: text/html; charset=utf-8\r\n" +
      "Content-Transfer-Encoding: base64\r\n" +
      "\r\n" + b64
  }

  def deliver(subject: String, html: String): Unit = {
    val sock = new java.net.Socket(host, port)
    try {
      sock.setSoTimeout(15000)
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(sock.getInputStream, "US-ASCII"))
      val out = new java.io.BufferedWriter(
        new java.io.OutputStreamWriter(sock.getOutputStream, "US-ASCII"))
      def expect(code: String): Unit = {
        var line = in.readLine()
        // skip multi-line continuation replies ("250-...")
        while (line != null && line.length > 3 && line.charAt(3) == '-')
          line = in.readLine()
        if (line == null || !line.startsWith(code))
          throw new java.io.IOException(s"smtp: expected $code, got $line")
      }
      def send(cmd: String): Unit = { out.write(cmd); out.write("\r\n"); out.flush() }
      expect("220")
      send("EHLO graft"); expect("250")
      send(s"MAIL FROM:<$from>"); expect("250")
      recipients.foreach { r => send(s"RCPT TO:<$r>"); expect("250") }
      send("DATA"); expect("354")
      send(mimeMessage(subject, html))
      send("."); expect("250")
      send("QUIT"); expect("221")
    } finally sock.close()
  }
}

/** Driver-side report rendering — the engine's equivalent of the
  * reference's HTML email body (reference: Raptor.py:206-268,656-682:
  * `df.limit(n).toPandas().to_html()` + SMTP). Rendering stays bounded
  * (limit(n) before collect); delivery goes through [[ReportSink]].
  */
object Report {

  /** Render the first `n` rows (after an optional global sort already
    * applied by the caller) as a minimal HTML table. Bounded by limit():
    * only `n` rows ever reach the driver. */
  def htmlTable(df: DataFrame, n: Int = 15): String = {
    val cols = df.columns
    val rows = df.limit(n).collect()
    val head = cols.map(c => s"<th>$c</th>").mkString
    val body = rows.map { r =>
      cols.indices.map { i =>
        val v = if (r.isNullAt(i)) "" else r.get(i).toString
        s"<td>${escape(v)}</td>"
      }.mkString
    }.map(tds => s"<tr>$tds</tr>").mkString("\n")
    s"<table>\n<tr>$head</tr>\n$body\n</table>"
  }

  /** Full reconciliation report: row counts, worst columns (globally
    * sorted by mismatch count — the reference's O1 sort,
    * Raptor.py:219-224, done numerically BEFORE formatting, fixing its
    * lexical-sort-of-percentage bug), and a bounded sample of cell
    * mismatches. */
  def reconciliation(diff: DiffResult, sampleRows: Int = 15): String = {
    import org.apache.spark.sql.functions.col
    val counts = htmlTable(diff.rowCounts, 10)
    val worst = htmlTable(
      diff.columnSummary.orderBy(col("mismatch_count").desc), 10)
    val sample = htmlTable(diff.cellMismatches, sampleRows)
    s"""<h3>Row counts</h3>
       |$counts
       |<h3>Mismatches by column</h3>
       |$worst
       |<h3>Sample cell mismatches</h3>
       |$sample""".stripMargin
  }

  /** Render the full reconciliation report and push it through the
    * delivery seam — the one-call twin of the reference's
    * `submit_raptor_request` end state (render → email,
    * Raptor.py:656-682). */
  def deliver(diff: DiffResult, subject: String, sink: ReportSink,
              sampleRows: Int = 15): Unit =
    sink.deliver(subject, reconciliation(diff, sampleRows))

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private[reconcile] def escapeHtml(s: String): String = escape(s)
}
