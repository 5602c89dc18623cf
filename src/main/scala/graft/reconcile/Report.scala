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
