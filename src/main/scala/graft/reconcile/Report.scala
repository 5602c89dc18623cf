package graft.reconcile

import org.apache.spark.sql.DataFrame

/** Driver-side report rendering — the engine's equivalent of the
  * reference's HTML email body (reference: Raptor.py:206-268,656-682:
  * `df.limit(n).toPandas().to_html()` + SMTP). Rendering and transport
  * stay OUT of the engine core: this renders bounded samples to HTML;
  * delivery (mail/slack/file) is the caller's concern.
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

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
}
