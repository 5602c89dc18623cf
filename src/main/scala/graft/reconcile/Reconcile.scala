package graft.reconcile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset reconciliation — the engine's equivalent of the reference's
  * "Raptor" module (reference: Raptor/Raptor.py:491-682 inside
  * ETL_Airflow/jars/raptor-1.2.10-py3-none-any.whl): diff two keyed
  * datasets row-by-row and cell-by-cell.
  *
  * Same observable semantics, different mechanics. The reference serializes
  * every row to one delimiter-joined string, splits it back, and zips the
  * two arrays with a higher-order transform + explode (Raptor.py:559-605) —
  * fragile (delimiter collisions) and codegen-hostile. Here each compared
  * column becomes a struct in a single array literal and one generator does
  * the cell-level explode; no string round-trip, and the pre-explode
  * mismatch filter runs inside whole-stage codegen.
  *
  * Normalization preserved from the reference: every compared column is
  * cast to string and nulls become '' before comparison (Raptor.py:549-558),
  * so 1 vs '1' and NULL vs '' compare equal.
  *
  * Scale: one shuffle per side (the PK join); anti-joins reuse the same
  * exchange under AQE. Cell explode multiplies only *mismatching* rows.
  */
final case class DiffResult(
    /** (pk..., column_name, source_value, target_value) per differing cell. */
    cellMismatches: DataFrame,
    /** Rows whose PK exists only in the source. */
    sourceOnly: DataFrame,
    /** Rows whose PK exists only in the target. */
    targetOnly: DataFrame,
    /** (column_name, mismatch_count) summary. */
    columnSummary: DataFrame,
    /** (metric, count) rows — the reference's reconciliation report
      * header (source/target/common/extra/mismatched row counts,
      * Raptor.py:271-438). */
    rowCounts: DataFrame)

object Reconcile {

  private def normalize(c: Column): Column =
    coalesce(c.cast("string"), lit(""))

  /** Diff `src` vs `tgt` on primary key `pk`. Columns compared = all
    * non-PK columns present on BOTH sides (the reference requires identical
    * schemas; we intersect, which also tolerates added columns). */
  def diff(src: DataFrame, tgt: DataFrame, pk: Seq[String]): DiffResult = {
    val compared = src.columns.filterNot(pk.contains)
      .filter(tgt.columns.contains).toSeq

    val s = src.select((pk.map(col) ++
      compared.map(c => normalize(col(c)).as(s"__s_$c"))): _*)
    val t = tgt.select((pk.map(col) ++
      compared.map(c => normalize(col(c)).as(s"__t_$c"))): _*)

    val joined = s.join(t, pk, "inner")

    // One struct per compared column; keep only rows with any differing
    // cell before exploding (the common all-equal case never explodes).
    val cells = array(compared.map(c =>
      struct(lit(c).as("column_name"),
             col(s"__s_$c").as("source_value"),
             col(s"__t_$c").as("target_value"))): _*)
    val anyDiff = compared.map(c => col(s"__s_$c") =!= col(s"__t_$c"))
      .reduceOption(_ || _).getOrElse(lit(false))

    val mismatches = joined
      .filter(anyDiff)
      .select((pk.map(col) :+ explode(cells).as("cell")): _*)
      .filter(col("cell.source_value") =!= col("cell.target_value"))
      .select((pk.map(col) :+ col("cell.column_name") :+
               col("cell.source_value") :+ col("cell.target_value")): _*)

    val summary = mismatches.groupBy(col("column_name"))
      .agg(count(lit(1)).as("mismatch_count"))

    val sourceOnly = src.join(tgt.select(pk.map(col): _*), pk, "left_anti")
    val targetOnly = tgt.join(src.select(pk.map(col): _*), pk, "left_anti")
    def counted(label: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("count")).select(lit(label).as("metric"), col("count"))
    val rowCounts =
      counted("source_rows", src)
        .union(counted("target_rows", tgt))
        .union(counted("common_keys", joined))
        .union(counted("source_only", sourceOnly))
        .union(counted("target_only", targetOnly))
        .union(counted("mismatched_rows",
          mismatches.select(pk.map(col): _*).distinct()))

    DiffResult(
      cellMismatches = mismatches,
      sourceOnly = sourceOnly,
      targetOnly = targetOnly,
      columnSummary = summary,
      rowCounts = rowCounts)
  }
}
