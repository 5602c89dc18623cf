package graft.schema

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Schema contracts and drift handling.
  *
  * The reference infers every schema (CSV inferSchema, Row(**dict) for
  * JSON — reference: ingestion_task.py:207-212, 38-39) and imposes column
  * names positionally (ingestion_task.py:42-46), which broke on real-world
  * header drift (SampleData/Customers_20250315.csv trailing column,
  * products_20250318.csv merged price column; repaired by hand in
  * adhoc_column_mismatch_20250711_file.py). This module makes the repair
  * behaviors first-class: declared StructType contracts, header
  * normalization, by-name or positional conformance with casts, and a
  * drift *report* instead of a crash.
  */
final case class DriftReport(missing: Seq[String], added: Seq[String],
                             typeChanged: Seq[(String, String, String)]) {
  def isClean: Boolean = missing.isEmpty && added.isEmpty && typeChanged.isEmpty
}

object SchemaOps {

  /** trim → upper-snake header normalization, the adhoc repair's rename
    * trick done declaratively (reference:
    * adhoc_load_sales_20250707_file.py:31-32). */
  def normalizeName(c: String): String =
    c.trim.toUpperCase.replaceAll("\\s+", "_")

  def normalizeColumns(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(normalizeName): _*)

  /** Conform a frame to a contract by (normalized) name: project the
    * contract's columns in order, cast to contract types; missing columns
    * become typed nulls. Extra source columns are dropped — never a crash. */
  def conformByName(df: DataFrame, contract: StructType): DataFrame = {
    val have = df.columns.map(c => normalizeName(c) -> c).toMap
    val cols = contract.fields.map { f =>
      have.get(normalizeName(f.name)) match {
        case Some(src) => col(src).cast(f.dataType).as(f.name)
        case None => org.apache.spark.sql.functions.lit(null)
          .cast(f.dataType).as(f.name)
      }
    }
    df.select(cols.toSeq: _*)
  }

  /** Positional conformance — the reference's ingestion rename
    * (ingestion_task.py:42-46): i-th source column takes the i-th contract
    * name and type. Requires at least as many source columns as contract
    * fields; extras are dropped. */
  def conformPositional(df: DataFrame, contract: StructType): DataFrame = {
    require(df.columns.length >= contract.fields.length,
      s"source has ${df.columns.length} columns, contract needs ${contract.fields.length}")
    val cols = contract.fields.zipWithIndex.map { case (f, i) =>
      col(df.columns(i)).cast(f.dataType).as(f.name)
    }
    df.select(cols.toSeq: _*)
  }

  /** Report drift between an observed frame and a contract instead of
    * failing mid-load (SURVEY §1.4). */
  def drift(df: DataFrame, contract: StructType): DriftReport = {
    val have = df.schema.fields.map(f => normalizeName(f.name) -> f).toMap
    val want = contract.fields.map(f => normalizeName(f.name) -> f).toMap
    val missing = contract.fields.map(_.name)
      .filterNot(n => have.contains(normalizeName(n)))
    val added = df.schema.fields.map(_.name)
      .filterNot(n => want.contains(normalizeName(n)))
    val changed = contract.fields.flatMap { f =>
      have.get(normalizeName(f.name)).collect {
        case g if g.dataType != f.dataType =>
          (f.name, f.dataType.simpleString, g.dataType.simpleString)
      }
    }
    DriftReport(missing.toSeq, added.toSeq, changed.toSeq)
  }
}
