package graft.connect

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** The reference's two-layer snapshot warehouse (SURVEY §1.1) as a
  * storage-agnostic surface: `{entity}_pre` staging replaced per run,
  * `{entity}` history appended per run keyed by the injected load date.
  *
  * The reference binds this to PostgreSQL over single-partition JDBC
  * (utils.py:145-163) — its #1 bottleneck. This parquet implementation
  * partitions history by `day_dt`, so every "today's snapshot" read
  * (`DAY_DT = current_date()` in the reference,
  * m_customer_sales_report_task.py:82-84) becomes a partition-pruned scan
  * instead of a full-table filter; a JDBC-backed implementation plugs in
  * through the same trait with partitioned writes.
  */
trait Warehouse {
  def writeStaging(df: DataFrame, entity: String): Unit
  def appendHistory(df: DataFrame, entity: String): Unit

  /** Idempotent per-micro-batch history append for streaming sinks:
    * replaying batch `batchId` after a failure must OVERWRITE that
    * batch's own slice instead of appending a second copy (foreachBatch
    * is at-least-once). The written history carries a `batch_id`
    * lineage column. */
  def appendHistoryBatch(df: DataFrame, entity: String, batchId: Long): Unit

  def readStaging(spark: SparkSession, entity: String): DataFrame
  def readHistory(spark: SparkSession, entity: String): DataFrame
}

/** @param env environment → physical-prefix routing: prod keeps
  *   `raw`/`legacy`, anything else lands in `dev_raw`/`dev_legacy` under
  *   the same root (reference: utils.py:190-211). Default prod preserves
  *   the un-prefixed layout for callers that manage isolation by root
  *   path instead. */
final class ParquetWarehouse(root: String,
                             env: graft.core.EnvSchema = graft.core.EnvSchema("prod"))
    extends Warehouse {
  private def stagingPath(entity: String) = s"$root/${env.resolve("raw")}/${entity}_pre"
  private def historyPath(entity: String) = s"$root/${env.resolve("legacy")}/$entity"

  def writeStaging(df: DataFrame, entity: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(stagingPath(entity))

  def appendHistory(df: DataFrame, entity: String): Unit =
    df.write.mode(SaveMode.Append).partitionBy("day_dt")
      .parquet(historyPath(entity))

  def appendHistoryBatch(df: DataFrame, entity: String, batchId: Long): Unit = {
    // dynamic partition overwrite: only the partitions present in this
    // batch (its own day_dt × batch_id slices) are replaced — a replayed
    // epoch rewrites itself, other batches' data is untouched
    import org.apache.spark.sql.functions.lit
    df.withColumn("batch_id", lit(batchId))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("day_dt", "batch_id")
      .parquet(historyPath(entity))
  }

  def readStaging(spark: SparkSession, entity: String): DataFrame =
    spark.read.parquet(stagingPath(entity))

  def readHistory(spark: SparkSession, entity: String): DataFrame =
    spark.read.parquet(historyPath(entity))
}
