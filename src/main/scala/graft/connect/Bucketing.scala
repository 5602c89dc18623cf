package graft.connect

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed managed tables for co-located joins.
  *
  * At 100 TB the dominant cost of fact⋈fact joins (lineitem⋈orders on
  * orderkey) is the shuffle. Writing both tables bucketed by the join key
  * with the same bucket count makes the join shuffle-free forever after:
  * Spark matches the bucket specs and plans a sort-merge join with NO
  * Exchange on either side (verified in BucketingSpec). The write costs
  * one shuffle once; every subsequent join, aggregation, or dedup keyed
  * on the bucket column reads co-located data.
  *
  * The reference has no bucketing (its JDBC tables are unpartitioned,
  * SURVEY §4.2); this is the storage-side half of the engine's shuffle
  * budget.
  */
object Bucketing {

  /** Write `df` as a managed bucketed table (sorted within buckets for
    * merge-join readiness). */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    buckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** True if the physical plan of `df` contains a shuffle exchange.
    * String-matched on the rendered plan: under AQE the root is an
    * AdaptiveSparkPlanExec whose inner plan is a field, not a child, so
    * tree traversal misses it. */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
