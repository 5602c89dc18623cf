package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.Tables

/** Incremental aggregate maintenance: keep a daily rollup current by
  * merging each new batch's partial aggregate into the stored state
  * instead of recomputing over all history — the O(batch) path that
  * replaces the reference's daily full-table rebuild.
  *
  * Correctness rests on the aggregate being DECOMPOSABLE: counts and
  * exact decimal sums merge associatively, so state ⊕ batch ≡ recompute
  * (which the oracle asserts by recomputing from scratch). Averages and
  * other derived metrics are final-projected from the mergeable parts,
  * never stored. At warehouse scale the merge is a shuffle of
  * |state ∩ touched days| + |batch rollup| rows — independent of history
  * length.
  */
object Rollup {

  /** Mergeable per-(day, event_type) state: count + exact decimal sum. */
  def dailyState(events: DataFrame): DataFrame =
    events
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value").cast(DecimalType(18, 6))).as("sum_value"))

  /** Merge a batch's state into the stored state (associative ⊕). */
  def merge(state: DataFrame, batchState: DataFrame): DataFrame =
    state.unionByName(batchState)
      .groupBy(col("day"), col("event_type"))
      .agg(sum(col("n_events")).as("n_events"),
           sum(col("sum_value")).as("sum_value"))

  /** Final projection: derived metrics come from the mergeable parts. */
  def present(state: DataFrame): DataFrame =
    state.select(
      col("day"), col("event_type"), col("n_events"),
      round(col("sum_value"), 2).cast("double").as("total_value"),
      // cast the exact sum to double BEFORE dividing — decimal division
      // has engine-specific scale rules, double division does not
      round(col("sum_value").cast("double") / col("n_events"), 6).as("avg_value"))

  /** Oracle scenario: state built from the first 20 days, then the
    * remainder merged in as a batch — must equal a from-scratch rollup. */
  def incrementalQuery(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val cut = lit(java.sql.Date.valueOf("2024-01-21"))
    val state = dailyState(e.filter(to_date(col("ts")) < cut))
    val batch = dailyState(e.filter(to_date(col("ts")) >= cut))
    present(merge(state, batch))
  }

  val incrementalOracle: String =
    """SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, event_type,
      |       CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value,
      |       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_value
      |FROM events
      |GROUP BY 1, 2
      |""".stripMargin
}
