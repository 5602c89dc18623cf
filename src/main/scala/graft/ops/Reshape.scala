package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Wide↔long reshaping: pivot (one column per category value) and unpivot
  * (one row per metric). Both are single-aggregation / single-projection
  * plans — pivot with an EXPLICIT value list compiles to conditional
  * aggregates in one shuffle (omitting the list adds a distinct-values
  * driver job first, a full extra pass at 100 TB); unpivot is a
  * projection + generator, no shuffle at all.
  */
object Reshape {

  /** Event types pinned at compile time — the pivot contract. */
  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  /** Daily event matrix: one row per day, one count column per event type
    * (absent combinations are 0, not null, so downstream arithmetic is
    * total-function).
    *
    * Written as direct conditional aggregates rather than
    * `.pivot(col, values)`: RelationalGroupedDataset.pivot compiles to TWO
    * aggregations (a (day, type) rollup shuffled twice, then pivotfirst) —
    * the conditional-count form is a single partial+final hash aggregate,
    * one shuffle keyed by day, which PlanGuardSpec pins. */
  def eventPivot(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(to_date(col("ts")).as("day"), col("event_type"))
      .groupBy(col("day"))
      .agg(count(when(col("event_type") === EventTypes.head, 1)).as(EventTypes.head),
           EventTypes.tail.map(t =>
             count(when(col("event_type") === t, 1)).as(t)): _*)

  val eventPivotOracle: String = {
    val cols = EventTypes.map(t =>
      s"CAST(count(*) FILTER (event_type = '$t') AS BIGINT) AS $t")
    s"""SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
       |       ${cols.mkString(",\n       ")}
       |FROM events GROUP BY 1
       |""".stripMargin
  }

  /** Part metrics melted to long form: (p_partkey, metric, value) — the
    * shape feature stores and metric sinks ingest. */
  def partUnpivot(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(col("p_partkey"),
              col("p_size").cast("double").as("p_size"),
              col("p_retailprice").cast("double").as("p_retailprice"))
      .unpivot(Array(col("p_partkey")),
               Array(col("p_size"), col("p_retailprice")),
               "metric", "value")

  val partUnpivotOracle: String =
    """SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value
      |FROM part
      |UNION ALL
      |SELECT p_partkey, 'p_retailprice', p_retailprice FROM part
      |""".stripMargin

  /** Multi-level rollup in ONE pass: per (event_type, day), per
    * event_type, and grand total, tagged by `gid` (bit 1 = day rolled up,
    * bit 2 = event_type rolled up — Spark's `grouping_id` bit order).
    *
    * ROLLUP is how a warehouse serves every drill level from one shuffle
    * instead of one query per level: Spark expands the grouping sets
    * map-side and a single partial+final hash aggregate computes all
    * three levels — at 100 TB that is one fact-table scan for the whole
    * dashboard family. Value sums go through exact per-row
    * DECIMAL(18,6) casts so every level is order-independent. */
  def eventRollupLevels(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"),
              col("value"))
      .rollup(col("event_type"), col("day"))
      .agg(grouping_id().as("gid"),
           count(lit(1)).as("n"),
           sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"))

  val eventRollupLevelsOracle: String =
    """SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
      |       CAST(grouping(event_type) * 2 + grouping(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT) AS gid,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY ROLLUP(event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE))
      |""".stripMargin
}
