package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Dataset profiling — the summary statistics a data-quality system
  * computes before trusting a feed (the reference is exactly such a
  * system: duplicate gates, reconciliation, mismatch summaries; these
  * operators extend that family with per-column and distributional
  * profiles).
  *
  * Both operators are single-scan: completeness unpivots columns into
  * rows with one `stack` projection (rows × columns cells through ONE
  * hash aggregate — no per-column jobs, no driver loop over columns),
  * Benford is a projection + 9-group aggregate. Both scale as pure
  * map-side-combinable aggregations.
  */
object Profiling {

  /** Per-column completeness/cardinality profile of the customer table:
    * row count, nulls, distinct values. Values are profiled via their
    * string form — distinct COUNTS are formatting-independent because
    * round-trip double formatting is injective in any engine, which is
    * what makes the result portable. `n_distinct` excludes nulls (SQL
    * count-distinct semantics on both engines). */
  def completeness(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal",
                   "c_mktsegment")
    val stackArgs = cols.map(c => s"'$c', CAST($c AS STRING)").mkString(", ")
    Tables.customer(spark, dir)
      .select(expr(s"stack(${cols.size}, $stackArgs) AS (column_name, v)"))
      .groupBy(col("column_name"))
      .agg(count(lit(1)).as("n_rows"),
           sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
           countDistinct(col("v")).as("n_distinct"))
  }

  val completenessOracle: String = {
    val cols = Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal",
                   "c_mktsegment")
    val branches = cols.map(c =>
      s"SELECT '$c' AS column_name, CAST($c AS VARCHAR) AS v FROM customer")
      .mkString("\n  UNION ALL ")
    s"""WITH cells AS (
       |  $branches)
       |SELECT column_name,
       |       CAST(count(*) AS BIGINT) AS n_rows,
       |       CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       |       CAST(count(DISTINCT v) AS BIGINT) AS n_distinct
       |FROM cells GROUP BY 1
       |""".stripMargin
  }

  /** Leading-digit (Benford) profile of order amounts: digit 1–9 counts
    * and shares. Genuinely transactional amounts follow Benford's law
    * closely; a synthetic or truncated feed does not — a one-row-per-
    * digit fingerprint that catches distribution swaps between loads. */
  def benford(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.orders(spark, dir)
      .select(substring(floor(col("o_totalprice")).cast("long").cast("string"),
        1, 1).cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val total = d.agg(sum(col("n")).as("n_total"))
    d.crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
              round(col("n").cast("double") / col("n_total"), 6).as("share"))
  }

  /** k-anonymity / l-diversity audit over the customer table: group by
    * the quasi-identifier pair (nation, market segment) and report each
    * equivalence class's size, the number of distinct sensitive values
    * (account balance) inside it, and whether the class is re-identifiable
    * (size below k) — the privacy gate a dataset passes before leaving a
    * governed zone. One hash aggregate; output is quasi-identifier-sized,
    * never row-sized, so the plan is a single map-side-combinable shuffle
    * at any corpus scale. */
  private val KAnon = 8L

  def kAnonymity(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("class_size"),
           countDistinct(col("c_acctbal")).as("l_diversity"))
      .withColumn("at_risk", col("class_size") < KAnon)

  val kAnonymityOracle: String =
    s"""SELECT c_nationkey, c_mktsegment,
       |       CAST(count(*) AS BIGINT) AS class_size,
       |       CAST(count(DISTINCT c_acctbal) AS BIGINT) AS l_diversity,
       |       count(*) < $KAnon AS at_risk
       |FROM customer GROUP BY 1, 2
       |""".stripMargin

  val benfordOracle: String =
    """WITH d AS (
      |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
      |         count(*) AS n
      |  FROM orders GROUP BY 1),
      |t AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM d)
      |SELECT digit, CAST(n AS BIGINT) AS n,
      |       round(CAST(n AS DOUBLE) / n_total, 6) AS share
      |FROM d CROSS JOIN t
      |""".stripMargin
}
