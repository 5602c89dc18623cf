package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, StringType}

/** Expression ("EXP_") operators: derived columns and null patches.
  *
  * Mirrors the reference's expression nodes
  * (reference: m_supplier_performance_task.py:115-117 REVENUE,
  * m_product_performance_task.py:95-101 PROFIT/DISCOUNTED_PRICE,
  * m_customer_sales_report_task.py:155-158 SALE_AMOUNT,
  * m_supplier_performance_task.py:189-209 null patches).
  */
object Exp {

  /** Exact-decimal money cell: compute in double (cheap, codegen'd), then
    * pin to DECIMAL(18,6) per row so downstream SUMs are order-independent.
    * A plain double SUM is sensitive to partition/merge order, which makes
    * results flap across runs and engines; decimal accumulation is exact.
    * This is what makes results hash-comparable against an external oracle.
    */
  def money(c: Column): Column = c.cast(DecimalType(18, 6))

  /** Round an exact-decimal aggregate to cents and surface as double. */
  def asMoney(c: Column): Column = round(c, 2).cast(DoubleType)

  /** revenue = extendedprice * (1 - discount). The reference's equivalent is
    * (SELLING_PRICE - SELLING_PRICE*DISCOUNT/100) * QUANTITY
    * (reference: m_supplier_performance_task.py:116); the corpus's
    * l_extendedprice already folds price*quantity and l_discount is a 0-1
    * fraction (FIXTURES.md §B).
    */
  def revenue(price: Column, discount: Column): Column =
    money(price * (lit(1.0) - discount))

  /** profit = (selling - cost) * qty, the product-performance formula
    * (reference: m_product_performance_task.py:96-98). */
  def profit(selling: Column, cost: Column, qty: Column): Column =
    money((selling - cost) * qty)

  /** Null→default patch for the post-left-join columns
    * (reference: m_supplier_performance_task.py:189-200). */
  def patchNulls(df: DataFrame, defaults: Map[String, Any]): DataFrame =
    defaults.foldLeft(df) { case (d, (c, v)) =>
      d.withColumn(c, coalesce(col(c), lit(v)))
    }

  /** Chained-when classifier, e.g. stock status
    * (reference: m_product_performance_task.py:118-137). The `cases` fire in
    * order; `default` otherwise. */
  def classify(cases: Seq[(Column, String)], default: String): Column =
    cases.foldLeft(Option.empty[Column]) {
      case (None, (cond, v))      => Some(when(cond, v))
      case (Some(acc), (cond, v)) => Some(acc.when(cond, v))
    }.fold(lit(default))(_.otherwise(default))

  /** Tier classification with the reference's exact boundary semantics:
    * x > gold → GOLD; silver <= x <= gold → SILVER; else BRONZE
    * (values exactly equal to gold are SILVER — between is inclusive;
    * reference: m_customer_sales_report_task.py:177-187). */
  def tier(x: Column, silver: Double, gold: Double): Column =
    when(x > gold, "GOLD")
      .when(x.between(silver, gold), "SILVER")
      .otherwise("BRONZE")

  /** Stamp the snapshot load date (reference: ingestion_task.py:49, but
    * parameterized — see RunDate). */
  def stampDayDt(df: DataFrame, runDate: graft.core.RunDate): DataFrame =
    df.withColumn("day_dt", lit(runDate.sqlDate))

  /** Boolean surfaced as the *string* "true"/"false" — the reference's
    * TOP_PERFORMER type (reference: m_customer_sales_report_task.py:220-252). */
  def boolAsString(c: Column): Column = c.cast(StringType)

  /** The reference's approxQuantile thresholds (Q1) for API parity:
    * driver-side Greenwald–Khanna sketch, relErr 0.01 (reference:
    * m_customer_sales_report_task.py:169-174). The customer-sales mart
    * uses the in-plan exact `percentile` window instead (deterministic,
    * no driver cut); this helper is for interactive profiling, where one
    * pass over a 100 TB column beats an exact sort. */
  def approxTiers(df: DataFrame, valueCol: String,
                  probabilities: Array[Double] = Array(0.5, 0.8),
                  relErr: Double = 0.01): Array[Double] =
    df.stat.approxQuantile(valueCol, probabilities, relErr)

  /** HLL++ distinct-count sketch (one pass, fixed memory): the cardinality
    * estimator to reach for before any exact COUNT(DISTINCT) at 100 TB.
    * Engine-specific sketch — spec-verified against exact counts, not
    * oracle-compared. */
  def approxCardinality(df: DataFrame, valueCol: String,
                        rsd: Double = 0.05): Long =
    df.select(approx_count_distinct(col(valueCol), rsd))
      .collect()(0).getLong(0)
}
