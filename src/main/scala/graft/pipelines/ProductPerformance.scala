package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{RunDate, Tables}
import graft.ops.Exp

/** Product-performance mart (reference: m_product_performance_task.py:60-160),
  * over the corpus mapping products→part, sales→lineitem(+orders for status).
  *
  * Reference semantics preserved:
  *  - products LEFT JOIN sales (unsold products kept, metrics null→0)
  *  - per-row REVENUE / PROFIT, then one product-level hash aggregation
  *  - AVG_SALE_PRICE = round(total/qty, 2) guarded by qty>0
  *  - AVAILABLE_STOCK = stock - qty sold; STOCK_LEVEL_STATUS classified
  *    'Below Reorder Level' / 'Sufficient Stock'
  *
  * Corpus stand-ins for the retail columns (FIXTURES.md §B): selling price =
  * l_extendedprice (already price×qty), cost = p_retailprice×qty,
  * stock_quantity = p_size×40, reorder_level = p_size×10 (both branches of
  * the status classifier occur at every sf).
  *
  * Scale: sales are aggregated to one row per partkey BEFORE the join with
  * part (the join key is the group key, so aggregate-below-join is exact).
  * The wide lineitem never shuffles toward part: the only exchanges are
  * lineitem⋈orders on orderkey and the map-side-combined partial rollup by
  * partkey; the part⋈rollup join is between two dimension-sized inputs and
  * AQE is free to broadcast the rollup (BuildRight of a left-outer is
  * supported — broadcasting the preserved part side, as a naive
  * `broadcast(part).join(sales, "left")` would ask, is not, and falls back
  * to shuffling the whole fact).
  */
object ProductPerformance {

  def build(spark: SparkSession, dir: String): DataFrame =
    build(spark, dir, RunDate.default)

  def build(spark: SparkSession, dir: String, runDate: RunDate): DataFrame = {
    val part = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_name"), col("p_type").as("category"),
              (col("p_size") * 40).as("stock_quantity"),
              (col("p_size") * 10).as("reorder_level"),
              col("p_retailprice"))

    val salesRaw = SupplierPerformance.salesWithStatus(spark, dir)
      .select(col("l_partkey").as("p_partkey"), col("l_quantity"),
              col("l_extendedprice"), col("l_discount"))

    // Aggregate first: one row per sold part (map-side combine makes the
    // exchange carry partials, not raw lineitem rows).
    val salesAgg = salesRaw
      .groupBy(col("p_partkey"))
      .agg(sum(Exp.revenue(col("l_extendedprice"), col("l_discount"))).as("rev_sum"),
           sum(col("l_quantity")).as("qty_sum"))

    // products LEFT JOIN sales-rollup keeps unsold products (reference: J3,
    // m_product_performance_task.py:75-91); null metrics patch to 0.
    val agg = part.join(salesAgg, Seq("p_partkey"), "left")
      .withColumn("total_sales_amount",
        Exp.asMoney(coalesce(col("rev_sum"), Exp.money(lit(0)))))
      .withColumn("total_quantity_sold", coalesce(col("qty_sum"), lit(0.0)))
      .withColumn("profit",
        Exp.asMoney(coalesce(col("rev_sum"), Exp.money(lit(0))) -
                    Exp.money(col("p_retailprice") * col("total_quantity_sold"))))

    agg
      .withColumn("avg_sale_price",
        when(col("total_quantity_sold") > 0,
             round(Exp.money(col("total_sales_amount") / col("total_quantity_sold")), 2)
               .cast("double"))
          .otherwise(0.0))
      .withColumn("available_stock", col("stock_quantity") - col("total_quantity_sold"))
      .withColumn("stock_level_status",
        when(col("available_stock") < col("reorder_level"), "Below Reorder Level")
          .otherwise("Sufficient Stock"))
      .withColumn("day_dt", lit(runDate.sqlDate))
      .select(col("day_dt"),
              col("p_partkey").as("product_id"),
              col("p_name").as("product_name"),
              col("total_sales_amount"),
              col("total_quantity_sold"),
              col("avg_sale_price"),
              col("stock_quantity"),
              col("reorder_level"),
              col("stock_level_status"),
              col("profit"),
              col("category"))
  }

  val oracle: String =
    """WITH sales AS (
      |  SELECT l_partkey, l_quantity,
      |         l_extendedprice, l_discount
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus <> 'F'
      |), sales_agg AS (
      |  SELECT l_partkey,
      |         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS rev_sum,
      |         sum(l_quantity) AS qty_sum
      |  FROM sales GROUP BY 1
      |), agg AS (
      |  SELECT p.p_partkey, p.p_name, p.p_type AS category,
      |         p.p_size * 40 AS stock_quantity,
      |         p.p_size * 10 AS reorder_level,
      |         CAST(round(coalesce(s.rev_sum, 0), 2) AS DOUBLE) AS total_sales_amount,
      |         coalesce(s.qty_sum, 0.0) AS total_quantity_sold,
      |         CAST(round(coalesce(s.rev_sum, 0) -
      |                    CAST(p.p_retailprice * coalesce(s.qty_sum, 0.0) AS DECIMAL(18,6)),
      |                    2) AS DOUBLE) AS profit
      |  FROM part p LEFT JOIN sales_agg s ON p.p_partkey = s.l_partkey
      |)
      |SELECT DATE '2024-06-01' AS day_dt,
      |       p_partkey AS product_id,
      |       p_name AS product_name,
      |       total_sales_amount,
      |       total_quantity_sold,
      |       CASE WHEN total_quantity_sold > 0
      |            THEN CAST(round(CAST(total_sales_amount / total_quantity_sold
      |                                 AS DECIMAL(18,6)), 2) AS DOUBLE)
      |            ELSE 0.0 END AS avg_sale_price,
      |       stock_quantity,
      |       reorder_level,
      |       CASE WHEN stock_quantity - total_quantity_sold < reorder_level
      |            THEN 'Below Reorder Level' ELSE 'Sufficient Stock'
      |            END AS stock_level_status,
      |       profit,
      |       category
      |FROM agg
      |""".stripMargin
}
