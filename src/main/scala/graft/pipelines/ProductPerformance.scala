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
  * Scale: part is broadcast; the only wide shuffles are lineitem⋈orders on
  * orderkey and the final groupBy(p_partkey) — both partial-aggregated
  * map-side before exchange.
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

    // products LEFT JOIN sales keeps unsold products (reference: J3,
    // m_product_performance_task.py:75-91). The dimension is the LEFT side
    // here; Spark can still broadcast it as the build side of a
    // BroadcastHashJoin(LeftOuter) with the fact streamed.
    val joined = broadcast(part).join(salesRaw, Seq("p_partkey"), "left")
      .withColumn("revenue",
        coalesce(Exp.revenue(col("l_extendedprice"), col("l_discount")), Exp.money(lit(0))))
      .withColumn("profit",
        coalesce(Exp.money(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
                   - col("p_retailprice") * col("l_quantity")),
                 Exp.money(lit(0))))
      .withColumn("quantity", coalesce(col("l_quantity"), lit(0.0)))

    val agg = joined
      .groupBy(col("p_partkey"), col("p_name"), col("category"),
               col("stock_quantity"), col("reorder_level"))
      .agg(Exp.asMoney(sum(col("revenue"))).as("total_sales_amount"),
           sum(col("quantity")).as("total_quantity_sold"),
           Exp.asMoney(sum(col("profit"))).as("profit"))

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
      |), joined AS (
      |  SELECT p.p_partkey, p.p_name, p.p_type AS category,
      |         p.p_size * 40 AS stock_quantity,
      |         p.p_size * 10 AS reorder_level,
      |         coalesce(CAST(s.l_extendedprice * (1 - s.l_discount) AS DECIMAL(18,6)),
      |                  CAST(0 AS DECIMAL(18,6))) AS revenue,
      |         coalesce(CAST(s.l_extendedprice * (1 - s.l_discount)
      |                       - p.p_retailprice * s.l_quantity AS DECIMAL(18,6)),
      |                  CAST(0 AS DECIMAL(18,6))) AS profit,
      |         coalesce(s.l_quantity, 0.0) AS quantity
      |  FROM part p LEFT JOIN sales s ON p.p_partkey = s.l_partkey
      |), agg AS (
      |  SELECT p_partkey, p_name, category, stock_quantity, reorder_level,
      |         CAST(round(sum(revenue), 2) AS DOUBLE) AS total_sales_amount,
      |         sum(quantity) AS total_quantity_sold,
      |         CAST(round(sum(profit), 2) AS DOUBLE) AS profit
      |  FROM joined GROUP BY 1, 2, 3, 4, 5
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
