package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Exp

/** Classic warehouse-analytics queries over the star schema — the TPC-H
  * Q1/Q5 shapes, re-grounded on this corpus. The reference's marts cover
  * bespoke report pipelines; these cover the two canonical OLAP plan
  * shapes every engine is judged on:
  *
  *  - Q1 (pricing summary): scan-heavy single-table aggregate — the
  *    filter reaches the parquet scan (PushedFilters) and the whole query
  *    is one partial+final hash aggregate over a pruned 7-column read.
  *  - Q5 (local supplier volume): a 6-table star join — every dimension
  *    side is BROADCAST (region→nation→supplier/customer chain collapses
  *    driver-side to small tables), so the fact table shuffles only for
  *    the final per-nation aggregate, not for any join.
  *
  * Money goes through exact per-row DECIMAL(18,6) casts before summing
  * (order-independent at any parallelism — [[graft.ops.Exp.money]]).
  */
object Olap {

  private val Q1Cutoff = "1998-09-02"

  /** TPC-H Q1 shape: pricing summary by (returnflag, linestatus).
    *
    * The disc-price and charge sums run on EXACT INTEGER GRIDS (cents ×
    * discount/tax basis points → e6/e10 units, accumulated through
    * [[graft.functions.Int128Sum]]) rather than per-row
    * double→DECIMAL(18,6) casts. The round-14 sf1 oracle sweep caught
    * why: the charge is a triple product on a 10-dp rational grid, and
    * for rows landing on the 7th-decimal midpoint Spark's double→decimal
    * cast (rounds the double's SHORTEST DECIMAL representation) and
    * DuckDB's (rounds the binary value) disagree by 1e-6 — ~3 rows in
    * 6M, invisible at the gate scales. On the integer grid both engines
    * compute identical integers; the only float step is one
    * cast-and-divide on the per-group total, identical IEEE on both. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    def sum128(c: org.apache.spark.sql.Column) =
      call_function(graft.functions.GraftFunctions.Int128SumName, c)
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf(s"$Q1Cutoff 00:00:00")))
    val centsE = expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
    val discBp = lit(10000L) - expr("CAST(round(l_discount * 10000) AS BIGINT)")
    val taxBp = lit(10000L) + expr("CAST(round(l_tax * 10000) AS BIGINT)")
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
        (sum128(centsE * discBp).cast("double") / lit(1e6)).as("sum_disc_price"),
        (sum128(centsE * discBp * taxBp).cast("double") / lit(1e10)).as("sum_charge"),
        round(sum(col("l_quantity").cast("decimal(18,2)")).cast("double") /
              count(lit(1)), 6).as("avg_qty"),
        round(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double") /
              count(lit(1)), 6).as("avg_price"),
        round(sum(col("l_discount").cast("decimal(8,4)")).cast("double") /
              count(lit(1)), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  val pricingSummaryOracle: String =
    s"""SELECT l_returnflag, l_linestatus,
       |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       |       CAST(sum(CAST(round(l_extendedprice * 100) AS HUGEINT) *
       |                (10000 - CAST(round(l_discount * 10000) AS BIGINT))) AS DOUBLE)
       |         / 1e6 AS sum_disc_price,
       |       CAST(sum(CAST(round(l_extendedprice * 100) AS HUGEINT) *
       |                (10000 - CAST(round(l_discount * 10000) AS BIGINT)) *
       |                (10000 + CAST(round(l_tax * 10000) AS BIGINT))) AS DOUBLE)
       |         / 1e10 AS sum_charge,
       |       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
       |       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price,
       |       round(CAST(sum(CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) / count(*), 6) AS avg_disc,
       |       CAST(count(*) AS BIGINT) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '$Q1Cutoff 00:00:00'
       |GROUP BY 1, 2
       |""".stripMargin

  private val Q5From = "1996-01-01"
  private val Q5To = "1997-01-01"
  private val Q5Region = "ASIA"

  /** TPC-H Q5 shape: revenue by nation for one region/year, where the
    * supplying nation equals the customer's nation.
    *
    * Broadcast hints ONLY on the genuinely bounded dimensions (region,
    * nation — constant-sized at any scale factor). customer / orders /
    * supplier all scale with the data, so their joins are left to the
    * optimizer: at bench scale AQE broadcasts them automatically (they
    * sit under the 10 MB threshold after the date/region filters), and at
    * 100 TB the same plan degrades gracefully to shuffle joins instead of
    * OOMing the driver on a hinted broadcast. */
  def localSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val nations = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir)
              .filter(col("r_name") === Q5Region)),
            col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = Tables.customer(spark, dir)
      .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf(s"$Q5From 00:00:00")) &&
              col("o_orderdate") < lit(java.sql.Timestamp.valueOf(s"$Q5To 00:00:00")))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_nationkey"), col("n_name"))
    val sup = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_nationkey"))
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
              Exp.money(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
                .as("rev"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(sup,
            col("l_suppkey") === col("s_suppkey") &&
              col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("rev")).cast("double").as("revenue"),
           count(lit(1)).as("n_items"))
  }

  val localSupplierVolumeOracle: String =
    s"""SELECT n_name,
       |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       |       CAST(count(*) AS BIGINT) AS n_items
       |FROM lineitem
       |JOIN orders   ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
       |JOIN nation   ON c_nationkey = n_nationkey
       |JOIN region   ON n_regionkey = r_regionkey
       |WHERE r_name = '$Q5Region'
       |  AND o_orderdate >= TIMESTAMP '$Q5From 00:00:00'
       |  AND o_orderdate <  TIMESTAMP '$Q5To 00:00:00'
       |GROUP BY 1
       |""".stripMargin

  private val Q3Cutoff = "1998-06-01"
  private val Q3Segment = "BUILDING"

  /** TPC-H Q3 shape (shipping priority): top-10 open orders by pending
    * revenue for one market segment — orders placed before the cutoff
    * whose items ship after it. The canonical filter-join-agg-topk plan:
    * both date filters push to their scans, the segment-filtered
    * customer side is dimension-small, the aggregate keys on the join
    * key (orderkey) so it co-partitions with the fact shuffle, and the
    * top-10 is a distributed TakeOrdered with deterministic tiebreak.
    * Revenue sums exact decimals, so the double ordering agrees across
    * engines. */
  def shippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cut = lit(java.sql.Timestamp.valueOf(s"$Q3Cutoff 00:00:00"))
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === Q3Segment)
      .select(col("c_custkey"))
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < cut)
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > cut)
      .select(col("l_orderkey"),
              Exp.money(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
                .as("rev"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(col("rev")).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val shippingPriorityOracle: String =
    s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
       |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
       |FROM customer
       |JOIN orders   ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE c_mktsegment = '$Q3Segment'
       |  AND o_orderdate < TIMESTAMP '$Q3Cutoff 00:00:00'
       |  AND l_shipdate  > TIMESTAMP '$Q3Cutoff 00:00:00'
       |GROUP BY 1, 2, 3
       |ORDER BY revenue DESC, l_orderkey LIMIT 10
       |""".stripMargin

  private val Q10From = "1997-01-01"
  private val Q10To = "1997-04-01"

  /** TPC-H Q10 shape (returned-item reporting): top-20 customers by
    * revenue lost to returns in one quarter, with their nation. Fact
    * filters (return flag, quarter) push to the scans; nation broadcasts;
    * the per-customer aggregate shuffles once; top-20 is TakeOrdered. */
  def returnedItemReport(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf(s"$Q10From 00:00:00")) &&
              col("o_orderdate") < lit(java.sql.Timestamp.valueOf(s"$Q10To 00:00:00")))
      .select(col("o_orderkey"), col("o_custkey"))
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
              Exp.money(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
                .as("rev"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey")).agg(sum(col("rev")).as("rev"))
    Tables.customer(spark, dir)
      .join(rev, col("c_custkey") === col("o_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
            col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"),
              col("c_acctbal"), col("rev").cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val returnedItemOracle: String =
    s"""SELECT c_custkey, c_name, n_name, c_acctbal,
       |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
       |FROM customer
       |JOIN orders   ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |JOIN nation   ON c_nationkey = n_nationkey
       |WHERE l_returnflag = 'R'
       |  AND o_orderdate >= TIMESTAMP '$Q10From 00:00:00'
       |  AND o_orderdate <  TIMESTAMP '$Q10To 00:00:00'
       |GROUP BY 1, 2, 3, 4
       |ORDER BY revenue DESC, c_custkey LIMIT 20
       |""".stripMargin

  /** Cardinality profile (oracle-gated): per event_type, event count and
    * EXACT distinct-user count. Spark's count(DISTINCT) is the two-phase
    * expand+partial-agg plan — distributed, no driver state — so the
    * exact answer is affordable here; [[cardinalitySketch]] is the
    * fixed-memory HLL++ path for when the distinct keyspace itself is
    * the bottleneck. */
  def cardinalityProfile(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           count_distinct(col("user_id")).as("n_users"))

  val cardinalityOracle: String =
    """SELECT event_type, count(*) AS n_events,
      |       count(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1
      |""".stripMargin

  /** HLL++ sketch variant: approximate distinct-user count in one pass
    * with fixed sketch memory — the COUNT(DISTINCT) replacement at
    * 100 TB. The estimate is engine-specific so it carries no SQL
    * oracle; the spec bounds it against [[cardinalityProfile]]'s exact
    * counts instead (rsd 2%). */
  def cardinalitySketch(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           approx_count_distinct(col("user_id"), 0.02).as("approx_users"))

  // --------------------------------------------------- Q4 shape (EXISTS)
  private val LateDays = 365

  /** TPC-H Q4 shape: per-priority count of orders with at least one line
    * item shipped more than [[LateDays]] days after the order date — an
    * EXISTS compiled as a LEFT SEMI join on the order key with the
    * lateness predicate in the join condition, so each order contributes
    * at most once no matter how many late items it has. Both sides are
    * facts: the semi join shuffles co-partitioned on the key (never
    * broadcast), and the 5-row aggregate follows. */
  def orderPriorityAudit(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"),
              to_date(col("o_orderdate")).as("od"))
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), to_date(col("l_shipdate")).as("sd"))
    o.join(li,
        col("o_orderkey") === col("l_orderkey") &&
          datediff(col("sd"), col("od")) > lit(LateDays),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("late_order_count"))
  }

  val orderPriorityAuditOracle: String =
    s"""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS late_order_count
       |FROM orders o
       |WHERE EXISTS (
       |  SELECT 1 FROM lineitem l
       |  WHERE l.l_orderkey = o.o_orderkey
       |    AND date_diff('day', CAST(o.o_orderdate AS DATE),
       |                  CAST(l.l_shipdate AS DATE)) > $LateDays)
       |GROUP BY 1
       |""".stripMargin

  // ------------------------------------------------- Q18 shape (HAVING)
  private val LargeQty = 250

  /** TPC-H Q18 shape: orders whose total quantity exceeds [[LargeQty]],
    * with the customer and the stated total attached. Aggregate-
    * below-join ORDER: lineitem collapses to one row per order FIRST
    * (HAVING prunes there, map-side combined), and only the surviving
    * handful of keys join to orders and customer — both co-partitioned
    * fact joins; nothing is broadcast because customers scale with the
    * data. Quantity sums are exact DECIMAL(18,2). */
  def largeOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("total_qty"))
      .filter(col("total_qty") > lit(LargeQty))
    Tables.orders(spark, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
              to_date(col("o_orderdate")).cast("string").as("o_date"),
              col("total_qty").cast("double").as("total_qty"))
  }

  val largeOrdersOracle: String =
    s"""WITH big AS (
       |  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
       |  FROM lineitem GROUP BY 1
       |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > $LargeQty)
       |SELECT c_custkey, c_name, o_orderkey,
       |       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_date,
       |       CAST(total_qty AS DOUBLE) AS total_qty
       |FROM big JOIN orders ON o_orderkey = l_orderkey
       |         JOIN customer ON c_custkey = o_custkey
       |""".stripMargin

  // ------------------------------------------------ CUBE / grouping sets
  /** Full CUBE over (returnflag, linestatus) with the grouping bitmask:
    * all four aggregation levels (detail, each single-axis rollup, grand
    * total) in ONE pass — Spark expands grouping sets inside a single
    * hash aggregate (map-side combined), not four scans. Sums are exact
    * per-row DECIMAL(18,6); the bitmask column pins each row's level so
    * NULL-as-total is unambiguous cross-engine. */
  def cubeSummary(spark: SparkSession, dir: String): DataFrame = {
    val revenue = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().cast("int").as("level_id"),
           count(lit(1)).as("n_items"),
           sum(Exp.money(revenue)).cast("double").as("revenue"))
      .select(col("l_returnflag"), col("l_linestatus"), col("level_id"),
              col("n_items"), col("revenue"))
  }

  val cubeSummaryOracle: String =
    """SELECT l_returnflag, l_linestatus,
      |       CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS level_id,
      |       CAST(count(*) AS BIGINT) AS n_items,
      |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |""".stripMargin
}
