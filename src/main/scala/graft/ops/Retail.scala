package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Caches.TrackedDataset
import graft.core.Tables

/** Retail-warehouse analytics the reference's mart suite stops short of:
  * order-total consistency auditing, ABC/Pareto classification, cohort
  * revenue, RFM segmentation, and market-basket association rules.
  *
  * Scale design notes (the patterns, not the defaults, are the point):
  *
  *  - [[orderConsistency]] recomputes every order's total from its line
  *    items in EXACT integer arithmetic (cents × basis-points × basis-
  *    points = an e8-scaled long) so the mismatch test is bit-identical
  *    across engines and partitionings — no float fold anywhere. The
  *    join is fact⋈fact on the order key AFTER the lineitem side is
  *    aggregated to one row per order, so shuffle volume is order-count,
  *    not item-count.
  *  - [[abcPareto]] is the classic cumulative-share classification; its
  *    running total uses [[Rnk.globalCumsum]] — the distributed two-pass
  *    prefix sum — NOT a global `sum() OVER (ORDER BY …)`, which would
  *    drag every part through one WindowExec task.
  *  - [[rfmSegments]] buckets by explicit rank arithmetic
  *    (`1 + (rank−1)·5 DIV n`) over [[Rnk.globalRank]] instead of
  *    `ntile(5)` for the same reason: the three metric rankings stay
  *    distributed, and the bucket formula is reproducible in plain SQL
  *    (ntile's remainder distribution is, too, but ties to one window).
  *  - [[basketRules]] builds co-occurrence pairs by ORDER-LOCAL array
  *    expansion (sorted item set → upper-triangle pairs), the same
  *    one-shuffle shape as the PageRank co-purchase graph — never a
  *    fact-to-fact self-join with two sorted sides. Pair volume is
  *    Σ C(basket,2), bounded by basket size, not by parts².
  */
object Retail {

  private val centsE = "CAST(round(l_extendedprice * 100) AS BIGINT)"

  // ------------------------------------------------- order consistency

  /** Per-status audit of `o_totalprice` against the total recomputed
    * from line items as Σ price·(1−discount)·(1+tax), carried exactly:
    * price in cents (long), discount/tax in basis points, so each item
    * contributes `cents · (10000−d_bp) · (10000+t_bp)` — an integer on
    * the e8 grid (cents × 10⁸). The stated total is lifted onto the
    * same grid and compared with `=`, not a float tolerance. Orders
    * with no line items count separately (they trivially mismatch
    * unless the stated total is zero). */
  def orderConsistency(spark: SparkSession, dir: String): DataFrame = {
    val perOrder = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"),
        (expr(centsE) *
         (lit(10000L) - expr("CAST(round(l_discount * 10000) AS BIGINT)")) *
         (lit(10000L) + expr("CAST(round(l_tax * 10000) AS BIGINT)"))).as("net_e8"))
      .groupBy(col("l_orderkey"))
      .agg(sum(col("net_e8")).as("recomputed_e8"), count(lit(1)).as("n_items"))
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        (expr("CAST(round(o_totalprice * 100) AS BIGINT)") * lit(100000000L))
          .as("stated_e8"))
      .join(perOrder, col("o_orderkey") === col("l_orderkey"), "left")
      .select(col("o_orderstatus"), col("stated_e8"),
        coalesce(col("recomputed_e8"), lit(0L)).as("rec"),
        coalesce(col("n_items"), lit(0L)).as("ni"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("ni") === 0L, 1L).otherwise(0L)).as("n_no_items"),
        sum(when(col("rec") =!= col("stated_e8"), 1L).otherwise(0L)).as("n_mismatch"),
        max(abs(col("rec") - col("stated_e8"))).as("max_abs_diff_e8"))
  }

  val orderConsistencyOracle: String =
    """WITH li AS (
      |  SELECT l_orderkey,
      |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
      |                  (10000 - CAST(round(l_discount * 10000) AS BIGINT)) *
      |                  (10000 + CAST(round(l_tax * 10000) AS BIGINT))) AS BIGINT)
      |           AS recomputed_e8,
      |         CAST(count(*) AS BIGINT) AS n_items
      |  FROM lineitem GROUP BY 1),
      |o AS (
      |  SELECT o_orderstatus,
      |         CAST(round(o_totalprice * 100) AS BIGINT) * 100000000 AS stated_e8,
      |         coalesce(li.recomputed_e8, 0) AS rec,
      |         coalesce(li.n_items, 0) AS ni
      |  FROM orders LEFT JOIN li ON o_orderkey = l_orderkey)
      |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
      |       CAST(sum(CASE WHEN ni = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_no_items,
      |       CAST(sum(CASE WHEN rec <> stated_e8 THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch,
      |       CAST(max(abs(rec - stated_e8)) AS BIGINT) AS max_abs_diff_e8
      |FROM o GROUP BY 1
      |""".stripMargin

  // ---------------------------------------------------- ABC / Pareto

  /** ABC (Pareto) classification of parts by revenue share: rank parts
    * by exact-cents revenue, take the INCLUSIVE running total over
    * (revenue desc, partkey) via the distributed prefix sum, and label
    * A / B / C at the 80% / 95% cumulative-share cuts — compared in
    * integers (`cum·100 ≤ total·80`), so the class boundary is exact. */
  def abcPareto(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey").as("p_partkey"))
      .agg(sum(expr(centsE)).as("revenue_cents"))
    val total = rev.agg(sum(col("revenue_cents")).as("total_cents"))
    val cum = Rnk.globalCumsum(rev,
        Seq(col("revenue_cents").desc, col("p_partkey").asc),
        col("revenue_cents"))
      .withColumn("cum_cents", col("cumsum_before") + col("revenue_cents"))
    cum.crossJoin(broadcast(total))
      .select(col("p_partkey"), col("revenue_cents"),
        round(col("cum_cents").cast("double") / col("total_cents"), 6)
          .as("cum_share"),
        when(col("cum_cents") * 100L <= col("total_cents") * 80L, "A")
          .when(col("cum_cents") * 100L <= col("total_cents") * 95L, "B")
          .otherwise("C").as("abc_class"))
  }

  val abcParetoOracle: String =
    """WITH rev AS (
      |  SELECT l_partkey AS p_partkey,
      |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |           AS revenue_cents
      |  FROM lineitem GROUP BY 1),
      |c AS (
      |  SELECT p_partkey, revenue_cents,
      |         CAST(sum(revenue_cents) OVER (
      |           ORDER BY revenue_cents DESC, p_partkey
      |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
      |         CAST((SELECT sum(revenue_cents) FROM rev) AS BIGINT) AS total
      |  FROM rev)
      |SELECT p_partkey, revenue_cents,
      |       round(CAST(cum AS DOUBLE) / total, 6) AS cum_share,
      |       CASE WHEN cum * 100 <= total * 80 THEN 'A'
      |            WHEN cum * 100 <= total * 95 THEN 'B'
      |            ELSE 'C' END AS abc_class
      |FROM c
      |""".stripMargin

  // ------------------------------------------------------ cohort revenue

  /** Cohort revenue matrix: customers grouped by FIRST-order month, each
    * cell = (cohort month, months since cohort) with active customers,
    * orders, and exact-cents revenue. Months are the integer index
    * `year·12 + month − 1` on both engines, so the offset arithmetic is
    * engine-proof. The first-order frame is an aggregate of orders
    * joined back on the customer key — co-partitioned, never broadcast
    * (customers scale with the data). */
  def cohortRevenue(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1).as("m"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val first = o.groupBy(col("o_custkey")).agg(min(col("m")).as("m0"))
    o.join(first, Seq("o_custkey"))
      .groupBy(col("m0"), (col("m") - col("m0")).as("month_offset"))
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
           count(lit(1)).as("n_orders"),
           sum(col("cents")).as("revenue_cents"))
      .select(
        format_string("%04d-%02d", expr("m0 DIV 12"), expr("m0 % 12 + 1"))
          .as("cohort_month"),
        col("month_offset"), col("n_customers"), col("n_orders"),
        col("revenue_cents"))
  }

  val cohortRevenueOracle: String =
    """WITH o AS (
      |  SELECT o_custkey,
      |         year(CAST(o_orderdate AS DATE)) * 12 +
      |           month(CAST(o_orderdate AS DATE)) - 1 AS m,
      |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders),
      |f AS (SELECT o_custkey, min(m) AS m0 FROM o GROUP BY 1)
      |SELECT printf('%04d-%02d', m0 // 12, m0 % 12 + 1) AS cohort_month,
      |       CAST(m - m0 AS INT) AS month_offset,
      |       CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_customers,
      |       CAST(count(*) AS BIGINT) AS n_orders,
      |       CAST(sum(cents) AS BIGINT) AS revenue_cents
      |FROM o JOIN f USING (o_custkey)
      |GROUP BY m0, m - m0
      |""".stripMargin

  // ----------------------------------------------------- RFM segments

  /** RFM segmentation: per customer recency (days since their last
    * order, relative to the corpus max date), frequency (order count),
    * and exact-cents monetary value, each bucketed 1–5 by explicit rank
    * arithmetic `1 + (rank−1)·5 DIV n` over a DISTRIBUTED global rank —
    * deterministic tiebreak on the customer key, no ntile, no global
    * window. Bucket 1 is the best on every axis (most recent / most
    * frequent / highest spend). */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val day = datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
    val cust = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(max(day).as("last_d"), count(lit(1)).as("frequency"),
           sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("monetary_cents"))
      .trackPersist()
    val bounds = cust.agg(max(col("last_d")).as("dmax"),
                          count(lit(1)).as("n"))
    val base = cust.crossJoin(broadcast(bounds))
      .select(col("o_custkey"), (col("dmax") - col("last_d")).as("recency_days"),
              col("frequency"), col("monetary_cents"), col("n"))
      .trackPersist()
    def bucket(rankCol: String) =
      expr(s"CAST(1 + ($rankCol - 1) * 5 DIV n AS INT)")
    val r = Rnk.globalRank(base.select(col("o_custkey"), col("recency_days"), col("n")),
      Seq(col("recency_days").asc, col("o_custkey").asc), "r_rank")
      .select(col("o_custkey"), bucket("r_rank").as("r_bucket"))
    val f = Rnk.globalRank(base.select(col("o_custkey"), col("frequency"), col("n")),
      Seq(col("frequency").desc, col("o_custkey").asc), "f_rank")
      .select(col("o_custkey"), bucket("f_rank").as("f_bucket"))
    val m = Rnk.globalRank(base.select(col("o_custkey"), col("monetary_cents"), col("n")),
      Seq(col("monetary_cents").desc, col("o_custkey").asc), "m_rank")
      .select(col("o_custkey"), bucket("m_rank").as("m_bucket"))
    base.select(col("o_custkey"), col("recency_days"), col("frequency"),
                col("monetary_cents"))
      .join(r, Seq("o_custkey")).join(f, Seq("o_custkey")).join(m, Seq("o_custkey"))
      .withColumn("rfm_code",
        (col("r_bucket") * 100 + col("f_bucket") * 10 + col("m_bucket")).cast("int"))
  }

  val rfmSegmentsOracle: String =
    """WITH c AS (
      |  SELECT o_custkey,
      |         max(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)))
      |           AS last_d,
      |         CAST(count(*) AS BIGINT) AS frequency,
      |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |           AS monetary_cents
      |  FROM orders GROUP BY 1),
      |g AS (SELECT max(last_d) AS dmax, count(*) AS n FROM c),
      |r AS (
      |  SELECT o_custkey,
      |         CAST(dmax - last_d AS INT) AS recency_days,
      |         frequency, monetary_cents, n,
      |         row_number() OVER (ORDER BY dmax - last_d, o_custkey) AS r_rank,
      |         row_number() OVER (ORDER BY frequency DESC, o_custkey) AS f_rank,
      |         row_number() OVER (ORDER BY monetary_cents DESC, o_custkey) AS m_rank
      |  FROM c, g)
      |SELECT o_custkey, recency_days, frequency, monetary_cents,
      |       CAST(1 + (r_rank - 1) * 5 // n AS INT) AS r_bucket,
      |       CAST(1 + (f_rank - 1) * 5 // n AS INT) AS f_bucket,
      |       CAST(1 + (m_rank - 1) * 5 // n AS INT) AS m_bucket,
      |       CAST(CAST(1 + (r_rank - 1) * 5 // n AS INT) * 100 +
      |            CAST(1 + (f_rank - 1) * 5 // n AS INT) * 10 +
      |            CAST(1 + (m_rank - 1) * 5 // n AS INT) AS INT) AS rfm_code
      |FROM r
      |""".stripMargin

  // -------------------------------------------- lead-time percentiles

  /** Ship-lead-time percentiles per order priority — the digest-narrowed
    * EXACT grouped quantiles ([[Sketches.groupedExactQuantiles]])
    * composed over a fact⋈fact join: lineitem joins orders co-partitioned
    * on the order key, lead time is the integer day difference shifted by
    * +8192 onto the digest's non-negative grid (dates span years, not
    * data volume — 16 bits covers ±8k days at any corpus size) and
    * shifted back on output. Groups are the 5 order priorities —
    * bounded by contract, as the grouped-digest operator requires. */
  def leadTimeQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val shift = 8192L
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"),
              to_date(col("o_orderdate")).as("od"))
    val j = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), to_date(col("l_shipdate")).as("sd"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
              (datediff(col("sd"), col("od")) + lit(shift)).as("shifted"))
    Sketches.groupedExactQuantiles(j, col("o_orderpriority"), col("shifted"),
        Seq(25, 50, 75, 90, 99), bits = 16)
      .select(col("grp").as("o_orderpriority"), col("q_pct"),
              (col("value_cents") - lit(shift)).as("lead_days"))
  }

  val leadTimeQuantilesOracle: String =
    """WITH s AS (
      |  SELECT CAST(o_orderpriority AS VARCHAR) AS grp,
      |         date_diff('day', CAST(o_orderdate AS DATE),
      |                   CAST(l_shipdate AS DATE)) AS v
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |r AS (SELECT grp, v,
      |             row_number() OVER (PARTITION BY grp ORDER BY v) AS rn
      |      FROM s),
      |n AS (SELECT grp, count(*) AS cnt FROM s GROUP BY grp),
      |qs(pct) AS (VALUES (25), (50), (75), (90), (99))
      |SELECT r.grp AS o_orderpriority, qs.pct AS q_pct,
      |       CAST(r.v AS BIGINT) AS lead_days
      |FROM qs CROSS JOIN n
      |JOIN r ON r.grp = n.grp AND r.rn = (qs.pct * n.cnt + 99) // 100
      |""".stripMargin

  // ------------------------------------------------ market-basket rules

  /** Association rules over parts co-occurring in one order: support
    * counts from order-local pair expansion (sorted distinct item set →
    * upper-triangle pairs, the one-shuffle co-occurrence shape), then
    * confidence = pairs/p1-orders and lift = pairs·N/(p1·p2) from exact
    * counts — integer products first, ONE double division at the end, so
    * both engines compute the identical IEEE quotient. `minSupport`
    * prunes before the (dimension-sized, broadcast) item-count join. */
  def basketRules(spark: SparkSession, dir: String,
                  minSupport: Long = 3L): DataFrame = {
    val op = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .trackPersist()
    val pairs = op
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_set(col("l_partkey"))).as("parts"))
      .select(explode(expr(
        """flatten(transform(parts, (x, i) ->
          |  transform(slice(parts, i + 2, size(parts)),
          |            y -> struct(x AS p1, y AS p2))))""".stripMargin)).as("pr"))
      .select(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
      .groupBy(col("p1"), col("p2")).agg(count(lit(1)).as("pair_orders"))
      .filter(col("pair_orders") >= minSupport)
    val itemCnt = op.groupBy(col("l_partkey")).agg(count(lit(1)).as("item_orders"))
    val nOrders = op.agg(countDistinct(col("l_orderkey")).as("n_orders"))
    pairs
      .join(broadcast(itemCnt.select(col("l_partkey").as("p1"),
        col("item_orders").as("p1_orders"))), Seq("p1"))
      .join(broadcast(itemCnt.select(col("l_partkey").as("p2"),
        col("item_orders").as("p2_orders"))), Seq("p2"))
      .crossJoin(broadcast(nOrders))
      .select(col("p1"), col("p2"), col("pair_orders"),
        col("p1_orders"), col("p2_orders"),
        round(col("pair_orders").cast("double") / col("p1_orders"), 6)
          .as("confidence"),
        round((col("pair_orders") * col("n_orders")).cast("double") /
              (col("p1_orders") * col("p2_orders")), 6).as("lift"))
  }

  // ------------------------------------------------------- 2-D skyline

  /** Pareto-optimal (skyline) parts — maximize retail price, minimize
    * size: a part is dominated when some other part is at least as good
    * on both axes and strictly better on one. Computed WITHOUT the n²
    * dominance self-join: group to one row per price level (min size at
    * that price), take the EXCLUSIVE prefix minimum of size over levels
    * ordered by price descending via the distributed
    * [[Rnk.globalPrefixMin]] — that is exactly "best size among strictly
    * higher prices" — and join each part back to its level
    * co-partitioned. Survival is two integer compares:
    * `min_higher > size ∧ min_eq ≥ size`. Cost: one level aggregate +
    * the two-pass prefix min over the LEVEL table (distinct prices, not
    * parts) + one equi-join. */
  def skylineParts(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .select(col("p_partkey"),
        expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("price_cents"),
        col("p_size"))
    val levels = p.groupBy(col("price_cents"))
      .agg(min(col("p_size")).as("min_eq"))
    val withHigher = Rnk.globalPrefixMin(levels,
      Seq(col("price_cents").desc), col("min_eq"), "min_higher")
    p.join(withHigher, Seq("price_cents"))
      .filter(col("min_higher") > col("p_size") &&
              col("min_eq") >= col("p_size"))
      .select(col("p_partkey"), col("price_cents"), col("p_size"))
  }

  val skylinePartsOracle: String =
    """WITH p AS (
      |  SELECT p_partkey,
      |         CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
      |         p_size
      |  FROM part)
      |SELECT p_partkey, price_cents, p_size
      |FROM p a
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM p b
      |  WHERE (b.price_cents > a.price_cents AND b.p_size <= a.p_size)
      |     OR (b.price_cents >= a.price_cents AND b.p_size < a.p_size))
      |""".stripMargin

  // ------------------------------------------------ open-order backlog

  /** Daily open-order backlog — for every day in the corpus range, how
    * many orders were placed but not yet fully shipped. Interval
    * stabbing by PREFIX SUM, not per-day scans: each order contributes
    * +1 at its order day and −1 the day after its last shipment, the
    * deltas aggregate to one net per day, and the running total over the
    * (date-range-bounded) day spine comes from the distributed
    * [[Rnk.globalCumsum]]. Cost is order-linear + a spine-sized pass —
    * against the naive `days × orders` EXISTS scan. Orders with no line
    * items close same-day. */
  def openOrdersDaily(spark: SparkSession, dir: String): DataFrame = {
    val epoch = lit("1970-01-01")
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        datediff(to_date(col("o_orderdate")), epoch).as("d0"))
    val e = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(max(datediff(to_date(col("l_shipdate")), epoch)).as("d1raw"))
    val span = o.join(e, col("o_orderkey") === col("l_orderkey"), "left")
      .select(col("d0"),
        greatest(col("d0"), coalesce(col("d1raw"), col("d0"))).as("d1"))
      .trackPersist()
    val deltas = span.select(col("d0").as("day"), lit(1L).as("net"))
      .unionByName(span.select((col("d1") + 1).as("day"), lit(-1L).as("net")))
      .groupBy(col("day")).agg(sum(col("net")).as("net"))
    val range = span.agg(min(col("d0")).as("lo"), (max(col("d1")) + 1).as("hi"))
    val spine = range.select(explode(sequence(col("lo"), col("hi"))).as("day"))
    val days = spine.join(deltas, Seq("day"), "left")
      .select(col("day"), coalesce(col("net"), lit(0L)).as("net"))
    Rnk.globalCumsum(days, Seq(col("day").asc), col("net"), "before")
      .select(date_add(to_date(epoch), col("day").cast("int")).as("day"),
              (col("before") + col("net")).as("open_orders"))
  }

  val openOrdersDailyOracle: String =
    """WITH o AS (
      |  SELECT o_orderkey,
      |         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d0
      |  FROM orders),
      |e AS (
      |  SELECT l_orderkey,
      |         max(date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))) AS d1raw
      |  FROM lineitem GROUP BY 1),
      |span AS (
      |  SELECT d0, greatest(d0, coalesce(d1raw, d0)) AS d1
      |  FROM o LEFT JOIN e ON o_orderkey = l_orderkey),
      |deltas AS (
      |  SELECT d0 AS day, 1 AS net FROM span
      |  UNION ALL
      |  SELECT d1 + 1 AS day, -1 AS net FROM span),
      |net AS (SELECT day, CAST(sum(net) AS BIGINT) AS net FROM deltas GROUP BY 1),
      |r AS (SELECT min(d0) AS lo, max(d1) + 1 AS hi FROM span),
      |days AS (SELECT unnest(generate_series(lo, hi)) AS day FROM r),
      |j AS (SELECT days.day, coalesce(net.net, 0) AS net
      |      FROM days LEFT JOIN net USING (day))
      |SELECT DATE '1970-01-01' + CAST(day AS INT) AS day,
      |       CAST(sum(net) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
      |         AS open_orders
      |FROM j
      |""".stripMargin

  val basketRulesOracle: String =
    """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |p AS (
      |  SELECT a.l_partkey AS p1, b.l_partkey AS p2,
      |         CAST(count(*) AS BIGINT) AS pair_orders
      |  FROM op a JOIN op b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2 HAVING count(*) >= 3),
      |i AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS item_orders
      |      FROM op GROUP BY 1),
      |n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM op)
      |SELECT p1, p2, pair_orders,
      |       i1.item_orders AS p1_orders, i2.item_orders AS p2_orders,
      |       round(CAST(pair_orders AS DOUBLE) / i1.item_orders, 6) AS confidence,
      |       round(CAST(pair_orders * n_orders AS DOUBLE) /
      |             (i1.item_orders * i2.item_orders), 6) AS lift
      |FROM p JOIN i i1 ON p.p1 = i1.l_partkey
      |       JOIN i i2 ON p.p2 = i2.l_partkey
      |       CROSS JOIN n
      |""".stripMargin
}
