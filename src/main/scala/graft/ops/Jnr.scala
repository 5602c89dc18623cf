package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join ("JNR_") operators.
  *
  * All reference joins are equi-joins (SURVEY §2.5). At scale the key moves
  * are: broadcast the dimension side (part/supplier/customer are orders of
  * magnitude smaller than the fact), and keep keys *clean at ingest* instead
  * of `trim()`-wrapping both sides of a join, which blocks pushdown and
  * breaks broadcast key statistics (reference anti-pattern:
  * m_supplier_performance_task.py:99-104).
  */
object Jnr {

  /** Fact ⋈ broadcast dimension (reference: J1 sales⋈products,
    * m_supplier_performance_task.py:81-95). */
  def factDim(fact: DataFrame, dim: DataFrame, keys: Seq[String],
              joinType: String = "inner"): DataFrame =
    fact.join(broadcast(dim), keys, joinType)

  /** Trim-tolerant equi-join, the reference's padded-key behavior
    * (reference: J2, m_supplier_performance_task.py:99-104). Implemented by
    * normalizing the key on each side *before* the join so the join itself
    * is a plain equi-join on a clean attribute (broadcast/SMJ eligible),
    * not an expression join. */
  def trimJoin(left: DataFrame, right: DataFrame, leftKey: String,
               rightKey: String, joinType: String = "inner"): DataFrame = {
    val lk = "__trim_" + leftKey
    val l = left.withColumn(lk, trim(col(leftKey)))
    val r = right.withColumn(lk, trim(col(rightKey))).drop(rightKey)
    l.join(r, Seq(lk), joinType).drop(lk)
  }

  /** Skew-safe equi-join for big⋈big joins with pathological hot keys,
    * where broadcast is impossible and AQE's skew split only kicks in
    * after a partition has already been written oversized. Each LEFT row
    * gets a deterministic salt in [0, `salts`) hashed from its content;
    * the RIGHT side is replicated `salts` times; the join key becomes
    * (keys..., salt) — a hot key's rows spread across `salts` reducers
    * instead of hammering one. Cost: the right side shuffles `salts`×
    * (choose the SMALLER side as `right`). The result is EXACTLY the
    * plain inner join — oracle-gated by [[saltedJoinOracle]] and
    * property-tested for several salt counts. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val l = left.withColumn("__salt",
      pmod(hash(left.columns.map(col): _*), lit(salts)))
    val r = right.withColumn("__salt",
      explode(typedlit(List.range(0, salts))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }

  /** Oracle query for [[saltedJoin]]: revenue by order priority through a
    * salted lineitem⋈orders join (hinted to SortMergeJoin so the salt is
    * actually load-bearing — a broadcast would hide it). Exact decimal
    * per-row money casts keep the sum reduction-order-free. */
  def saltedJoinQuery(spark: SparkSession, dir: String): DataFrame = {
    val li = graft.core.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"),
              (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
                .cast("decimal(18,6)").as("rev"))
    val ord = graft.core.Tables.orders(spark, dir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    saltedJoin(li, ord.hint("merge"), Seq("l_orderkey"), salts = 8)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
           sum(col("rev")).cast("double").as("revenue"))
  }

  val saltedJoinOracle: String =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1
      |""".stripMargin

  /** Rows in `src` whose key is absent from `tgt` — the reference expresses
    * this as outer-join + null filter (reference: Raptor.py:619-624); native
    * left_anti avoids materializing the null side. */
  def antiByKey(src: DataFrame, tgt: DataFrame, keys: Seq[String]): DataFrame =
    src.join(tgt, keys, "left_anti")

  /** Keyed semi-join (EXISTS). */
  def semiByKey(src: DataFrame, tgt: DataFrame, keys: Seq[String]): DataFrame =
    src.join(tgt, keys, "left_semi")

  /** Binned range join: `left` points joined to `right` intervals
    * `[start, end)` WITHOUT an equi-key, as an equi-join on a computed
    * bin column.
    *
    * Spark plans a pure inequality join as BroadcastNestedLoopJoin —
    * O(|L|·|R|) pair evaluations, a scale-killer when neither side fits
    * in a broadcast. Binning restores hash-partitionable structure: with
    * `binWidth` ≥ the longest interval, every interval overlaps at most
    * 2 consecutive bins, so the interval side is exploded to ≤2 rows,
    * both sides equi-join on the bin id, and the exact predicate filters
    * inside the bin. Shuffle volume is |L| + 2|R| keyed rows; pair
    * evaluations drop from |L|·|R| to Σ_bin |L_b|·|R_b| — the same
    * technique Flink's interval join and range-join hints in Databricks
    * runtime apply.
    *
    * `point`, `start`, `end` must be long-valued (e.g. epoch micros);
    * `binWidth` must be ≥ max(end − start) — asserted per row inside the
    * plan, because a silently-split interval would silently drop matches.
    * Output: all left columns + matched right columns (inner) — callers
    * aggregate or left-join against the result as needed. */
  def rangeJoinBinned(left: DataFrame, right: DataFrame,
                      point: Column, start: Column, end: Column,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val bw = lit(binWidth)
    // exact floor-division over the full long domain: pmod is >= 0 for any
    // sign, the subtraction lands on an exact multiple, and the decimal
    // divide keeps it exact where a double divide would round past 2^53
    def binOf(c: Column): Column =
      ((c - pmod(c, bw)).cast("decimal(38,0)") / bw).cast("long")
    // null-valued points/bounds can never satisfy the range predicate —
    // drop them up front, matching the naive inequality join (which
    // produces no match) instead of crashing the guard below on a NULL
    // length comparison
    val lBinned = left.filter(point.isNotNull).withColumn("__bin", binOf(point))
    // guard: an interval longer than binWidth would span >2 bins and
    // SILENTLY lose matches — raise inside the plan via a filter (a
    // dropped projection column would be pruned away unevaluated)
    val rBinned = right
      .filter(start.isNotNull && end.isNotNull)
      .filter(when(end - start <= bw, lit(true)).otherwise(raise_error(concat(
        lit("rangeJoinBinned: interval longer than binWidth at start="),
        start.cast("string")))))
      .withColumn("__bin", explode(array(binOf(start), binOf(start) + 1)))
    lBinned.join(rBinned, Seq("__bin"))
      .filter(point >= start && point < end)
      .drop("__bin")
  }

  private val DayUs = 86400000000L
  private val WindowDays = 3
  private val BigOrder = 400000.0

  /** Oracle query for [[rangeJoinBinned]]: each lineitem shipment joined
    * to the LARGE orders (totalprice > [[BigOrder]], ~20% of orders)
    * placed in the [[WindowDays]] days up to and including its ship date
    * — a pure range predicate with NO equi-key (the order side is all
    * large orders, not the lineitem's own), aggregated per lineitem. The
    * exact same result falls out of a plain inequality join in the
    * oracle; the engine side goes through the bin equi-join, proving the
    * rewrite is lossless.
    *
    * The selectivity filter keeps the matched-pair volume linear-ish in
    * the corpus (the synthetic testdata packs 10× the orders into the
    * SAME 2400-day span at each sf, so an unfiltered 3-day window grows
    * pair volume quadratically — a fixture artifact, not a property of
    * deployed data, where the time span grows with the data). */
  def rangeJoinQuery(spark: SparkSession, dir: String): DataFrame = {
    val li = graft.core.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
              // parquet carries TIMESTAMP_NTZ; session TZ is pinned UTC so
              // the cast is the identity instant, same micros as DuckDB
              unix_micros(col("l_shipdate").cast("timestamp")).as("p"))
    // aggregate-below-join: the interval is a pure function of s, so
    // orders sharing an s are ONE interval row carrying pre-summed
    // measures — a lossless rewrite (no alignment assumption) that cuts
    // the joined pair volume from |lineitem|×|orders-in-window| to
    // |lineitem|×|distinct s in window|, here ~12×
    val ord = graft.core.Tables.orders(spark, dir)
      .filter(col("o_totalprice") > BigOrder)
      .select(col("o_totalprice"),
              unix_micros(col("o_orderdate").cast("timestamp")).as("s"))
      .groupBy(col("s"))
      .agg(count(lit(1)).as("n_ord"),
           sum(col("o_totalprice").cast("decimal(18,6)")).as("day_price"))
      .withColumn("e", col("s") + lit(WindowDays * DayUs))
    rangeJoinBinned(li, ord, col("p"), col("s"), col("e"), WindowDays * DayUs)
      .groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(sum(col("n_ord")).as("n_orders"),
           round(sum(col("day_price")).cast("double"), 6).as("sum_price"))
  }

  val rangeJoinOracle: String =
    s"""WITH li AS (
       |  SELECT l_orderkey, l_linenumber,
       |         epoch_us(CAST(l_shipdate AS TIMESTAMP)) AS p
       |  FROM lineitem),
       |o AS (
       |  SELECT o_totalprice, epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS s
       |  FROM orders WHERE o_totalprice > $BigOrder)
       |SELECT l_orderkey, l_linenumber,
       |       CAST(count(*) AS BIGINT) AS n_orders,
       |       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_price
       |FROM li JOIN o ON li.p >= o.s AND li.p < o.s + ${WindowDays * DayUs}::BIGINT
       |GROUP BY 1, 2
       |""".stripMargin

  /** Flag join: mark rows whose `attr` appears in a (small) flag set,
    * surfacing the flag as the string "true"/"false" like the reference's
    * TOP_PERFORMER (reference: J9, m_customer_sales_report_task.py:226-252).
    * Broadcast + left join + coalesce, not a shuffle.
    */
  def flagJoin(detail: DataFrame, flags: DataFrame, detailAttr: String,
               flagAttr: String, outCol: String): DataFrame = {
    val f = flags.select(col(flagAttr).as(detailAttr))
      .distinct()
      .withColumn(outCol, lit("true"))
    detail.join(broadcast(f), Seq(detailAttr), "left")
      .withColumn(outCol, coalesce(col(outCol), lit("false")))
  }
}
