package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Temporal (as-of) joins — absent from the reference (SURVEY §2.5: "no
  * theta/range/as-of/interval joins"), essential for event attribution.
  *
  * The scalable as-of pattern: UNION the two sides with a type tag, sort
  * once per key by event time, and carry the left side's latest value
  * forward with a running `max(when(...))` window — one shuffle + one
  * sort per key, no range-join explosion, no per-row probe. (A native
  * ASOF JOIN, where the engine has one, compiles to the same plan.)
  */
object Temporal {

  /** Running "latest value of `valueCol` on tagged rows" per key: the
    * as-of carry-forward. Frame is unbounded-preceding → current row, so
    * a row can see its own tag only if it IS the tagged side. */
  def asofCarryForward(df: DataFrame, keys: Seq[String], order: Seq[Column],
                       value: Column, outCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(outCol, max(value).over(w))
  }

  /** Attribution query: for every purchase, the user's most recent click
    * at-or-before the purchase, and the gap in seconds (null when the
    * user never clicked before buying). */
  def attribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"),
              unix_micros(col("ts")).as("ts_us"), col("ts"))
    val carried = asofCarryForward(ev, Seq("user_id"),
      Seq(col("ts_us"), col("event_id")),
      when(col("event_type") === "click", col("ts_us")), "last_click_us")
    carried.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts").as("purchase_ts"),
        timestamp_micros(col("last_click_us")).as("last_click_ts"),
        expr("CAST((ts_us - last_click_us) DIV 1000000 AS LONG)")
          .as("gap_seconds"))
  }

  /** Range-frame query: for every purchase, how many clicks the user made
    * in the trailing hour — an interval join expressed as a RANGE window
    * over microseconds (one sort per user, no self-join, no row
    * explosion; frames are the engine-native way to do bounded-interval
    * aggregation). */
  def trailingWindow(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"),
              unix_micros(col("ts")).as("ts_us"), col("ts"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-3600L * 1000000L, 0L)
    ev.withColumn("clicks_1h",
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts").as("purchase_ts"),
              col("clicks_1h"))
  }

  val trailingWindowOracle: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, event_type,
      |         epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
      |         CAST(ts AS TIMESTAMP) AS ts
      |  FROM events WHERE event_type IN ('click', 'purchase')),
      |win AS (
      |  SELECT *,
      |         sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |           OVER (PARTITION BY user_id ORDER BY ts_us
      |                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS clicks_1h
      |  FROM ev)
      |SELECT event_id, user_id, ts AS purchase_ts,
      |       CAST(clicks_1h AS BIGINT) AS clicks_1h
      |FROM win WHERE event_type = 'purchase'
      |""".stripMargin

  /** Generic multi-column as-of join: for each `left` row, the latest
    * `right` row (per `keys`) with `rightTime` ≤ `leftTime`, carrying the
    * listed `carry` columns (null when no right row precedes).
    *
    * [[asofCarryForward]]'s `max(when(...))` trick carries ONE orderable
    * value; the general form needs all carried fields to come from the
    * SAME right row. Same union-once shape — tag the sides, sort each key
    * by (time, side, tiebreak) so right rows land immediately BEFORE the
    * left rows they are visible to (inclusive as-of) — then carry ONE
    * struct packing every carried field with `last(_, ignoreNulls)`. The
    * struct is null exactly on left rows and non-null on every right row
    * (even when individual carried FIELDS are null), so the carried
    * fields are unconditionally from the same latest right row —
    * per-column lasts would skip independently past null fields and
    * stitch a row that never existed. One shuffle + one sort per key —
    * the plan a native ASOF JOIN compiles to — versus the per-row probe
    * or range-explosion alternatives. Heavily-skewed keys shard like any
    * window: salt the key with a coarse time bucket upstream.
    *
    * `rightTiebreak` must totally order right rows within (key, time) —
    * ties would otherwise make the carried row engine-dependent. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String, rightTiebreak: String,
               carry: Seq[String]): DataFrame = {
    require(carry.nonEmpty, "carry must name at least one right column")
    val rSchema = right.schema
    def rType(c: String) = rSchema(c).dataType
    val asofStruct = org.apache.spark.sql.types.StructType(
      carry.map(c => org.apache.spark.sql.types.StructField(c, rType(c))))
    val l3 = left
      .withColumn("__t", col(leftTime))
      .withColumn("__r", lit(0))
      .withColumn("__tb", lit(null).cast(rType(rightTiebreak)))
      .withColumn("__asof", lit(null).cast(asofStruct))
    val leftOnly = l3.columns.filterNot(c =>
      keys.contains(c) || c == "__t" || c == "__r" || c == "__tb" ||
        c == "__asof")
    val r2base = right.select(
      keys.map(col) :+ col(rightTime).as("__t") :+ lit(1).as("__r") :+
        col(rightTiebreak).as("__tb") :+
        struct(carry.map(c => col(c).as(c)): _*).as("__asof"): _*)
    val r3 = leftOnly.foldLeft(r2base) { (df, c) =>
      df.withColumn(c, lit(null).cast(l3.schema(c).dataType))
    }
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__r").desc, col("__tb").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l3.unionByName(r3.select(l3.columns.map(col): _*))
    val carriedOut = carry.foldLeft(
        joined.withColumn("__asof", last(col("__asof"), ignoreNulls = true).over(w))) {
      (df, c) => df.withColumn("__asof_" + c, col("__asof").getField(c))
    }
    carriedOut
      .filter(col("__r") === 0)
      .drop("__t", "__r", "__tb", "__asof")
  }

  /** Oracle query for [[asofJoin]]: every purchase annotated with the
    * user's most recent `view` event at-or-before it — id, value, and the
    * gap in seconds, all from the SAME view row. */
  def asofQuery(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
              unix_micros(col("ts")).as("ts_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_event_id"),
              col("ts_us").as("view_ts_us"), col("ts_us"))
    asofJoin(purchases, views, Seq("user_id"),
        leftTime = "ts_us", rightTime = "ts_us", rightTiebreak = "view_event_id",
        carry = Seq("view_event_id", "view_ts_us"))
      .select(col("event_id"), col("user_id"),
        timestamp_micros(col("ts_us")).as("purchase_ts"),
        col("__asof_view_event_id").as("view_event_id"),
        expr("CAST((ts_us - `__asof_view_ts_us`) DIV 1000000 AS LONG)")
          .as("gap_seconds"))
  }

  val asofOracle: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, event_type,
      |         epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      |  FROM events WHERE event_type IN ('view', 'purchase')),
      |u AS (
      |  SELECT user_id, ts_us, event_id, 0 AS is_right,
      |         CAST(NULL AS BIGINT) AS tb,
      |         CAST(NULL AS BIGINT) AS r_event_id,
      |         CAST(NULL AS BIGINT) AS r_ts_us
      |  FROM ev WHERE event_type = 'purchase'
      |  UNION ALL
      |  SELECT user_id, ts_us, NULL, 1, event_id, event_id, ts_us
      |  FROM ev WHERE event_type = 'view'),
      |c AS (
      |  SELECT *,
      |         last_value(r_event_id IGNORE NULLS)
      |           OVER (PARTITION BY user_id
      |                 ORDER BY ts_us ASC, is_right DESC, tb ASC NULLS LAST
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS view_event_id,
      |         last_value(r_ts_us IGNORE NULLS)
      |           OVER (PARTITION BY user_id
      |                 ORDER BY ts_us ASC, is_right DESC, tb ASC NULLS LAST
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ts
      |  FROM u)
      |SELECT event_id, user_id, make_timestamp(ts_us) AS purchase_ts,
      |       view_event_id,
      |       CAST((ts_us - v_ts) // 1000000 AS BIGINT) AS gap_seconds
      |FROM c WHERE is_right = 0
      |""".stripMargin

  val attributionOracle: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, event_type,
      |         epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
      |         CAST(ts AS TIMESTAMP) AS ts
      |  FROM events WHERE event_type IN ('click', 'purchase')),
      |carried AS (
      |  SELECT *,
      |         max(CASE WHEN event_type = 'click' THEN ts_us END)
      |           OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_us
      |  FROM ev)
      |SELECT event_id, user_id, ts AS purchase_ts,
      |       make_timestamp(last_click_us) AS last_click_ts,
      |       CAST((ts_us - last_click_us) // 1000000 AS BIGINT) AS gap_seconds
      |FROM carried WHERE event_type = 'purchase'
      |""".stripMargin

  /** Half-life-decayed engagement per user: each event's value (cents
    * grid) weighted by `2^(−age/halfLife)` against a FIXED anchor date
    * (a pipeline parameter like [[graft.core.RunDate]] — never the wall
    * clock) and summed. The decay is PURE INTEGER arithmetic — micro-
    * scaled cents `DIV 2^weeks`, weeks capped at 60 so the shift cannot
    * overflow — which keeps the sum order-independent (the repo's
    * exact-sum discipline; a float `exp` decay would flap run-to-run at
    * 1000 executors AND differ between engines in the last ulp). One
    * map-side-combined hash aggregate; no window, no join.
    * PRECONDITION: event values are non-negative (integer DIV truncates
    * toward zero in Spark but floors in DuckDB — identical only for
    * non-negative operands; the events fixture is all-positive). */
  /** The per-event decay projection shared by the batch aggregate and
    * its streaming twin (the weight depends only on the event's own
    * timestamp and the fixed anchor — stateless per row, so a streaming
    * groupBy folds it with plain aggregation state). */
  def decayedProjection(events: DataFrame, anchor: String,
                        halfLifeDays: Int): DataFrame =
    events
      .select(col("user_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("value_cents"),
        greatest(datediff(lit(anchor).cast("date"), col("ts").cast("date")),
                 lit(0)).as("age_days"))
      .withColumn("weeks", least(expr(s"age_days DIV $halfLifeDays"), lit(60)))
      .withColumn("decayed_micro",
        expr("(value_cents * 1000000) DIV shiftleft(CAST(1 AS BIGINT), CAST(weeks AS INT))"))

  def decayedEngagement(spark: SparkSession, dir: String,
                        anchor: String = "2024-02-01",
                        halfLifeDays: Int = 7): DataFrame =
    decayedProjection(Tables.events(spark, dir), anchor, halfLifeDays)
      .groupBy(col("user_id"))
      .agg(sum(col("decayed_micro")).as("decayed_value_micro"),
           count(lit(1)).as("events_n"))

  val decayedEngagementOracle: String =
    """WITH e AS (
      |  SELECT user_id,
      |         CAST(round(value * 100) AS BIGINT) AS value_cents,
      |         greatest(date_diff('day', CAST(CAST(ts AS TIMESTAMP) AS DATE),
      |                            DATE '2024-02-01'), 0) AS age_days
      |  FROM events),
      |d AS (
      |  SELECT user_id,
      |         (value_cents * 1000000)
      |           // (CAST(1 AS BIGINT) << least(age_days // 7, 60)) AS decayed_micro
      |  FROM e)
      |SELECT user_id, CAST(sum(decayed_micro) AS BIGINT) AS decayed_value_micro,
      |       CAST(count(*) AS BIGINT) AS events_n
      |FROM d GROUP BY 1
      |""".stripMargin

  // ------------------------------------ point-in-time trailing features

  /** Point-in-time feature extraction: every order annotated with its
    * customer's trailing-90-day order count and spend, computed over
    * STRICTLY EARLIER days only (`RANGE BETWEEN 90 PRECEDING AND 1
    * PRECEDING` on a day-number axis). This is the feature-store
    * correctness contract for training-data generation — a frame that
    * included the current day would leak the label event into its own
    * features, the classic target-leakage bug.
    *
    * The RANGE frame (not ROWS) makes same-day peers — and the corpus's
    * planted duplicate order keys — see identical feature values, so the
    * result is deterministic without any intra-day tiebreak. Spend is
    * summed on the cents grid (exact-sum discipline: a float trailing
    * sum would be accumulation-order-dependent).
    *
    * Scale: one hash-partitioned window keyed by customer — no global
    * window, no join; skew is bounded by orders-per-customer. */
  def pitFeatures(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      col("o_orderkey"), col("o_custkey"),
      datediff(col("o_orderdate"), lit("1990-01-01").cast("date"))
        .cast("int").as("day"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
      .rangeBetween(-90, -1)
    o.withColumn("prior_cnt_90d", count(lit(1)).over(w).cast("long"))
      .withColumn("prior_cents_90d",
        coalesce(sum(col("cents")).over(w), lit(0L)))
  }

  val pitFeaturesOracle: String =
    """SELECT o_orderkey, o_custkey,
      |       CAST(date_diff('day', DATE '1990-01-01', o_orderdate) AS INT) AS day,
      |       CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
      |       CAST(count(*) OVER w AS BIGINT) AS prior_cnt_90d,
      |       CAST(coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w, 0) AS BIGINT)
      |         AS prior_cents_90d
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey
      |             ORDER BY date_diff('day', DATE '1990-01-01', o_orderdate)
      |             RANGE BETWEEN 90 PRECEDING AND 1 PRECEDING)
      |""".stripMargin
}
