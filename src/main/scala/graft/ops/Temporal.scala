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
}
