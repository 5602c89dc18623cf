package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.Tables

/** Event-stream analytics. The reference has no streaming surface at all
  * (SURVEY §2.12 — "incremental" processing is simulated with daily batch
  * snapshots); this module adds the streaming-shaped operators a modern
  * pipeline needs, built so the SAME transform runs in batch and in
  * Structured Streaming: each operator is a DataFrame→DataFrame function;
  * batch callers apply it to a parquet scan, streaming callers to a
  * `readStream` source with a watermark (see [[streamingWindowedAgg]]).
  *
  * Scale notes: the windowed aggregate is a standard partial+final hash
  * agg keyed by (window, event_type) — no skew risk with bounded event
  * types × time buckets. Sessionization shuffles once on user_id; in
  * streaming it holds one small state object per active (user) group and
  * evicts by event-time timeout, so state is O(active users), not O(events).
  */
object EventOps {

  private val SessionGapSeconds = 1800L

  /** Exact money accumulation (order-independent across engines). */
  private def money(c: Column): Column = c.cast(DecimalType(18, 6))

  // ----------------------------------------------------------- windowed agg
  /** Tumbling 1-hour aggregate per event type: counts, exact value sum,
    * and a JSON-extracted metric sum (`props.k`). Works unchanged on a
    * streaming frame (append a watermark first). */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           round(sum(money(col("value"))), 2).cast("double").as("total_value"),
           sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"))
      .select(col("window.start").as("window_start"), col("event_type"),
              col("n_events"), col("total_value"), col("sum_k"))

  /** The same aggregate as a late-data-tolerant streaming query. */
  def streamingWindowedAgg(stream: DataFrame, watermark: String = "2 hours"): DataFrame =
    windowedAgg(stream.withWatermark("ts", watermark))

  def windowedQuery(spark: SparkSession, dir: String): DataFrame =
    windowedAgg(Tables.events(spark, dir))

  val windowedOracle: String =
    """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
      |       event_type,
      |       CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value,
      |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
      |FROM events
      |GROUP BY 1, 2
      |""".stripMargin

  // ------------------------------------------------------- sliding uniques
  /** SLIDING-window distinct users (HLL estimate) — the streaming twin of
    * [[graft.ops.TimeSeries.rollingUniquesSketch]]'s rolling-reach shape:
    * `window(ts, length, slide)` assigns each event to every window it
    * falls in, and `approx_count_distinct` keeps one fixed-size HLL per
    * open window — the only state a stream can afford for rolling
    * distinct (exact distinct state grows with user cardinality and can
    * never be evicted). Deterministic for a given input set (hash-based,
    * order-independent), so the streaming run equals the batch run on the
    * same frame EXACTLY — the stream==batch equality is spec-gated, not
    * bounded. Works unchanged on a batch frame; streaming callers append
    * a watermark so closed windows seal and state is evicted. */
  def slidingUniques(events: DataFrame, length: String = "70 minutes",
                     slide: String = "10 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), length, slide))
      .agg(approx_count_distinct(col("user_id")).as("n_unique_est"))
      .select(col("window.start").as("win_start"),
              col("window.end").as("win_end"), col("n_unique_est"))

  /** The same sliding-uniques aggregate as a watermark-evicted stream. */
  def streamingSlidingUniques(stream: DataFrame,
                              watermark: String = "2 hours",
                              length: String = "70 minutes",
                              slide: String = "10 minutes"): DataFrame =
    slidingUniques(stream.withWatermark("ts", watermark), length, slide)

  // --------------------------------------------------------- trending top-k
  /** Trending event types: the top-`k` types per tumbling hour by count,
    * deterministic event_type tiebreak. The rank window is partitioned
    * PER HOUR — parallel across windows, bounded (#event types) within
    * one.
    *
    * Streaming twin: rank is a window function, which streaming
    * aggregation cannot host — so the stream maintains the mergeable
    * per-(hour, type) COUNTS with a foreachBatch ⊕-merge (same
    * decomposability argument as [[graft.ops.Rollup]]) and presents
    * trending from the maintained state; see the stream==batch spec. */
  def trending(windowed: DataFrame, k: Int = 3): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("window_start"))
      .orderBy(col("n_events").desc, col("event_type"))
    windowed.select(col("window_start"), col("event_type"), col("n_events"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }

  def trendingQuery(spark: SparkSession, dir: String): DataFrame =
    trending(windowedQuery(spark, dir))

  /** ⊕-merge of two per-(window, type) count states. */
  def mergeCounts(state: DataFrame, batch: DataFrame): DataFrame =
    state.unionByName(batch)
      .groupBy(col("window_start"), col("event_type"))
      .agg(sum(col("n_events")).as("n_events"))

  val trendingOracle: String =
    """WITH c AS (
      |  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
      |         event_type, CAST(count(*) AS BIGINT) AS n_events
      |  FROM events GROUP BY 1, 2),
      |r AS (
      |  SELECT *, CAST(row_number() OVER (
      |    PARTITION BY window_start
      |    ORDER BY n_events DESC, event_type) AS INT) AS rank
      |  FROM c)
      |SELECT window_start, event_type, n_events, rank FROM r WHERE rank <= 3
      |""".stripMargin

  // ------------------------------------------------------------- rollup agg
  /** Daily/event-type rollup with subtotals and a grand total (grouping
    * sets). One hash aggregation; subtotal rows are computed by Spark's
    * Expand, not extra scans. */
  def rollupQuery(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("day", to_date(col("ts")))
      .rollup(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_events"),
           round(sum(money(col("value"))), 2).cast("double").as("total_value"))

  val rollupOracle: String =
    """SELECT event_type,
      |       CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
      |       CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY ROLLUP (event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE))
      |""".stripMargin

  // -------------------------------------------------------- anomaly scoring
  /** Per-event z-score against its event type's global mean/stddev;
    * events with |z| ≥ 3 are anomalies. Two-pass shape: a tiny per-type
    * stats aggregate broadcast back onto the stream of events — at scale
    * the stats side is bounded by the number of event types. */
  def anomalies(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val stats = ev.groupBy(col("event_type"))
      .agg(avg(col("value")).as("mean_v"),
           stddev_samp(col("value")).as("sd_v"))
    ev.join(broadcast(stats), Seq("event_type"))
      .withColumn("z", (col("value") - col("mean_v")) / col("sd_v"))
      .filter(abs(col("z")) >= 3.0)
      .select(col("event_id"), col("event_type"), col("value"),
              round(col("z"), 6).as("z_score"))
  }

  val anomaliesOracle: String =
    """WITH stats AS (
      |  SELECT event_type, avg(value) AS mean_v, stddev_samp(value) AS sd_v
      |  FROM events GROUP BY 1)
      |SELECT event_id, e.event_type, value,
      |       round((value - mean_v) / sd_v, 6) AS z_score
      |FROM events e JOIN stats USING (event_type)
      |WHERE abs((value - mean_v) / sd_v) >= 3.0
      |""".stripMargin

  // --------------------------------------------------------- streaming dedup
  /** Streaming exact dedup: keeps the first event per key within the
    * watermark horizon, state evicted as the watermark passes — the
    * streaming twin of [[graft.ops.Dedup.exact]] for at-least-once
    * sources. */
  def streamingDedup(stream: DataFrame, keys: Seq[String],
                     watermark: String = "1 hour"): DataFrame = {
    // empty key list means whole-row dedup (dropDuplicates semantics);
    // the within-watermark variant rejects Nil at plan time, so spell
    // out the full column list instead of throwing head-of-empty-list
    val ks = if (keys.isEmpty) stream.columns.toSeq else keys
    stream.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(ks)
  }

  // ------------------------------------------------- stream-stream join
  /** Click→purchase interval join: each purchase matched to every click by
    * the same user in the preceding hour. One transform serves batch and
    * streaming — the join condition is pure event-time arithmetic.
    *
    * In streaming (both inputs watermarked — see
    * [[streamingClickPurchaseJoin]]) the event-time range bound is what
    * lets Spark EVICT join state: each side buffers only the watermark
    * horizon + 1 hour, so state is O(recent events), not O(stream). An
    * equi-join without the time bound would grow state forever. Batch
    * planning is an ordinary shuffle join on user_id with the range as a
    * post-filter. */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.select(col("user_id"), col("event_id").as("click_id"),
                          col("ts").as("click_ts"))
    val p = purchases.select(col("user_id").as("p_user"),
                             col("event_id").as("purchase_id"),
                             col("ts").as("purchase_ts"),
                             col("value").as("purchase_value"))
    c.join(p,
        col("user_id") === col("p_user") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
              col("click_ts"), col("purchase_ts"), col("purchase_value"))
  }

  /** Scale variant of [[clickPurchaseJoin]] for skewed users: the plain
    * form equi-joins on user_id and evaluates the time range as a join
    * filter, so a user with C clicks and P purchases costs C×P
    * comparisons inside one task. Adding the hour bucket to the equi-key
    * bounds each group to one hour of activity: every in-range pair has
    * click_bucket ∈ {purchase_bucket − 1, purchase_bucket}, so the
    * purchase side explodes those two candidate keys (2× row overhead)
    * and each qualifying pair meets EXACTLY once — results identical,
    * verified against the plain form in NewOpsSpec. Batch-only: the
    * streaming twin needs the raw event-time range for watermark state
    * eviction analysis. */
  def clickPurchaseJoinBucketed(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val BucketUs = 3600000000L // 1 hour, matching the join's range width
    val c = clicks.select(col("user_id"), col("event_id").as("click_id"),
                          col("ts").as("click_ts"))
      .withColumn("bucket", expr(s"unix_micros(click_ts) div $BucketUs"))
    val p = purchases.select(col("user_id").as("p_user"),
                             col("event_id").as("purchase_id"),
                             col("ts").as("purchase_ts"),
                             col("value").as("purchase_value"),
                             expr(s"unix_micros(ts) div $BucketUs").as("pb"))
      .withColumn("bucket", explode(array(col("pb") - 1, col("pb"))))
      .drop("pb")
    c.join(p,
        col("user_id") === col("p_user") && c("bucket") === p("bucket") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
              col("click_ts"), col("purchase_ts"), col("purchase_value"))
  }

  /** The same join as a streaming query (append mode): watermarks bound
    * both sides' state; late events beyond the watermark are dropped. */
  def streamingClickPurchaseJoin(clickStream: DataFrame,
                                 purchaseStream: DataFrame,
                                 watermark: String = "2 hours"): DataFrame =
    clickPurchaseJoin(clickStream.withWatermark("ts", watermark),
                      purchaseStream.withWatermark("ts", watermark))

  def clickPurchaseQuery(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    clickPurchaseJoin(e.filter(col("event_type") === "click"),
                      e.filter(col("event_type") === "purchase"))
  }

  val clickPurchaseOracle: String =
    """WITH c AS (
      |  SELECT user_id, event_id AS click_id, CAST(ts AS TIMESTAMP) AS click_ts
      |  FROM events WHERE event_type = 'click'),
      |p AS (
      |  SELECT user_id, event_id AS purchase_id, CAST(ts AS TIMESTAMP) AS purchase_ts,
      |         value AS purchase_value
      |  FROM events WHERE event_type = 'purchase')
      |SELECT c.user_id, c.click_id, p.purchase_id, c.click_ts, p.purchase_ts,
      |       p.purchase_value
      |FROM c JOIN p ON c.user_id = p.user_id
      | AND p.purchase_ts >= c.click_ts
      | AND p.purchase_ts <= c.click_ts + INTERVAL 1 HOUR
      |""".stripMargin

  /** UNATTRIBUTED clicks — the abandonment metric: clicks with NO
    * purchase by the same user in the following hour. ONE transform for
    * batch and streaming: a LEFT OUTER interval join + null filter
    * (streaming left-outer emits the null-extended row only once the
    * WATERMARK proves no match can still arrive — exactly the
    * "waited an hour, nobody bought" semantics; in batch the same plan
    * is an ordinary left join). The anti-join formulation would be the
    * batch idiom, but streaming has no left_anti interval join — the
    * null-filtered left-outer IS the streaming-portable anti. */
  def unattributedClicks(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.select(col("user_id"), col("event_id").as("click_id"),
                          col("ts").as("click_ts"))
    val p = purchases.select(col("user_id").as("p_user"),
                             col("event_id").as("purchase_id"),
                             col("ts").as("purchase_ts"))
    c.join(p,
        col("user_id") === col("p_user") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"),
        "left_outer")
      .filter(col("purchase_id").isNull)
      .select(col("user_id"), col("click_id"), col("click_ts"))
  }

  /** Streaming twin: both sides watermarked so the join can seal "no
    * match arrived" per click and evict its state. */
  def streamingUnattributedClicks(clickStream: DataFrame,
                                  purchaseStream: DataFrame,
                                  watermark: String = "2 hours"): DataFrame =
    unattributedClicks(clickStream.withWatermark("ts", watermark),
                       purchaseStream.withWatermark("ts", watermark))

  def unattributedQuery(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    unattributedClicks(e.filter(col("event_type") === "click"),
                       e.filter(col("event_type") === "purchase"))
  }

  val unattributedOracle: String =
    """WITH c AS (
      |  SELECT user_id, event_id AS click_id, CAST(ts AS TIMESTAMP) AS click_ts
      |  FROM events WHERE event_type = 'click'),
      |p AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS purchase_ts
      |  FROM events WHERE event_type = 'purchase')
      |SELECT c.user_id, c.click_id, c.click_ts
      |FROM c
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM p
      |  WHERE p.user_id = c.user_id
      |    AND p.purchase_ts >= c.click_ts
      |    AND p.purchase_ts <= c.click_ts + INTERVAL 1 HOUR)
      |""".stripMargin

  // -------------------------------------------------------- warehouse sink
  /** Continuously append a streaming frame's micro-batches into the
    * two-layer warehouse history (foreachBatch: each batch is a normal
    * DataFrame write, so the same [[graft.connect.Warehouse]] sink serves
    * batch and streaming). Caller starts/stops the returned query.
    *
    * foreachBatch is AT-LEAST-ONCE: a batch whose write committed but
    * whose checkpoint offset did not is REPLAYED after restart. The
    * epochId is therefore threaded into the idempotent per-batch append
    * ([[graft.connect.Warehouse.appendHistoryBatch]]), which overwrites
    * the batch's own partition on replay instead of appending a second
    * copy — restoring the exactly-once history the built-in file sinks
    * give for free. */
  def toWarehouse(stream: DataFrame, warehouse: graft.connect.Warehouse,
                  entity: String, checkpoint: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        warehouse.appendHistoryBatch(batch, entity, epochId)
      }

  // ---------------------------------------------------------- sessionization
  /** Batch sessionization: a session is a run of events per user with
    * gaps < 30 minutes. Computed with lag + a running sum of gap-breaks —
    * two passes over one user-partitioned sort, no self-join. Gap compare
    * is in integer microseconds, so engines can't disagree on boundaries. */
  def sessionize(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapBreak = when(
      unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(byUser)) >
        SessionGapSeconds * 1000000L, 1).otherwise(lit(0))
    // first event of a user has lag NULL -> comparison NULL -> otherwise(0):
    // session numbering starts at 0 for every user.
    events
      .withColumn("brk", gapBreak)
      .withColumn("session_id",
        sum(col("brk")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("session_start"),
           max(col("ts")).as("session_end"),
           count(lit(1)).as("n_events"),
           round(sum(money(col("value"))), 2).cast("double").as("session_value"))
  }

  def sessionQuery(spark: SparkSession, dir: String): DataFrame =
    sessionize(Tables.events(spark, dir))

  /** The same sessions via Spark's built-in `session_window` aggregation —
    * the form that also runs under Structured Streaming with native
    * session-state merging. Differences from [[sessionize]]: the built-in
    * treats the gap as session-window EXTENT (end = last event + gap) and
    * merges windows that OVERLAP, i.e. a gap exactly equal to
    * [[SessionGapSeconds]] stays in one session, where the lag-based
    * formulation (gap > threshold breaks) also keeps it — boundary-equal
    * semantics, verified against [[sessionize]] on the corpus in
    * StreamingSpec/NewOpsSpec. No window ordering pass: one aggregation. */
  def sessionizeBuiltin(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"),
               session_window(col("ts"), s"$SessionGapSeconds seconds"))
      .agg(min(col("ts")).as("session_start"),
           max(col("ts")).as("session_end"),
           count(lit(1)).as("n_events"),
           round(sum(money(col("value"))), 2).cast("double").as("session_value"))
      .drop("session_window")

  val sessionOracle: String =
    s"""WITH o AS (
       |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value,
       |         CASE WHEN epoch_us(CAST(ts AS TIMESTAMP)) - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w > ${SessionGapSeconds}000000
       |              THEN 1 ELSE 0 END AS brk
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)),
       |s AS (
       |  SELECT user_id, ts, value,
       |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                        ROWS UNBOUNDED PRECEDING) AS session_id
       |  FROM o)
       |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       |       min(ts) AS session_start,
       |       max(ts) AS session_end,
       |       CAST(count(*) AS BIGINT) AS n_events,
       |       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS session_value
       |FROM s GROUP BY 1, 2
       |""".stripMargin
}
