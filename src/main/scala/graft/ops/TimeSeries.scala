package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.Caches.TrackedDataset
import graft.core.Tables

/** Time-series shaping over the event log: dense gap-filled daily series,
  * the full ranking/offset window-function family, and JSON property
  * flattening.
  *
  * Scale design: [[gapFill]] builds the day spine with `sequence()` from
  * a 1-row global min/max aggregate — the spine explode is per-user and
  * bounded by the date range, never a driver loop; the left join streams
  * the (user, day) rollup against it. [[windowFuncs]] is one
  * user-partitioned sort shared by every window expression (same
  * partition+order ⇒ one WindowExec). [[jsonFlatten]] is a shuffle-free
  * projection with `from_json` (schema pinned — no sampling pass).
  */
object TimeSeries {

  /** Dense per-(user, day) click counts: absent days appear with 0 —
    * downstream rolling averages and burn-down charts need total series.
    * Spine = every user × every day in the corpus's global range. */
  def gapFill(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val perDay = e.filter(col("event_type") === "click")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_clicks"))
    // global range: one-row aggregate, broadcast into the per-user spine
    val range = e.agg(to_date(min(col("ts"))).as("d0"),
                      to_date(max(col("ts"))).as("d1"))
    val spine = e.select(col("user_id")).distinct()
      .crossJoin(broadcast(range))
      .select(col("user_id"),
              explode(sequence(col("d0"), col("d1"))).as("day"))
    spine.join(perDay, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
              coalesce(col("n_clicks"), lit(0L)).as("n_clicks"))
  }

  val gapFillOracle: String =
    """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
      |r AS (SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1 FROM e),
      |days AS (
      |  SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS d FROM r),
      |spine AS (
      |  SELECT u.user_id, CAST(days.d AS DATE) AS day
      |  FROM (SELECT DISTINCT user_id FROM e) u, days),
      |c AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n_clicks
      |  FROM e WHERE event_type = 'click' GROUP BY 1, 2)
      |SELECT s.user_id, s.day, coalesce(c.n_clicks, 0) AS n_clicks
      |FROM spine s LEFT JOIN c USING (user_id, day)
      |""".stripMargin

  /** The ranking/offset/frame window families over one shared
    * user-partitioned sort: lag/lead, row_number, ntile, cume_dist, and
    * an exact-decimal running total. Every function orders by the unique
    * (ts, event_id) pair, so results are deterministic. */
  def windowFuncs(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .select(
        col("user_id"), col("event_id"),
        lag(col("event_id"), 1).over(w).as("prev_event_id"),
        lead(col("event_id"), 1).over(w).as("next_event_id"),
        row_number().over(w).as("seq"),
        ntile(4).over(w).as("quartile"),
        round(cume_dist().over(w), 6).as("cume"),
        round(sum(col("value").cast(DecimalType(18, 6)))
          .over(w.rowsBetween(Long.MinValue, 0)), 2)
          .cast("double").as("running_value"))
  }

  val windowFuncsOracle: String =
    """SELECT user_id, event_id,
      |       lag(event_id, 1) OVER w AS prev_event_id,
      |       lead(event_id, 1) OVER w AS next_event_id,
      |       CAST(row_number() OVER w AS INT) AS seq,
      |       CAST(ntile(4) OVER w AS INT) AS quartile,
      |       round(cume_dist() OVER w, 6) AS cume,
      |       CAST(round(sum(CAST(value AS DECIMAL(18,6))) OVER (
      |         PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
      |         ROWS UNBOUNDED PRECEDING), 2) AS DOUBLE) AS running_value
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
      |""".stripMargin

  /** Seasonal-baseline anomaly detection on the daily event count: each
    * day is compared against the mean/variance of ITS OWN WEEKDAY (so a
    * quiet Sunday is not flagged just for being a Sunday — the
    * day-of-week seasonality is the baseline). A day is anomalous when
    * `|cnt − mean_dow| > 2·σ_dow`.
    *
    * The test is evaluated entirely in 64-bit integer arithmetic —
    * multiplying through by n² turns `(cnt − s/n)² > 4·(nΣx²−s²)/n²`
    * into `(n·cnt − s)² > 4·(n·Σx² − s²)`, with no division, no sqrt,
    * no float: bit-identical across engines. Weekday is
    * `days-since-epoch mod 7` (epoch = Thursday), avoiding the
    * dayofweek() numbering mismatch between engines. Shape: one daily
    * hash aggregate (365·years rows), a 7-row weekday aggregate joined
    * back broadcast — scan-bound at any event volume. */
  def weekdayAnomalies(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("dow",
        pmod(datediff(col("day"), lit("1970-01-01")), lit(7)).cast("int"))
    val base = daily.groupBy(col("dow"))
      .agg(count(lit(1)).as("n"), sum(col("cnt")).as("s"),
           sum(col("cnt") * col("cnt")).as("ss"))
    daily.join(broadcast(base), "dow")
      .select(col("day"), col("dow"), col("cnt"),
        (pow2(col("n") * col("cnt") - col("s")) >
          lit(4L) * (col("n") * col("ss") - col("s") * col("s"))).as("is_anomaly"))
  }

  private def pow2(c: org.apache.spark.sql.Column) = c * c

  val weekdayAnomaliesOracle: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1),
      |d AS (
      |  SELECT day, cnt,
      |         CAST(date_diff('day', DATE '1970-01-01', day) % 7 AS INT) AS dow
      |  FROM daily),
      |base AS (
      |  SELECT dow, CAST(count(*) AS BIGINT) AS n, CAST(sum(cnt) AS BIGINT) AS s,
      |         CAST(sum(cnt * cnt) AS BIGINT) AS ss
      |  FROM d GROUP BY 1)
      |SELECT day, d.dow, cnt,
      |       (n * cnt - s) * (n * cnt - s) > 4 * (n * ss - s * s) AS is_anomaly
      |FROM d JOIN base ON d.dow = base.dow
      |""".stripMargin

  /** Typed JSON property extraction with a PINNED schema (`from_json`
    * with inference would add a full sampling pass before the real scan). */
  def jsonFlatten(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
              from_json(col("props"), lit("k INT")).getField("k").as("k"))
      .withColumn("k_bucket", floor(col("k") / 10).cast("int"))

  val jsonFlattenOracle: String =
    """SELECT event_id,
      |       CAST(json_extract_string(props, '$.k') AS INT) AS k,
      |       CAST(floor(CAST(json_extract_string(props, '$.k') AS INT) / 10) AS INT) AS k_bucket
      |FROM events
      |""".stripMargin

  /** Robust daily-volume trend per event type: the Theil–Sen slope
    * (median of all pairwise day-slopes — breakdown point 29%, immune
    * to the single-day spikes that wreck OLS) next to the exact-decimal
    * OLS slope for comparison. The pairwise expansion is per-group over
    * the DAILY rollup — days², not events² (a year is ~66k pairs), and
    * the fact table is touched once for the rollup. OLS comes from
    * exact integer sums (counts × epoch-days — no double folds at all);
    * Theil–Sen medians use the percentile() aggregate over IEEE-exact
    * slope quotients, both proven cross-engine patterns. Days are
    * epoch-days so x is integer and identical everywhere. */
  def dailyTrend(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"),
               datediff(to_date(col("ts")), lit("1970-01-01")).as("d"))
      .agg(count(lit(1)).as("cnt"))
      .trackPersist()
    val a = daily.select(col("event_type"), col("d").as("da"), col("cnt").as("ca"))
    val b = daily.select(col("event_type"), col("d").as("db"), col("cnt").as("cb"))
    val sen = a.join(b, Seq("event_type")).filter(col("da") < col("db"))
      .select(col("event_type"),
        ((col("cb") - col("ca")).cast("double") / (col("db") - col("da")))
          .as("slope"))
      .groupBy(col("event_type"))
      .agg(round(expr("percentile(slope, 0.5)"), 6).as("theil_sen_slope"))
    val ols = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("d")).as("sx"),
           sum(col("cnt")).as("sy"), sum(col("d") * col("d")).as("sxx"),
           sum(col("d") * col("cnt")).as("sxy"))
      .select(col("event_type"), col("n"),
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"), 6)
          .as("ols_slope"))
    ols.join(sen, Seq("event_type"))
      .select(col("event_type"), col("n").as("days"),
              col("ols_slope"), col("theil_sen_slope"))
  }

  val dailyTrendOracle: String =
    """WITH daily AS (
      |  SELECT event_type,
      |         date_diff('day', DATE '1970-01-01',
      |                   CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS d,
      |         CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |sen AS (
      |  SELECT a.event_type,
      |         round(quantile_cont(CAST(b.cnt - a.cnt AS DOUBLE) / (b.d - a.d), 0.5), 6)
      |           AS theil_sen_slope
      |  FROM daily a JOIN daily b
      |    ON a.event_type = b.event_type AND a.d < b.d
      |  GROUP BY 1),
      |ols AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS days,
      |         round(CAST(count(*) * sum(d * cnt) - sum(d) * sum(cnt) AS DOUBLE) /
      |               CAST(count(*) * sum(d * d) - sum(d) * sum(d) AS DOUBLE), 6)
      |           AS ols_slope
      |  FROM daily GROUP BY 1)
      |SELECT event_type, days, ols_slope, theil_sen_slope
      |FROM ols JOIN sen USING (event_type)
      |""".stripMargin

  /** Per-user inter-arrival cadence: count of gaps, mean / median gap in
    * integer seconds, and the coefficient of variation ("burstiness" —
    * CV ≈ 1 is Poisson-like, ≫ 1 bursty, ≪ 1 metronomic), the behavior
    * fingerprint bot-detection and engagement models start from. Gaps
    * come from one user-partitioned ordered window (lag — parallel, no
    * self-join); truncating each gap to integer seconds FIRST keeps
    * every power sum exact in BIGINT (gap² ≤ ~10¹⁰ · gaps — no
    * overflow, no double fold), so mean/CV are closed-form from exact
    * sums and the median is the proven percentile() aggregate. */
  def cadence(spark: SparkSession, dir: String): DataFrame = {
    val gaps = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("gap_s",
        expr("(ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)) DIV 1000000"))
      .filter(col("gap_s").isNotNull)
    gaps.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"),
           sum(col("gap_s")).as("sx"),
           sum(col("gap_s") * col("gap_s")).as("sxx"),
           expr("percentile(gap_s, 0.5)").as("med"))
      .select(col("user_id"), col("n_gaps"),
        round(col("sx").cast("double") / col("n_gaps"), 6).as("mean_gap_s"),
        round(col("med"), 6).as("median_gap_s"),
        when(col("sx") === 0L, lit(0d)).otherwise(round(
          sqrt(greatest((col("sxx") - col("sx") * col("sx") / col("n_gaps"))
                          .cast("double") / col("n_gaps"), lit(0d))) /
          (col("sx").cast("double") / col("n_gaps")), 6)).as("burstiness"))
  }

  /** Longest consecutive-day activity streak per user — gaps-and-islands
    * on the distinct (user, day) frame: within a user, `day −
    * row_number()` is constant exactly along a run of consecutive days,
    * so one user-partitioned window (parallel) plus two hash aggregates
    * yield streak lengths with no self-join and no spine explosion.
    * Days are integer epoch-days, so the island key is pure integer
    * arithmetic on both engines. */
  def streaks(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("d"))
    Tables.events(spark, dir)
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01")).as("d"))
      .distinct()
      .withColumn("isl", col("d") - row_number().over(w))
      .groupBy(col("user_id"), col("isl"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(sum(col("len")).as("n_active_days"),
           max(col("len")).as("longest_streak"),
           count(lit(1)).as("n_streaks"))
  }

  val streaksOracle: String =
    """WITH d AS (
      |  SELECT DISTINCT user_id,
      |         date_diff('day', DATE '1970-01-01',
      |                   CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS d
      |  FROM events),
      |i AS (
      |  SELECT user_id,
      |         d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS isl
      |  FROM d),
      |runs AS (
      |  SELECT user_id, isl, CAST(count(*) AS BIGINT) AS len
      |  FROM i GROUP BY 1, 2)
      |SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
      |       CAST(max(len) AS BIGINT) AS longest_streak,
      |       CAST(count(*) AS BIGINT) AS n_streaks
      |FROM runs GROUP BY 1
      |""".stripMargin

  val cadenceOracle: String =
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      |  FROM events),
      |g AS (
      |  SELECT user_id,
      |         (ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id))
      |           // 1000000 AS gap_s
      |  FROM e),
      |gg AS (SELECT user_id, gap_s FROM g WHERE gap_s IS NOT NULL),
      |agg AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
      |         CAST(sum(gap_s) AS BIGINT) AS sx,
      |         CAST(sum(gap_s * gap_s) AS BIGINT) AS sxx,
      |         quantile_cont(gap_s, 0.5) AS med
      |  FROM gg GROUP BY 1)
      |SELECT user_id, n_gaps,
      |       round(CAST(sx AS DOUBLE) / n_gaps, 6) AS mean_gap_s,
      |       round(med, 6) AS median_gap_s,
      |       CASE WHEN sx = 0 THEN 0.0 ELSE round(
      |         sqrt(greatest(CAST(sxx - sx * sx / n_gaps AS DOUBLE) / n_gaps, 0)) /
      |         (CAST(sx AS DOUBLE) / n_gaps), 6) END AS burstiness
      |FROM agg
      |""".stripMargin

  // ----------------------------------------------------- rolling uniques

  private val RollWindow = 7

  /** Trailing-[[RollWindow]]-day DISTINCT users per day — the rolling
    * reach metric (WAU-style) that a plain window frame cannot compute,
    * because distinct does not decompose over frame slides. The exact
    * formulation: dedupe to (day, user) grain once, let each day
    * CONTRIBUTE to the [[RollWindow]] target days it falls inside
    * (`explode(sequence(day, day+6))` — a bounded ×7 fan-out of the
    * already-deduped pairs, not of raw events), then one distinct count
    * per target day. Inner-joining back to observed days drops the
    * phantom tail beyond the last day of data.
    *
    * At 100 TB the (day, user) fan-out is the bottleneck; the production
    * path is [[rollingUniquesSketch]] — per-day HLL sketches merged
    * across the window, so the shuffle carries days × KB-sized sketches
    * instead of day-user pairs. This exact version is the
    * oracle-checkable baseline the sketch twin is error-bounded against
    * (same discipline as Contamination's Bloom path). */
  def rollingUniques(spark: SparkSession, dir: String): DataFrame = {
    val du = Tables.events(spark, dir)
      .select(datediff(to_date(col("ts")), lit("1970-01-01")).as("day"),
              col("user_id"))
      .distinct()
      .trackPersist()
    val daily = du.groupBy(col("day"))
      .agg(count_distinct(col("user_id")).as("n_unique_1d"))
    val rolled = du
      .withColumn("d", explode(expr(s"sequence(day, day + ${RollWindow - 1})")))
      .groupBy(col("d"))
      .agg(count_distinct(col("user_id")).as(s"n_unique_${RollWindow}d"))
    daily.join(rolled, daily("day") === rolled("d"))
      .select(col("d"), col("n_unique_1d"), col(s"n_unique_${RollWindow}d"))
  }

  /** The mergeable-sketch twin of [[rollingUniques]]: one HLL sketch per
    * (day) — a single map-side-combinable aggregate over raw events —
    * then each day's sketch joins the [[RollWindow]] windows it belongs
    * to and `hll_union_agg` merges 7 KB-sized sketches per output row.
    * Nothing in the plan is proportional to user cardinality after the
    * first aggregate. Estimate error is the standard HLL bound
    * (lgConfigK = 12 → ~1.6% rsd), spec-bounded against the exact twin.
    * Not oracle-checked (sketch layouts are engine-specific). */
  def rollingUniquesSketch(spark: SparkSession, dir: String): DataFrame = {
    val sk = Tables.events(spark, dir)
      .select(datediff(to_date(col("ts")), lit("1970-01-01")).as("day"),
              col("user_id"))
      .groupBy(col("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .trackPersist()
    val days = sk.select(col("day").as("d"))
    sk.withColumn("d", explode(expr(s"sequence(day, day + ${RollWindow - 1})")))
      .join(days, Seq("d"), "left_semi")
      .groupBy(col("d"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk")))
        .as(s"n_unique_${RollWindow}d_est"))
  }

  val rollingUniquesOracle: String =
    s"""WITH du AS (
       |  SELECT DISTINCT
       |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS TIMESTAMP)) AS INT)
       |      AS day,
       |    user_id
       |  FROM events),
       |daily AS (
       |  SELECT day AS d, CAST(count(DISTINCT user_id) AS BIGINT) AS n_unique_1d
       |  FROM du GROUP BY 1),
       |rolled AS (
       |  SELECT d.d, CAST(count(DISTINCT du.user_id) AS BIGINT)
       |           AS n_unique_${RollWindow}d
       |  FROM (SELECT DISTINCT day AS d FROM du) d
       |  JOIN du ON du.day BETWEEN d.d - ${RollWindow - 1} AND d.d
       |  GROUP BY 1)
       |SELECT d, n_unique_1d, n_unique_${RollWindow}d
       |FROM daily JOIN rolled USING (d)
       |""".stripMargin

  // ---------------------------------------------------- CUSUM changepoint

  /** One-sided CUSUM drift detector over the daily event volume — the
    * sequential changepoint statistic (`S_t = max(0, S_{t-1} + (x_t − k))`)
    * that flags a SUSTAINED upward level shift long before any single
    * day trips a z-score gate ([[weekdayAnomalies]] catches spikes;
    * this catches creep). The allowance `k` is the corpus's own mean
    * daily volume (integer `total div days`), so the statistic
    * accumulates only above-typical excess; the decision threshold `h`
    * is one mean day's volume.
    *
    * The recurrence looks inherently serial, but the classic reduction
    * `S_t = P_t − min(0, min_{j≤t} P_j)` over the prefix sums `P` of
    * `(x − k)` turns it into two DISTRIBUTED primitives:
    * [[Rnk.globalCumsum]] for `P` and [[Rnk.globalPrefixMin]] for the
    * running floor — no single-partition window anywhere, so the same
    * plan holds whether the grain is 30 days or three years of
    * per-minute buckets. All arithmetic is integer (counts and integer
    * `div`), so the statistic hash-matches any engine. */
  def cusumChangepoint(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(datediff(to_date(col("ts")), lit("1970-01-01")).as("d"))
      .agg(count(lit(1)).as("n_events"))
    val tot = daily.agg(sum(col("n_events")).as("tot"),
                        count(lit(1)).as("nd"))
    val based = daily.crossJoin(broadcast(tot))
      .withColumn("k", expr("tot div nd"))
      .withColumn("excess", col("n_events") - col("k"))
    val withP = Rnk.globalCumsum(based, Seq(col("d")), col("excess"), "p_before")
      .withColumn("p", col("p_before") + col("excess"))
    Rnk.globalPrefixMin(withP, Seq(col("d")), col("p"), "m_before")
      // inclusive running floor of P, with the empty prefix P_0 = 0:
      // m_before is EXCLUSIVE (Long.MaxValue on the first row), so fold
      // in this row's P and the zero origin explicitly
      .withColumn("cusum", col("p") - least(lit(0L), col("m_before"), col("p")))
      .withColumn("shift_flag", col("cusum") >= col("k"))
      .select(col("d"), col("n_events"), col("cusum"), col("shift_flag"))
  }

  /** Autocorrelation of the daily revenue series at lags 1..[[AcfLags]] —
    * the seasonality probe run before trusting any day-over-day trend
    * model (a strong lag-7 spike means weekday seasonality must be
    * removed first; see [[weekdayAnomalies]]).
    *
    * Estimator: Pearson r over the aligned pairs (x_t, x_{t+ℓ}) for each
    * lag ℓ — the regression (lag-scatter) form, computed only on days
    * both present in the series (the rollup skips empty days; orders is
    * dense so at this corpus the two conventions coincide). All moments
    * accumulate as exact DECIMAL(38,0) on the cents grid — the
    * [[Stats.corrMatrix]] discipline, so the statistic hash-matches any
    * engine; the only floating-point steps are the shared IEEE
    * double division and sqrt. Magnitude bound: daily revenue at a
    * 100 TB deployment is ~10¹³ cents, so `n·Σxy ≲ 10⁴·(10⁴·10²⁶) =
    * 10³⁴` — inside DECIMAL(38,0) with four digits to spare.
    *
    * Plan shape: ONE day-grain rollup (the only data-sized shuffle),
    * persisted and reused as both sides of the lag join; the shifted
    * side is broadcast (day-count-sized — bounded by the calendar range,
    * not the row count), so the 7-lag align is map-side; the final
    * aggregate is 7 rows. */
  val AcfLags = 7

  def acf(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS DECIMAL(38,0))"))
        .as("rev"))
    acfOf(daily, AcfLags)
  }

  /** ACF core over an arbitrary `(day DATE, rev DECIMAL(38,0))` series —
    * factored out so specs can drive constructed series (an exactly
    * linear series must return acf = 1.0 at every lag). */
  def acfOf(series: DataFrame, lags: Int): DataFrame = {
    val daily = series.trackPersist()
    val shifted = broadcast(
      daily.select(col("day").as("lag_day"), col("rev").as("rev_lag")))
    daily
      .select(col("day"), col("rev"),
        explode(array((1 to lags).map(lit): _*)).as("lag"))
      .withColumn("lag_day", date_add(col("day"), col("lag")))
      .join(shifted, Seq("lag_day"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("rev")).as("sx"), sum(col("rev_lag")).as("sy"),
        sum(col("rev") * col("rev")).as("sxx"),
        sum(col("rev_lag") * col("rev_lag")).as("syy"),
        sum(col("rev") * col("rev_lag")).as("sxy"))
      .select(col("lag"),
        col("n").cast("long").as("n_pairs"),
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
             .cast("double")) *
           sqrt((col("n") * col("syy") - col("sy") * col("sy"))
             .cast("double"))), 6).as("acf"))
  }

  /** Per-group OLS TREND SLOPE: for each order priority, the
    * least-squares slope of its daily revenue series against the day
    * index — the "is this segment growing or shrinking, and how fast"
    * readout, computed exactly. `slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²)`
    * with x the epoch-day integer and y the day's revenue in cents; all
    * moments are DECIMAL(38,0)-exact per the [[acf]]/corrMatrix
    * discipline (x ≤ ~2·10⁴, y ≤ ~10¹³ cents/day at 100 TB ⇒ the n·Σxy
    * cross term stays ≤ ~10²⁴), so only the final IEEE division is
    * floating point. One (group × day)-grain rollup, one group-grain
    * aggregate — two map-side-combinable shuffles, output rows = groups. */
  def trendSlopeBy(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01")).as("x"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS DECIMAL(38,0))"))
        .as("y"))
      .withColumn("xd", col("x").cast("decimal(38,0)"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("xd")).as("sx"), sum(col("y")).as("sy"),
        sum(col("xd") * col("xd")).as("sxx"),
        sum(col("xd") * col("y")).as("sxy"))
      .select(col("o_orderpriority"),
        col("n").cast("long").as("n_days"),
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"), 6)
          .as("slope_cents_per_day"))

  val trendSlopeByOracle: String =
    """WITH daily AS (
      |  SELECT o_orderpriority,
      |         CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS TIMESTAMP)) AS HUGEINT) AS x,
      |         sum(CAST(round(o_totalprice * 100) AS HUGEINT)) AS y
      |  FROM orders GROUP BY 1, 2),
      |m AS (
      |  SELECT o_orderpriority, CAST(count(*) AS HUGEINT) AS n,
      |         sum(x) AS sx, sum(y) AS sy,
      |         sum(x * x) AS sxx, sum(x * y) AS sxy
      |  FROM daily GROUP BY 1)
      |SELECT o_orderpriority, CAST(n AS BIGINT) AS n_days,
      |       round(CAST(n * sxy - sx * sy AS DOUBLE) /
      |             CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope_cents_per_day
      |FROM m
      |""".stripMargin

  /** WEEKDAY-SEASONAL DECOMPOSITION of daily revenue: each day's cents
    * split into its weekday mean (the seasonal component) and the
    * residual — the detrending step [[acf]]'s lag-7 spike says is needed
    * before any day-over-day model. Weekday is computed as
    * `(epoch_day + 4) mod 7` (1970-01-01 was a Thursday; 0 = Sunday) —
    * pure integer arithmetic, no locale/dialect weekday function on
    * either engine. The weekday mean is an exact integer division of
    * exact cents sums, the residual an exact subtraction: the whole
    * decomposition hash-matches. Day-grain rollup + a 7-row broadcast. */
  def seasonalDecompose(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1970-01-01")).as("d"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
        .as("rev_cents"))
      .withColumn("weekday", (col("d") + 4) % 7)
    val idx = daily.groupBy(col("weekday"))
      .agg(expr("sum(rev_cents) div count(1)").as("weekday_mean"))
    daily.join(broadcast(idx), Seq("weekday"))
      .select(col("d"), col("weekday"), col("rev_cents"),
        col("weekday_mean"),
        (col("rev_cents") - col("weekday_mean")).as("residual"))
  }

  val seasonalDecomposeOracle: String =
    """WITH daily AS (
      |  SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS TIMESTAMP)) AS d,
      |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
      |  FROM orders GROUP BY 1),
      |w AS (SELECT d, (d + 4) % 7 AS weekday, rev_cents FROM daily),
      |idx AS (
      |  SELECT weekday, CAST(sum(rev_cents) // count(*) AS BIGINT) AS weekday_mean
      |  FROM w GROUP BY 1)
      |SELECT CAST(w.d AS INT) AS d, CAST(w.weekday AS INT) AS weekday,
      |       w.rev_cents, idx.weekday_mean,
      |       w.rev_cents - idx.weekday_mean AS residual
      |FROM w JOIN idx USING (weekday)
      |""".stripMargin

  val acfOracle: String =
    s"""WITH daily AS (
       |  SELECT CAST(o_orderdate AS DATE) AS day,
       |         sum(CAST(round(o_totalprice * 100) AS HUGEINT)) AS rev
       |  FROM orders GROUP BY 1),
       |lags AS (SELECT CAST(unnest(generate_series(1, $AcfLags)) AS INT) AS lag),
       |pairs AS (
       |  SELECT l.lag, a.rev AS x, b.rev AS y
       |  FROM daily a CROSS JOIN lags l
       |  JOIN daily b ON b.day = a.day + l.lag),
       |m AS (
       |  SELECT lag, CAST(count(*) AS HUGEINT) AS n,
       |         sum(x) AS sx, sum(y) AS sy,
       |         sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
       |  FROM pairs GROUP BY 1)
       |SELECT lag, CAST(n AS BIGINT) AS n_pairs,
       |       round(CAST(n * sxy - sx * sy AS DOUBLE) /
       |             (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
       |              sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS acf
       |FROM m
       |""".stripMargin

  val cusumChangepointOracle: String =
    """WITH daily AS (
      |  SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS TIMESTAMP)) AS d,
      |         CAST(count(*) AS BIGINT) AS n_events
      |  FROM events GROUP BY 1),
      |t AS (SELECT CAST(sum(n_events) AS BIGINT) AS tot,
      |             CAST(count(*) AS BIGINT) AS nd FROM daily),
      |b AS (SELECT d, n_events, tot // nd AS k, n_events - tot // nd AS excess
      |      FROM daily CROSS JOIN t),
      |p AS (SELECT d, n_events, k,
      |             CAST(sum(excess) OVER (ORDER BY d
      |               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pp
      |      FROM b),
      |m AS (SELECT d, n_events, k, pp,
      |             least(CAST(0 AS BIGINT), min(pp) OVER (ORDER BY d
      |               ROWS UNBOUNDED PRECEDING)) AS mm
      |      FROM p)
      |SELECT CAST(d AS INT) AS d, n_events,
      |       CAST(pp - mm AS BIGINT) AS cusum,
      |       (pp - mm) >= k AS shift_flag
      |FROM m
      |""".stripMargin
}
