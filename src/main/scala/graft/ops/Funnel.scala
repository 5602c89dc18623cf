package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Sequential funnel analysis over the events table: for each user, the
  * earliest time of each step where step N must occur strictly AFTER the
  * user's step N-1 time (signup → click → purchase).
  *
  * Shape: one narrow scan per step joined on user_id — each step frame
  * is a per-user aggregate (dimension-sized), so the joins are
  * broadcast/small and the heavy input is scanned with only
  * (user_id, event_type, ts) read. A single-pass alternative
  * (collect per-user sorted event lists) trades shuffle volume for state
  * size; at 100 TB the per-step aggregate form keeps memory flat.
  */
object Funnel {

  val Steps = Seq("signup", "click", "purchase")

  def query(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"))

    // step 1: first signup per user
    val s1 = ev.filter(col("event_type") === Steps(0))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    // step 2: first click after t1
    val s2 = ev.filter(col("event_type") === Steps(1)).join(s1, "user_id")
      .filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    // step 3: first purchase after t2
    val s3 = ev.filter(col("event_type") === Steps(2)).join(s2, "user_id")
      .filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))

    s1.join(s2.select("user_id", "t2"), Seq("user_id"), "left")
      .join(s3.select("user_id", "t3"), Seq("user_id"), "left")
      .select(col("user_id"), col("t1"), col("t2"), col("t3"),
        (lit(1) + when(col("t2").isNotNull, 1).otherwise(0)
                + when(col("t3").isNotNull, 1).otherwise(0)).as("reached_step"))
  }

  /** Cohort retention: users grouped by first-activity week, counted as
    * retained in week k if they have any event k weeks after their cohort
    * week. Two aggregates (first-activity, distinct user-week activity)
    * and one join — the cohort table is user-sized, the matrix is
    * (cohorts × weeks)-sized. */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"),
        floor(unix_micros(col("ts")) / lit(604800L * 1000000L)).as("week"))
    val cohort = ev.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    val active = ev.distinct()
    active.join(cohort, Seq("user_id"))
      .withColumn("week_offset", col("week") - col("cohort_week"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  val retentionOracle: String =
    """WITH ev AS (
      |  SELECT user_id,
      |         CAST(floor(epoch_us(CAST(ts AS TIMESTAMP)) / 604800000000) AS BIGINT) AS week
      |  FROM events),
      |cohort AS (
      |  SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY 1),
      |active AS (SELECT DISTINCT user_id, week FROM ev)
      |SELECT c.cohort_week, a.week - c.cohort_week AS week_offset,
      |       CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
      |FROM active a JOIN cohort c ON a.user_id = c.user_id
      |GROUP BY 1, 2
      |""".stripMargin

  /** First-order Markov transition matrix over per-user event sequences:
    * for every (previous event type → event type) pair, its count and the
    * transition probability P(next | prev). The behavioral fingerprint of
    * a clickstream — a load whose transition matrix shifts signals
    * instrumentation or funnel changes even when per-type totals look flat.
    *
    * Shape: ONE shuffle (by user for the lag window, a sort the session
    * and funnel operators already pay), then a hash aggregate over a
    * (types × types)-sized result with the per-prev denominator joined
    * back broadcast. The probability is one double division (portable);
    * ties in `ts` are broken by event_id so the lag is deterministic. */
  def transitions(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val outDeg = pairs.groupBy(col("prev_type")).agg(sum(col("n")).as("n_out"))
    pairs.join(broadcast(outDeg), "prev_type")
      .select(col("prev_type"), col("event_type"), col("n"),
        round(col("n").cast("double") / col("n_out"), 6).as("p"))
  }

  val transitionsOracle: String =
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |         lag(event_type, 1) OVER (
      |           PARTITION BY user_id
      |           ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_type
      |  FROM events),
      |pairs AS (
      |  SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n
      |  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2),
      |deg AS (
      |  SELECT prev_type, CAST(sum(n) AS BIGINT) AS n_out FROM pairs GROUP BY 1)
      |SELECT p.prev_type, p.event_type, p.n,
      |       round(CAST(p.n AS DOUBLE) / d.n_out, 6) AS p
      |FROM pairs p JOIN deg d ON p.prev_type = d.prev_type
      |""".stripMargin

  val oracle: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |s1 AS (
      |  SELECT user_id, min(ts) AS t1 FROM ev
      |  WHERE event_type = 'signup' GROUP BY 1),
      |s2 AS (
      |  SELECT e.user_id, min(e.ts) AS t2
      |  FROM ev e JOIN s1 ON e.user_id = s1.user_id
      |  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
      |s3 AS (
      |  SELECT e.user_id, min(e.ts) AS t3
      |  FROM ev e JOIN s2 ON e.user_id = s2.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
      |SELECT s1.user_id, s1.t1, s2.t2, s3.t3,
      |       1 + CASE WHEN s2.t2 IS NOT NULL THEN 1 ELSE 0 END
      |         + CASE WHEN s3.t3 IS NOT NULL THEN 1 ELSE 0 END AS reached_step
      |FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
      |        LEFT JOIN s3 ON s1.user_id = s3.user_id
      |""".stripMargin
}
