package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Slowly-changing-dimension type-2 history maintenance: merge a new
  * dimension snapshot into a history table where each key holds one OPEN
  * row (`effective_to IS NULL`) plus closed rows for every prior version.
  *
  * The reference pipeline family overwrites dimensions in place on every
  * daily run (staging truncate-and-load), losing history; SCD2 is the
  * standard upgrade and a core ETL-engine capability.
  *
  * Plan shape: ONE full-outer join between the OPEN slice and the
  * snapshot on the business key — the closed history is appended
  * untouched (no read-modify-write of the whole table). Change detection
  * is null-safe equality over the tracked columns only. The output
  * branches (carry-forward / close / re-open / insert / soft-delete) are
  * emitted by exploding a per-row array of candidate rows computed in the
  * SAME projection — filtering the joined frame once per branch instead
  * would let the optimizer push each branch's predicate into its own copy
  * of the join (measured: 5 joins, 6 scans of each input), which at
  * warehouse scale means five shuffles of the dimension instead of one.
  * PlanGuardSpec pins the single-join shape. Deletes (key absent from the
  * snapshot) close the open row when `closeMissing` is set — full
  * snapshots want that, incremental feeds don't.
  */
object Scd2 {

  /** Merge `snapshot` (current values per `key`) into `history` (SCD2
    * table: same columns + effective_from/effective_to) as of `asOf`.
    * Unchanged open rows carry forward; changed rows close at `asOf` and
    * re-open from `asOf`; unseen keys insert; missing keys optionally
    * close. Rows already closed pass through untouched. */
  def merge(history: DataFrame, snapshot: DataFrame, key: Seq[String],
            tracked: Seq[String], asOf: java.sql.Date,
            closeMissing: Boolean = false): DataFrame = {
    // fail fast on column drift: the merge projects exactly key ++ tracked
    // (+ effective dates), so a history attribute the caller forgot to
    // list in `tracked` would be SILENTLY dropped from every output row —
    // corrupting the dimension. Require exact coverage instead.
    def requireExact(df: DataFrame, expected: Seq[String], what: String): Unit = {
      val extra = df.columns.toSeq.diff(expected)
      val missing = expected.diff(df.columns.toSeq)
      require(extra.isEmpty && missing.isEmpty,
        s"Scd2.merge: $what columns must be exactly {${expected.mkString(", ")}}" +
          (if (extra.nonEmpty) s"; unexpected: {${extra.mkString(", ")}} — add them to `tracked` (or `key`) or drop them" else "") +
          (if (missing.nonEmpty) s"; missing: {${missing.mkString(", ")}}" else ""))
    }
    requireExact(history, key ++ tracked ++ Seq("effective_from", "effective_to"),
                 "history")
    requireExact(snapshot, key ++ tracked, "snapshot")
    val open = history.filter(col("effective_to").isNull)
    val closed = history.filter(col("effective_to").isNotNull)
    val attrs = key ++ tracked
    // explicit presence flags, NOT key.isNotNull: the join is null-safe
    // (<=>), so a NULL business key is a legal value — inferring presence
    // from key nullness would silently drop that row from the merge
    val o = open.select(attrs.map(c => col(c).as(s"o_$c")) ++
      Seq(col("effective_from").as("o_from"), lit(true).as("o_present")): _*)
    val s = snapshot.select(attrs.map(c => col(c).as(s"s_$c")) :+
      lit(true).as("s_present"): _*)
    val keyMatch = key.map(k => col(s"o_$k") <=> col(s"s_$k")).reduce(_ && _)
    val joined = o.join(s, keyMatch, "full_outer")
    val changed = tracked.map(c => !(col(s"o_$c") <=> col(s"s_$c"))).reduce(_ || _)
    val inO = col("o_present").isNotNull
    val inS = col("s_present").isNotNull
    val openTo = lit(null).cast("date")

    def mkRow(prefix: String, from: Column, to: Column): Column =
      struct(attrs.map(c => col(s"${prefix}_$c").as(c)) ++
        Seq(from.as("effective_from"), to.as("effective_to")): _*)

    // every joined row yields 1 row (2 when a change closes + re-opens),
    // selected by a CASE in one projection; `when` without `otherwise`
    // gives a null struct, compacted away before the explode
    val first = when(inO && inS && !changed, mkRow("o", col("o_from"), openTo))
      .when(inO && inS && changed, mkRow("o", col("o_from"), lit(asOf)))
      .when(!inO && inS, mkRow("s", lit(asOf), openTo))
      .when(inO && !inS, mkRow("o", col("o_from"),
                               if (closeMissing) lit(asOf) else openTo))
    val second = when(inO && inS && changed, mkRow("s", lit(asOf), openTo))
    val merged = joined
      .select(explode(filter(array(first, second), r => r.isNotNull)).as("r"))
      .select(col("r.*"))
    merged.unionByName(closed.select(
      attrs.map(col) ++ Seq(col("effective_from"), col("effective_to")): _*))
  }

  /** Point-in-time lookup against the SCD2 history: each fact row joins
    * the dimension VERSION that was valid at its event date
    * (`effective_from <= d < effective_to`, open rows unbounded).
    *
    * This is a key-equality join with a range residual — Spark shuffles
    * both sides by the business key and evaluates the validity window as
    * a join filter, so cost is O(versions-per-key) per fact row, not a
    * range explosion; at warehouse scale versions-per-key is tiny. */
  def asOfLookup(history: DataFrame, facts: DataFrame, key: Seq[String],
                 dateCol: String): DataFrame = {
    val h = history.columns.foldLeft(history)((d, c) => d.withColumnRenamed(c, s"h_$c"))
    val cond = key.map(k => col(k) === col(s"h_$k")).reduce(_ && _) &&
      col(dateCol) >= col("h_effective_from") &&
      (col("h_effective_to").isNull || col(dateCol) < col("h_effective_to"))
    facts.join(h, cond, "left")
      .drop(key.map(k => s"h_$k"): _*)
  }

  private val Day1 = java.sql.Date.valueOf("2024-06-01")
  private val Day2 = java.sql.Date.valueOf("2024-06-02")

  /** Oracle scenario: the supplier table loaded on day 1 as the initial
    * history, then a day-2 snapshot where 1-in-7 suppliers changed name
    * and suppliers with key % 31 = 0 disappeared (full snapshot →
    * closeMissing). Deterministic end-to-end. */
  def query(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
    val history = base
      .withColumn("effective_from", lit(Day1))
      .withColumn("effective_to", lit(null).cast("date"))
    val snapshot = base
      .filter(col("s_suppkey") % 31 =!= 0)
      .withColumn("s_name",
        when(col("s_suppkey") % 7 === 0, concat(col("s_name"), lit("_v2")))
          .otherwise(col("s_name")))
    merge(history, snapshot, Seq("s_suppkey"), Seq("s_name", "s_acctbal"),
          Day2, closeMissing = true)
  }

  /** Oracle query for [[asOfLookup]]: every supplier probed at day 1 and
    * day 5 against the [[query]] history — day-1 probes resolve to the
    * original version, day-5 probes to the v2 version (or no version at
    * all for the soft-deleted keys). */
  def lookupQuery(spark: SparkSession, dir: String): DataFrame = {
    val probes = Tables.supplier(spark, dir)
      .select(col("s_suppkey"),
              explode(array(lit(Day1), lit(java.sql.Date.valueOf("2024-06-05"))))
                .as("probe_date"))
    asOfLookup(query(spark, dir), probes, Seq("s_suppkey"), "probe_date")
      .select(col("s_suppkey"), col("probe_date"),
              col("h_s_name").as("s_name_then"),
              col("h_effective_from").as("version_from"))
  }

  // lazy: references `oracle`, declared below (object vals init in order)
  private def oraclePlain: String = oracle.trim
  // the newline before the paren matters: the embedded SQL ends in a
  // line comment that would otherwise swallow the rest of the line
  lazy val lookupOracle: String =
    s"""WITH hist AS ($oraclePlain
       |),
       |probes AS (
       |  SELECT s_suppkey, CAST(d AS DATE) AS probe_date
       |  FROM supplier, (VALUES (DATE '2024-06-01'), (DATE '2024-06-05')) v(d))
       |SELECT p.s_suppkey, p.probe_date,
       |       h.s_name AS s_name_then,
       |       h.effective_from AS version_from
       |FROM probes p LEFT JOIN hist h
       |  ON p.s_suppkey = h.s_suppkey
       | AND p.probe_date >= h.effective_from
       | AND (h.effective_to IS NULL OR p.probe_date < h.effective_to)
       |""".stripMargin

  val oracle: String =
    """WITH snap AS (
      |  SELECT s_suppkey,
      |         CASE WHEN s_suppkey % 7 = 0 THEN s_name || '_v2' ELSE s_name END AS s_name,
      |         s_acctbal
      |  FROM supplier WHERE s_suppkey % 31 <> 0)
      |SELECT s_suppkey, s_name, s_acctbal,
      |       DATE '2024-06-01' AS effective_from,
      |       CAST(NULL AS DATE) AS effective_to
      |FROM supplier
      |WHERE s_suppkey % 31 <> 0 AND s_suppkey % 7 <> 0       -- unchanged, kept open
      |UNION ALL
      |SELECT s_suppkey, s_name, s_acctbal, DATE '2024-06-01', DATE '2024-06-02'
      |FROM supplier
      |WHERE s_suppkey % 7 = 0 AND s_suppkey % 31 <> 0        -- changed, closed
      |UNION ALL
      |SELECT s_suppkey, s_name, s_acctbal, DATE '2024-06-02', CAST(NULL AS DATE)
      |FROM snap
      |WHERE s_suppkey % 7 = 0                                -- changed, re-opened
      |UNION ALL
      |SELECT s_suppkey, s_name, s_acctbal, DATE '2024-06-01', DATE '2024-06-02'
      |FROM supplier
      |WHERE s_suppkey % 31 = 0                               -- missing, closed
      |""".stripMargin
}
