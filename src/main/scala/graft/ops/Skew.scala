package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling joins for hot keys (SURVEY §7.4.5).
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin`) handles most
  * sort-merge skew at runtime and is on by default in
  * [[graft.core.Sessions]]. Salting is the explicit fallback for the case
  * AQE cannot fix: a shuffle HASH join / aggregation where one key's rows
  * exceed a single task's memory, or a broadcast-ineligible dim join with
  * a handful of pathological keys.
  *
  * `saltedJoin` replicates the (small) right side `salt` times and
  * scatters the (large) left side's hot keys uniformly across the
  * replicas: each shuffle partition receives ~1/salt of a hot key's rows.
  * Exact same join semantics for inner/left joins on equi-keys; cost is
  * salt× the right side's shuffle volume — use a salt of 8–32, sized to
  * the worst key's row count / target partition size.
  */
object Skew {

  /** Deterministic per-row scatter in [0, salt): hash of the whole row's
    * key plus a uniformly distributed disambiguator. Uses the key value
    * itself through xxhash64 of the key columns and monotonically
    * increasing row ids folded in — stable under retries within a task. */
  private def scatter(salt: Int, keys: Seq[String]): Column =
    pmod(xxhash64((keys.map(col) :+ spark_partition_id() :+
      monotonically_increasing_id()).toSeq: _*), lit(salt))

  /** Equi-join `left ⋈ right` on `keys` with the left side salted across
    * `salt` replicas of the right side. Supports "inner" and "left". */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 salt: Int, joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"saltedJoin supports inner/left, got $joinType")
    val saltCol = "__salt"
    val l = left.withColumn(saltCol, scatter(salt, keys))
    val r = right.withColumn(saltCol,
      explode(array((0 until salt).map(lit): _*)))
    l.join(r, keys :+ saltCol, joinType).drop(saltCol)
  }

  /** Two-phase aggregation for skewed group keys: partial-aggregate by
    * (key, scatter) first, then merge partials by key. `partialAggs` and
    * `mergeAggs` must be an associative pair (e.g. sum/sum, count/sum).
    * Spark's hash aggregation already partial-aggregates map-side, so this
    * is only for the rare non-combinable path (e.g. collect_list of a hot
    * key) — provided for completeness. */
  /** Join-key skew profile — the diagnostic that decides WHETHER the
    * salted paths above (or AQE's skew split) are needed: the top-20
    * hottest join keys of orders⋈customer with each key's row count and
    * parts-per-million share, plus the keyspace totals for context. A key
    * whose share approaches `1e6 / target-partition-count` ppm is the one
    * that will straggle a shuffle.
    *
    * One hash aggregate over the fact (map-side combinable), a 1-row
    * totals aggregate broadcast back, and a distributed TakeOrdered for
    * the top-20 — nothing key-cardinality-sized ever sorts globally. The
    * in-list rank is [[Rnk.boundedRank]] over the BOUNDED 20-row frame
    * (window-free — no unpartitioned WindowExec anywhere in the plan).
    * Integer arithmetic only (ppm is one `div`), so the profile
    * hash-matches the oracle on any engine. */
  def keyProfile(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val counts = graft.core.Tables.orders(spark, dir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
    val totals = counts.agg(sum(col("n")).as("total"),
                            count(lit(1)).as("n_keys"))
    val top = counts.crossJoin(broadcast(totals))
      .orderBy(col("n").desc, col("o_custkey"))
      .limit(20)
    Rnk.boundedRank(top, struct(-col("n"), col("o_custkey")), "rank")
      .select(col("rank").cast("int").as("rank"), col("o_custkey"), col("n"),
        expr("CAST(n * 1000000 div total AS BIGINT)").as("share_ppm"),
        col("total"), col("n_keys"))
  }

  val keyProfileOracle: String =
    """WITH counts AS (
      |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n
      |  FROM orders GROUP BY 1),
      |totals AS (
      |  SELECT CAST(sum(n) AS BIGINT) AS total,
      |         CAST(count(*) AS BIGINT) AS n_keys FROM counts),
      |top AS (
      |  SELECT o_custkey, n, total, n_keys
      |  FROM counts CROSS JOIN totals
      |  ORDER BY n DESC, o_custkey LIMIT 20)
      |SELECT CAST(row_number() OVER (ORDER BY n DESC, o_custkey) AS INT) AS rank,
      |       o_custkey, n,
      |       CAST(n * 1000000 // total AS BIGINT) AS share_ppm,
      |       total, n_keys
      |FROM top
      |""".stripMargin

  /** Join-blowup PREFLIGHT: estimate a join's output size from per-key
    * count profiles BEFORE running it — the check a 100 TB join gets in
    * review, mechanized. For an equi-join on `key`, the exact output
    * cardinality is `Σ_k n_left(k) · n_right(k)`; this computes that sum
    * plus the top-`k` contributing keys, each with its share of the
    * estimated output and the overall amplification vs the left rows
    * that actually participate (keys present on BOTH sides — unmatched
    * keys contribute nothing to an equi-join's output).
    * A handful of keys carrying most of `share_ppm` means salt them
    * ([[saltedJoin]]) or pre-aggregate; `amp_x1000` ≫ 1000 means the
    * join multiplies its input and downstream sizing must assume the
    * estimated total, not the scan size.
    *
    * Cost: two map-side-combinable count aggregates (key-cardinality
    * output, never row-sized), one key-grain join, two 1-row totals
    * broadcast back, and a distributed TakeOrdered for the top-k — the
    * profile is free compared to the join it de-risks. The key-grain
    * profile is persisted (it feeds the totals and the top-k);
    * integer-only arithmetic so the profile hash-matches any engine. */
  def joinPreflight(left: DataFrame, leftKey: String,
                    right: DataFrame, rightKey: String,
                    topK: Int = 20): DataFrame = {
    import graft.core.Caches.TrackedDataset
    val lc = left.groupBy(col(leftKey).as("key"))
      .agg(count(lit(1)).as("n_left"))
    val rc = right.groupBy(col(rightKey).as("key"))
      .agg(count(lit(1)).as("n_right"))
    val perKey = lc.join(rc, Seq("key"))
      .withColumn("est_pairs", col("n_left") * col("n_right"))
      .trackPersist()
    val totals = perKey.agg(sum(col("est_pairs")).as("est_total"),
                            sum(col("n_left")).as("rows_left"))
    val top = perKey.crossJoin(broadcast(totals))
      .orderBy(col("est_pairs").desc, col("key"))
      .limit(topK)
    Rnk.boundedRank(top, struct(-col("est_pairs"), col("key")), "rank")
      .select(col("rank").cast("int").as("rank"), col("key"),
        col("n_left"), col("n_right"), col("est_pairs"),
        expr("CAST(est_pairs * 1000000 div est_total AS BIGINT)")
          .as("share_ppm"),
        col("est_total"),
        expr("CAST(est_total * 1000 div rows_left AS BIGINT)")
          .as("amp_x1000"))
  }

  /** Oracle-checked preflight of the lineitem⋈lineitem self-join on
    * `l_partkey` — the same-part pair analysis whose output is Σ n(k)²,
    * the canonical accidental-blowup shape. */
  def joinPreflightQuery(spark: org.apache.spark.sql.SparkSession,
                         dir: String): DataFrame = {
    val li = graft.core.Tables.lineitem(spark, dir)
    joinPreflight(li, "l_partkey", li, "l_partkey")
  }

  val joinPreflightOracle: String =
    """WITH lc AS (
      |  SELECT l_partkey AS key, CAST(count(*) AS BIGINT) AS n_left
      |  FROM lineitem GROUP BY 1),
      |rc AS (
      |  SELECT l_partkey AS key, CAST(count(*) AS BIGINT) AS n_right
      |  FROM lineitem GROUP BY 1),
      |per_key AS (
      |  SELECT key, n_left, n_right, n_left * n_right AS est_pairs
      |  FROM lc JOIN rc USING (key)),
      |totals AS (
      |  SELECT CAST(sum(est_pairs) AS BIGINT) AS est_total,
      |         CAST(sum(n_left) AS BIGINT) AS rows_left FROM per_key),
      |top AS (
      |  SELECT key, n_left, n_right, est_pairs, est_total, rows_left
      |  FROM per_key CROSS JOIN totals
      |  ORDER BY est_pairs DESC, key LIMIT 20)
      |SELECT CAST(row_number() OVER (ORDER BY est_pairs DESC, key) AS INT) AS rank,
      |       key, n_left, n_right, est_pairs,
      |       CAST(est_pairs * 1000000 // est_total AS BIGINT) AS share_ppm,
      |       est_total,
      |       CAST(est_total * 1000 // rows_left AS BIGINT) AS amp_x1000
      |FROM top
      |""".stripMargin

  /** SHUFFLE-partition straggler PREFLIGHT — the partner of
    * [[joinPreflight]] for aggregations: simulate hash-partitioning the
    * key space over `partitions` reducers and report each reducer's key
    * count, row load, and load-vs-average (×1000) — `load_x1000` ≫ 1000
    * on one partition predicts the straggler that decides whether to
    * salt ([[saltedAgg]]), raise the partition count, or let AQE split.
    * The simulated placement uses the corpus-standard deterministic
    * md5-60 hash (NOT the engine's internal hash) so the profile
    * hash-matches any engine — the point is the load SHAPE under a
    * uniform hash, which any good hash reproduces.
    *
    * Cost: one map-side-combinable key-count aggregate (key-cardinality
    * output), one partition-count-sized regroup, a 1-row total broadcast
    * back. Integer arithmetic throughout. */
  def shufflePreflight(df: DataFrame, key: Column,
                       partitions: Int): DataFrame = {
    import graft.functions.TextFunctions.hash60
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
    val parts = counts
      .withColumn("p", pmod(
        hash60(concat(lit("shuf:"), col("key").cast("string"))),
        lit(partitions.toLong)))
      .groupBy(col("p"))
      .agg(count(lit(1)).as("n_keys"), sum(col("n")).as("n_rows"))
    val tot = parts.agg(sum(col("n_rows")).as("total"))
    parts.crossJoin(broadcast(tot))
      .select(col("p").cast("int").as("partition"), col("n_keys"),
        col("n_rows"),
        expr("n_rows * 1000000 div total").as("load_ppm"),
        expr(s"n_rows * $partitions * 1000 div total").as("load_x1000"))
  }

  private val PreflightPartitions = 32

  /** Oracle-checked straggler preflight of a groupBy(user_id) shuffle of
    * the event log across [[PreflightPartitions]] reducers. */
  def shufflePreflightQuery(spark: org.apache.spark.sql.SparkSession,
                            dir: String): DataFrame =
    shufflePreflight(graft.core.Tables.events(spark, dir), col("user_id"),
      PreflightPartitions)

  val shufflePreflightOracle: String =
    s"""WITH c AS (
       |  SELECT user_id AS key, CAST(count(*) AS BIGINT) AS n
       |  FROM events GROUP BY 1),
       |p AS (
       |  SELECT CAST(CAST(('0x' || substr(md5('shuf:' || CAST(key AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT) % $PreflightPartitions AS p,
       |         CAST(count(*) AS BIGINT) AS n_keys,
       |         CAST(sum(n) AS BIGINT) AS n_rows
       |  FROM c GROUP BY 1),
       |t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS total FROM p)
       |SELECT CAST(p AS INT) AS partition, n_keys, n_rows,
       |       CAST(n_rows * 1000000 // total AS BIGINT) AS load_ppm,
       |       CAST(n_rows * $PreflightPartitions * 1000 // total AS BIGINT) AS load_x1000
       |FROM p CROSS JOIN t
       |""".stripMargin

  def saltedAgg(df: DataFrame, keys: Seq[String], salt: Int,
                partialAggs: Seq[Column], mergeAggs: Seq[Column]): DataFrame = {
    val saltCol = "__salt"
    df.withColumn(saltCol, scatter(salt, keys))
      .groupBy((keys :+ saltCol).map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(mergeAggs.head, mergeAggs.tail: _*)
  }
}
