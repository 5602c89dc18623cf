package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Change-data-capture maintenance operators: log compaction (latest
  * record per key) and SCD1 upsert (apply a change batch to a snapshot).
  *
  * Compaction is deliberately an AGGREGATION, not a window: `max` over a
  * (version, tiebreak, payload...) struct compares lexicographically, so
  * partial aggregation collapses each map task's rows to ONE row per key
  * BEFORE the shuffle — the shuffle moves |keys| rows instead of |log|
  * rows. The row_number window formulation shuffles and sorts the entire
  * log (no partial aggregation for windows); at a 100 TB change log with
  * high key cardinality update rates the difference is the job.
  */
object Cdc {

  /** Latest row per key from a change log: key columns, a version column
    * (monotone per key), explicit deterministic tiebreaks, and the payload
    * columns to carry. One hash aggregate, map-side combined. */
  def latestByKey(log: DataFrame, key: Seq[String], version: Column,
                  tiebreak: Seq[Column], payload: Seq[String]): DataFrame = {
    // ordering fields get reserved names: a payload column may well BE
    // the version or tiebreak column, and duplicate struct field names
    // make the payload extraction ambiguous
    val ordered = version.as("__v") +:
      tiebreak.zipWithIndex.map { case (t, i) => t.as(s"__t$i") }
    val m = struct(ordered ++ payload.map(col): _*).as("m")
    log.groupBy(key.map(col): _*)
      .agg(max(m).as("m"))
      .select(key.map(col) ++ payload.map(c => col(s"m.$c").as(c)): _*)
  }

  /** Oracle query: compact the orders "log" to each customer's latest
    * order (version = o_orderdate, tiebreak = o_orderkey). */
  def latestOrderQuery(spark: SparkSession, dir: String): DataFrame =
    latestByKey(
      Tables.orders(spark, dir)
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
                col("o_totalprice"), col("o_orderstatus")),
      Seq("o_custkey"), col("o_orderdate"), Seq(col("o_orderkey")),
      Seq("o_orderkey", "o_orderdate", "o_totalprice", "o_orderstatus"))

  val latestOrderOracle: String =
    """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice, o_orderstatus
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice, o_orderstatus,
      |         row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |  FROM orders)
      |WHERE rn = 1
      |""".stripMargin

  /** SCD1 upsert: apply a change batch (`op` ∈ insert/update as upsert,
    * delete) to the current snapshot in ONE full-outer join on the key.
    * Upserted keys take the batch row, deleted keys drop, untouched keys
    * carry forward. The type-1 counterpart of [[Scd2.merge]] — no
    * history, last write wins.
    *
    * PRECONDITION: at most one batch row per key (a multi-row key would
    * fan the join out and duplicate the snapshot row). A raw change log
    * compacts to that shape with [[latestByKey]] first — that pairing is
    * the standard log→table apply pipeline. */
  def upsert(snapshot: DataFrame, batch: DataFrame, key: Seq[String],
             opCol: String = "op"): DataFrame = {
    val payload = snapshot.columns.filterNot(key.contains)
    require(batch.columns.toSet == (key ++ payload :+ opCol).toSet,
      s"Cdc.upsert: batch columns must be snapshot columns + '$opCol', got " +
        batch.columns.mkString(", "))
    val s = snapshot.select(key.map(c => col(c).as(s"s_$c")) ++
      payload.map(c => col(c).as(s"s_$c")) :+ lit(true).as("s_present"): _*)
    val b = batch.select(key.map(c => col(c).as(s"b_$c")) ++
      payload.map(c => col(c).as(s"b_$c")) ++
      Seq(col(opCol).as("b_op"), lit(true).as("b_present")): _*)
    val keyMatch = key.map(k => col(s"s_$k") <=> col(s"b_$k")).reduce(_ && _)
    s.join(b, keyMatch, "full_outer")
      .filter(!(col("b_op") <=> lit("delete"))) // deletes drop (incl. no-op deletes)
      .select(key.map(k => coalesce(col(s"b_$k"), col(s"s_$k")).as(k)) ++
        payload.map(c =>
          when(col("b_present").isNotNull, col(s"b_$c"))
            .otherwise(col(s"s_$c")).as(c)): _*)
  }

  /** Oracle scenario: suppliers as the snapshot; a deterministic batch
    * that updates every key % 7 = 0 (acctbal + 100), deletes every
    * key % 31 = 0, and inserts two fresh keys above the current max. */
  def upsertQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val snap = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
    // % 7 minus the % 31 overlap: one batch row per key (the upsert
    // precondition) — key 217k would otherwise get an update AND a delete
    val updates = snap.filter(col("s_suppkey") % 7 === 0 &&
                              col("s_suppkey") % 31 =!= 0)
      .select(col("s_suppkey"), col("s_name"),
              (col("s_acctbal") + 100.0).as("s_acctbal"))
      .withColumn("op", lit("upsert"))
    val deletes = snap.filter(col("s_suppkey") % 31 === 0)
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
      .withColumn("op", lit("delete"))
    val maxKey = snap.agg(max(col("s_suppkey"))).collect()(0).getLong(0)
    val inserts = Seq(
      (maxKey + 1, "Supplier#new1", 0.0, "upsert"),
      (maxKey + 2, "Supplier#new2", 10.5, "upsert"))
      .toDF("s_suppkey", "s_name", "s_acctbal", "op")
    upsert(snap, updates.unionByName(deletes).unionByName(inserts),
           Seq("s_suppkey"))
  }

  val upsertOracle: String =
    """WITH mx AS (SELECT max(s_suppkey) AS m FROM supplier)
      |SELECT s_suppkey, s_name,
      |       CASE WHEN s_suppkey % 7 = 0 THEN s_acctbal + 100.0
      |            ELSE s_acctbal END AS s_acctbal
      |FROM supplier
      |WHERE s_suppkey % 31 <> 0
      |UNION ALL
      |SELECT m + 1, 'Supplier#new1', 0.0 FROM mx
      |UNION ALL
      |SELECT m + 2, 'Supplier#new2', 10.5 FROM mx
      |""".stripMargin

  // -------------------------------------------------- CDC extraction

  /** CDC EXTRACTION — the inverse of [[upsert]]: diff two keyed
    * snapshots into the MINIMAL change batch (op ∈ insert/update/delete)
    * that replays old → new. Key present only in `next` → insert; only
    * in `prev` → delete; in both with any payload cell differing
    * (null-safe) → update; identical rows emit nothing. Law (spec'd):
    * `upsert(prev, extract(prev, next), key) == next`.
    *
    * This is how a changefeed is manufactured when the source system
    * offers only snapshots (the nightly-full-export reality of most
    * vendor feeds): downstream incremental consumers ([[upsert]],
    * [[graft.ops.Rollup.applyDeltas]], [[Scd2.merge]]) then run on
    * delta-sized input instead of the full export.
    *
    * Scale shape: ONE co-partitioned full-outer join on the key and a
    * null-safe column compare — no window, no collect; output is
    * churn-sized, not snapshot-sized.
    *
    * PRECONDITION: unique keys per snapshot (compact a log with
    * [[latestByKey]] first) — a duplicate key would fan the join out. */
  def extract(prev: DataFrame, next: DataFrame, key: Seq[String],
              opCol: String = "op"): DataFrame = {
    val payload = prev.columns.filterNot(key.contains).toSeq
    require(next.columns.toSet == prev.columns.toSet,
      s"Cdc.extract: snapshots must share a schema, got " +
        s"${prev.columns.mkString(",")} vs ${next.columns.mkString(",")}")
    val p = prev.select(prev.columns.map(c => col(c).as(s"p_$c")).toSeq :+
      lit(true).as("p_present"): _*)
    val n = next.select(next.columns.map(c => col(c).as(s"n_$c")).toSeq :+
      lit(true).as("n_present"): _*)
    val keyMatch = key.map(k => col(s"p_$k") <=> col(s"n_$k")).reduce(_ && _)
    val changed = payload.map(c => !(col(s"p_$c") <=> col(s"n_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    p.join(n, keyMatch, "full_outer")
      .withColumn(opCol,
        when(col("p_present").isNull, lit("insert"))
          .when(col("n_present").isNull, lit("delete"))
          .when(changed, lit("update")))
      .filter(col(opCol).isNotNull)
      // deletes carry the old payload (the key is what matters; keeping
      // the last-known row makes the feed self-describing for auditing).
      // Payload picks by side PRESENCE, not coalesce — an update that
      // sets a cell to NULL must emit NULL, not resurrect the old value
      .select(key.map(k => coalesce(col(s"n_$k"), col(s"p_$k")).as(k)) ++
        payload.map(c =>
          when(col("n_present").isNotNull, col(s"n_$c"))
            .otherwise(col(s"p_$c")).as(c)) :+
        col(opCol): _*)
  }

  /** Oracle scenario on the unique-keyed part table: the previous
    * snapshot is missing the "recently added" parts (hash bucket
    * [0, 200)) and carries a stale retail price for bucket [200, 500);
    * the next snapshot lost bucket [500, 600) to deletion. The extracted
    * feed must name exactly those three churn sets. */
  def extractQuery(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir).select(
      col("p_partkey"), col("p_brand"), col("p_size"),
      expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("price_cents"))
    val b = Sampling.bucket(col("p_partkey"), "cdcx")
    val prev = part.filter(b >= 200)
      .withColumn("price_cents",
        when(b < 500, col("price_cents") + 999L).otherwise(col("price_cents")))
    val next = part.filter(b < 500 || b >= 600)
    extract(prev, next, Seq("p_partkey"))
  }

  val extractOracle: String = {
    val bucket = "CAST(CAST(('0x' || substr(md5('cdcx:' || CAST(p_partkey AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT) % 10000"
    s"""WITH base AS (
       |  SELECT p_partkey, p_brand, p_size,
       |         CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
       |         $bucket AS b
       |  FROM part)
       |SELECT p_partkey, p_brand, p_size, price_cents, 'insert' AS op
       |FROM base WHERE b < 200
       |UNION ALL
       |SELECT p_partkey, p_brand, p_size, price_cents, 'update' AS op
       |FROM base WHERE b >= 200 AND b < 500
       |UNION ALL
       |SELECT p_partkey, p_brand, p_size, price_cents, 'delete' AS op
       |FROM base WHERE b >= 500 AND b < 600
       |""".stripMargin
  }
}
