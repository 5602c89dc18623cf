package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.Tables

/** Incremental aggregate maintenance: keep a daily rollup current by
  * merging each new batch's partial aggregate into the stored state
  * instead of recomputing over all history — the O(batch) path that
  * replaces the reference's daily full-table rebuild.
  *
  * Correctness rests on the aggregate being DECOMPOSABLE: counts and
  * exact decimal sums merge associatively, so state ⊕ batch ≡ recompute
  * (which the oracle asserts by recomputing from scratch). Averages and
  * other derived metrics are final-projected from the mergeable parts,
  * never stored. At warehouse scale the merge is a shuffle of
  * |state ∩ touched days| + |batch rollup| rows — independent of history
  * length.
  */
object Rollup {

  /** Mergeable per-(day, event_type) state: count + exact decimal sum. */
  def dailyState(events: DataFrame): DataFrame =
    events
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value").cast(DecimalType(18, 6))).as("sum_value"))

  /** Merge a batch's state into the stored state (associative ⊕). */
  def merge(state: DataFrame, batchState: DataFrame): DataFrame =
    state.unionByName(batchState)
      .groupBy(col("day"), col("event_type"))
      .agg(sum(col("n_events")).as("n_events"),
           sum(col("sum_value")).as("sum_value"))

  /** Final projection: derived metrics come from the mergeable parts. */
  def present(state: DataFrame): DataFrame =
    state.select(
      col("day"), col("event_type"), col("n_events"),
      round(col("sum_value"), 2).cast("double").as("total_value"),
      // cast the exact sum to double BEFORE dividing — decimal division
      // has engine-specific scale rules, double division does not
      round(col("sum_value").cast("double") / col("n_events"), 6).as("avg_value"))

  /** Oracle scenario: state built from the first 20 days, then the
    * remainder merged in as a batch — must equal a from-scratch rollup. */
  def incrementalQuery(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val cut = lit(java.sql.Date.valueOf("2024-01-21"))
    val state = dailyState(e.filter(to_date(col("ts")) < cut))
    val batch = dailyState(e.filter(to_date(col("ts")) >= cut))
    present(merge(state, batch))
  }

  val incrementalOracle: String =
    """SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, event_type,
      |       CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value,
      |       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_value
      |FROM events
      |GROUP BY 1, 2
      |""".stripMargin

  // ------------------------------------------- incremental JOIN view

  /** Incremental maintenance of a JOIN view (insert-only deltas on BOTH
    * sides) — the aggregate companion above maintains Σ-state; this
    * maintains A⋈B by the standard delta derivation
    *
    *   A'⋈B' = (A⋈B) ∪ (ΔA⋈B) ∪ (A'⋈ΔB)
    *
    * so refreshing the view touches only delta-sized join inputs (each
    * delta joins one full side; the base⋈base term is the already-
    * materialized view and is NOT recomputed). The three terms are
    * disjoint by construction — every joined pair is new on exactly one
    * side, with ΔA⋈ΔB landing in the third term because A' includes ΔA.
    *
    * The oracle scenario splits orders 90/10 and customers 95/5 by a
    * deterministic key hash (the md5 bucket the sampling family uses),
    * maintains the view through the two deltas, and must equal the
    * from-scratch join of the full tables — the IVM correctness
    * statement, hash-checked in DuckDB. */
  def ivmJoinQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Sampling
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("total_cents"))
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    val oIsBase = Sampling.bucket(col("o_orderkey"), "ivm_o") < lit((0.9 * Sampling.D).toLong)
    val cIsBase = Sampling.bucket(col("c_custkey"), "ivm_c") < lit((0.95 * Sampling.D).toLong)
    val a0 = o.filter(oIsBase);  val dA = o.filter(!oIsBase)
    val b0 = c.filter(cIsBase);  val dB = c.filter(!cIsBase)
    val aFull = a0.unionByName(dA)
    def j(l: DataFrame, r: DataFrame): DataFrame =
      l.join(r, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("c_name"),
                col("c_mktsegment"), col("o_orderstatus"), col("total_cents"))
    j(a0, b0)            // the materialized view (base ⋈ base)
      .unionByName(j(dA, b0))   // ΔA against old B
      .unionByName(j(aFull, dB)) // new A against ΔB
  }

  val ivmJoinOracle: String =
    """SELECT o_orderkey, o_custkey, c_name, c_mktsegment, o_orderstatus,
      |       CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |""".stripMargin

  // --------------------------------- retraction-aware aggregate view

  /** Signed per-(day, event_type) delta state: each row contributes with
    * multiplicity `weight` (+1 insert, −1 retraction) to the count and
    * the exact decimal sum. With weight ≡ +1 this is [[dailyState]]. */
  def signedState(events: DataFrame, weight: Column): DataFrame =
    events
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(sum(weight.cast("long")).as("n_events"),
           sum(col("value").cast(DecimalType(18, 6)) * weight.cast("long"))
             .cast(DecimalType(18, 6)).as("sum_value"))

  /** Merge signed delta state into the stored state and drop groups whose
    * multiplicity reaches zero — the retraction subtlety insert-only IVM
    * never faces: a fully-retracted group must VANISH from the view, not
    * linger as a zero row (its avg would be 0/0). Count+sum are
    * ABELIAN-group aggregates (inverses exist), so deletes need no
    * re-scan of the base data; a MIN/MAX view would instead need a
    * per-group recompute of retracted groups. */
  def applyDeltas(state: DataFrame, delta: DataFrame): DataFrame =
    merge(state, delta).filter(col("n_events") > 0)

  /** Oracle scenario: the view is built from ALL events, then a CDC batch
    * retracts a deterministic 10% of rows (the md5 bucket the sampling
    * family uses) — the maintained view must equal a from-scratch rollup
    * of the surviving rows. Delta-sized work only: the retraction batch
    * aggregates before touching the state, and the state merge is
    * group-count-sized. */
  def ivmRetractQuery(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val retracted = Sampling.bucket(col("event_id"), "ivm_r") < lit((0.1 * Sampling.D).toLong)
    val state = dailyState(e)
    val delta = signedState(e.filter(retracted), lit(-1))
    present(applyDeltas(state, delta))
  }

  val ivmRetractOracle: String =
    s"""SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, event_type,
       |       CAST(count(*) AS BIGINT) AS n_events,
       |       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value,
       |       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_value
       |FROM events
       |WHERE CAST(CAST(('0x' || substr(md5('ivm_r:' || CAST(event_id AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT) % ${Sampling.D}
       |      >= ${(0.1 * Sampling.D).toLong}
       |GROUP BY 1, 2
       |""".stripMargin
}
