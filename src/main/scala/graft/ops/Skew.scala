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
