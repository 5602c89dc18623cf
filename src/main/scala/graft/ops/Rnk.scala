package graft.ops

import graft.core.Caches.TrackedDataset
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking ("RNK_") operators.
  *
  * The reference's top-1-per-group uses row_number with NO tiebreaker,
  * making ties nondeterministic (reference:
  * m_supplier_performance_task.py:145-155). Here every ranking takes an
  * explicit deterministic tiebreak column list.
  */
object Rnk {

  /** Keep the top `k` rows per group ordered by `orderBy` (desc) with
    * deterministic tiebreaks. */
  def topKPerGroup(df: DataFrame, partitionBy: Seq[String], orderBy: Column,
                   tiebreak: Seq[Column], k: Int = 1): DataFrame = {
    val w = Window
      .partitionBy(partitionBy.map(col): _*)
      .orderBy((orderBy.desc +: tiebreak.map(_.asc)): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Rank (1-based) inside a BOUNDED frame WITHOUT a window: each row's
    * rank is `1 + count(rows with a strictly smaller key)`, computed by
    * broadcasting the frame's key column back onto itself and counting
    * matches in one hash aggregate. Equals `row_number() OVER (ORDER BY
    * key)` whenever `key` is a tie-free total order (callers append a
    * unique tiebreak field, exactly as for [[globalRank]]).
    *
    * This exists for the top-k/limit-bounded frames (retrieval fusion
    * lists, skew profiles — tens of rows by construction) where an
    * unpartitioned `Window.orderBy` would be CORRECT but still funnels
    * the frame through one WindowExec task and logs the
    * "No Partition Defined" scale warning on every run. The broadcast
    * self-comparison is O(n²) in the frame size — only ever call it on
    * frames already bounded by an upstream `limit`; unbounded frames
    * belong to [[globalRank]].
    *
    * `key` must be an orderable ascending key — compose descending
    * numeric fields by negation, e.g.
    * `struct(-col("score"), col("doc_id"))`. Grouping re-keys on every
    * column of `df`, so the frame must not contain map-typed columns
    * (none of the bounded frames do).
    *
    * The tie-free contract is ENFORCED, not just documented: the same
    * self-comparison also counts equal keys, and any key matched by more
    * than itself raises at execution time. Without the guard, two fully
    * identical rows would silently collapse into one group with a wrong
    * rank (the group sums both rows' matches) — a dropped row is worse
    * than a loud failure.
    *
    * The input frame is persisted (graft-tracked) before the self-join:
    * the frame is tiny but its LINEAGE may be arbitrarily heavy (the
    * retrieval fusion ranks top-k cuts of corpus-scoring subplans), and
    * the broadcast side would otherwise re-execute that whole upstream a
    * second time. */
  def boundedRank(df: DataFrame, key: Column,
                  rankCol: String = "rank"): DataFrame = {
    val withKey = df.withColumn("__bkey", key).trackPersist()
    val others = broadcast(withKey.select(col("__bkey").as("__okey")))
    withKey
      .join(others, col("__okey") <= col("__bkey"), "left")
      .groupBy(withKey.columns.map(col): _*)
      .agg(count(when(col("__okey") < col("__bkey"), lit(1))).as("__lt"),
           count(when(col("__okey") === col("__bkey"), lit(1))).as("__eq"))
      .withColumn(rankCol,
        when(col("__eq") > 1, raise_error(concat(
          lit("boundedRank: tied key violates the tie-free contract: "),
          col("__bkey").cast("string"))))
          .otherwise(col("__lt") + 1L))
      .drop("__bkey", "__lt", "__eq")
  }

  /** DISTRIBUTED global row_number over a total order — the scalable
    * replacement for `row_number() OVER (ORDER BY ...)`, which forces
    * every row into ONE WindowExec partition.
    *
    * Range-partition by the sort keys, rank locally inside each partition
    * (a partitioned window — parallel), then shift each partition's ranks
    * by the total count of all earlier partitions. The per-partition
    * count table is partition-count-sized: collected to the driver,
    * prefix-summed, and joined back as a broadcast — the data itself
    * never converges on one task. Results are identical to the global
    * window for any total (tie-free) ordering, which the caller
    * guarantees via tiebreak columns.
    *
    * Builds eagerly (the offset table is collected), and the returned
    * frame depends on a persisted cut registered in
    * [[graft.core.Caches]] — long-lived sessions call
    * `Caches.release(spark)` when done with the result. */
  def globalRank(df: DataFrame, order: Seq[Column],
                 rankCol: String = "rank"): DataFrame = {
    import df.sparkSession.implicits._
    val parted = df
      .repartitionByRange(order: _*)
      .withColumn("__pid", spark_partition_id())
      .trackPersist()
    val counts = parted.groupBy(col("__pid")).count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, n) =>
      val o = (pid, acc); acc += n; o
    }
    val offDf = broadcast(offsets.toSeq.toDF("__pid", "__offset"))
    val local = Window.partitionBy(col("__pid")).orderBy(order: _*)
    parted
      .withColumn("__local", row_number().over(local))
      .join(offDf, Seq("__pid"))
      // long, not int: past 2^31 rows an int rank silently wraps negative,
      // and >2^31 rows is exactly the regime this operator exists for
      .withColumn(rankCol, (col("__local") + col("__offset")).cast("long"))
      .drop("__pid", "__local", "__offset")
  }

  /** DISTRIBUTED global EXCLUSIVE prefix sum of `value` over a total
    * order — the scalable replacement for
    * `sum(x) OVER (ORDER BY … ROWS UNBOUNDED PRECEDING AND 1 PRECEDING)`,
    * which (like global row_number) forces every row through one
    * WindowExec partition.
    *
    * Same two-pass shape as [[globalRank]]: range-partition by the sort
    * keys, run the exclusive running sum INSIDE each partition (a
    * partitioned window — parallel), and shift each partition by the sum
    * of all earlier partitions, carried via a partition-count-sized
    * offset table collected to the driver and broadcast back. Identical
    * to the global window for any tie-free ordering. Values are summed
    * as long — callers pre-scale doubles onto an integer grid (the
    * repo-wide exact-sum discipline; a float running sum would be
    * order-dependent anyway).
    *
    * Builds eagerly and registers a persisted cut in
    * [[graft.core.Caches]] — long-lived sessions call
    * `Caches.release(spark)` when done with the result. */
  def globalCumsum(df: DataFrame, order: Seq[Column], value: Column,
                   outCol: String = "cumsum_before"): DataFrame = {
    import df.sparkSession.implicits._
    // fail loudly on misuse: a null value would otherwise surface as an
    // unboxing NPE deep in the offset collect, and a fractional value
    // would silently truncate (callers pre-scale doubles onto an integer
    // grid — the repo-wide exact-sum discipline)
    val asLong = value.cast("long")
    val guarded = when(
      value.isNull.or(asLong.isNull)
        .or(value.cast("double") =!= asLong.cast("double")),
      raise_error(concat(
        lit("globalCumsum: value must be non-null and integral, got "),
        coalesce(value.cast("string"), lit("NULL"))))
    ).otherwise(asLong)
    val parted = df
      .repartitionByRange(order: _*)
      .withColumn("__v", guarded)
      .withColumn("__pid", spark_partition_id())
      .trackPersist()
    val sums = parted.groupBy(col("__pid")).agg(sum(col("__v")).as("s"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = sums.map { case (pid, s) =>
      val o = (pid, acc); acc += s; o
    }
    val offDf = broadcast(offsets.toSeq.toDF("__pid", "__offset"))
    val local = Window.partitionBy(col("__pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    parted
      .withColumn("__local", coalesce(sum(col("__v")).over(local), lit(0L)))
      .join(offDf, Seq("__pid"))
      .withColumn(outCol, col("__local") + col("__offset"))
      .drop("__pid", "__local", "__offset", "__v")
  }

  /** DISTRIBUTED global EXCLUSIVE prefix MINIMUM of `value` over a total
    * order — the running-min sibling of [[globalCumsum]], and the
    * primitive behind prefix-dominance operators (2-D skylines, "best so
    * far" scans): `min(x) OVER (ORDER BY … ROWS … 1 PRECEDING)` without
    * the single-partition WindowExec.
    *
    * Same two-pass shape: range-partition by the sort keys, run the
    * exclusive running min INSIDE each partition (parallel), then fold in
    * the minimum over all EARLIER partitions via a partition-count-sized
    * offset table (min is associative and commutative, so the per-
    * partition fold is exact). Rows before any value see Long.MaxValue —
    * the min-monoid identity — so "no prefix yet" compares correctly
    * against any real value. Values must be non-null and integral
    * (callers pre-scale onto an integer grid), enforced loudly. */
  def globalPrefixMin(df: DataFrame, order: Seq[Column], value: Column,
                      outCol: String = "prefix_min"): DataFrame = {
    import df.sparkSession.implicits._
    val asLong = value.cast("long")
    val guarded = when(
      value.isNull.or(asLong.isNull)
        .or(value.cast("double") =!= asLong.cast("double")),
      raise_error(concat(
        lit("globalPrefixMin: value must be non-null and integral, got "),
        coalesce(value.cast("string"), lit("NULL"))))
    ).otherwise(asLong)
    val parted = df
      .repartitionByRange(order: _*)
      .withColumn("__v", guarded)
      .withColumn("__pid", spark_partition_id())
      .trackPersist()
    val mins = parted.groupBy(col("__pid")).agg(min(col("__v")).as("m"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = Long.MaxValue
    val offsets = mins.map { case (pid, m) =>
      val o = (pid, acc); acc = math.min(acc, m); o
    }
    val offDf = broadcast(offsets.toSeq.toDF("__pid", "__premin"))
    val local = Window.partitionBy(col("__pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    parted
      .withColumn("__local",
        coalesce(min(col("__v")).over(local), lit(Long.MaxValue)))
      .join(offDf, Seq("__pid"))
      .withColumn(outCol, least(col("__local"), col("__premin")))
      .drop("__pid", "__local", "__premin", "__v")
  }
}
