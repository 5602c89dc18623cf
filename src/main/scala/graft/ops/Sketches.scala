package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Sketch-based approximate aggregation — the paths that replace a
  * full-key shuffle with mergeable fixed-size state when key cardinality
  * is itself the problem (companions to the Bloom contamination probe and
  * the HLL cardinality profile).
  *
  * [[heavyHitters]] finds frequent keys WITHOUT `groupBy(key)` over the
  * full keyspace, in two passes:
  *
  *  1. NOMINATION — per-partition Misra-Gries summaries of capacity `m`
  *     (the mergeable-summaries construction: MG counters undercount a
  *     key's partition-local frequency by at most N_p/m, so a key absent
  *     from a partition's summary has local count ≤ N_p/m). Taking the
  *     UNION of summary keys across partitions therefore guarantees that
  *     every key with GLOBAL count > N/m is nominated — under ANY
  *     partitioning, including a heavy key spread so thinly that it is
  *     never a local top-k member. (The previous local-top-2k nomination
  *     lacked exactly this guarantee and could silently miss a global
  *     heavy hitter; see SketchesSpec's adversarial-partitioning test.)
  *  2. VERIFICATION — exact counts for the nominated keys only, via a
  *     broadcast semi-join (candidates ≤ partitions × m rows, KB-sized)
  *     and one hash aggregate. The output is exact, so it is fully
  *     oracle-checkable; the CMS estimate path ([[heavyHittersEstimate]])
  *     remains for the case where even the verification pass is too
  *     expensive, spec-bounded by the standard ε·N CMS guarantee.
  *
  * Shuffle volume is partitions × m candidate rows plus one filtered
  * aggregate — independent of key cardinality.
  */
object Sketches {

  /** Union of per-partition Misra-Gries(m) summary keys, as a 1-column
    * DataFrame ("k"). Guarantee: contains every key whose GLOBAL count
    * exceeds N/m, regardless of how rows are partitioned. Output size is
    * at most numPartitions × m rows (driver never sees the data — the
    * result stays distributed for the verification join). */
  /** The Misra-Gries counter core shared by [[nominate]] and
    * [[mgSummary]]: at most `m` counters; a full table decrements all
    * (O(m) per trigger, amortized O(1)/row — each decrement retires m
    * prior increments). */
  private def mgCounters(it: Iterator[String],
                         m: Int): scala.collection.mutable.HashMap[String, Long] = {
    val counters = scala.collection.mutable.HashMap.empty[String, Long]
    it.foreach { s =>
      counters.get(s) match {
        case Some(c) => counters.update(s, c + 1L)
        case None if counters.size < m => counters.update(s, 1L)
        case None =>
          val dead = List.newBuilder[String]
          counters.foreach { case (k, c) =>
            if (c == 1L) dead += k else counters.update(k, c - 1L)
          }
          dead.result().foreach(counters.remove)
      }
    }
    counters
  }

  def nominate(df: DataFrame, key: Column, m: Int): DataFrame = {
    require(m >= 1, s"Misra-Gries capacity must be >= 1, got $m")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(key.cast("string").as("k")).na.drop().as[String]
      .mapPartitions(it => mgCounters(it, m).keysIterator)
      .toDF("k").distinct()
  }

  /** Top-`k` keys by EXACT count, found without a full-keyspace shuffle:
    * Misra-Gries nomination (sound for any key with count > N/m) followed
    * by an exact count of the candidates only. Returns (key, cnt) sorted
    * by count descending, key ascending. The result equals the true
    * top-k whenever the k-th heaviest key has count > N/m — size `m`
    * accordingly (default 1024 tolerates a top-k threshold down to
    * 0.1% of N). */
  def heavyHitters(df: DataFrame, key: Column, k: Int = 5,
                   m: Int = 1024): DataFrame = {
    val keyed = df.select(key.cast("string").as("k")).na.drop()
    val candidates = nominate(df, key, m)
    keyed.join(broadcast(candidates), "k")
      .groupBy(col("k").as("key")).agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("key")).limit(k)
      .select(col("key"), col("cnt"))
  }

  /** Estimate-only variant for when even one verification aggregate is
    * too much: same sound nomination, but counts come from a single
    * mergeable count-min-sketch aggregate probed driver-side (the sketch
    * is KB-sized by construction). CMS-standard bounds: estimates never
    * undercount and overshoot by at most ε·N with confidence `conf`
    * (spec-bounded in SketchesSpec). */
  def heavyHittersEstimate(df: DataFrame, key: Column, k: Int = 5,
                           m: Int = 1024, eps: Double = 0.0001,
                           conf: Double = 0.99): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df.select(key.cast("string").as("k")).na.drop()
    val candidates = nominate(df, key, m).as[String].collect().sorted
    val bytes = keyed
      .agg(count_min_sketch(col("k"), lit(eps), lit(conf), lit(42)))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(bytes))
    candidates.map(c => (c, cms.estimateCount(c)))
      .sortBy { case (c, n) => (-n, c) }.take(k)
      .toSeq.toDF("key", "est")
  }

  // --------------------------------------------------- mergeable summaries

  /** One Misra-Gries(m) summary per partition, merged driver-side with
    * [[mgMerge]] into a single capacity-m summary for the whole frame.
    * Driver traffic is partitions × m counters — state, not data. The
    * result satisfies the MG bound: for every key,
    * `count(k) − N/m ≤ summary(k) ≤ count(k)` (absent keys read 0). */
  def mgSummary(df: DataFrame, key: Column, m: Int): Map[String, Long] = {
    require(m >= 1, s"Misra-Gries capacity must be >= 1, got $m")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(key.cast("string").as("k")).na.drop().as[String]
      .mapPartitions(it => Iterator.single(mgCounters(it, m).toMap))
      .collect().foldLeft(Map.empty[String, Long])(mgMerge(_, _, m))
  }

  /** Merge two Misra-Gries summaries into one of capacity `m` (the
    * mergeable-summaries construction — Agarwal et al., PODS'12): sum
    * counters keywise, then subtract the (m+1)-th largest counter from
    * every key and drop the non-positive. The 1/m error bound holds for
    * the COMBINED stream, so unboundedly many merges keep bounded state
    * with a known guarantee — the streaming heavy-hitter state shape
    * (one summary per micro-batch folded into a running summary). */
  def mgMerge(a: Map[String, Long], b: Map[String, Long], m: Int): Map[String, Long] = {
    val summed = (a.keySet ++ b.keySet).iterator
      .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    if (summed.size <= m) summed
    else {
      val cut = summed.values.toIndexedSeq.sorted(Ordering[Long].reverse)(m)
      summed.iterator.map { case (k, c) => k -> (c - cut) }
        .filter(_._2 > 0L).toMap
    }
  }

  /** Oracle-gated query: top event types by EXACT verified count (the
    * candidate set comes from the sound Misra-Gries nomination; the
    * count is a real aggregate over the nominated keys). */
  def heavyHittersQuery(spark: SparkSession, dir: String): DataFrame =
    heavyHitters(Tables.events(spark, dir), col("event_type"))

  val heavyHittersOracle: String =
    """SELECT CAST(event_type AS VARCHAR) AS key, count(*) AS cnt
      |FROM events WHERE event_type IS NOT NULL
      |GROUP BY 1 ORDER BY cnt DESC, key LIMIT 5
      |""".stripMargin
}
