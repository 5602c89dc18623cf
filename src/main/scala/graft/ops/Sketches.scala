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
  * full keyspace: per-partition LOCAL exact counts nominate candidates
  * (a space-saving pass — any globally heavy key is locally heavy in at
  * least one partition), while a count-min sketch built by Spark's
  * `count_min_sketch` aggregate (mergeable partials, fixed memory)
  * estimates each candidate's global count. Shuffle volume is
  * partitions × candidates rows, independent of key cardinality; the
  * sketch is CMS-standard: estimates never undercount and overshoot by
  * at most ε·N with the configured confidence.
  */
object Sketches {

  /** Top-`k` keys by estimated count. Returns (key, est) sorted by
    * estimate descending, key ascending. Candidates are the union of
    * per-partition local top-(2k) keys; estimates come from one CMS
    * probe on the driver (the sketch is KB-sized by construction). */
  def heavyHitters(df: DataFrame, key: Column, k: Int = 5,
                   eps: Double = 0.0001, conf: Double = 0.99): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df.select(key.cast("string").as("k")).na.drop()
    // candidate nomination: exact local counts, top-2k per partition
    val candidates = keyed.as[String].mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach(s => m.update(s, m.getOrElse(s, 0L) + 1L))
      m.toSeq.sortBy { case (s, n) => (-n, s) }.take(2 * k).map(_._1).iterator
    }.distinct().collect().sorted
    // global estimates: one mergeable CMS aggregate, probed driver-side
    val bytes = keyed
      .agg(count_min_sketch(col("k"), lit(eps), lit(conf), lit(42)))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(bytes))
    candidates.map(c => (c, cms.estimateCount(c)))
      .sortBy { case (c, n) => (-n, c) }.take(k)
      .toSeq.toDF("key", "est")
  }

  /** Rows-only query (no SQL oracle — the sketch layout is
    * engine-specific, same standing as the HLL profile): top event types
    * by estimated count. Bounds vs exact counts are spec-asserted. */
  def heavyHittersQuery(spark: SparkSession, dir: String): DataFrame =
    heavyHitters(Tables.events(spark, dir), col("event_type"))
}
