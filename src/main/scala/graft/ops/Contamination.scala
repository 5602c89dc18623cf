package graft.ops

import graft.core.Caches.TrackedDataset
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Train/test contamination check: for every TEST document, the fraction
  * of its distinct 3-gram shingles that appear anywhere in the TRAIN
  * split — the leakage metric run before publishing an eval set carved
  * from the same corpus the model trains on.
  *
  * Plan shape: one shingle scan feeds both sides (split assignment is a
  * pure hash projection, so the two branches prune to train/test before
  * any shuffle); the train side collapses to a DISTINCT shingle dimension
  * and the test side left-joins it — shuffle volume is (distinct
  * shingles) + (test doc × shingle) pairs, never doc × doc.
  *
  * At 100 TB the exact distinct-train-shingle dimension is the bottleneck
  * (it is corpus-vocabulary-sized); the production variant replaces the
  * join with a Bloom filter built by `bloom_filter_agg` over the train
  * shingles and probed map-side — same plan minus the shuffle, with a
  * bounded false-positive overcount. This exact formulation is the
  * oracle-checkable baseline the approximate one is validated against.
  */
object Contamination {

  private val TrainPct = 0.8
  private val ValidPct = 0.1

  def query(spark: SparkSession, dir: String): DataFrame = {
    val sh = Dedup.explodedShinglesOf(spark, Tables.documents(spark, dir))
      .withColumn("split", Sampling.split(col("doc_id"), TrainPct, ValidPct))
    val train = sh.filter(col("split") === "train").select(col("h")).distinct()
      .withColumn("hit", lit(1))
    sh.filter(col("split") === "test")
      .join(train, Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
           sum(coalesce(col("hit"), lit(0))).as("n_shared"))
      .withColumn("contamination",
        round(col("n_shared").cast("double") / col("n_shingles"), 6))
  }

  /** The scale path: identical shape to [[query]], but the train-shingle
    * dimension collapses into a Bloom filter (`bloom_filter_agg`, one
    * small binary blob) broadcast and probed map-side with
    * `might_contain` — no distinct-dimension shuffle, no join. False
    * positives OVERCOUNT `n_shared` by at most the configured fpp; false
    * negatives are impossible, which the spec asserts against [[query]].
    * Not oracle-checked (the filter's bit layout is engine-specific). */
  def approxQuery(spark: SparkSession, dir: String,
                  expectedItems: Long = 1000000L): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    import graft.functions.GraftFunctions.{BloomAggName, BloomContainsName}
    // the shingle scan feeds the filter BUILD (collected now) and the
    // probe aggregation (the returned plan) — persist it or the dominant
    // corpus-wide explode runs twice
    val sh = Dedup.explodedShinglesOf(spark, Tables.documents(spark, dir))
      .withColumn("split", Sampling.split(col("doc_id"), TrainPct, ValidPct))
      .trackPersist()
    // build the filter (one distributed aggregation) and inline the blob
    // as a plan literal — might_contain requires a constant filter, and a
    // literal is how Spark's own runtime join filters inject it; the probe
    // is then a pure map-side projection over the test shingles
    val bf: Array[Byte] = sh.filter(col("split") === "train")
      .agg(call_function(BloomAggName, col("h"), lit(expectedItems),
             lit((expectedItems * 8).max(1048576L))).as("bf"))
      .collect()(0).getAs[Array[Byte]]("bf")
    sh.filter(col("split") === "test")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
           sum(when(call_function(BloomContainsName, lit(bf), col("h")), 1L)
             .otherwise(0L)).as("n_shared"))
      .withColumn("contamination",
        round(col("n_shared").cast("double") / col("n_shingles"), 6))
  }

  val oracle: String = {
    val D = 10000L
    s"""WITH ${Dedup.shingleCte},
       |splt AS (
       |  SELECT doc_id,
       |         CASE WHEN CAST(CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT) % $D < ${(TrainPct * D).toLong} THEN 'train'
       |              WHEN CAST(CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT) % $D < ${((TrainPct + ValidPct) * D).toLong} THEN 'valid'
       |              ELSE 'test' END AS split
       |  FROM documents),
       |ex AS (SELECT sh.doc_id, unnest(sgl) AS h, splt.split
       |       FROM sh JOIN splt USING (doc_id)),
       |tr AS (SELECT DISTINCT h FROM ex WHERE split = 'train'),
       |te AS (SELECT doc_id, h FROM ex WHERE split = 'test')
       |SELECT te.doc_id,
       |       CAST(count(*) AS BIGINT) AS n_shingles,
       |       CAST(sum(CASE WHEN tr.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
       |       round(sum(CASE WHEN tr.h IS NOT NULL THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS contamination
       |FROM te LEFT JOIN tr ON te.h = tr.h
       |GROUP BY 1
       |""".stripMargin
  }
}
