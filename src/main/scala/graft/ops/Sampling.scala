package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions.hash60

/** Reproducible sampling and train/valid/test splitting by key hash.
  *
  * RNG-based sampling (`df.sample`, Bernoulli per partition) is neither
  * reproducible across partitionings nor portable across engines. Hash
  * sampling — keep a row iff `md5(salt || key) mod D < rate·D` — is
  * deterministic per KEY: stable under repartitioning, re-runs, engine
  * changes, and late-arriving duplicates of the same key land in the
  * same bucket. This is the standard way to cut training corpora.
  *
  * Shuffle-free (pure projection + filter); the salt gives independent
  * draws for nested samples.
  */
object Sampling {

  private[ops] val D = 10000L

  /** Uniform bucket in [0, D) for `key` under `salt`. */
  def bucket(key: Column, salt: String): Column =
    pmod(hash60(concat(lit(salt + ":"), key.cast("string"))), lit(D))

  /** Keep rows whose key falls in the first `rate` fraction of buckets. */
  def sampleByKey(df: DataFrame, key: Column, rate: Double,
                  salt: String = "sample"): DataFrame =
    df.filter(bucket(key, salt) < (rate * D).toLong)

  /** Deterministic 3-way split: train / valid / test by key hash. */
  def split(key: Column, trainPct: Double, validPct: Double,
            salt: String = "split"): Column = {
    val b = bucket(key, salt)
    when(b < (trainPct * D).toLong, "train")
      .when(b < ((trainPct + validPct) * D).toLong, "valid")
      .otherwise("test")
  }

  /** Stratified sampling: a different keep-rate per stratum value, still
    * hash-deterministic per key (`df.stat.sampleBy` is RNG-based and not
    * reproducible across partitionings). Rows in strata missing from
    * `rates` are dropped — the common "cap the over-represented sources"
    * corpus-shaping move. Pure projection + filter, shuffle-free. */
  def stratified(df: DataFrame, key: Column, stratum: Column,
                 rates: Map[String, Double], salt: String = "strat"): DataFrame = {
    val b = bucket(key, salt)
    val keep = rates.foldLeft(lit(false)) { case (acc, (s, r)) =>
      acc || (stratum === s && b < (r * D).toLong)
    }
    df.filter(keep)
  }

  /** Oracle query for [[stratified]]: cap each document source at a
    * source-dependent rate (even sources 60%, odd 25%). */
  private[ops] val StratRates: Map[String, Double] =
    (0 until 20).map(i => s"src$i" -> (if (i % 2 == 0) 0.6 else 0.25)).toMap

  def stratifiedQuery(spark: SparkSession, dir: String): DataFrame =
    stratified(Tables.documents(spark, dir).select(col("doc_id"), col("source")),
               col("doc_id"), col("source"), StratRates)

  val stratifiedOracle: String = {
    val arms = StratRates.toSeq.sortBy(_._1).map { case (s, r) =>
      s"(source = '$s' AND b < ${(r * D).toLong})"
    }.mkString("\n   OR ")
    s"""WITH t AS (
       |  SELECT doc_id, source,
       |         CAST(CAST(('0x' || substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT) % $D AS b
       |  FROM documents)
       |SELECT doc_id, source FROM t
       |WHERE $arms
       |""".stripMargin
  }

  /** Query: assign every document to a split and draw a 20% sample flag;
    * per-language split counts prove the stratification is stable. */
  def query(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"), col("lang"),
      split(col("doc_id"), 0.8, 0.1).as("split"),
      (bucket(col("doc_id"), "sample") < (0.2 * D).toLong).as("in_sample"))

  val oracle: String =
    s"""WITH b AS (
       |  SELECT doc_id, lang,
       |         CAST(CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT) % $D AS bs,
       |         CAST(CAST(('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT) % $D AS bp
       |  FROM documents)
       |SELECT doc_id, lang,
       |       CASE WHEN bs < ${(0.8 * D).toLong} THEN 'train'
       |            WHEN bs < ${(0.9 * D).toLong} THEN 'valid'
       |            ELSE 'test' END AS split,
       |       bp < ${(0.2 * D).toLong} AS in_sample
       |FROM b
       |""".stripMargin
}
