package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions.tokens

/** Sequence packing and mixture rebalancing — the last mile between a
  * cleaned corpus and training batches.
  */
object Packing {

  val ContextBudget = 512L

  /** Assign each document to a training-sequence bin by contiguous fill:
    * documents in deterministic doc_id order accumulate token counts, and
    * a document starts in the bin where its tokens begin,
    * `bin = floor(cumulative_tokens_before / budget)`. This is the
    * streaming-fill packing used for pretraining shards (greedy best-fit
    * would need a sequential pass; contiguous fill is fully parallel:
    * one cumulative-sum window).
    *
    * Scale note: the window runs over a GLOBAL ordering — at 100 TB you
    * run it per shard key (e.g. per source or hash bucket) with
    * `partitionBy`, keeping each window partition bounded; the global
    * form here matches what the oracle can express. */
  def packQuery(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(spark, dir)
      .select(col("doc_id"), size(tokens(col("text"))).as("n_tokens"))
      .withColumn("tokens_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("bin_id", floor(col("tokens_before") / ContextBudget))
      .select(col("doc_id"), col("n_tokens"), col("tokens_before"), col("bin_id"))
  }

  val packOracle: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |         CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS INT) AS n_tokens
       |  FROM documents)
       |SELECT doc_id, n_tokens,
       |       CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
       |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tokens_before,
       |       CAST(floor(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
       |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / $ContextBudget) AS BIGINT) AS bin_id
       |FROM t
       |""".stripMargin

  /** Rebalance the corpus to a uniform source mixture: every source is
    * down-sampled (by reproducible key hash — [[Sampling.bucket]]) to the
    * size of the smallest source. Rates are computed IN the plan (tiny
    * per-source aggregate, broadcast back) — no driver round-trip.
    * Generalizes to arbitrary target shares by joining a weights table. */
  def mixQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n_src"))
    val minN = counts.agg(min(col("n_src")).as("n_min"))
    val rates = counts.crossJoin(broadcast(minN))
      .select(col("source"), (col("n_min").cast("double") / col("n_src")).as("keep_rate"))
    docs.join(broadcast(rates), Seq("source"))
      .filter(Sampling.bucket(col("doc_id"), "mix") < floor(col("keep_rate") * 10000L).cast("long"))
      .select(col("doc_id"), col("source"))
  }

  val mixOracle: String =
    """WITH counts AS (
      |  SELECT source, count(*) AS n_src FROM documents GROUP BY 1),
      |rates AS (
      |  SELECT source, (SELECT min(n_src) FROM counts) * 1.0 / n_src AS keep_rate
      |  FROM counts)
      |SELECT doc_id, d.source
      |FROM documents d JOIN rates r ON d.source = r.source
      |WHERE CAST(CAST(('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT) % 10000
      |      < CAST(floor(r.keep_rate * 10000) AS BIGINT)
      |""".stripMargin
}
