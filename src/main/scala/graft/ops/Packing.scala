package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    * Scale note: the running sum is over a GLOBAL ordering, but it does
    * NOT run as a single-partition window — it goes through
    * [[Rnk.globalCumsum]], the distributed two-pass prefix sum
    * (range-partition, per-partition running sums in parallel,
    * partition offsets broadcast back), so no task ever sees more than
    * one range partition of the corpus. */
  def packQuery(spark: SparkSession, dir: String): DataFrame =
    Rnk.globalCumsum(
        Tables.documents(spark, dir)
          .select(col("doc_id"), size(tokens(col("text"))).as("n_tokens")),
        Seq(col("doc_id")), col("n_tokens"), outCol = "tokens_before")
      .withColumn("bin_id", floor(col("tokens_before") / ContextBudget))
      .select(col("doc_id"), col("n_tokens"), col("tokens_before"), col("bin_id"))

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

  private val MixBudget = 250L

  /** Temperature-based source mixing (α = 0.5): per-source keep rates
    * ∝ n_s^α — the standard multilingual/multi-source rebalancing that
    * up-samples small sources relative to proportional sampling without
    * the uniform mix's heavy repetition of tiny ones (α=1 is
    * proportional, α=0 is uniform). Allocation for source s is
    * `MixBudget · √n_s / Σ_t √n_t`, capped at the source's own size.
    *
    * Portability discipline: α is fixed at 0.5 because `sqrt` is
    * IEEE-correctly-rounded (bit-identical in every engine) where a
    * general `pow` is a libm transcendental and is not; the √-weights
    * are floored onto a 1e6 integer grid so the cross-source SUM is
    * exact long arithmetic (a double Σ would be reduction-order-
    * dependent, and Spark does not fix aggregation order); the final
    * rate is one identical double-division sequence on both engines.
    * Selection is the same md5-bucket filter as [[mixQuery]] —
    * deterministic, order-insensitive, join-free per row. */
  def temperatureMixOf(docs: DataFrame): DataFrame = {
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n_src"))
      .withColumn("w",
        floor(sqrt(col("n_src").cast("double")) * 1e6).cast("long"))
    val denom = counts.agg(sum(col("w")).as("w_sum")) // exact long sum
    val rates = counts.crossJoin(broadcast(denom))
      .select(col("source"),
        least(lit(1.0).cast("double"),
          lit(MixBudget).cast("double") *
            (col("w").cast("double") / col("w_sum")) / col("n_src"))
          .as("keep_rate"))
    docs.join(broadcast(rates), Seq("source"))
      .filter(Sampling.bucket(col("doc_id"), "tmix") <
        floor(col("keep_rate") * 10000L).cast("long"))
      .select(col("doc_id"), col("source"), round(col("keep_rate"), 6).as("keep_rate"))
  }

  def temperatureMixQuery(spark: SparkSession, dir: String): DataFrame =
    temperatureMixOf(Tables.documents(spark, dir))

  val temperatureMixOracle: String =
    s"""WITH counts AS (
       |  SELECT source, count(*) AS n_src FROM documents GROUP BY 1),
       |w AS (
       |  SELECT source, n_src,
       |         CAST(floor(sqrt(CAST(n_src AS DOUBLE)) * 1000000) AS BIGINT) AS w
       |  FROM counts),
       |d AS (SELECT CAST(sum(w) AS BIGINT) AS w_sum FROM w),
       |rates AS (
       |  SELECT source,
       |         least(CAST(1 AS DOUBLE),
       |               CAST($MixBudget AS DOUBLE) * (CAST(w AS DOUBLE) / w_sum) / n_src)
       |           AS keep_rate
       |  FROM w CROSS JOIN d)
       |SELECT doc_id, docs.source, round(r.keep_rate, 6) AS keep_rate
       |FROM documents docs JOIN rates r ON docs.source = r.source
       |WHERE CAST(CAST(('0x' || substr(md5('tmix:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT) % 10000
       |      < CAST(floor(r.keep_rate * 10000) AS BIGINT)
       |""".stripMargin

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

  // ----------------------------------------------------- padding waste

  private val PadBatch = 32L

  /** PADDING-WASTE AUDIT for batched inference: fixed-size batches pad
    * every sequence to the batch maximum, so batch composition decides
    * how many compute tokens are burned on padding. Two strategies over
    * the same corpus, quantified exactly: `arrival` (doc_id order — what
    * a naive loader does) vs `sorted` (length-sorted batching — the
    * standard bucketing fix). Output per strategy: batch count, real
    * tokens, padded tokens, and waste ppm — the number that justifies
    * adding the sort shuffle to an inference pipeline.
    *
    * Both batch assignments use the DISTRIBUTED [[Rnk.globalRank]]
    * (`batch = (rank−1) div B`) — no single-partition window at any
    * corpus size; the per-batch max/sum aggregate is batch-count-sized.
    * Integer arithmetic throughout. */
  def paddingWaste(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.Caches.TrackedDataset
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long").as("n_tok"))
      .trackPersist() // both strategies rank the same frame
    def strategy(name: String, order: Seq[org.apache.spark.sql.Column]) =
      Rnk.globalRank(base, order, "rank")
        .withColumn("batch", expr(s"(rank - 1) div $PadBatch"))
        .groupBy(col("batch"))
        .agg(count(lit(1)).as("n"), max(col("n_tok")).as("mx"),
             sum(col("n_tok")).as("tok"))
        .agg(count(lit(1)).as("n_batches"),
             sum(col("tok")).as("total_tokens"),
             sum(col("mx") * col("n")).as("padded_tokens"))
        .select(lit(name).as("strategy"), col("n_batches"),
          col("total_tokens"), col("padded_tokens"),
          expr("(padded_tokens - total_tokens) * 1000000 div padded_tokens")
            .as("waste_ppm"))
    strategy("arrival", Seq(col("doc_id")))
      .unionByName(strategy("sorted", Seq(col("n_tok"), col("doc_id"))))
  }

  val paddingWasteOracle: String = {
    def cte(name: String, order: String) =
      s"""${name}_r AS (
         |  SELECT n_tok, (row_number() OVER (ORDER BY $order) - 1) // $PadBatch AS batch
         |  FROM base),
         |${name}_b AS (
         |  SELECT batch, CAST(count(*) AS BIGINT) AS n,
         |         CAST(max(n_tok) AS BIGINT) AS mx,
         |         CAST(sum(n_tok) AS BIGINT) AS tok
         |  FROM ${name}_r GROUP BY 1),
         |${name}_s AS (
         |  SELECT '$name' AS strategy, CAST(count(*) AS BIGINT) AS n_batches,
         |         CAST(sum(tok) AS BIGINT) AS total_tokens,
         |         CAST(sum(mx * n) AS BIGINT) AS padded_tokens
         |  FROM ${name}_b)""".stripMargin
    s"""WITH base AS (
       |  SELECT doc_id,
       |         CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT) AS n_tok
       |  FROM documents),
       |${cte("arrival", "doc_id")},
       |${cte("sorted", "n_tok, doc_id")}
       |SELECT strategy, n_batches, total_tokens, padded_tokens,
       |       CAST((padded_tokens - total_tokens) * 1000000 // padded_tokens AS BIGINT) AS waste_ppm
       |FROM (SELECT * FROM arrival_s UNION ALL SELECT * FROM sorted_s)
       |""".stripMargin
  }
}
