package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions.tokens

/** Lexical retrieval over the corpus — the "find the training documents
  * most relevant to this probe query" primitive used for targeted corpus
  * audits (e.g. pull the top-k documents matching a benchmark prompt
  * before a contamination deep-dive, or spot-check what a source says
  * about a topic).
  *
  * Scoring is BM25-shaped but kept in EXACT integer arithmetic so the
  * result is engine-portable (no log, no float accumulation ordering):
  * each term's inverse document frequency is the integer lift
  * `(N * 1e6) / df`, a document's raw score is the fixed-order sum of
  * `tf * idf` over the (few) query terms, and length normalization is a
  * final integer division by the document's token count. Monotone in tf,
  * anti-monotone in df and document length — the BM25 ordering
  * ingredients without the transcendental-function portability risk.
  *
  * Plan shape at scale: ONE corpus scan with a per-row projection
  * (`filter(tk, …)` array kernels — no explode, no per-term join), a
  * 1-row global aggregate for the document frequencies, broadcast back,
  * then a distributed TakeOrdered for the top-k. Nothing in the plan is
  * proportional to vocabulary or query size beyond the fixed term list.
  *
  * All quantities are non-negative, so Spark's truncating `div` and
  * DuckDB's flooring `//` agree (the [[Layout]] floor-division caveat
  * does not bite here).
  */
object Retrieval {

  /** Probe query terms (fixed, so the oracle is a closed expression). */
  private val Terms = Seq("spark", "vector", "merge")
  private val TopK = 50

  /** Top-[[TopK]] documents for the probe query, scored by
    * length-normalized integer tf-idf. Emits per-doc tf for each term
    * (audit columns), the matched-term count, and the score. */
  def lexicalTopK(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .select(
        col("doc_id") +: size(col("tk")).cast("long").as("dl") +:
          Terms.zipWithIndex.map { case (t, i) =>
            size(filter(col("tk"), x => x === lit(t))).cast("long").as(s"tf$i")
          }: _*)
    val dfAggs = Terms.indices.map(i =>
      sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
    val dfs = docs.agg(count(lit(1)).as("n_docs"), dfAggs: _*)
    val idfScore = Terms.indices
      .map(i => s"tf$i * ((n_docs * CAST(1000000 AS BIGINT)) div df$i)")
      .mkString(" + ")
    val matched = Terms.indices
      .map(i => when(col(s"tf$i") > 0, 1).otherwise(0))
      .reduce(_ + _)
    val outCols = col("doc_id") +:
      Terms.indices.map(i => col(s"tf$i").cast("int").as(s"tf$i")) :+
      matched.cast("int").as("matched") :+
      expr(s"CAST(($idfScore) div dl AS BIGINT)").as("score")
    docs.crossJoin(broadcast(dfs))
      .select(outCols: _*)
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(TopK)
  }

  private val RrfK = 60L
  private val FuseTop = 20

  /** Hybrid ranking by reciprocal-rank fusion: the lexical top-k list
    * (relevance) fused with the corpus fluency prior (unigram-NLL
    * ascending — the CCNet-style "in-distribution" signal), the standard
    * two-signal retrieval composition when no single scorer is trusted.
    * `RRF(d) = Σ_lists 1/(60 + rank_list(d))`, kept portable as the
    * integer `floor(1e9 / (60 + rank))` so the fused score is an exact
    * long sum.
    *
    * Both input lists are top-50 frames — BOUNDED by construction — so
    * the in-list ranks ([[Rnk.boundedRank]] — window-free, so nothing in
    * the plan is an unpartitioned WindowExec) and the final sort run over
    * ≤50/≤100 rows regardless of corpus size (same boundedness argument
    * as the report sink); the heavy work (scoring the corpus) happens in
    * the two upstream operators, which are scan-shaped. */
  def hybridTopK(spark: SparkSession, dir: String): DataFrame = {
    val lex = Rnk.boundedRank(
        lexicalTopK(spark, dir),
        struct(-col("score"), col("doc_id")), "lex_rank")
      .select(col("doc_id"), col("lex_rank"))
    val flu = Rnk.boundedRank(
        TextAnalysis.unigramNll(spark, dir)
          .orderBy(col("nll").asc, col("doc_id")).limit(TopK),
        struct(col("nll"), col("doc_id")), "nll_rank")
      .select(col("doc_id"), col("nll_rank"))
    lex.join(flu, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("lex_rank"), col("nll_rank"),
        (coalesce(expr(s"CAST(1000000000 AS BIGINT) div ($RrfK + lex_rank)"), lit(0L)) +
         coalesce(expr(s"CAST(1000000000 AS BIGINT) div ($RrfK + nll_rank)"), lit(0L)))
          .as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(FuseTop)
  }

  def hybridOracle(lexicalOracle: String, nllOracle: String): String =
    s"""WITH lex_base AS ($lexicalOracle),
       |lex AS (
       |  SELECT doc_id,
       |         CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS lex_rank
       |  FROM lex_base),
       |flu_base AS ($nllOracle),
       |flu AS (
       |  SELECT doc_id,
       |         CAST(row_number() OVER (ORDER BY nll ASC, doc_id) AS BIGINT) AS nll_rank
       |  FROM (SELECT * FROM flu_base ORDER BY nll ASC, doc_id LIMIT $TopK)),
       |fused AS (
       |  SELECT coalesce(lex.doc_id, flu.doc_id) AS doc_id, lex_rank, nll_rank,
       |         coalesce(1000000000 // ($RrfK + lex_rank), 0) +
       |         coalesce(1000000000 // ($RrfK + nll_rank), 0) AS rrf
       |  FROM lex FULL OUTER JOIN flu ON lex.doc_id = flu.doc_id)
       |SELECT doc_id, lex_rank, nll_rank, CAST(rrf AS BIGINT) AS rrf
       |FROM fused ORDER BY rrf DESC, doc_id LIMIT $FuseTop
       |""".stripMargin

  val lexicalOracle: String = {
    val tfCols = Terms.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(tk, x -> x = '$t')) AS BIGINT) AS tf$i"
    }.mkString(",\n       |         ")
    val dfCols = Terms.indices.map(i =>
      s"CAST(sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df$i")
      .mkString(", ")
    val score = Terms.indices.map(i => s"tf$i * ((n_docs * 1000000) // df$i)")
      .mkString(" + ")
    val matched = Terms.indices.map(i => s"CASE WHEN tf$i > 0 THEN 1 ELSE 0 END")
      .mkString(" + ")
    val tfOut = Terms.indices.map(i => s"CAST(tf$i AS INT) AS tf$i").mkString(", ")
    s"""WITH d AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
       |  FROM documents),
       |t AS (
       |  SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl,
       |         $tfCols
       |  FROM d),
       |f AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, $dfCols FROM t),
       |s AS (
       |  SELECT doc_id, $tfOut,
       |         CAST($matched AS INT) AS matched,
       |         CAST(($score) // dl AS BIGINT) AS score
       |  FROM t CROSS JOIN f)
       |SELECT * FROM s WHERE score > 0
       |ORDER BY score DESC, doc_id LIMIT $TopK
       |""".stripMargin
  }

  /** Closed-form oracle for [[hybridTopK]] (composed AFTER
    * [[lexicalOracle]] initializes — object vals run in order). */
  val fusedOracle: String =
    hybridOracle(lexicalOracle, TextAnalysis.unigramNllOracle)
}
