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
}
