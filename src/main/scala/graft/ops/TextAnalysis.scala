package graft.ops

import graft.core.Caches.TrackedDataset
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions._

/** Document-corpus text analysis: token statistics, quality scoring,
  * language ID, and content fingerprinting — the per-document metrics a
  * training-data pipeline computes before filtering/dedup.
  *
  * Every query is one narrow projection over a single scan of `documents`
  * — no shuffle at all (purely per-row expressions), so throughput at
  * 100 TB is scan-bound: Spark maps each parquet split to a task and the
  * whole thing is one WholeStageCodegen stage. Column pruning reaches the
  * scan (only `doc_id`/`text` are read).
  */
object TextAnalysis {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)

  private val toks: Column = tokens(col("text"))

  // ---------------------------------------------------------------- stats
  /** Per-document token statistics (whitespace + BPE-ish counts). */
  def stats(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      size(toks).as("n_tokens"),
      bpeTokenCount(col("text")).as("n_bpe_tokens"),
      size(array_distinct(toks)).as("n_uniq_tokens"),
      round(tokenLenSum(toks).cast("double") / size(toks), 6).as("avg_token_len"),
      round(size(array_distinct(toks)).cast("double") / size(toks), 6).as("uniq_ratio"))

  val statsOracle: String =
    """WITH t AS (
      |  SELECT doc_id, text,
      |         string_split_regex(trim(lower(text)), '\s+') AS tk
      |  FROM documents)
      |SELECT doc_id,
      |       CAST(length(text) AS INT) AS n_chars,
      |       CAST(len(tk) AS INT) AS n_tokens,
      |       CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INT) AS n_bpe_tokens,
      |       CAST(len(list_distinct(tk)) AS INT) AS n_uniq_tokens,
      |       round(list_sum(list_transform(tk, x -> len(x))) * 1.0 / len(tk), 6) AS avg_token_len,
      |       round(len(list_distinct(tk)) * 1.0 / len(tk), 6) AS uniq_ratio
      |FROM t
      |""".stripMargin

  // --------------------------------------------------------------- langid
  /** Per-language function-word hit-ratio score columns (`s_<lang>`), the
    * raw material for [[langid]] — exposed so composed pipelines
    * ([[CorpusClean]]) can fuse them into a shared single-scan profile. */
  private[ops] def langScoreCols: Seq[Column] =
    langProfiles.map { case (l, ws) => vocabRatio(toks, ws).as(s"s_$l") }

  /** Deterministic argmax over the `s_<lang>` columns: CASE chain in
    * alphabetical order — first lang whose score ties-or-beats every later
    * lang wins; zero everywhere → "und". */
  private[ops] def langPredExpr: Column = {
    val names = langProfiles.map(_._1)
    def gr(cs: Seq[Column]): Column =
      if (cs.size == 1) cs.head else greatest(cs: _*)
    val pred = names.init.zipWithIndex.foldLeft(Option.empty[Column]) {
      case (acc, (l, i)) =>
        val cond = col(s"s_$l") >= gr(names.drop(i + 1).map(r => col(s"s_$r")))
        Some(acc.fold(when(cond, l))(_.when(cond, l)))
    }.get.otherwise(names.last)
    when(langBestExpr > 0, pred).otherwise("und")
  }

  /** Best (maximum) language score across the `s_<lang>` columns. */
  private[ops] def langBestExpr: Column = {
    val cs = langProfiles.map(p => col(s"s_${p._1}"))
    if (cs.size == 1) cs.head else greatest(cs: _*)
  }

  /** N-gram-free language ID: score each language by its function-word hit
    * ratio; highest score wins, ties resolve alphabetically, zero
    * everywhere → "und". */
  def langid(spark: SparkSession, dir: String): DataFrame = {
    val scoreCols: Seq[Column] =
      Seq(col("doc_id"), col("lang").as("lang_actual")) ++ langScoreCols
    docs(spark, dir).select(scoreCols: _*).select(
      col("doc_id"), col("lang_actual"),
      langPredExpr.as("lang_pred"),
      round(langBestExpr, 6).as("score"))
  }

  val langidOracle: String = {
    val names = langProfiles.map(_._1)
    def sql(l: String, ws: Seq[String]) =
      s"len(list_filter(tk, x -> list_contains([${ws.map("'" + _ + "'").mkString(",")}], x))) * 1.0 / len(tk)"
    val scores = langProfiles.map { case (l, ws) => s"${sql(l, ws)} AS s_$l" }
    val caseArms = names.init.zipWithIndex.map { case (l, i) =>
      val rest = names.drop(i + 1).map(r => s"s_$r")
      s"WHEN s_$l >= greatest(${rest.mkString(",")}) THEN '$l'"
    }
    s"""WITH t AS (
       |  SELECT doc_id, lang, string_split_regex(trim(lower(text)), '\\s+') AS tk
       |  FROM documents),
       |s AS (
       |  SELECT doc_id, lang AS lang_actual, ${scores.mkString(",\n         ")}
       |  FROM t)
       |SELECT doc_id, lang_actual,
       |       CASE WHEN greatest(${names.map("s_" + _).mkString(",")}) > 0
       |            THEN CASE ${caseArms.mkString(" ")} ELSE '${names.last}' END
       |            ELSE 'und' END AS lang_pred,
       |       round(greatest(${names.map("s_" + _).mkString(",")}), 6) AS score
       |FROM s
       |""".stripMargin
  }

  /** Paragraph-grain language consistency — the code-switch filter:
    * run the [[langid]] scorer per non-overlapping 25-token paragraph
    * and flag documents whose paragraphs disagree (mixed-language
    * pages are poison for monolingual training slices, and a
    * doc-level language label hides them). TRUE dual implementation:
    * the oracle replays slicing, scoring, and argmax in SQL rather
    * than predicting from a planted fixture. Output per doc:
    * paragraph count, distinct predicted languages, the majority
    * prediction (ties alphabetical), and the mixed flag.
    *
    * Plan: one scan → paragraph explode (corpus-linear) → pure-column
    * scoring → two hash aggregates on doc_id; the vote table is
    * (docs × ≤6 languages), nothing wider ever shuffles. */
  def mixedLangQuery(spark: SparkSession, dir: String): DataFrame = {
    val P = 25
    val base = docs(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("tk"))
    val paras = base.select(col("doc_id"),
      explode(transform(
        sequence(lit(0L),
          ceil(size(col("tk")) / lit(P.toDouble)).cast("long") - 1),
        i => slice(col("tk"), (i * P + 1).cast("int"), lit(P)))).as("ptk"))
    val scored = paras.select(
      col("doc_id") +:
        langProfiles.map { case (l, ws) =>
          vocabRatio(col("ptk"), ws).as(s"s_$l")
        }: _*)
    val votes = scored.select(col("doc_id"), langPredExpr.as("pred"))
      .groupBy(col("doc_id"), col("pred"))
      .agg(count(lit(1)).as("c"))
    votes.groupBy(col("doc_id"))
      .agg(sum(col("c")).cast("int").as("n_paras"),
        count(lit(1)).cast("int").as("n_langs"),
        min(struct((-col("c")).as("nc"), col("pred").as("pred")))
          .getField("pred").as("majority_lang"))
      .withColumn("is_mixed", col("n_langs") > 1)
  }

  val mixedLangOracle: String = {
    val names = langProfiles.map(_._1)
    def sql(ws: Seq[String]) =
      s"len(list_filter(ptk, x -> list_contains([${ws.map("'" + _ + "'").mkString(",")}], x))) * 1.0 / len(ptk)"
    val scores = langProfiles.map { case (l, ws) => s"${sql(ws)} AS s_$l" }
    val caseArms = names.init.zipWithIndex.map { case (l, i) =>
      val rest = names.drop(i + 1).map(r => s"s_$r")
      s"WHEN s_$l >= greatest(${rest.mkString(",")}) THEN '$l'"
    }
    s"""WITH t AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
       |  FROM documents),
       |p AS (
       |  SELECT doc_id,
       |         list_slice(tk, i * 25 + 1, least(i * 25 + 25, len(tk))) AS ptk
       |  FROM t, unnest(generate_series(0,
       |         CAST(ceil(len(tk) / 25.0) AS BIGINT) - 1)) u(i)),
       |s AS (
       |  SELECT doc_id, ${scores.mkString(",\n         ")}
       |  FROM p),
       |pr AS (
       |  SELECT doc_id,
       |         CASE WHEN greatest(${names.map("s_" + _).mkString(",")}) > 0
       |              THEN CASE ${caseArms.mkString(" ")}
       |                   ELSE '${names.last}' END
       |              ELSE 'und' END AS pred
       |  FROM s),
       |v AS (SELECT doc_id, pred, count(*) AS c FROM pr GROUP BY 1, 2),
       |r AS (
       |  SELECT doc_id, pred, c,
       |         row_number() OVER (PARTITION BY doc_id
       |                            ORDER BY c DESC, pred) AS rn,
       |         sum(c) OVER (PARTITION BY doc_id) AS np,
       |         count(*) OVER (PARTITION BY doc_id) AS nl
       |  FROM v)
       |SELECT doc_id, CAST(np AS INT) AS n_paras, CAST(nl AS INT) AS n_langs,
       |       pred AS majority_lang, nl > 1 AS is_mixed
       |FROM r WHERE rn = 1
       |""".stripMargin
  }

  /** Confusion matrix of the [[langid]] heuristic against the corpus's
    * labeled `lang` column, with per-cell recall/precision in ppm — the
    * classifier-calibration audit run before TRUSTING a cheap lang-ID
    * gate to route documents at scale (a class the heuristic
    * systematically swallows shows up as an off-diagonal cell with high
    * recall_ppm loss, per-class, not as a single accuracy number).
    *
    * Plan: the prediction is a pure projection (one scan), the matrix a
    * classes²-bounded hash aggregate, and the row/column totals are
    * class-count-sized aggregates BROADCAST back onto the matrix —
    * nothing in the plan scales with corpus size except the one scan.
    * Integer ppm throughout. */
  def langidConfusion(spark: SparkSession, dir: String): DataFrame = {
    val cm = langid(spark, dir)
      .groupBy(col("lang_actual"), col("lang_pred"))
      .agg(count(lit(1)).as("n"))
    val at = cm.groupBy(col("lang_actual")).agg(sum(col("n")).as("actual_total"))
    val pt = cm.groupBy(col("lang_pred")).agg(sum(col("n")).as("pred_total"))
    cm.join(broadcast(at), Seq("lang_actual"))
      .join(broadcast(pt), Seq("lang_pred"))
      .select(col("lang_actual"), col("lang_pred"), col("n"),
              col("actual_total"), col("pred_total"),
              expr("n * 1000000 div actual_total").as("recall_ppm"),
              expr("n * 1000000 div pred_total").as("precision_ppm"))
  }

  val langidConfusionOracle: String =
    s"""WITH base AS ($langidOracle),
       |cm AS (SELECT lang_actual, lang_pred, CAST(count(*) AS BIGINT) AS n
       |       FROM base GROUP BY 1, 2),
       |at AS (SELECT lang_actual, CAST(sum(n) AS BIGINT) AS actual_total
       |       FROM cm GROUP BY 1),
       |pt AS (SELECT lang_pred, CAST(sum(n) AS BIGINT) AS pred_total
       |       FROM cm GROUP BY 1)
       |SELECT cm.lang_actual, cm.lang_pred, n, actual_total, pred_total,
       |       CAST(n * 1000000 // actual_total AS BIGINT) AS recall_ppm,
       |       CAST(n * 1000000 // pred_total AS BIGINT) AS precision_ppm
       |FROM cm JOIN at USING (lang_actual) JOIN pt USING (lang_pred)
       |""".stripMargin

  // -------------------------------------------------------------- quality
  /** (uniq-ratio, length-score, stopword-ratio) component expressions of
    * the quality score — exposed for fusion into shared profiles. */
  private[ops] def qualityParts: (Column, Column, Column) = {
    val en = langProfiles.toMap.apply("en")
    (size(array_distinct(toks)).cast("double") / size(toks),
     least(size(toks).cast("double") / lit(100.0), lit(1.0)),
     vocabRatio(toks, en))
  }

  /** Quality score in [0,1]: mix of lexical diversity, length saturation,
    * and English function-word density (heuristic filter for boilerplate /
    * gibberish before training). */
  def quality(spark: SparkSession, dir: String): DataFrame = {
    val (uniq, lenScore, stop) = qualityParts
    docs(spark, dir).select(
      col("doc_id"),
      round(uniq, 6).as("uniq_ratio"),
      round(lenScore, 6).as("length_score"),
      round(stop, 6).as("stopword_ratio"),
      round(uniq * 0.4 + lenScore * 0.3 + stop * 0.3, 6).as("quality_score"))
  }

  val qualityOracle: String = {
    val en = langProfiles.toMap.apply("en").map("'" + _ + "'").mkString(",")
    s"""WITH t AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
       |  FROM documents),
       |m AS (
       |  SELECT doc_id,
       |         len(list_distinct(tk)) * 1.0 / len(tk) AS uniq,
       |         least(len(tk) * 1.0 / 100.0, 1.0) AS lens,
       |         len(list_filter(tk, x -> list_contains([$en], x))) * 1.0 / len(tk) AS stp
       |  FROM t)
       |SELECT doc_id,
       |       round(uniq, 6) AS uniq_ratio,
       |       round(lens, 6) AS length_score,
       |       round(stp, 6) AS stopword_ratio,
       |       round(uniq * 0.4 + lens * 0.3 + stp * 0.3, 6) AS quality_score
       |FROM m
       |""".stripMargin
  }

  /** QUANTILE NORMALIZATION of the per-doc quality score ACROSS SOURCES:
    * each document's score is replaced by the GLOBAL score distribution's
    * value at the document's within-source rank decile — after which "top
    * 30% by quality" means the same thing in every source, and one global
    * threshold can't silently keep all of an easy-scoring source and none
    * of a harsh-scoring one. This is the calibration step run before any
    * cross-source quality gate.
    *
    * Decile grain ([[QnormB]] buckets): a doc in its source's b-th score
    * decile maps to the global b-th-decile upper-edge score (the order
    * statistic at global rank `b·N/B` — exact, not interpolated, so the
    * mapping hash-matches any engine on the already-oracle-checked
    * [[quality]] scores).
    *
    * Scale shape — deliberately NO per-source windows (a 30%-of-corpus
    * source would serialize a `PARTITION BY source` rank into one task):
    * both rank passes are [[Rnk.globalRank]] range-partition sorts.
    * Within-source ranks come from the (source, score, doc_id)-ordered
    * global rank minus each source's minimum rank (source-grain
    * broadcast); global decile edges are B rows picked from the (score,
    * doc_id)-ordered rank by a broadcast join. */
  val QnormB = 10

  def qualityQuantileNorm(spark: SparkSession, dir: String): DataFrame = {
    // persist the scored cut (round-14 opt): both global and per-source
    // rank pipelines consume it, and each [[Rnk.globalRank]] call starts
    // its own jobs — unpersisted, the quality-scoring kernel (regex
    // tokenization + stopword filter over every document) replayed once
    // per consumer (isolated min-of-5 at sf0.1: see OPTIMIZATION_r14.md)
    val scored = quality(spark, dir).select(col("doc_id"), col("quality_score"))
      .join(docs(spark, dir).select(col("doc_id"), col("source")), Seq("doc_id"))
      .trackPersist()
    val g = Rnk.globalRank(scored, Seq(col("quality_score"), col("doc_id")),
      "grank").trackPersist()
    val tot = g.agg(count(lit(1)).as("n"))
    val targets = broadcast(tot.select(
        explode(array((1 to QnormB).map(lit): _*)).as("gb"), col("n"))
      .withColumn("target", expr(s"CAST(gb AS BIGINT) * n div $QnormB")))
    val edges = broadcast(g.join(targets, col("grank") === col("target"))
      .select(col("gb").cast("long").as("gb"),
        col("quality_score").as("norm_score")))
    val s = Rnk.globalRank(scored,
      Seq(col("source"), col("quality_score"), col("doc_id")), "srank")
    val srcBase = s.groupBy(col("source"))
      .agg(min(col("srank")).as("r0"), count(lit(1)).as("n_src"))
    s.join(broadcast(srcBase), Seq("source"))
      .withColumn("src_bucket",
        expr(s"(srank - r0) * $QnormB div n_src"))
      .join(edges, col("gb") === col("src_bucket") + 1L)
      .select(col("doc_id"), col("source"), col("quality_score"),
        col("src_bucket"), col("norm_score"))
  }

  val qualityQuantileNormOracle: String = {
    val en = langProfiles.toMap.apply("en").map("'" + _ + "'").mkString(",")
    s"""WITH t AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
       |  FROM documents),
       |m AS (
       |  SELECT doc_id,
       |         len(list_distinct(tk)) * 1.0 / len(tk) AS uniq,
       |         least(len(tk) * 1.0 / 100.0, 1.0) AS lens,
       |         len(list_filter(tk, x -> list_contains([$en], x))) * 1.0 / len(tk) AS stp
       |  FROM t),
       |scored AS (
       |  SELECT m.doc_id, d.source,
       |         round(uniq * 0.4 + lens * 0.3 + stp * 0.3, 6) AS q
       |  FROM m JOIN documents d ON m.doc_id = d.doc_id),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM scored),
       |gr AS (SELECT doc_id, q,
       |              CAST(row_number() OVER (ORDER BY q, doc_id) AS BIGINT) AS grank
       |       FROM scored),
       |targets AS (
       |  SELECT CAST(unnest(generate_series(1, $QnormB)) AS BIGINT) AS gb, n
       |  FROM tot),
       |edges AS (
       |  SELECT t.gb, g.q AS norm_score
       |  FROM targets t JOIN gr g ON g.grank = t.gb * t.n // $QnormB),
       |sr AS (SELECT doc_id, source, q,
       |              CAST(row_number() OVER (PARTITION BY source ORDER BY q, doc_id) AS BIGINT) AS srank,
       |              CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_src
       |       FROM scored)
       |SELECT sr.doc_id, sr.source, sr.q AS quality_score,
       |       CAST((srank - 1) * $QnormB // n_src AS BIGINT) AS src_bucket,
       |       e.norm_score
       |FROM sr JOIN edges e ON e.gb = (srank - 1) * $QnormB // n_src + 1
       |""".stripMargin
  }

  /** FLESCH READING-EASE per document — the readability member of the
    * quality-signal family (a corpus whose reading ease collapses
    * between snapshots has drifted toward boilerplate or word salad):
    * `206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)`, with
    * syllables approximated by vowel-group count (the standard
    * dictionary-free proxy) and sentences by terminal-punctuation count
    * (floored at 1 — fixture prose is often unpunctuated). Counting is
    * regexp_extract_all (codegen'd, dialect-portable patterns); the
    * score is one shared-structure IEEE expression over exact integer
    * counts. One scan, no shuffle. */
  def readability(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"),
        size(toks).cast("long").as("n_words"),
        greatest(lit(1L),
          size(regexp_extract_all(col("text"), lit("[.!?]"), lit(0)))
            .cast("long")).as("n_sentences"),
        size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"), lit(0)))
          .cast("long").as("n_syllables"))
      .withColumn("flesch",
        round(lit(206.835) -
          lit(1.015) * (col("n_words").cast("double") /
            col("n_sentences").cast("double")) -
          lit(84.6) * (col("n_syllables").cast("double") /
            col("n_words").cast("double")), 6))

  val readabilityOracle: String =
    """WITH t AS (
      |  SELECT doc_id,
      |         CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS n_words,
      |         greatest(CAST(1 AS BIGINT),
      |                  CAST(len(regexp_extract_all(text, '[.!?]')) AS BIGINT)) AS n_sentences,
      |         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syllables
      |  FROM documents)
      |SELECT doc_id, n_words, n_sentences, n_syllables,
      |       round(206.835 - 1.015 * (n_words * 1.0 / n_sentences)
      |                     - 84.6 * (n_syllables * 1.0 / n_words), 6) AS flesch
      |FROM t
      |""".stripMargin

  // ---------------------------------------------------------------- vocab
  /** Corpus vocabulary: per token, document frequency, total occurrence
    * count, and frequency rank. One explode + one hash aggregation; the
    * rank window runs over the (bounded, dimension-sized) vocabulary,
    * not the corpus. */
  def vocab(spark: SparkSession, dir: String): DataFrame =
    // the frequency rank is a DISTRIBUTED global row_number
    // (Rnk.globalRank: range-partition + local rank + broadcast offsets)
    // — a plain `row_number() OVER (ORDER BY ...)` would pull the whole
    // vocabulary into one WindowExec partition, the exact shape that
    // stops scaling when the vocabulary does
    Rnk.globalRank(
      docs(spark, dir)
        .select(col("doc_id"), explode(toks).as("token"))
        .groupBy(col("token"))
        .agg(countDistinct(col("doc_id")).as("doc_freq"),
             count(lit(1)).as("total_count")),
      Seq(col("total_count").desc, col("token")))

  val vocabOracle: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
      |  FROM documents),
      |agg AS (
      |  SELECT token,
      |         CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq,
      |         CAST(count(*) AS BIGINT) AS total_count
      |  FROM tok GROUP BY 1)
      |SELECT token, doc_freq, total_count,
      |       CAST(row_number() OVER (ORDER BY total_count DESC, token) AS BIGINT) AS rank
      |FROM agg
      |""".stripMargin

  /** Vocabulary COVERAGE CURVE: the fraction of total token mass covered
    * by the top-k most frequent tokens, for k ∈ [[CoverageKs]] — the
    * measurement that sizes a tokenizer vocabulary (or a
    * stop-list/cache): "32k types cover 97% of tokens" is this query's
    * output. Builds on [[vocab]]'s DISTRIBUTED frequency rank
    * (Rnk.globalRank — no single-partition window at any vocabulary
    * size); the curve itself is ONE conditional-sum aggregate over the
    * ranked vocabulary and a 3-row projection. Integer arithmetic
    * (parts-per-million div) end to end. */
  val CoverageKs: Seq[Long] = Seq(100L, 1000L, 10000L)

  def vocabCoverage(spark: SparkSession, dir: String): DataFrame = {
    val ranked = vocab(spark, dir)
    val aggs =
      CoverageKs.map(k =>
        sum(when(col("rank") <= k, col("total_count")).otherwise(0L))
          .as(s"c_$k")) :+
      max(col("rank")).as("vocab_size")
    val m = ranked.agg(sum(col("total_count")).as("grand"), aggs: _*)
    val rows = CoverageKs.map { k =>
      struct(lit(k).as("top_k"),
        least(lit(k), col("vocab_size")).as("tokens_in_vocab"),
        col(s"c_$k").as("covered_count"),
        col("grand").as("total_count"),
        expr(s"CAST(c_$k * 1000000 div grand AS BIGINT)")
          .as("coverage_ppm"))
    }
    m.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  val vocabCoverageOracle: String = {
    val branches = CoverageKs.map { k =>
      s"""SELECT CAST($k AS BIGINT) AS top_k,
         |       least($k, vocab_size) AS tokens_in_vocab,
         |       c_$k AS covered_count, grand AS total_count,
         |       CAST(c_$k * 1000000 // grand AS BIGINT) AS coverage_ppm
         |FROM m""".stripMargin
    }
    val sums = CoverageKs.map(k =>
      s"CAST(sum(CASE WHEN rank <= $k THEN total_count ELSE 0 END) AS BIGINT) AS c_$k")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
       |  FROM documents),
       |agg AS (
       |  SELECT token, CAST(count(*) AS BIGINT) AS total_count
       |  FROM tok GROUP BY 1),
       |ranked AS (
       |  SELECT total_count,
       |         row_number() OVER (ORDER BY total_count DESC, token) AS rank
       |  FROM agg),
       |m AS (
       |  SELECT CAST(sum(total_count) AS BIGINT) AS grand,
       |         CAST(max(rank) AS BIGINT) AS vocab_size,
       |         ${sums.mkString(",\n         ")}
       |  FROM ranked)
       |${branches.mkString("\nUNION ALL\n")}
       |""".stripMargin
  }

  // ---------------------------------------------------------- OOV coverage
  private val VocabMinCount = 50L

  /** Vocabulary coverage / out-of-vocabulary rate per document: the
    * fraction of a document's tokens NOT in the reference vocabulary
    * (corpus tokens with total count ≥ [[VocabMinCount]]) — the
    * tokenizer-coverage proxy that predicts how much of a document a
    * fixed-vocab tokenizer will shatter into bytes/unknowns. A feed
    * whose OOV rate jumps between snapshots has drifted (new language,
    * encoding rot, spam).
    *
    * Shape: one explode + vocabulary hash-agg (count-thresholded — no
    * rank needed, so no total order anywhere), a broadcast-sized
    * LEFT join probe of the token stream against it, one per-doc
    * aggregate. The rate is exact micro-units via integer round-half-up
    * (same (2a+n) div 2n idiom as [[unigramNll]]). */
  def oovCoverage(spark: SparkSession, dir: String): DataFrame = {
    val tok = docs(spark, dir).select(col("doc_id"), explode(toks).as("token"))
      .trackPersist() // two consumers: vocab build + probe
    val vocab = tok.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= VocabMinCount)
      .select(col("token"))
    tok.join(broadcast(vocab.withColumn("__in", lit(1))), Seq("token"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
           sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        (expr("(2 * n_oov * 1000000 + n_tokens) div (2 * n_tokens)")
          .cast("double") / 1e6).as("oov_rate"))
  }

  val oovOracle: String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
       |  FROM documents),
       |vocab AS (
       |  SELECT token FROM tok GROUP BY 1 HAVING count(*) >= $VocabMinCount),
       |probe AS (
       |  SELECT tok.doc_id,
       |         CASE WHEN vocab.token IS NULL THEN 1 ELSE 0 END AS oov
       |  FROM tok LEFT JOIN vocab ON tok.token = vocab.token)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |       CAST(sum(oov) AS BIGINT) AS n_oov,
       |       CAST((2 * sum(oov) * 1000000 + count(*)) // (2 * count(*)) AS DOUBLE) / 1e6
       |         AS oov_rate
       |FROM probe GROUP BY 1
       |""".stripMargin

  // ---------------------------------------------------------------- tf-idf
  /** Top-3 characteristic terms per document by tf-idf
    * (tf × ln(N / df)). Two aggregations — term frequencies per (doc,
    * token) and document frequencies per token — joined and ranked per
    * doc. The df table is vocabulary-sized, so its join side broadcasts;
    * the heavy exchange is the (doc, token) rollup, which map-side
    * combines. */
  def tfidf(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val n = d.count() // corpus size: one tiny action, a constant in the plan
    val tf = d.select(col("doc_id"), explode(toks).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("token"))
    tf.join(broadcast(df), Seq("token"))
      .withColumn("tfidf", round(col("tf") * log(lit(n.toDouble) / col("df")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
              col("tfidf"), col("rank"))
  }

  val tfidfOracle: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
      |  FROM documents),
      |tf AS (
      |  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
      |  FROM tok GROUP BY 1, 2),
      |df AS (
      |  SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      |n AS (SELECT count(*) AS n FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.token, tf.tf, df.df,
      |         round(tf.tf * ln(n.n * 1.0 / df.df), 6) AS tfidf
      |  FROM tf JOIN df USING (token), n),
      |ranked AS (
      |  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
      |              ORDER BY tfidf DESC, token) AS INT) AS rank
      |  FROM scored)
      |SELECT doc_id, token, tf, df, tfidf, rank FROM ranked WHERE rank <= 3
      |""".stripMargin

  // ------------------------------------------------------ unigram logprob
  /** Unigram negative log-likelihood per document — the cheap stand-in
    * for the LM-perplexity quality filter (CCNet-style): documents whose
    * tokens are improbable under the corpus unigram distribution score
    * high (gibberish, boilerplate, wrong-language).
    *
    * nll(doc) = −(1/n) Σ_tokens ln p̂(token), with add-one smoothing over
    * the corpus vocabulary. Two aggregations: the unigram table (bounded
    * by vocabulary, broadcast to the scorer) and the per-doc average. The
    * per-token logprob is rounded to 6 dp and summed as exact integer
    * MICRO-NATS, and the average is integer round-half-up
    * ((2a + n) div 2n) — `round(sum/n, 6)` on doubles flaps by one ulp
    * between engines when the quotient lands on a decimal midpoint
    * (observed once in 5000 docs at sf0.1). */
  def unigramNll(spark: SparkSession, dir: String): DataFrame = {
    // the exploded token stream feeds three consumers (corpus count,
    // unigram table, scoring join) — persist it so the tokenize+explode
    // pass runs once, and persist the vocabulary-sized unigram table
    // across its count and the broadcast probe
    val tok = docs(spark, dir).select(col("doc_id"), explode(toks).as("token"))
      .trackPersist()
    val total = tok.count() // also materializes the cache
    val uni = tok.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .trackPersist()
    val v = uni.count() // vocabulary size; materializes uni
    val scored = tok.join(broadcast(uni), Seq("token"))
      .withColumn("lp_micro",
        // explicit round-to-integer before the cast: Spark's double->long
        // cast truncates while DuckDB's rounds, and -3.402035 stored as
        // -3.4020349999... * -1e6 is a fraction away from its integer
        round(round(log((col("cnt") + 1).cast("double") / lit((total + v).toDouble)), 6)
          * -1000000d, 0).cast("long"))
    scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("lp_micro")).as("s"))
      .select(col("doc_id"), col("n_tokens"),
              (expr("(2 * s + n_tokens) div (2 * n_tokens)").cast("double") / 1e6)
                .as("nll"))
  }

  val unigramNllOracle: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
      |  FROM documents),
      |uni AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY 1),
      |consts AS (SELECT (SELECT count(*) FROM tok) AS total,
      |                  (SELECT count(*) FROM uni) AS v),
      |scored AS (
      |  SELECT tok.doc_id,
      |         CAST(round(round(ln(CAST(uni.cnt + 1 AS DOUBLE) / (consts.total + consts.v)), 6)
      |              * -1000000, 0) AS BIGINT) AS lp_micro
      |  FROM tok JOIN uni USING (token), consts)
      |SELECT doc_id, n_tokens, CAST((2 * s + n_tokens) // (2 * n_tokens) AS DOUBLE) / 1e6 AS nll
      |FROM (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |             CAST(sum(lp_micro) AS BIGINT) AS s
      |      FROM scored GROUP BY 1)
      |""".stripMargin

  /** Bigram negative log-likelihood per document — one LM order up from
    * [[unigramNll]]: each transition scores
    * `−ln p̂(cur | prev) = −ln ((c(prev,cur)+1)/(c(prev)+V))` with
    * add-one smoothing, so repeated-phrase boilerplate (high bigram
    * probability) separates from fluent-but-novel text in a way the
    * unigram score cannot see.
    *
    * Shapes: the bigram stream is an order-local array expansion (no
    * position self-join); the bigram count table is joined back
    * CO-PARTITIONED on (prev, cur) — it is vocab²-bounded, too big to
    * assume broadcastable — while the context-count table is
    * vocab-bounded and broadcasts, exactly like the unigram table in
    * [[unigramNll]]. Per-transition logprobs round to 6 dp and fold as
    * exact integer micro-nats (the repo's log discipline), and the
    * per-doc average is integer round-half-up. */
  def bigramNll(spark: SparkSession, dir: String): DataFrame = {
    val t = docs(spark, dir).withColumn("tk", toks)
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"), col("tk"))
      .trackPersist()
    val bg = t.select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(tk) - 2), i -> struct(tk[i] AS prev, tk[i + 1] AS cur))"))
        .as("b"))
      .select(col("doc_id"), col("b.prev").as("prev"), col("b.cur").as("cur"))
      .trackPersist()
    val v = t.select(explode(col("tk")).as("token")).distinct().count()
    val big = bg.groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("bcnt"))
    val ctx = bg.groupBy(col("prev")).agg(count(lit(1)).as("ccnt"))
    bg.join(big, Seq("prev", "cur"))
      .join(broadcast(ctx), Seq("prev"))
      .withColumn("lp_micro",
        round(round(log((col("bcnt") + 1).cast("double") /
                        (col("ccnt") + lit(v.toDouble))), 6)
          * -1000000d, 0).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp_micro")).as("s"))
      .select(col("doc_id"), col("n_bigrams"),
              (expr("(2 * s + n_bigrams) div (2 * n_bigrams)").cast("double") / 1e6)
                .as("nll"))
  }

  val bigramNllOracle: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
      |  FROM documents),
      |f AS (SELECT doc_id, tk FROM t WHERE len(tk) >= 2),
      |b AS (SELECT doc_id, tk[i] AS prev, tk[i + 1] AS cur
      |      FROM f, unnest(generate_series(1, len(tk) - 1)) u(i)),
      |big AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS bcnt
      |        FROM b GROUP BY 1, 2),
      |ctx AS (SELECT prev, CAST(count(*) AS BIGINT) AS ccnt FROM b GROUP BY 1),
      |consts AS (
      |  SELECT count(DISTINCT token) AS v
      |  FROM (SELECT unnest(tk) AS token FROM f)),
      |scored AS (
      |  SELECT b.doc_id,
      |         CAST(round(round(ln(CAST(big.bcnt + 1 AS DOUBLE) /
      |                             (ctx.ccnt + consts.v)), 6)
      |              * -1000000, 0) AS BIGINT) AS lp_micro
      |  FROM b JOIN big USING (prev, cur) JOIN ctx USING (prev), consts)
      |SELECT doc_id, n_bigrams,
      |       CAST((2 * s + n_bigrams) // (2 * n_bigrams) AS DOUBLE) / 1e6 AS nll
      |FROM (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      |             CAST(sum(lp_micro) AS BIGINT) AS s
      |      FROM scored GROUP BY 1)
      |""".stripMargin

  private val NllRates = Seq(1.0, 0.5, 0.25, 0.10, 0.05)

  /** Perplexity-bucketed corpus sampling (CCNet's selection step): rank
    * documents by unigram NLL, split into quintiles, keep each quintile
    * at a tapering rate ([[NllRates]]: the most in-distribution fifth
    * fully, the tail at 5%) via the deterministic md5-bucket filter.
    * This is the composition that turns the NLL *score* into an actual
    * training-mix *selection*.
    *
    * The quintile split is DISTRIBUTED: [[Rnk.globalRank]] assigns the
    * total-order rank without a single-partition window, and the ntile
    * bucket is then recovered from (rank, n) in closed-form integer
    * arithmetic — SQL ntile semantics exactly (the first `n mod k`
    * buckets take one extra row), so the oracle keeps its plain `ntile`
    * while the engine never funnels the corpus through one task. */
  def nllBucketSample(spark: SparkSession, dir: String): DataFrame = {
    val k = NllRates.size
    val ranked = Rnk.globalRank(unigramNll(spark, dir),
      Seq(col("nll").asc, col("doc_id").asc), rankCol = "__r")
    val n = ranked.agg(max(col("__r")).as("__n"))
    // ntile semantics from (rank, n): q = n div k rows per bucket, the
    // first rem = n mod k buckets hold q+1
    val bucket = expr(
      s"""CAST(CASE WHEN __r <= ((__n div $k) + 1) * (__n % $k)
         |  THEN (__r - 1) div ((__n div $k) + 1) + 1
         |  ELSE (__n % $k) +
         |       (__r - ((__n div $k) + 1) * (__n % $k) - 1) div (__n div $k) + 1
         |END AS INT)""".stripMargin)
    val rate = NllRates.zipWithIndex.foldLeft(lit(0.0)) { case (acc, (r, i)) =>
      when(col("nll_bucket") === i + 1, lit(r)).otherwise(acc)
    }
    ranked.crossJoin(broadcast(n))
      .withColumn("nll_bucket", bucket)
      .withColumn("rate", rate)
      .filter(graft.ops.Sampling.bucket(col("doc_id"), "nllsample") <
        floor(col("rate") * 10000L).cast("long"))
      .select(col("doc_id"), col("nll_bucket"), col("nll"))
  }

  val nllBucketSampleOracle: String = {
    val rateCase = NllRates.zipWithIndex
      .map { case (r, i) => s"WHEN ${i + 1} THEN $r" }.mkString(" ")
    s"""WITH nll AS ($unigramNllOracle),
       |b AS (
       |  SELECT doc_id, nll,
       |         ntile(${NllRates.size}) OVER (ORDER BY nll ASC, doc_id ASC) AS nll_bucket
       |  FROM nll),
       |r AS (
       |  SELECT *, CASE nll_bucket $rateCase END AS rate FROM b)
       |SELECT doc_id, CAST(nll_bucket AS INT) AS nll_bucket, nll
       |FROM r
       |WHERE CAST(CAST(('0x' || substr(md5('nllsample:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT) % 10000
       |      < CAST(floor(rate * 10000) AS BIGINT)
       |""".stripMargin
  }

  // --------------------------------------------------------- gopher gates
  /** Gopher-style per-document quality gates (Rae et al. 2021's rule
    * family, adapted to this corpus): token-count bounds, mean-token-length
    * bounds, minimum stopword density, and a 3-gram repetition ceiling
    * (1 − distinct/total 3-grams — boilerplate and looped text repeat).
    * One scan, one projection; each gate is reported separately so
    * downstream can tune the AND. */
  def gopher(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val en = langProfiles.toMap.apply("en")
    val n = size(toks)
    val meanLen = tokenLenSum(toks).cast("double") / n
    val stop = vocabRatio(toks, en)
    val nShingles = size(call_function(
      graft.functions.GraftFunctions.ShingleName, col("text"), lit(3)))
    val rep = when(n >= 3,
      lit(1.0) - nShingles.cast("double") / (n - 2)).otherwise(lit(0.0))
    docs(spark, dir).select(
      col("doc_id"),
      n.as("n_tokens"),
      round(meanLen, 6).as("mean_token_len"),
      round(stop, 6).as("stopword_ratio"),
      round(rep, 6).as("rep3_ratio"),
      (n >= 50 && n <= 100000).as("pass_len"),
      (meanLen >= 3.0 && meanLen <= 10.0).as("pass_word_len"),
      (stop >= 0.06).as("pass_stopwords"),
      (rep <= 0.2).as("pass_repetition"))
      .withColumn("keep",
        col("pass_len") && col("pass_word_len") &&
          col("pass_stopwords") && col("pass_repetition"))
  }

  val gopherOracle: String = {
    val en = langProfiles.toMap.apply("en").map("'" + _ + "'").mkString(",")
    s"""WITH t AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
       |  FROM documents),
       |m AS (
       |  SELECT doc_id,
       |         len(tk) AS n,
       |         list_sum(list_transform(tk, x -> len(x))) * 1.0 / len(tk) AS ml,
       |         len(list_filter(tk, x -> list_contains([$en], x))) * 1.0 / len(tk) AS stp,
       |         CASE WHEN len(tk) >= 3 THEN
       |           1.0 - len(list_distinct(list_transform(
       |                   generate_series(1, len(tk) - 2),
       |                   i -> array_to_string(list_slice(tk, i, i + 2), ' '))))
       |                 * 1.0 / (len(tk) - 2)
       |         ELSE 0.0 END AS rep
       |  FROM t)
       |SELECT doc_id,
       |       CAST(n AS INT) AS n_tokens,
       |       round(ml, 6) AS mean_token_len,
       |       round(stp, 6) AS stopword_ratio,
       |       round(rep, 6) AS rep3_ratio,
       |       n >= 50 AND n <= 100000 AS pass_len,
       |       ml >= 3.0 AND ml <= 10.0 AS pass_word_len,
       |       stp >= 0.06 AS pass_stopwords,
       |       rep <= 0.2 AS pass_repetition,
       |       (n >= 50 AND n <= 100000) AND (ml >= 3.0 AND ml <= 10.0)
       |         AND stp >= 0.06 AND rep <= 0.2 AS keep
       |FROM m
       |""".stripMargin
  }

  // --------------------------------------------------------- boilerplate
  private val BoilerN = 5
  // 3, not 10: this corpus's 5-gram doc-frequency tops out at 4 even at
  // sf0.1, so a floor of 10 made the operator degenerate (always-empty
  // output = a correctness gate that can't fail). A floor of 3 keeps the
  // phrase list selective (74 rows at sf0.01, 550 at sf0.1) while
  // exercising the whole two-pass plan
  private val BoilerMinDocs = 3

  /** Corpus-level boilerplate phrases: 5-gram phrases (distinct per doc)
    * that appear in ≥ [[BoilerMinDocs]] documents — the phrase list a
    * C4-style "remove repeated lines" pass strips.
    *
    * Two-pass hash-prefilter plan. Shuffling every phrase STRING
    * corpus-wide (the naive explode → groupBy) moves ~30 bytes × (tokens
    * per doc) × corpus — the single most expensive shuffle in the text
    * suite (measured 32 s at sf0.1, dominating the whole bench). Instead:
    *
    *  1. Doc-frequency over the 60-bit PHRASE HASHES from the native
    *     [[graft.functions.ShingleHash]] kernel — the corpus-wide explode
    *     shuffles 8-byte longs, and the candidate set (hashes in ≥
    *     MinDocs docs) is boilerplate-sized: tiny, broadcastable.
    *  2. Phrase-string recovery ONLY where needed: docs holding ≥ 1
    *     candidate hash survive a broadcast semi-join, and only their
    *     phrases are built, hashed (the same md5-prefix derivation the
    *     kernel uses), semi-joined again, and counted exactly.
    *
    * The hash prefilter is conservative (a hash's doc count ≥ any of its
    * phrases' doc counts, so no false negatives); 60-bit collisions are
    * removed by the final per-string HAVING. Results are identical to the
    * one-pass formulation — the oracle is unchanged. */
  def boilerplate(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    import graft.functions.GraftFunctions.ShingleName
    // hash arrays feed the candidate aggregation AND the doc prefilter —
    // persist the kernel output (Caches-tracked) so the scan runs once
    val hashed = docs(spark, dir)
      .select(col("doc_id"),
              call_function(ShingleName, col("text"), lit(BoilerN)).as("hs"))
      .trackPersist()
    val candidates = hashed.select(explode(col("hs")).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("hash_freq"))
      .filter(col("hash_freq") >= BoilerMinDocs)
      .select(col("h"))
    val hitDocs = hashed.select(col("doc_id"), explode(col("hs")).as("h"))
      .join(broadcast(candidates), Seq("h"), "left_semi")
      .select(col("doc_id")).distinct()
    docs(spark, dir)
      .join(hitDocs, Seq("doc_id"), "left_semi")
      .select(explode(array_distinct(phraseNgrams(toks, BoilerN))).as("phrase"))
      // same 60-bit hash the kernel computes: top 15 hex digits of md5
      .withColumn("h",
        conv(substring(md5(col("phrase")), 1, 15), 16, 10).cast("long"))
      .join(broadcast(candidates), Seq("h"), "left_semi")
      .groupBy(col("phrase"))
      .agg(count(lit(1)).as("doc_freq"))
      .filter(col("doc_freq") >= BoilerMinDocs)
  }

  /** k-token phrase strings from a token array (empty when < k tokens). */
  private def phraseNgrams(tk: Column, k: Int): Column =
    when(size(tk) >= k,
      transform(sequence(lit(0), size(tk) - k),
        i => array_join(slice(tk, i + 1, lit(k)), " ")))
      .otherwise(array().cast("array<string>"))

  val boilerplateOracle: String =
    s"""WITH t AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
       |  FROM documents),
       |p AS (
       |  SELECT doc_id,
       |         unnest(list_distinct(CASE WHEN len(tk) >= $BoilerN THEN
       |           list_transform(generate_series(1, len(tk) - ${BoilerN - 1}),
       |                          i -> array_to_string(list_slice(tk, i, i + ${BoilerN - 1}), ' '))
       |           ELSE [] END)) AS phrase
       |  FROM t)
       |SELECT phrase, CAST(count(*) AS BIGINT) AS doc_freq
       |FROM p GROUP BY 1 HAVING count(*) >= $BoilerMinDocs
       |""".stripMargin

  // ---------------------------------------------------------- fingerprint
  /** Content fingerprints: an exact fingerprint (md5 of the normalized
    * token stream) and a shingle fingerprint (minimum 60-bit-hashed
    * 3-shingle — one minhash component, stable under small edits;
    * computed by the native [[graft.functions.ShingleHash]] kernel). */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    docs(spark, dir).select(
      col("doc_id"),
      md5(concat_ws(" ", toks)).as("exact_fp"),
      array_min(call_function(graft.functions.GraftFunctions.ShingleName,
        col("text"), lit(3))).as("shingle_fp"))
  }

  val fingerprintOracle: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |         CASE WHEN len(tk) >= 3 THEN list_distinct(
      |           list_transform(generate_series(1, len(tk) - 2),
      |                          i -> array_to_string(list_slice(tk, i, i + 2), ' ')))
      |              ELSE [] END AS sgl,
      |         tk
      |  FROM t)
      |SELECT doc_id,
      |       md5(array_to_string(tk, ' ')) AS exact_fp,
      |       list_min(list_transform(sgl,
      |         s -> CAST(CAST(('0x' || substr(md5(s), 1, 15)) AS UBIGINT) AS BIGINT))) AS shingle_fp
      |FROM sh
      |""".stripMargin

  /** Unicode normalization pass: NFC-compose, collapse whitespace runs,
    * trim, and accent-fold — the canonical first stage of a mixed-source
    * corpus pipeline (without it, fingerprints and shingles disagree on
    * visually identical strings in different composition forms). Runs on
    * native expressions ([[graft.functions.NfcNormalize]] /
    * [[graft.functions.StripAccents]]); DuckDB evaluates the same
    * semantics natively (`nfc_normalize`, `strip_accents`), so the query
    * is hash-gated. Shuffle-free single scan; `changed` flags rows the
    * normalization actually rewrote.
    *
    * The fixture corpus is pure ASCII (where normalization is the
    * identity), so the query DIRTIES every row first — appends a
    * DECOMPOSED accent ("e" + U+0301) and doubled whitespace — making
    * the oracle verify a real composition rewrite on every row, not a
    * pass-through (same pattern as the image-decode query: synthesize a
    * genuine payload, then prove the transform on it). Unicode edge
    * semantics are additionally spec-proven in TextNormSpec. */
  def normalize(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    import graft.functions.GraftFunctions.{NfcName, StripAccentsName}
    // "  cafe" + combining acute U+0301 (spelled as an escape so the
    // source encoding cannot pre-compose it): ws-collapse + NFC both
    // have real work on every row
    val dirty = concat(col("text"), lit("  cafe\u0301"))
    Tables.documents(spark, dir)
      .withColumn("dirty", dirty)
      .withColumn("norm",
        trim(regexp_replace(call_function(NfcName, col("dirty")), "\\s+", " ")))
      .select(col("doc_id"), col("norm"),
        call_function(StripAccentsName, col("norm")).as("ascii_text"),
        (col("norm") =!= col("dirty")).cast("int").as("changed"))
  }

  val normalizeOracle: String =
    """WITH t AS (
      |  SELECT doc_id, text || '  cafe' || chr(769) AS dirty
      |  FROM documents),
      |n AS (
      |  SELECT doc_id, dirty,
      |         trim(regexp_replace(nfc_normalize(dirty), '\s+', ' ', 'g')) AS norm
      |  FROM t)
      |SELECT doc_id, norm, strip_accents(norm) AS ascii_text,
      |       CAST(norm <> dirty AS INT) AS changed
      |FROM n
      |""".stripMargin

  /** Top-3 token bigrams PER LANGUAGE by exact count — the per-dimension
    * frequent-pattern table (stopword candidates, boilerplate phrases,
    * per-language fingerprints) as a composition of the grouped
    * heavy-hitter operator over the exploded bigram stream: sound
    * per-group Misra-Gries nomination, exact verification, no per-group
    * full-keyspace shuffle. The k-th heaviest bigram per language must
    * clear N_lang/m for the guarantee (m = 1024; this corpus's per-lang
    * bigram vocabularies sit entirely under m, so nomination is
    * lossless here). */
  def topNgramsByLang(spark: SparkSession, dir: String): DataFrame = {
    val bg = docs(spark, dir)
      .withColumn("tk", tokens(col("text")))
      .filter(size(col("tk")) >= 2)
      .select(col("lang"), explode(expr(
        "transform(sequence(0, size(tk) - 2), i -> concat(tk[i], ' ', tk[i + 1]))"))
        .as("bg"))
    Sketches.groupedHeavyHitters(bg, col("lang"), col("bg"), k = 3)
      .select(col("grp").as("lang"), col("key").as("ngram"),
              col("cnt"), col("rank"))
  }

  val topNgramsByLangOracle: String =
    """WITH t AS (SELECT lang, string_split_regex(trim(lower(text)), '\s+') AS tk
      |           FROM documents),
      |b AS (SELECT lang, tk[i] || ' ' || tk[i + 1] AS bg
      |      FROM t, unnest(generate_series(1, len(tk) - 1)) u(i)
      |      WHERE len(tk) >= 2),
      |c AS (SELECT CAST(lang AS VARCHAR) AS lang, bg, count(*) AS cnt
      |      FROM b GROUP BY 1, 2),
      |r AS (SELECT lang, bg AS ngram, cnt,
      |             row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, bg) AS rank
      |      FROM c)
      |SELECT lang, ngram, CAST(cnt AS BIGINT) AS cnt, CAST(rank AS INT) AS rank
      |FROM r WHERE rank <= 3
      |""".stripMargin

  // ------------------------------------------------------ n-gram diversity

  /** Per-SOURCE n-gram diversity: of all (doc, shingle) pairs a source
    * contributes (3-gram shingles, per-doc distinct — the same shingle
    * universe the dedup family uses), how many shingles are distinct
    * across the source, and what fraction is cross-document repetition.
    * A templated / boilerplate-heavy source (mirrored docs, generated
    * pages, scraped nav chrome) shows a high `repetition_ppm` long before
    * pairwise dedup runs — this is the cheap corpus-health screen that
    * decides which sources are worth the pairwise pass, and it
    * complements [[TextPrep.sourceDrift]] (token-distribution drift) with
    * a within-source redundancy signal.
    *
    * Plan: ONE shingle-explode scan carrying `source` through the
    * projection (no doc-dimension join), then one per-source aggregate
    * with an exact distinct. At 100 TB the exact distinct is the
    * bottleneck (it shuffles the (source, shingle) universe once);
    * swapping `count_distinct` for `approx_count_distinct` keeps the
    * identical single-scan shape with fixed-size HLL state — this exact
    * formulation is the oracle-checkable baseline that approximation is
    * validated against (same discipline as [[Contamination]]'s Bloom
    * path). Integer ppm, so the result hash-matches any engine. */
  def ngramDiversity(spark: SparkSession, dir: String): DataFrame =
    ngramDiversityOf(spark, docs(spark, dir))

  private[graft] def ngramDiversityOf(spark: SparkSession, d: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val sh = d.select(
      col("source"),
      explode(call_function(graft.functions.GraftFunctions.ShingleName,
        col("text"), lit(Dedup.ShingleN))).as("h"))
    sh.groupBy(col("source"))
      .agg(count(lit(1)).as("n_shingles"),
           count_distinct(col("h")).as("n_distinct"))
      .withColumn("repetition_ppm",
        expr("(n_shingles - n_distinct) * 1000000 div n_shingles"))
  }

  /** The 100 TB path for [[ngramDiversity]]: identical single-scan shape
    * with `approx_count_distinct` (HLL++, fixed-size mergeable state) in
    * place of the exact distinct — per-source state is KB-sized however
    * many shingles a source has, so the aggregate never shuffles the
    * (source, shingle) universe. Standard-error `rsd` defaults to Spark's
    * 5%; the spec bounds the observed error against the exact baseline.
    * Not oracle-checked (HLL layouts are engine-specific) — the exact
    * twin is the gate, this is the documented-and-TESTED approximation. */
  private[graft] def ngramDiversityApproxOf(spark: SparkSession,
                                            d: DataFrame,
                                            rsd: Double = 0.05): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val sh = d.select(
      col("source"),
      explode(call_function(graft.functions.GraftFunctions.ShingleName,
        col("text"), lit(Dedup.ShingleN))).as("h"))
    sh.groupBy(col("source"))
      .agg(count(lit(1)).as("n_shingles"),
           approx_count_distinct(col("h"), rsd).as("n_distinct_approx"))
  }

  val ngramDiversityOracle: String =
    s"""WITH ${Dedup.shingleCte},
       |ex AS (SELECT d.source, unnest(sh.sgl) AS h
       |       FROM sh JOIN documents d USING (doc_id))
       |SELECT source,
       |       CAST(count(*) AS BIGINT) AS n_shingles,
       |       CAST(count(DISTINCT h) AS BIGINT) AS n_distinct,
       |       CAST((count(*) - count(DISTINCT h)) * 1000000 // count(*) AS BIGINT)
       |         AS repetition_ppm
       |FROM ex GROUP BY 1
       |""".stripMargin

  // ------------------------------------------------ JSON-LD extraction

  /** Structured-data mining from HTML — the schema.org harvest behind
    * product/recipe/article datasets: documents embed
    * `<script type="application/ld+json">` blocks, and the op extracts
    * every block (regexp_extract_all over the raw markup), explodes
    * them in order, and pulls typed fields out with get_json_object
    * (`@type`, `name`, and `price` for Products). All codegen'd column
    * expressions over one scan — zero UDFs, no shuffle, linear at any
    * corpus size. The fixture varies block count per doc (none / one /
    * two) so absent-data and multi-block paths are both gated. */
  def jsonLdQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    def block(t: Column): Column = {
      val fid = col("doc_id") * 4 + t
      val typ = element_at(
        array(lit("Product"), lit("Article"), lit("Recipe")),
        ((col("doc_id") + t) % 3 + 1).cast("int"))
      concat(lit("<script type=\"application/ld+json\">"),
        lit("{\"@type\": \""), typ, lit("\", \"name\": \"Item"),
        fid.cast("string"),
        when(typ === "Product",
          concat(lit("\", \"price\": "), (fid % 100).cast("string"),
            lit("}")))
          .otherwise(lit("\"}")),
        lit("</script>"))
    }
    val html = docs.withColumn("html", concat(
      lit("<html><head><title>t</title>"),
      when(col("doc_id") % 5 === 3, lit("")).otherwise(block(lit(0))),
      when(col("doc_id") % 5 =!= 3 && col("doc_id") % 7 === 0,
        block(lit(1))).otherwise(lit("")),
      lit("</head><body><p>body</p></body></html>")))
    html
      .select(col("doc_id"), posexplode(regexp_extract_all(col("html"),
        lit("<script type=\"application/ld\\+json\">(.*?)</script>"),
        lit(1))))
      .select(col("doc_id"), col("pos").cast("int").as("block_index"),
        get_json_object(col("col"), "$['@type']").as("item_type"),
        get_json_object(col("col"), "$.name").as("name"),
        get_json_object(col("col"), "$.price").cast("int").as("price"))
  }

  /** HTML `<table>` extraction over ANY corpus column: one output row
    * per table row, keeping every input column and adding
    * (table_idx, row_idx, n_cells, row_text) — nested non-greedy
    * `regexp_extract_all` pulls table → tr → th/td, inner markup is
    * stripped from cells, cells join on `|`. Rows without tables
    * produce nothing. All codegen'd column expressions, zero UDFs, no
    * shuffle, scan-linear at 100 TB. */
  def htmlTables(df: DataFrame, html: Column): DataFrame =
    df.select(col("*"), posexplode(regexp_extract_all(html,
        lit("(?si)<table[^>]*>(.*?)</table>"), lit(1)))
        .as(Seq("table_idx", "__graft_tbl")))
      .select(col("*"), posexplode(regexp_extract_all(col("__graft_tbl"),
        lit("(?si)<tr[^>]*>(.*?)</tr>"), lit(1)))
        .as(Seq("row_idx", "__graft_row")))
      .withColumn("__graft_cells", regexp_extract_all(col("__graft_row"),
        lit("(?si)<t[dh][^>]*>(.*?)</t[dh]>"), lit(1)))
      .withColumn("table_idx", col("table_idx").cast("int"))
      .withColumn("row_idx", col("row_idx").cast("int"))
      .withColumn("n_cells", size(col("__graft_cells")).cast("int"))
      .withColumn("row_text", array_join(transform(col("__graft_cells"),
        c => regexp_replace(c, lit("<[^>]*>"), lit(""))), "|"))
      .drop("__graft_tbl", "__graft_row", "__graft_cells")

  /** Oracle gate for [[htmlTables]] over a formula fixture: 0–2 tables
    * per doc, 2–4 rows, 2–3 cells, header rows as `<th>` on even
    * tables, `<b>` markup planted inside cells — the absent / single /
    * multi paths are all gated. */
  def htmlTablesQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    def cellText(t: Column, r: Column, j: Column): Column =
      concat(lit("c"), col("doc_id").cast("string"), lit("_"),
        t.cast("string"), lit("_"), r.cast("string"), lit("_"),
        j.cast("string"))
    def tbl(t: Column): Column = {
      val nr = lit(2L) + (col("doc_id") + t) % 3
      val nc = lit(2L) + (col("doc_id") + t) % 2
      concat(lit("<table class=\"data\">"),
        array_join(transform(sequence(lit(0L), nr - 1), r =>
          concat(lit("<tr>"),
            array_join(transform(sequence(lit(0L), nc - 1), j => {
              val tag = when(r === 0 && t % 2 === 0, lit("th"))
                .otherwise(lit("td"))
              val body = when(j === 1,
                concat(lit("<b>"), cellText(t, r, j), lit("</b>")))
                .otherwise(cellText(t, r, j))
              concat(lit("<"), tag, lit(">"), body, lit("</"), tag, lit(">"))
            }), ""),
            lit("</tr>"))), ""),
        lit("</table>"))
    }
    val html = docs.withColumn("html", concat(
      lit("<html><body><nav><a href=\"/\">home</a></nav>"),
      when(col("doc_id") % 3 >= 1, tbl(lit(0L))).otherwise(lit("")),
      when(col("doc_id") % 3 === 2, tbl(lit(1L))).otherwise(lit("")),
      lit("<p>footer</p></body></html>")))
    htmlTables(html, col("html"))
      .select(col("doc_id"), col("table_idx"), col("row_idx"),
        col("n_cells"), col("row_text"))
  }

  val htmlTablesOracle: String =
    """WITH tt AS (
      |  SELECT doc_id, t
      |  FROM documents, (VALUES (0), (1)) v(t)
      |  WHERE doc_id % 3 > t),
      |rr AS (
      |  SELECT doc_id, t, r
      |  FROM tt, unnest(generate_series(0, 1 + (doc_id + t) % 3)) u(r))
      |SELECT doc_id, CAST(t AS INT) AS table_idx, CAST(r AS INT) AS row_idx,
      |       CAST(2 + (doc_id + t) % 2 AS INT) AS n_cells,
      |       array_to_string(list_transform(
      |         generate_series(0, 1 + (doc_id + t) % 2),
      |         j -> 'c' || CAST(doc_id AS VARCHAR) || '_' || CAST(t AS VARCHAR)
      |              || '_' || CAST(r AS VARCHAR) || '_' || CAST(j AS VARCHAR)),
      |         '|') AS row_text
      |FROM rr
      |""".stripMargin

  /** Subtitle (SRT / WebVTT) cue extraction over ANY corpus column:
    * one output row per cue, keeping every input column and adding
    * (format, cue_idx, start_ms, end_ms, text). The format is
    * DETECTED from the payload (a `WEBVTT` header → vtt, else srt) —
    * not supplied by the caller. One cue-block `regexp_extract_all`
    * (timestamp separator `,` SRT / `.` VTT accepted uniformly), then
    * pure column timestamp arithmetic and markup stripping (VTT
    * italic tags) — zero UDFs, one scan, per-payload linear. */
  def subtitleCues(df: DataFrame, sub: Column): DataFrame = {
    def msOf(c: Column): Column =
      substring(c, 1, 2).cast("long") * 3600000L +
        substring(c, 4, 2).cast("long") * 60000L +
        substring(c, 7, 2).cast("long") * 1000L +
        substring(c, 10, 3).cast("long")
    df.withColumn("format",
        when(sub.startsWith("WEBVTT"), lit("vtt")).otherwise(lit("srt")))
      .select(col("*"), posexplode(regexp_extract_all(sub,
        lit("(\\d{2}:\\d{2}:\\d{2}[,.]\\d{3} --> " +
          "\\d{2}:\\d{2}:\\d{2}[,.]\\d{3}\\n[^\\n]*)"), lit(1)))
        .as(Seq("cue_idx", "__graft_cue")))
      .withColumn("cue_idx", col("cue_idx").cast("int"))
      .withColumn("start_ms", msOf(regexp_extract(col("__graft_cue"),
        "^(\\d{2}:\\d{2}:\\d{2}[,.]\\d{3})", 1)))
      .withColumn("end_ms", msOf(regexp_extract(col("__graft_cue"),
        "--> (\\d{2}:\\d{2}:\\d{2}[,.]\\d{3})", 1)))
      .withColumn("text", regexp_replace(
        regexp_extract(col("__graft_cue"), "\\n(.*)$", 1),
        lit("<[^>]*>"), lit("")))
      .drop("__graft_cue")
  }

  /** Oracle gate for [[subtitleCues]]: 2–5 cues per doc, VTT
    * (headered, index-free, dot separator, `<i>` wraps) for every
    * third doc, SRT otherwise; every cell oracle-predicted, and the
    * format column comes from DETECTION, not the fixture arm. */
  def subtitleQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    val vtt = col("doc_id") % 3 === 0
    def two(c: Column): Column = lpad(c.cast("long").cast("string"), 2, "0")
    def ts(ms: Column, sep: Column): Column =
      concat(two(floor(ms / 3600000L)), lit(":"),
        two(floor(ms % 3600000L / 60000L)),
        lit(":"), two(floor(ms % 60000L / 1000L)), sep,
        lpad((ms % 1000L).cast("string"), 3, "0"))
    val n = lit(2L) + col("doc_id") % 4
    val sep = when(vtt, lit(".")).otherwise(lit(","))
    val body = array_join(transform(sequence(lit(0L), n - 1), i => {
      val start = (col("doc_id") % 10) * 100L + i * 2500L
      val end = start + 1200L + lit(100L) * ((col("doc_id") + i) % 5)
      val text0 = concat(lit("line"), col("doc_id").cast("string"),
        lit("_"), i.cast("string"))
      val text = when(vtt && i % 3 === 1,
        concat(lit("<i>"), text0, lit("</i>"))).otherwise(text0)
      concat(
        when(vtt, lit("")).otherwise(concat((i + 1).cast("string"), lit("\n"))),
        ts(start, sep), lit(" --> "), ts(end, sep), lit("\n"), text)
    }), "\n\n")
    val payload = docs.withColumn("sub",
      concat(when(vtt, lit("WEBVTT\n\n")).otherwise(lit("")), body))
    subtitleCues(payload, col("sub"))
      .select(col("doc_id"), col("format"), col("cue_idx"),
        col("start_ms"), col("end_ms"), col("text"))
  }

  val subtitleOracle: String =
    """SELECT doc_id,
      |       CASE WHEN doc_id % 3 = 0 THEN 'vtt' ELSE 'srt' END AS format,
      |       CAST(i AS INT) AS cue_idx,
      |       CAST((doc_id % 10) * 100 + i * 2500 AS BIGINT) AS start_ms,
      |       CAST((doc_id % 10) * 100 + i * 2500 + 1200
      |            + 100 * ((doc_id + i) % 5) AS BIGINT) AS end_ms,
      |       'line' || CAST(doc_id AS VARCHAR) || '_' || CAST(i AS VARCHAR)
      |         AS text
      |FROM documents, unnest(generate_series(0, 1 + doc_id % 4)) u(i)
      |""".stripMargin

  /** Markdown structure census over ANY corpus column — repository /
    * docs corpora are markdown-heavy and a curation pass routes by
    * structure (how much is code, how deep the outline, link
    * density). Keeps every input column and adds counts of ATX
    * headings and their max depth, inline links, fenced code blocks
    * (fence pairs), and list items — multiline-anchored regexp
    * columns over one scan, zero UDFs. */
  def markdownCensus(df: DataFrame, md: Column): DataFrame =
    df.withColumn("n_headings",
        size(regexp_extract_all(md, lit("(?m)^(#+) "), lit(1))).cast("int"))
      .withColumn("max_depth", coalesce(array_max(transform(
        regexp_extract_all(md, lit("(?m)^(#+) "), lit(1)),
        x => length(x))), lit(0)).cast("int"))
      .withColumn("n_links", size(regexp_extract_all(md,
        lit("\\[[^\\]]*\\]\\(([^)]*)\\)"), lit(1))).cast("int"))
      .withColumn("n_code_blocks",
        (size(regexp_extract_all(md, lit("(?m)^```"), lit(0))) / 2).cast("int"))
      .withColumn("n_list_items",
        size(regexp_extract_all(md, lit("(?m)^- "), lit(0))).cast("int"))

  /** Oracle gate for [[markdownCensus]]: each element class assembled
    * in formula-known quantities. */
  def markdownCensusQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    // sequence(1, 0) DESCENDS in Spark, so zero-count must short-circuit
    def rep(n: Column, piece: Column): Column =
      when(n < 1, lit(""))
        .otherwise(array_join(transform(sequence(lit(1L), n), _ => piece), ""))
    def repIdx(n: Column, piece: Column => Column): Column =
      when(n < 1, lit(""))
        .otherwise(array_join(transform(sequence(lit(1L), n), i => piece(i)), ""))
    val md = docs.withColumn("md", concat(
      repIdx(lit(1L) + col("doc_id") % 3, h =>
        concat(rep(h, lit("#")), lit(" Heading "), h.cast("string"),
          lit("\n"))),
      lit("intro text\n"),
      repIdx(col("doc_id") % 4, k =>
        concat(lit("see [link"), k.cast("string"), lit("](http://ex.org/"),
          k.cast("string"), lit(")\n"))),
      repIdx(col("doc_id") % 5, k =>
        concat(lit("- item "), k.cast("string"), lit("\n"))),
      rep(col("doc_id") % 2, lit("```\ncode line\n```\n"))))
    markdownCensus(md, col("md"))
      .select(col("doc_id"), col("n_headings"), col("max_depth"),
        col("n_links"), col("n_code_blocks"), col("n_list_items"))
  }

  val markdownCensusOracle: String =
    """SELECT doc_id,
      |       CAST(1 + doc_id % 3 AS INT) AS n_headings,
      |       CAST(1 + doc_id % 3 AS INT) AS max_depth,
      |       CAST(doc_id % 4 AS INT) AS n_links,
      |       CAST(doc_id % 2 AS INT) AS n_code_blocks,
      |       CAST(doc_id % 5 AS INT) AS n_list_items
      |FROM documents
      |""".stripMargin

  /** EML / RFC 5322 header extraction over ANY corpus column — mail
    * archives are a standard corpus source and their PII lives in the
    * headers. Keeps every input column and adds sender display-name
    * and address, recipient, unfolded subject, and the body size.
    * Folding (CRLF + whitespace continuation) is unfolded before
    * extraction. Pure column expressions over one scan. */
  def emlHeaders(df: DataFrame, eml: Column): DataFrame = {
    val unfolded = regexp_replace(eml, "\r\n[ \t]", " ")
    val header = regexp_extract(unfolded, "(?s)^(.*?)\r\n\r\n", 1)
    val body = regexp_extract(unfolded, "(?s)\r\n\r\n(.*)$", 1)
    df.withColumn("sender_name",
        regexp_extract(header, "(?m)^From: ([^<]*) <", 1))
      .withColumn("sender_addr",
        regexp_extract(header, "(?m)^From: [^<]*<([^>]*)>", 1))
      .withColumn("to_addr", regexp_extract(header, "(?m)^To: (.*)$", 1))
      .withColumn("subject", regexp_extract(header, "(?m)^Subject: (.*)$", 1))
      .withColumn("body_chars", length(body).cast("int"))
  }

  /** Oracle gate for [[emlHeaders]] — the fixture folds every fourth
    * subject so the unfold path is gated, not decorative. */
  def emlExtractQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    val subj = concat(lit("Re: topic "), (col("doc_id") % 31).cast("string"))
    val subjWire = when(col("doc_id") % 4 === 0,
      concat(lit("Re: topic\r\n "), (col("doc_id") % 31).cast("string")))
      .otherwise(subj)
    val eml = docs.withColumn("eml", concat(
      lit("From: Sender"), (col("doc_id") % 13).cast("string"),
      lit(" <s"), col("doc_id").cast("string"), lit("@ex.org>\r\n"),
      lit("To: r"), (col("doc_id") % 7).cast("string"), lit("@ex.org\r\n"),
      lit("Subject: "), subjWire, lit("\r\n"),
      lit("Content-Type: text/plain\r\n\r\n"),
      lit("body of message "), col("doc_id").cast("string"), lit("\r\n")))
    emlHeaders(eml, col("eml"))
      .select(col("doc_id"), col("sender_name"), col("sender_addr"),
        col("to_addr"), col("subject"), col("body_chars"))
  }

  val emlExtractOracle: String =
    """SELECT doc_id,
      |       'Sender' || CAST(doc_id % 13 AS VARCHAR) AS sender_name,
      |       's' || CAST(doc_id AS VARCHAR) || '@ex.org' AS sender_addr,
      |       'r' || CAST(doc_id % 7 AS VARCHAR) || '@ex.org' AS to_addr,
      |       'Re: topic ' || CAST(doc_id % 31 AS VARCHAR) AS subject,
      |       CAST(length('body of message ' || CAST(doc_id AS VARCHAR))
      |            + 2 AS INT) AS body_chars
      |FROM documents
      |""".stripMargin

  /** href extraction over ANY corpus column: one output row per link,
    * keeping every input column and adding the raw `href` — tolerant
    * of real markup (single OR double quotes, any attribute case,
    * whitespace around `=`). Canonicalization is the caller's next
    * step ([[graft.ops.UrlOps.canonicalizeUrl]]). */
  def outlinks(df: DataFrame, html: Column): DataFrame =
    df.select(col("*"), explode(concat(
        regexp_extract_all(html,
          lit("(?i)href\\s*=\\s*\"([^\"]*)\""), lit(1)),
        regexp_extract_all(html,
          lit("(?i)href\\s*=\\s*'([^']*)'"), lit(1)))).as("href"))

  /** Outlink-graph extraction — the web-graph building block: pull
    * every `href` from the page markup via [[outlinks]], CANONICALIZE
    * it (the wire form carries uppercase hosts and tracking params —
    * [[graft.ops.UrlOps.canonicalizeUrl]] is applied before anything
    * aggregates), and emit the domain-level edge list with link
    * counts. Domain-grain output is what host-level quality signals
    * (harmonic/pagerank-style) consume. One scan → explode →
    * canonical projection → one edge aggregate. */
  def outlinksQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    val nLinks = col("doc_id") % 5
    val anchors = when(nLinks < 1, lit(""))
      .otherwise(array_join(transform(sequence(lit(0L), nLinks - 1), k =>
        concat(lit("<a href=\"HTTP://WWW.EXAMPLE"),
          ((col("doc_id") + k) % 7).cast("string"),
          lit(".COM:80/p/"), (col("doc_id") % 13).cast("string"),
          lit("?utm_source=z&k="), k.cast("string"),
          lit("\">x</a>"))), ""))
    val html = docs.withColumn("html", concat(
      lit("<html><body><nav><a href=\"/local/nav\">home</a></nav>"),
      anchors, lit("</body></html>")))
    outlinks(html.select(col("doc_id"), col("html")), col("html"))
      .select(col("doc_id"), col("href"))
      .filter(col("href").startsWith("HTTP") || col("href").startsWith("http"))
      .select(
        concat(lit("www.example"), (col("doc_id") % 7).cast("string"),
          lit(".com")).as("src_domain"),
        regexp_extract(graft.ops.UrlOps.canonicalizeUrl(col("href")),
          "^[a-z][a-z0-9+.-]*://([^/:?#]*)", 1).as("dst_domain"))
      .groupBy(col("src_domain"), col("dst_domain"))
      .agg(count(lit(1)).as("n_links"))
  }

  /** Host-level rank over the EXTRACTED outlink graph — the quality
    * signal crawl pipelines weight domains by, composed end-to-end
    * from page markup: href pull → canonicalization → domain edges
    * ([[outlinksQuery]]) → two damped PageRank iterations. All
    * arithmetic is INTEGER ppm (per-edge integer division before the
    * order-independent sum, damping as 85/100 integer ops), so the
    * oracle replays both iterations exactly — no floating-point
    * accumulation order in the gate. Domain-grain everywhere: the
    * edge list is sites×sites, broadcast-sized next to any corpus. */
  def hostRankQuery(spark: SparkSession, dir: String,
                    largeGraph: Option[Boolean] = None): DataFrame = {
    import graft.core.Caches.TrackedDataset
    val e = outlinksQuery(spark, dir)
      .select(col("src_domain").as("s"), col("dst_domain").as("t"),
        col("n_links").as("w"))
    val nodes = e.select(col("s").as("d")).distinct().trackPersist()
    // ONE driver-side node count serves double duty: it is the nd
    // normalizer the rank formula needs anyway (injected as a literal
    // instead of the former 1-row crossJoin), AND the join-strategy
    // threshold -- the RANK, OUT-WEIGHT, and CONTRIBUTION tables are
    // node-sized, so they broadcast only below the vertex threshold
    // and become partitioned shuffle-hash joins above it (host grain
    // is ~1e7 and fits; page-grain web graphs do not)
    val nd = math.max(nodes.count(), 1L)
    val large = largeGraph.getOrElse(nd > graft.ops.Graph.BroadcastNodeLimit)
    val outw = e.groupBy(col("s")).agg(sum(col("w")).as("ow"))
    val ew =
      if (large) e.join(outw.hint("shuffle_hash"), "s")
      else e.join(broadcast(outw), "s")
    var rank = nodes.select(col("d"), lit(1000000L / nd).as("r"))
    for (_ <- 1 to 2) {
      val rs = rank.withColumnRenamed("d", "s")
      val contrib =
        (if (large) ew.join(rs.hint("shuffle_hash"), "s")
         else ew.join(broadcast(rs), "s"))
          .select(col("t").as("d"), expr("r * w div ow").as("c"))
          .groupBy(col("d")).agg(sum(col("c")).as("sc"))
      rank =
        (if (large) nodes.join(contrib.hint("shuffle_hash"), Seq("d"), "left")
         else nodes.join(broadcast(contrib), Seq("d"), "left"))
          .select(col("d"),
            (lit(150000L / nd) +
              expr("85 * coalesce(sc, 0) div 100")).as("r"))
    }
    rank.select(col("d").as("domain"), col("r").cast("long").as("rank_ppm"))
  }

  val hostRankOracle: String =
    """WITH l AS (
      |  SELECT doc_id % 7 AS s, (doc_id + k) % 7 AS t
      |  FROM documents,
      |       unnest(generate_series(0, CAST(doc_id % 5 AS BIGINT) - 1)) u(k)
      |  WHERE doc_id % 5 >= 1),
      |e AS (SELECT s, t, count(*) AS w FROM l GROUP BY 1, 2),
      |outw AS (SELECT s, sum(w) AS ow FROM e GROUP BY 1),
      |nodes AS (SELECT DISTINCT s AS d FROM e),
      |n AS (SELECT count(*) AS nd FROM nodes),
      |r0 AS (SELECT d, 1000000 // (SELECT nd FROM n) AS r FROM nodes),
      |c1 AS (
      |  SELECT e.t AS d, sum(r0.r * e.w // outw.ow) AS sc
      |  FROM e JOIN r0 ON e.s = r0.d JOIN outw ON e.s = outw.s
      |  GROUP BY 1),
      |r1 AS (
      |  SELECT nodes.d,
      |         150000 // (SELECT nd FROM n)
      |           + 85 * coalesce(c1.sc, 0) // 100 AS r
      |  FROM nodes LEFT JOIN c1 ON nodes.d = c1.d),
      |c2 AS (
      |  SELECT e.t AS d, sum(r1.r * e.w // outw.ow) AS sc
      |  FROM e JOIN r1 ON e.s = r1.d JOIN outw ON e.s = outw.s
      |  GROUP BY 1),
      |r2 AS (
      |  SELECT nodes.d,
      |         150000 // (SELECT nd FROM n)
      |           + 85 * coalesce(c2.sc, 0) // 100 AS r
      |  FROM nodes LEFT JOIN c2 ON nodes.d = c2.d)
      |SELECT 'www.example' || CAST(d AS VARCHAR) || '.com' AS domain,
      |       CAST(r AS BIGINT) AS rank_ppm
      |FROM r2
      |""".stripMargin

  val outlinksOracle: String =
    """WITH l AS (
      |  SELECT doc_id % 7 AS s, (doc_id + k) % 7 AS t
      |  FROM documents,
      |       unnest(generate_series(0, CAST(doc_id % 5 AS BIGINT) - 1)) u(k)
      |  WHERE doc_id % 5 >= 1)
      |SELECT 'www.example' || CAST(s AS VARCHAR) || '.com' AS src_domain,
      |       'www.example' || CAST(t AS VARCHAR) || '.com' AS dst_domain,
      |       CAST(count(*) AS BIGINT) AS n_links
      |FROM l GROUP BY 1, 2
      |""".stripMargin

  val jsonLdOracle: String =
    """SELECT doc_id, CAST(0 AS INT) AS block_index,
      |       CASE doc_id % 3 WHEN 0 THEN 'Product' WHEN 1 THEN 'Article'
      |            ELSE 'Recipe' END AS item_type,
      |       'Item' || CAST(doc_id * 4 AS VARCHAR) AS name,
      |       CAST(CASE WHEN doc_id % 3 = 0 THEN (doc_id * 4) % 100 END
      |            AS INT) AS price
      |FROM documents WHERE doc_id % 5 <> 3
      |UNION ALL
      |SELECT doc_id, CAST(1 AS INT),
      |       CASE (doc_id + 1) % 3 WHEN 0 THEN 'Product' WHEN 1 THEN 'Article'
      |            ELSE 'Recipe' END,
      |       'Item' || CAST(doc_id * 4 + 1 AS VARCHAR),
      |       CAST(CASE WHEN (doc_id + 1) % 3 = 0 THEN (doc_id * 4 + 1) % 100 END
      |            AS INT)
      |FROM documents WHERE doc_id % 5 <> 3 AND doc_id % 7 = 0
      |""".stripMargin
}
