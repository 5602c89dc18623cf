package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions.tokens

/** Training-corpus preparation beyond cleaning/dedup: overlapping
  * token-window chunking (context-length shaping), token-budgeted
  * selection per source (data mixing under a budget), and adjacent-token
  * association mining (phrase discovery).
  *
  * All three are per-row projections or single hash aggregations /
  * partitioned windows — no all-pairs structure anywhere, so the plans
  * survive corpus scale unchanged. Tokenization is the engine-portable
  * whitespace idiom shared with [[TextAnalysis]] (`split(trim(lower(…)))`
  * ↔ DuckDB `string_split_regex`), which is what lets every output ship
  * a value-exact oracle.
  */
object TextPrep {

  private val ChunkSize = 40
  private val Stride = 30

  /** Overlapping token-window chunks: windows of [[ChunkSize]] tokens
    * starting every [[Stride]] tokens (so consecutive chunks share
    * `ChunkSize − Stride` tokens of context, the standard LM-pretraining
    * shaping). Emits (doc_id, chunk_id, n_tok, chunk_md5) — the md5
    * stands in for the chunk text so the gated output stays narrow; the
    * text itself is `slice(tk, s+1, ChunkSize)` re-joined, which a sink
    * would keep instead. Pure explode-projection: no shuffle, scan-bound,
    * output rows ≈ docs × (len/stride). */
  def chunks(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .withColumn("n", size(col("tk")))
      .select(col("doc_id"), col("tk"), col("n"),
        posexplode(sequence(lit(0), col("n") - 1, lit(Stride)))
          .as(Seq("chunk_id", "s")))
      .select(col("doc_id"), col("chunk_id").cast("int").as("chunk_id"),
        least(col("n") - col("s"), lit(ChunkSize)).cast("int").as("n_tok"),
        md5(concat_ws(" ", slice(col("tk"), col("s") + 1, lit(ChunkSize))))
          .as("chunk_md5"))

  val chunksOracle: String =
    s"""WITH d AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
       |  FROM documents),
       |n AS (SELECT doc_id, tk, len(tk) AS n FROM d),
       |c AS (
       |  SELECT doc_id, tk, n,
       |         unnest(generate_series(0, n - 1, $Stride)) AS s
       |  FROM n)
       |SELECT doc_id, CAST(s // $Stride AS INT) AS chunk_id,
       |       CAST(least(n - s, $ChunkSize) AS INT) AS n_tok,
       |       md5(array_to_string(list_slice(tk, s + 1, least(s + $ChunkSize, n)), ' ')) AS chunk_md5
       |FROM c
       |""".stripMargin

  private val BudgetTokens = 5000L

  /** Token-budgeted selection per source: rank documents by lexical
    * diversity (unique/total token ratio, doc_id tiebreak) and keep each
    * source's prefix whose cumulative token count fits the budget — the
    * mixing step that turns "all of source X" into "the best N tokens of
    * source X" when composing a training mix.
    *
    * The running sum is a window partitioned BY SOURCE — parallel across
    * sources, sequential within one. That is the right shape while
    * sources number in the hundreds; a single source so large its window
    * skews would go through the [[Rnk.globalRank]] two-pass instead
    * (rank, then broadcast per-partition prefix sums), same as vocab. */
  def budgetSelect(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("score").desc, col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), tokens(col("text")).as("tk"))
      .select(col("doc_id"), col("source"),
        size(col("tk")).as("n_tok"),
        (size(array_distinct(col("tk"))).cast("double") / size(col("tk")))
          .as("score"))
      .withColumn("cum_tok", sum(col("n_tok").cast("long")).over(w))
      .filter(col("cum_tok") <= BudgetTokens)
      .select(col("doc_id"), col("source"), col("n_tok").cast("int").as("n_tok"),
              col("cum_tok"), round(col("score"), 6).as("score"))
  }

  val budgetOracle: String =
    s"""WITH d AS (
       |  SELECT doc_id, source, string_split_regex(trim(lower(text)), '\\s+') AS tk
       |  FROM documents),
       |s AS (
       |  SELECT doc_id, source, len(tk) AS n_tok,
       |         CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk) AS score
       |  FROM d),
       |c AS (
       |  SELECT doc_id, source, n_tok, score,
       |         sum(n_tok) OVER (PARTITION BY source
       |                          ORDER BY score DESC, doc_id) AS cum_tok
       |  FROM s)
       |SELECT doc_id, source, CAST(n_tok AS INT) AS n_tok,
       |       CAST(cum_tok AS BIGINT) AS cum_tok, round(score, 6) AS score
       |FROM c WHERE cum_tok <= $BudgetTokens
       |""".stripMargin

  /** Per-source distribution drift: the total-variation distance between
    * each source's token distribution and the REST of the corpus —
    * the fingerprint that catches a source going off-distribution
    * between corpus snapshots (scraper drift, contamination, encoding
    * rot) before it trains into a model.
    *
    * TV(S, R) = ½ Σ_tok |p_S − p_R| over the FULL vocabulary. The
    * absent-token tail is folded in algebraically instead of
    * materializing a vocab × sources grid: for tokens with c_S = 0 the
    * contribution is Σ c·n_S, i.e. n_S·(N − covered_S), where covered_S
    * sums the global counts of tokens the source DOES have. Everything
    * stays exact 64-bit integer arithmetic until one final division —
    * corpus-linear (one explode, hash aggs, vocab-sized join), no
    * all-pairs structure. Counts here fit long comfortably (Σ|…| ≤
    * N·n_S ≈ 10^12 at sf0.1); a trillion-token corpus would lift the
    * products to decimal, same plan. */
  def sourceDrift(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.Caches.TrackedDataset
    val st = Tables.documents(spark, dir)
      .select(col("source"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("cs"))
      .trackPersist() // three consumers: global counts, totals, the join
    val g = st.groupBy(col("tok")).agg(sum(col("cs")).as("c"))
    val ns = st.groupBy(col("source")).agg(sum(col("cs")).as("n_tok"))
    val tot = ns.agg(sum(col("n_tok")).as("n"))
    val per = st.join(g, "tok")
      .join(broadcast(ns), "source")
      .crossJoin(broadcast(tot))
      .groupBy(col("source"))
      .agg(sum(abs(col("cs") * (col("n") - col("n_tok")) -
                   (col("c") - col("cs")) * col("n_tok"))).as("a"),
           sum(col("c")).as("covered"))
    per.join(broadcast(ns), "source").crossJoin(broadcast(tot))
      .select(col("source"), col("n_tok"),
        round((col("a") + col("n_tok") * (col("n") - col("covered")))
                .cast("double") /
              (lit(2) * col("n_tok") * (col("n") - col("n_tok"))).cast("double"),
              6).as("tv"))
  }

  val sourceDriftOracle: String =
    """WITH d AS (
      |  SELECT source, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
      |  FROM documents),
      |st AS (SELECT source, tok, count(*) AS cs FROM d GROUP BY 1, 2),
      |g AS (SELECT tok, CAST(sum(cs) AS BIGINT) AS c FROM st GROUP BY 1),
      |ns AS (SELECT source, CAST(sum(cs) AS BIGINT) AS n_tok FROM st GROUP BY 1),
      |tot AS (SELECT CAST(sum(cs) AS BIGINT) AS n FROM st),
      |per AS (
      |  SELECT st.source,
      |         CAST(sum(abs(cs * (n - ns.n_tok) - (c - cs) * ns.n_tok)) AS BIGINT) AS a,
      |         CAST(sum(c) AS BIGINT) AS covered
      |  FROM st JOIN g USING (tok) JOIN ns USING (source) CROSS JOIN tot
      |  GROUP BY 1)
      |SELECT source, n_tok,
      |       round(CAST(a + n_tok * (n - covered) AS DOUBLE) /
      |             CAST(2 * n_tok * (n - n_tok) AS DOUBLE), 6) AS tv
      |FROM per JOIN ns USING (source) CROSS JOIN tot
      |""".stripMargin

  private val MinPairCount = 8L

  /** Adjacent-token association (phrase mining): for every bigram seen at
    * least [[MinPairCount]] times, the observed/expected co-occurrence
    * ratio `lift = P(a,b) / (P(a)·P(b))` — PMI without the log, so both
    * engines evaluate the IDENTICAL IEEE division sequence and the result
    * hash-matches without transcendental-function portability risk.
    *
    * Shape: one explode → bigram hash-agg (map-side combined), unigram
    * hash-agg over the same scan, two broadcast-sized joins against the
    * thresholded bigram table, scalar totals as a 1-row cross join. No
    * all-pairs anything: cost is corpus-linear plus vocab-sized joins. */
  def bigramLift(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .withColumn("n", size(col("tk")))
    val unigrams = toks
      .select(explode(col("tk")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c1"))
    val bigrams = toks
      .filter(col("n") >= 2)
      .select(explode(transform(sequence(lit(1), col("n") - 1),
        i => struct(element_at(col("tk"), i).as("a"),
                    element_at(col("tk"), i + 1).as("b")))).as("bg"))
      .select(col("bg.a").as("tok_a"), col("bg.b").as("tok_b"))
      .groupBy(col("tok_a"), col("tok_b")).agg(count(lit(1)).as("c2"))
      .filter(col("c2") >= MinPairCount)
    val totals = unigrams.agg(sum(col("c1")).as("n1")).crossJoin(
      toks.select(greatest(col("n") - 1, lit(0)).as("nb"))
        .agg(sum(col("nb")).as("n2")))
    bigrams
      .join(unigrams.select(col("tok").as("tok_a"), col("c1").as("ca")), Seq("tok_a"))
      .join(unigrams.select(col("tok").as("tok_b"), col("c1").as("cb")), Seq("tok_b"))
      .crossJoin(broadcast(totals))
      .select(col("tok_a"), col("tok_b"), col("c2"),
        round((col("c2").cast("double") / col("n2")) /
              ((col("ca").cast("double") / col("n1")) *
               (col("cb").cast("double") / col("n1"))), 6).as("lift"))
  }

  val bigramLiftOracle: String =
    s"""WITH d AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
       |  FROM documents),
       |uni AS (
       |  SELECT tok, count(*) AS c1
       |  FROM (SELECT unnest(tk) AS tok FROM d) GROUP BY 1),
       |bg AS (
       |  SELECT tk[i] AS tok_a, tk[i + 1] AS tok_b
       |  FROM (SELECT tk, len(tk) AS n FROM d),
       |       unnest(generate_series(1, n - 1)) t(i)
       |  WHERE n >= 2),
       |big AS (
       |  SELECT tok_a, tok_b, count(*) AS c2 FROM bg GROUP BY 1, 2
       |  HAVING count(*) >= $MinPairCount),
       |tot AS (
       |  SELECT (SELECT CAST(sum(c1) AS BIGINT) FROM uni) AS n1,
       |         (SELECT CAST(sum(greatest(len(tk) - 1, 0)) AS BIGINT) FROM d) AS n2)
       |SELECT tok_a, tok_b, CAST(c2 AS BIGINT) AS c2,
       |       round((CAST(c2 AS DOUBLE) / n2) /
       |             ((CAST(ua.c1 AS DOUBLE) / n1) * (CAST(ub.c1 AS DOUBLE) / n1)), 6) AS lift
       |FROM big
       |JOIN uni ua ON big.tok_a = ua.tok
       |JOIN uni ub ON big.tok_b = ub.tok, tot
       |""".stripMargin

  private val BpeTopK = 40

  /** First round of byte-pair-encoding vocabulary induction: the top
    * merge candidates — adjacent character pairs weighted by the
    * frequency of the words they occur in. This is the inner step a BPE
    * tokenizer trainer iterates; one round is the part that is a pure
    * data-parallel query (later rounds re-segment against the grown
    * vocab, which is a driver loop over the same plan).
    *
    * Scale shape: after the word-frequency aggregate the working set is
    * VOCAB-sized, not corpus-sized — the pair explode runs over distinct
    * words (len(w)−1 pairs each), and the final aggregate is over the
    * symbol-pair alphabet (tiny). Corpus-linear cost is exactly one
    * token explode + one map-side-combined count; top-k is a
    * TakeOrdered, not a global sort. */
  def bpeMerges(spark: SparkSession, dir: String): DataFrame = {
    val words = Tables.documents(spark, dir)
      .select(explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    words
      .select(col("freq"),
        explode(transform(sequence(lit(1), length(col("w")) - 1),
          i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("pair_count"))
      .orderBy(col("pair_count").desc, col("pair").asc)
      .limit(BpeTopK)
  }

  val bpeMergesOracle: String =
    s"""WITH tk AS (
       |  SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
       |  FROM documents),
       |wf AS (
       |  SELECT w, count(*) AS freq FROM tk WHERE len(w) >= 2 GROUP BY w),
       |p AS (
       |  SELECT unnest(list_transform(generate_series(1, len(w) - 1),
       |                i -> substring(w, i, 2))) AS pair,
       |         freq
       |  FROM wf)
       |SELECT pair, CAST(sum(freq) AS BIGINT) AS pair_count
       |FROM p GROUP BY pair
       |ORDER BY pair_count DESC, pair LIMIT $BpeTopK
       |""".stripMargin

  // ------------------------------------------------------ full BPE loop

  /** Merges the gated [[bpeVocab]] query performs (SQL-replayed); the
    * spec drives the same trainer to a 200-symbol vocab against an
    * independent in-memory golden. */
  private val BpeGateMerges = 12

  /** Left-to-right non-overlapping merge of one adjacent pair — the
    * textbook BPE rewrite. The oracle replays it over the space-joined
    * symbol string via the doubled-delimiter `replace` device (see
    * [[bpeVocabOracle]]) — a plain single-space `replace` would NOT be
    * equivalent: back-to-back occurrences share a delimiter space. */
  private[graft] def mergeSyms(s: IndexedSeq[String], a: String, b: String)
      : IndexedSeq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += s(i); i += 1 }
    }
    out.toIndexedSeq
  }

  /** The oracle's doubled-delimiter replace device, stated in Scala —
    * `java.lang.String.replace` is the same non-overlapping
    * left-to-right substitution as DuckDB's `replace`, so this IS the
    * SQL rewrite, and GraftProperties laws it equal to [[mergeSyms]]
    * (the single-space variant provably is not: 'banana' + (a,n)). */
  private[graft] def sqlMergeDevice(syms: IndexedSeq[String], a: String, b: String)
      : IndexedSeq[String] = {
    val s = " " + syms.mkString(" ") + " "
    val merged = s.replace(" ", "  ")
      .replace(" " + a + "  " + b + " ", " " + a + b + " ")
      .replace("  ", " ")
    val t = merged.trim
    if (t.isEmpty) IndexedSeq.empty else t.split(" ").toIndexedSeq
  }

  /** FULL BPE TRAINING LOOP — iterate merges to a target count with the
    * corpus RE-PAIRED INCREMENTALLY (the real tokenizer-training shape):
    *
    *  - corpus-linear work happens ONCE (the word-frequency aggregate);
    *    the loop runs over the distinct-word dictionary, which is
    *    bounded by the language, not the corpus — the collapse that
    *    makes BPE training feasible at 100 TB;
    *  - the pair-count table lives on the DRIVER (bounded by the
    *    symbol-pair alphabet — state-sized, like the MG candidate sets),
    *    so choosing the next merge is a map lookup, not a Spark job;
    *  - each round runs ONE rewrite pass over the dictionary (words not
    *    containing the pair pass through untouched and report no delta)
    *    plus one delta aggregate over the CHANGED words only — the
    *    incremental aggregation that replaces recounting every pair
    *    every round; `localCheckpoint` per round keeps lineage flat;
    *  - determinism: best pair = (max count, then lexicographically
    *    smallest (a, b)) — ScalaCheck-lawed independent of partitioning
    *    and input order, and replayed identically by the SQL oracle.
    *
    * Returns the merge table (rank, sym_a, sym_b, merged, pair_count). */
  def bpeTrain(words: DataFrame, numMerges: Int): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val (merges, fin) = bpeCore(words, numMerges)
    fin.unpersist()
    merges.toDF("rank", "sym_a", "sym_b", "merged", "pair_count")
  }

  /** The loop itself: returns the merge list and the FINAL per-word
    * symbol state (the trained segmentation of the dictionary — what
    * [[bpeEncode]] applies). Caller owns the returned state's cache. */
  private def bpeCore(words: DataFrame, numMerges: Int)
      : (Seq[(Int, String, String, String, Long)],
         org.apache.spark.sql.Dataset[(IndexedSeq[String], Long)]) = {
    val spark = words.sparkSession
    import spark.implicits._
    // LAZY local checkpoints throughout the loop (round-14 opt): the
    // eager form materialized each state in its own job and the
    // delta/count aggregate then ran a second job over it — 2 driver
    // round-trips per merge. Lazy checkpointing folds materialization
    // into the aggregate's job (the aggregate reads every partition
    // anyway), halving the loop's job count; lineage is still cut at
    // every iteration exactly as before.
    var cur: org.apache.spark.sql.Dataset[(IndexedSeq[String], Long)] =
      words.as[(String, Long)]
        .map { case (w, f) => (w.map(_.toString).toIndexedSeq, f) }
        .localCheckpoint(false)
    val counts = scala.collection.mutable.HashMap[(String, String), Long]()
    cur.flatMap { case (s, f) =>
        s.iterator.zip(s.iterator.drop(1)).map(p => (p._1, p._2, f))
      }.toDF("a", "b", "f").groupBy("a", "b")
      .agg(sum(col("f")).as("c")).collect()
      .foreach(r => counts((r.getString(0), r.getString(1))) = r.getLong(2))
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, String, Long)]()
    var rank = 1
    while (rank <= numMerges && counts.nonEmpty) {
      val ((a, b), c) = counts.minBy { case ((x, y), n) => (-n, x, y) }
      merges += ((rank, a, b, a + b, c))
      val (aa, bb) = (a, b)
      val next = cur.map { case (syms, f) =>
        val merged = mergeSyms(syms, aa, bb)
        (merged, f, if (merged.length != syms.length) syms else null)
      }.localCheckpoint(false) // materialized by the delta collect below;
                               // lineage stays flat
      // delta aggregate over changed words only (old pairs −f, new +f)
      val deltas = next.filter(_._3 != null)
        .flatMap { case (nw, f, ow) =>
          ow.iterator.zip(ow.iterator.drop(1)).map(p => (p._1, p._2, -f)) ++
            nw.iterator.zip(nw.iterator.drop(1)).map(p => (p._1, p._2, f))
        }.toDF("a", "b", "d").groupBy("a", "b")
        .agg(sum(col("d")).as("d")).collect()
      deltas.foreach { r =>
        val k = (r.getString(0), r.getString(1))
        val v = counts.getOrElse(k, 0L) + r.getLong(2)
        if (v > 0) counts(k) = v else counts.remove(k)
      }
      cur.unpersist()
      cur = next.map(t => (t._1, t._2))
      rank += 1
    }
    (merges.toSeq, cur)
  }

  /** The word-frequency dictionary the trainer runs over. */
  private def bpeWords(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy(col("w")).agg(count(lit(1)).cast("long").as("freq"))

  /** Oracle-gated query: the first [[BpeGateMerges]] merges of the full
    * loop over the documents word dictionary. */
  def bpeVocab(spark: SparkSession, dir: String): DataFrame =
    bpeTrain(bpeWords(spark, dir), BpeGateMerges)

  /** TOKENIZE UNDER THE TRAINED VOCAB — the apply path every corpus
    * pass runs after training: segment the word DICTIONARY once under
    * the learned merges (dictionary-sized work, the word -> n_tokens
    * map is the artifact), then one broadcast-joinable lookup prices
    * every document: words, characters, BPE tokens, and the
    * compression ratio in ppm. The corpus-linear cost is one token
    * explode + the lookup join; nothing re-segments per occurrence. */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (_, fin) = bpeCore(bpeWords(spark, dir), BpeGateMerges)
    val segDict = fin.map { case (syms, _) => (syms.mkString, syms.length.toLong) }
      .toDF("w", "n_syms")
    val out = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) >= 1)
      .join(broadcast(segDict), Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("w"))).cast("long").as("n_chars"),
        sum(col("n_syms")).cast("long").as("n_bpe_tokens"))
      .withColumn("compression_ppm",
        expr("CAST(n_bpe_tokens * 1000000 div n_chars AS BIGINT)"))
    out
  }

  /** TOKENIZER FERTILITY BY LANGUAGE — the audit run before a
    * multilingual corpus mix is frozen: a tokenizer trained on one
    * language distribution over-segments the others (more BPE tokens
    * per word), silently inflating their compute share and shrinking
    * their effective context. Same dictionary-segment-once +
    * broadcast-lookup shape as [[bpeEncode]], aggregated per corpus
    * language label: words, chars, BPE tokens, and fertility
    * (tokens per word) / density (tokens per char) in integer ppm. */
  def bpeFertility(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (_, fin) = bpeCore(bpeWords(spark, dir), BpeGateMerges)
    val segDict = fin.map { case (syms, _) => (syms.mkString, syms.length.toLong) }
      .toDF("w", "n_syms")
    Tables.documents(spark, dir)
      .select(col("lang"), explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) >= 1)
      .join(broadcast(segDict), Seq("w"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("w"))).cast("long").as("n_chars"),
        sum(col("n_syms")).cast("long").as("n_bpe_tokens"))
      .withColumn("fertility_ppm",
        expr("CAST(n_bpe_tokens * 1000000 div n_words AS BIGINT)"))
      .withColumn("density_ppm",
        expr("CAST(n_bpe_tokens * 1000000 div n_chars AS BIGINT)"))
  }

  val bpeFertilityOracle: String = {
    val k = BpeGateMerges
    s"""${bpeChainSql(k)},
       |seg AS (
       |  SELECT replace(trim(s), ' ', '') AS w,
       |         CAST(len(string_split(trim(s), ' ')) AS BIGINT) AS n_syms
       |  FROM s$k),
       |dt AS (
       |  SELECT lang, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
       |  FROM documents)
       |SELECT dt.lang,
       |       CAST(count(*) AS BIGINT) AS n_words,
       |       CAST(sum(length(dt.w)) AS BIGINT) AS n_chars,
       |       CAST(sum(seg.n_syms) AS BIGINT) AS n_bpe_tokens,
       |       CAST(sum(seg.n_syms) * 1000000 // count(*) AS BIGINT)
       |         AS fertility_ppm,
       |       CAST(sum(seg.n_syms) * 1000000 // sum(length(dt.w)) AS BIGINT)
       |         AS density_ppm
       |FROM dt JOIN seg ON dt.w = seg.w
       |WHERE len(dt.w) >= 1
       |GROUP BY 1
       |""".stripMargin
  }

  /** Shared WITH-body of the generated replay through state s{k}. */
  private def bpeChainSql(k: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """WITH tk AS (
        |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
        |  FROM documents),
        |wf AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM tk
        |  WHERE len(w) >= 1 GROUP BY 1),
        |s0 AS MATERIALIZED (
        |  SELECT ' ' || array_to_string(list_transform(
        |           generate_series(1, length(w)), i -> substring(w, i, 1)),
        |           ' ') || ' ' AS s, freq
        |  FROM wf)""".stripMargin)
    for (r <- 1 to k) {
      val p = r - 1
      sb.append(s""",
        |p$r AS (
        |  SELECT t[i] AS a, t[i + 1] AS b, CAST(sum(freq) AS BIGINT) AS c
        |  FROM (SELECT string_split(trim(s), ' ') AS t, freq FROM s$p),
        |       unnest(generate_series(1, len(t) - 1)) u(i)
        |  GROUP BY 1, 2),
        |b$r AS MATERIALIZED (
        |  SELECT a, b, c FROM p$r ORDER BY c DESC, a, b LIMIT 1),
        |s$r AS MATERIALIZED (
        |  SELECT replace(
        |           replace(replace(s, ' ', '  '),
        |             ' ' || (SELECT a FROM b$r) || '  ' || (SELECT b FROM b$r) || ' ',
        |             ' ' || (SELECT a FROM b$r) || (SELECT b FROM b$r) || ' '),
        |           '  ', ' ') AS s,
        |         freq
        |  FROM s$p)""".stripMargin)
    }
    sb.toString
  }

  /** Oracle for the apply path: reuse the replay chain, read the final
    * segmentation off s{K} (word = the state minus spaces), join the
    * corpus tokens. */
  val bpeEncodeOracle: String = {
    val k = BpeGateMerges
    s"""${bpeChainSql(k)},
       |seg AS (
       |  SELECT replace(trim(s), ' ', '') AS w,
       |         CAST(len(string_split(trim(s), ' ')) AS BIGINT) AS n_syms
       |  FROM s$k),
       |dt AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
       |  FROM documents)
       |SELECT dt.doc_id,
       |       CAST(count(*) AS BIGINT) AS n_words,
       |       CAST(sum(length(dt.w)) AS BIGINT) AS n_chars,
       |       CAST(sum(seg.n_syms) AS BIGINT) AS n_bpe_tokens,
       |       CAST(sum(seg.n_syms) * 1000000 // sum(length(dt.w)) AS BIGINT) AS compression_ppm
       |FROM dt JOIN seg ON dt.w = seg.w
       |WHERE len(dt.w) >= 1
       |GROUP BY 1
       |""".stripMargin
  }

  /** The SQL replay is GENERATED: one (pairs → best → rewrite) round
    * per merge, unrolled [[BpeGateMerges]] times — the symbol string is
    * space-joined and the rewrite is the DOUBLED-DELIMITER device:
    * a plain `replace(' a b ', ' ab ')` on the single-spaced state
    * misses the second of two back-to-back occurrences because they
    * share a delimiter space ('banana' with pair (a,n): the replay
    * would yield b/an/a/n/a where [[mergeSyms]] yields b/an/an/a). So
    * each round doubles every space first, replaces
    * `' a  b '` → `' ab '` (each match consumes one space of each
    * flanking pair, so every gap ends as exactly two spaces and
    * matches can no longer overlap), then collapses `'  '` → `' '`.
    * GraftProperties laws this device equal to [[mergeSyms]] on random
    * symbol strings including XYXY repeats. Materialized CTEs keep each
    * state referenced twice from re-evaluating. */
  val bpeVocabOracle: String = {
    bpeChainSql(BpeGateMerges) + "\n" +
      (1 to BpeGateMerges).map { r =>
        s"""SELECT $r AS rank, (SELECT a FROM b$r) AS sym_a,
           |       (SELECT b FROM b$r) AS sym_b,
           |       (SELECT a || b FROM b$r) AS merged,
           |       (SELECT c FROM b$r) AS pair_count""".stripMargin
      }.mkString("\nUNION ALL\n") + "\n"
  }

  private val SpanN = 8

  /** Cross-document repeated token spans — the exact-substring dedup
    * signal (long verbatim passages shared by 2+ documents, the thing
    * suffix-array dedup removes from training corpora). Emits one row per
    * [[SpanN]]-token span that appears in at least two DISTINCT
    * documents: (span_hash, n_docs, first_doc). Within-doc repeats don't
    * count (the shingle kernel is distinct per doc), so n_docs is a true
    * document frequency.
    *
    * Scale shape: the span kernel is the native
    * [[graft.functions.ShingleHash]] pass Dedup shares (one digest loop
    * per doc, no per-span string allocation — measured ~4× over the HOF
    * chain), so only 8-byte hashes ever enter the shuffle, the aggregate
    * is map-side combined, and the ≥2 filter drops the unique-span long
    * tail before any further work. At 100 TB the standard refinement is
    * hash-sampled spans (keep spans whose hash lands in 1/s of the space
    * — an unbiased doc-frequency sample); here the full span set is
    * retained — no silent sampling. */
  def repeatedSpans(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(call_function(graft.functions.GraftFunctions.ShingleName,
          col("text"), lit(SpanN))).as("span_hash"))
      .groupBy(col("span_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") >= 2)
  }

  val repeatedSpansOracle: String =
    s"""WITH d AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
       |  FROM documents),
       |s AS (
       |  SELECT doc_id,
       |         unnest(list_distinct(list_transform(
       |           list_transform(generate_series(1, len(tk) - ${SpanN - 1}),
       |             i -> array_to_string(list_slice(tk, i, i + ${SpanN - 1}), ' ')),
       |           sp -> CAST(CAST(('0x' || substr(md5(sp), 1, 15)) AS UBIGINT) AS BIGINT)))) AS span_hash
       |  FROM d WHERE len(tk) >= $SpanN)
       |SELECT span_hash, CAST(count(*) AS BIGINT) AS n_docs,
       |       min(doc_id) AS first_doc
       |FROM s GROUP BY 1 HAVING count(*) >= 2
       |""".stripMargin

  /** SUBSTRING-REMOVAL DEDUP — the cleaning step [[repeatedSpans]] is
    * the signal for: remove every occurrence of a cross-document
    * repeated [[SpanN]]-token span EXCEPT in its first (min doc_id)
    * document, and reassemble the surviving tokens in order — the
    * exact-substring dedup pass real pretraining pipelines run over
    * verbatim-shared boilerplate. A token is removed iff ANY repeated
    * span's occurrence window covers it (overlapping windows union), so
    * arbitrarily long shared passages collapse without re-deriving
    * maximal matches.
    *
    * Returns (doc_id, n_tokens, n_removed, clean_text).
    *
    * Scale shape: window hashes are 8-byte longs; the repeated-span
    * dictionary is the ≥2-doc survivor set (tiny next to the corpus);
    * coverage explode is bounded by [[SpanN]]·occurrences; reassembly
    * shuffles each token once and groups doc-sized lists — everything
    * corpus-linear, nothing quadratic. */
  def spanRemovalFrom(docs: DataFrame, sampleDenom: Int = 1): DataFrame = {
    require(sampleDenom >= 1, s"bad sample denominator $sampleDenom")
    import graft.core.Caches.TrackedDataset
    // three consumers (span windows, token positions, final doc lengths):
    // unpersisted, the scan + regex tokenization replayed once per
    // consumer (round-14 opt — measured 3 full tokenize passes in the
    // plan; at corpus scale that is 3 reads of every document)
    val d = docs.select(col("doc_id"),
      graft.functions.TextFunctions.tokens(col("text")).as("tk"))
      .trackPersist()
    // 1-based window start s → span hash (same md5-60 device as the
    // detection kernel, but WITH positions — removal needs offsets)
    val wAll = d.filter(size(col("tk")) >= SpanN)
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(1, size(tk) - ${SpanN - 1}),
           |  i -> CAST(conv(substr(md5(concat_ws(' ', slice(tk, i, $SpanN))), 1, 15), 16, 10) AS BIGINT))"""
          .stripMargin)))
      .toDF("doc_id", "s0", "span_hash")
    // the 100 TB refinement, as an EXPLICIT lever (never a silent cap):
    // keep spans whose hash lands in 1/sampleDenom of the space — an
    // unbiased doc-frequency sample of the span population. Sampled
    // coverage is a SUBSET of full coverage per document (a span either
    // participates everywhere or nowhere), so sampled removal never
    // drops a token the full pass would keep — spec-lawed
    // two consumers (repeated-span derivation, coverage): unpersisted,
    // the per-window md5 kernel — the hottest expression in this
    // operator — evaluated twice over every span position
    val w = (if (sampleDenom == 1) wAll
      else wAll.filter(col("span_hash") % sampleDenom === 0))
      .trackPersist()
    val rep = w.select(col("doc_id"), col("span_hash")).distinct()
      .groupBy(col("span_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") >= 2)
    // covered token positions in every NON-first document
    val cov = w.join(rep, "span_hash")
      .filter(col("doc_id") =!= col("first_doc"))
      .select(col("doc_id"),
        explode(sequence(col("s0") + 1, col("s0") + SpanN)).as("p"))
      .distinct()
    val tokpos = d.select(col("doc_id"), posexplode(col("tk")))
      .toDF("doc_id", "p0", "tok")
      .select(col("doc_id"), (col("p0") + 1).as("p"), col("tok"))
    val cleaned = tokpos.join(cov, Seq("doc_id", "p"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", expr(
          "transform(array_sort(collect_list(struct(p, tok))), x -> x.tok)"))
          .as("clean_text"))
    d.select(col("doc_id"), size(col("tk")).cast("long").as("n_tokens"))
      .join(cleaned, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).cast("long")
          .as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Oracle-gated entry over the documents table: md5 of the cleaned
    * text (the corpus fixture contains genuinely repeated spans — the
    * near-clone document families — so removal is exercised, not
    * vacuous). */
  def spanRemoval(spark: SparkSession, dir: String): DataFrame =
    spanRemovalFrom(Tables.documents(spark, dir))
      .select(col("doc_id"), col("n_tokens"), col("n_removed"),
        md5(col("clean_text")).as("clean_md5"))

  /** Shared oracle template; `denom` > 1 adds the span-hash sampling
    * predicate to BOTH the repeated-span derivation and the coverage
    * (the same filtered window set the Spark side uses). */
  private def spanRemovalOracleAt(denom: Int): String = {
    val sampled =
      if (denom == 1) "" else s" AND span_hash % $denom = 0"
    s"""WITH d AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
       |  FROM documents),
       |w AS (
       |  SELECT doc_id, i AS s, span_hash FROM (
       |    SELECT doc_id, i,
       |           CAST(CAST(('0x' || substr(md5(array_to_string(
       |             list_slice(tk, i, i + ${SpanN - 1}), ' ')), 1, 15)) AS UBIGINT) AS BIGINT) AS span_hash
       |    FROM d, unnest(generate_series(1, len(tk) - ${SpanN - 1})) u(i)
       |    WHERE len(tk) >= $SpanN)
       |  WHERE TRUE$sampled),
       |rep AS (
       |  SELECT span_hash, min(doc_id) AS first_doc
       |  FROM (SELECT DISTINCT doc_id, span_hash FROM w)
       |  GROUP BY 1 HAVING count(*) >= 2),
       |cov AS (
       |  SELECT DISTINCT w.doc_id, p
       |  FROM w JOIN rep USING (span_hash),
       |       unnest(generate_series(w.s, w.s + ${SpanN - 1})) v(p)
       |  WHERE w.doc_id <> rep.first_doc),
       |tokpos AS (
       |  SELECT doc_id, tk[i] AS tok, i AS p
       |  FROM d, unnest(generate_series(1, len(tk))) u(i)),
       |kept AS (
       |  SELECT t.doc_id, t.tok, t.p
       |  FROM tokpos t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.p = c.p
       |  WHERE c.p IS NULL)
       |SELECT d.doc_id,
       |       CAST(len(d.tk) AS BIGINT) AS n_tokens,
       |       CAST(len(d.tk) - count(k.p) AS BIGINT) AS n_removed,
       |       md5(coalesce(string_agg(k.tok, ' ' ORDER BY k.p), '')) AS clean_md5
       |FROM d LEFT JOIN kept k ON d.doc_id = k.doc_id
       |GROUP BY d.doc_id, len(d.tk)
       |""".stripMargin
  }

  val spanRemovalOracle: String = spanRemovalOracleAt(1)

  private val SpanSampleDenom = 4

  /** The sampled lever as its own gated row: 1/[[SpanSampleDenom]] of
    * the span-hash space participates. Beside [[spanRemoval]] this
    * prices the sampling trade openly — how many tokens the sampled
    * pass leaves that the full pass removes — instead of hiding it. */
  def spanRemovalSampled(spark: SparkSession, dir: String): DataFrame =
    spanRemovalFrom(Tables.documents(spark, dir), SpanSampleDenom)
      .select(col("doc_id"), col("n_tokens"), col("n_removed"),
        md5(col("clean_text")).as("clean_md5"))

  val spanRemovalSampledOracle: String =
    spanRemovalOracleAt(SpanSampleDenom)

  /** DATASET CARD — the one-row corpus summary a release ships with:
    * document/language/source counts, character mass, vocabulary
    * size, and the exact-duplicate share (docs whose normalized text
    * appears ≥2 times, in integer ppm). Every number is a corpus
    * aggregate the other queries expose at finer grain; the card is
    * the composition that pins them together in one artifact. Plan:
    * three corpus-linear aggregates broadcast-joined as 1-row frames
    * — no wide shuffle, nothing driver-side. */
  def datasetCard(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val base = d.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("lang")).cast("int").as("n_langs"),
      countDistinct(col("source")).cast("int").as("n_sources"),
      sum(col("n_chars")).as("total_chars"),
      expr("sum(n_chars) div count(1)").as("mean_doc_chars"))
    val vocab = d.select(explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) >= 1)
      .agg(countDistinct(col("w")).as("vocab_size"))
    val dups = d
      .select(md5(concat_ws(" ",
        split(trim(lower(col("text"))), "\\s+"))).as("fp"))
      .groupBy(col("fp")).agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(when(col("c") >= 2, col("c"))), lit(0L))
        .as("exact_dup_docs"))
    base.crossJoin(broadcast(vocab)).crossJoin(broadcast(dups))
      .withColumn("dup_ppm", expr("exact_dup_docs * 1000000 div n_docs"))
  }

  val datasetCardOracle: String =
    """WITH fp AS (
      |  SELECT md5(array_to_string(
      |           string_split_regex(trim(lower(text)), '\s+'), ' ')) AS fp
      |  FROM documents),
      |dups AS (
      |  SELECT CAST(coalesce(sum(c) FILTER (WHERE c >= 2), 0) AS BIGINT)
      |           AS exact_dup_docs
      |  FROM (SELECT fp, count(*) AS c FROM fp GROUP BY 1)),
      |vocab AS (
      |  SELECT CAST(count(DISTINCT w) AS BIGINT) AS vocab_size
      |  FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
      |        FROM documents)
      |  WHERE len(w) >= 1),
      |base AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |         CAST(count(DISTINCT lang) AS INT) AS n_langs,
      |         CAST(count(DISTINCT source) AS INT) AS n_sources,
      |         CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |         CAST(sum(n_chars) // count(*) AS BIGINT) AS mean_doc_chars
      |  FROM documents)
      |SELECT n_docs, n_langs, n_sources, total_chars, mean_doc_chars,
      |       vocab_size, exact_dup_docs,
      |       exact_dup_docs * 1000000 // n_docs AS dup_ppm
      |FROM base, vocab, dups
      |""".stripMargin

  // ---------------------------------------------- corpus balance audit

  /** Per-source corpus balance: document count, character mass and its
    * share of the corpus, and the Shannon entropy (nats) of the
    * language distribution INSIDE the source. Low entropy flags a
    * source that quietly became monolingual; char share is the number
    * the [[budgetSelect]] / temperature-mix knobs steer, so this is the
    * audit read alongside them.
    *
    * Entropy uses the aggregation-friendly identity
    * `H = ln(N) − Σ c·ln(c) / N` — one pass over (source, lang) counts,
    * no per-row probability column. Shape: two nested hash aggregates
    * (the second over ≤ sources × langs rows) plus a 1-row broadcast
    * total; nothing here grows faster than the group count. */
  def corpusBalance(spark: SparkSession, dir: String): DataFrame = {
    val byLang = Tables.documents(spark, dir)
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).as("chars"))
    val bySrc = byLang.groupBy(col("source")).agg(
      sum(col("cnt")).as("n_docs"),
      sum(col("chars")).as("chars"),
      sum(col("cnt") * log(col("cnt").cast("double"))).as("clogc"))
    val tot = bySrc.agg(sum(col("chars")).as("total_chars"))
    bySrc.crossJoin(broadcast(tot)).select(
      col("source"), col("n_docs"), col("chars"),
      round(log(col("n_docs").cast("double")) - col("clogc") / col("n_docs"), 6)
        .as("lang_entropy"),
      round(col("chars").cast("double") / col("total_chars"), 6).as("char_share"))
  }

  val corpusBalanceOracle: String =
    """WITH bl AS (
      |  SELECT source, lang, CAST(count(*) AS BIGINT) AS cnt,
      |         CAST(sum(n_chars) AS BIGINT) AS chars
      |  FROM documents GROUP BY 1, 2),
      |bs AS (
      |  SELECT source, CAST(sum(cnt) AS BIGINT) AS n_docs,
      |         CAST(sum(chars) AS BIGINT) AS chars,
      |         sum(cnt * ln(CAST(cnt AS DOUBLE))) AS clogc
      |  FROM bl GROUP BY 1),
      |tot AS (SELECT CAST(sum(chars) AS BIGINT) AS total_chars FROM bs)
      |SELECT source, n_docs, chars,
      |       round(ln(CAST(n_docs AS DOUBLE)) - clogc / n_docs, 6) AS lang_entropy,
      |       round(CAST(chars AS DOUBLE) / total_chars, 6) AS char_share
      |FROM bs CROSS JOIN tot
      |""".stripMargin

  // --------------------------------------------------- interleaved order

  /** Deterministic TRAINING ORDER that interleaves sources by stride
    * scheduling: document `r` of a source with `n_s` documents gets the
    * virtual position `(2r−1)/(2n_s)` on the unit interval (integer ppm
    * arithmetic), so every source spreads evenly across the epoch —
    * reading the output in `train_pos` order never clumps a source, the
    * property shuffled-concatenation only achieves in expectation and
    * random seeds can violate badly for small sources. The final
    * position is [[Rnk.globalRank]] over the tie-free
    * (pos_key, source, src_rank) order — the distributed two-pass, no
    * single-partition window — and per-source ranks are partitioned
    * windows. One broadcast of the source-count table; everything else
    * is scan + window + the rank's range partitioning. */
  def interleaveOrder(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    val ranked = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"))
      .withColumn("src_rank", row_number().over(w).cast("long"))
    val ns = ranked.groupBy(col("source")).agg(count(lit(1)).as("ns"))
    val keyed = ranked.join(broadcast(ns), Seq("source"))
      .withColumn("pos_key",
        expr("((2 * src_rank - 1) * 1000000) div (2 * ns)"))
      .drop("ns")
    Rnk.globalRank(keyed,
        Seq(col("pos_key"), col("source"), col("src_rank")), "train_pos")
      .select(col("doc_id"), col("source"), col("src_rank"),
              col("pos_key"), col("train_pos"))
  }

  val interleaveOrderOracle: String =
    """WITH s AS (
      |  SELECT doc_id, source,
      |         CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id)
      |              AS BIGINT) AS src_rank
      |  FROM documents),
      |n AS (SELECT source, CAST(count(*) AS BIGINT) AS ns
      |      FROM documents GROUP BY 1),
      |k AS (
      |  SELECT doc_id, s.source, src_rank,
      |         ((2 * src_rank - 1) * 1000000) // (2 * ns) AS pos_key
      |  FROM s JOIN n USING (source))
      |SELECT doc_id, source, src_rank, CAST(pos_key AS BIGINT) AS pos_key,
      |       CAST(row_number() OVER (ORDER BY pos_key, source, src_rank)
      |            AS BIGINT) AS train_pos
      |FROM k
      |""".stripMargin

  // --------------------------------------------- source vocabulary overlap

  /** PAIRWISE SOURCE VOCABULARY OVERLAP: Jaccard of distinct-token sets
    * for every source pair — the redundancy map that says which feeds
    * cover the same content space (candidates for dropping, or for the
    * pairwise dedup pass [[graft.ops.Dedup]] prices per pair). Shape:
    * one distinct (source, token) projection, a token-grain self-join
    * whose per-token fan-out is bounded by C(|sources|, 2) — never
    * token² — and source-pair-grain aggregates with the vocab sizes
    * broadcast back. Integer ppm Jaccard via inclusion–exclusion. */
  def sourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.Caches.TrackedDataset
    val vocab = Tables.documents(spark, dir)
      .select(col("source"), explode(tokens(col("text"))).as("token"))
      .distinct()
      .trackPersist() // both sides of the pair join + the size dimension
    val sizes = vocab.groupBy(col("source")).agg(count(lit(1)).as("vsize"))
    val inter = vocab.as("a").join(vocab.as("b"),
        col("a.token") === col("b.token") &&
          col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(broadcast(sizes.withColumnRenamed("source", "source_a")
        .withColumnRenamed("vsize", "v_a")), Seq("source_a"))
      .join(broadcast(sizes.withColumnRenamed("source", "source_b")
        .withColumnRenamed("vsize", "v_b")), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("v_a"), col("v_b"),
        col("n_inter"),
        expr("n_inter * 1000000 div (v_a + v_b - n_inter)")
          .as("jaccard_ppm"))
  }

  val sourceOverlapOracle: String =
    """WITH v AS (
      |  SELECT DISTINCT source, unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
      |  FROM documents),
      |s AS (SELECT source, CAST(count(*) AS BIGINT) AS vsize FROM v GROUP BY 1),
      |i AS (
      |  SELECT a.source AS source_a, b.source AS source_b,
      |         CAST(count(*) AS BIGINT) AS n_inter
      |  FROM v a JOIN v b ON a.token = b.token AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT i.source_a, i.source_b, sa.vsize AS v_a, sb.vsize AS v_b, i.n_inter,
      |       CAST(i.n_inter * 1000000 // (sa.vsize + sb.vsize - i.n_inter) AS BIGINT) AS jaccard_ppm
      |FROM i
      |JOIN s sa ON i.source_a = sa.source
      |JOIN s sb ON i.source_b = sb.source
      |""".stripMargin

  // ------------------------------------------------- HTML → text extract

  /** HTML markup synthesized around each document's text BY FORMULA
    * (title/heading boilerplate + every space promoted to a paragraph
    * break), so the extraction oracle can rebuild the identical markup
    * in SQL and verify the full strip. */
  private def htmlOf: Column =
    concat(
      lit("<html><head><title>doc "), col("doc_id"),
      lit("</title></head><body><h1>Doc "), col("doc_id"),
      lit("</h1><p>"),
      regexp_replace(col("text"), " ", "</p><p>"),
      lit("</p></body></html>"))

  /** HTML → TEXT extraction — step one of every web-corpus pipeline:
    * tags become whitespace (`<[^>]*>` → space, never empty — else
    * `<p>a</p><p>b</p>` would weld words together), whitespace
    * collapses, and the audit emits tag count, markup overhead in ppm,
    * and the md5 of the recovered text. Pure codegen'd `regexp_replace`
    * projections over one scan — no UDF, no shuffle; the regex is
    * dialect-portable (same semantics in Java regex and RE2/DuckDB).
    * The oracle rebuilds the identical markup in SQL and replays the
    * strip; a Round7OpsSpec case additionally pins the end-to-end
    * guarantee that the recovered text equals the ORIGINAL document
    * text (whitespace-normalized) — the extraction is lossless on
    * text content. */
  def htmlExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("html", htmlOf)
      .withColumn("clean", trim(regexp_replace(
        regexp_replace(col("html"), lit("<[^>]*>"), lit(" ")),
        lit("\\s+"), lit(" "))))
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("html"), lit("<[^>]*>"), lit(0)))
          .cast("long").as("n_tags"),
        length(col("html")).cast("long").as("html_len"),
        length(col("clean")).cast("long").as("text_len"),
        expr("CAST((length(html) - length(clean)) * 1000000 div length(html) AS BIGINT)")
          .as("markup_ppm"),
        md5(col("clean")).as("clean_md5"))

  val htmlExtractOracle: String =
    """WITH h AS (
      |  SELECT doc_id, text,
      |         '<html><head><title>doc ' || CAST(doc_id AS VARCHAR) ||
      |         '</title></head><body><h1>Doc ' || CAST(doc_id AS VARCHAR) ||
      |         '</h1><p>' || replace(text, ' ', '</p><p>') ||
      |         '</p></body></html>' AS html
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, text, html,
      |         trim(regexp_replace(regexp_replace(html, '<[^>]*>', ' ', 'g'),
      |                             '\s+', ' ', 'g')) AS clean
      |  FROM h)
      |SELECT doc_id,
      |       CAST(len(regexp_extract_all(html, '<[^>]*>')) AS BIGINT) AS n_tags,
      |       CAST(length(html) AS BIGINT) AS html_len,
      |       CAST(length(clean) AS BIGINT) AS text_len,
      |       CAST((length(html) - length(clean)) * 1000000 // length(html) AS BIGINT) AS markup_ppm,
      |       md5(clean) AS clean_md5
      |FROM c
      |""".stripMargin
}
