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

  // ------------------------------------- weighted sampling (A-Res race)

  /** 2^60, the range of [[hash60]] — the denominator that turns a hash
    * into a uniform double in (0, 1). */
  private[graft] val H = 1152921504606846976.0 // 2^60

  /** Efraimidis–Spirakis weighted sampling WITHOUT replacement: each key
    * draws `u = Uniform(0,1)` and the k smallest values of `-ln(u) / w`
    * win — equivalently an exponential race where key i holds an
    * `Exp(w_i)` clock. Inclusion probability is proportional-to-weight
    * at every prefix, the standard quality-weighted corpus cut
    * (weight = doc quality, token count, dedup-cluster mass, ...).
    *
    * The uniform draw is `(hash60(salt:key) + 0.5) / 2^60` — hash-
    * deterministic like everything else in this file (stable across
    * partitionings, re-runs, and engines), never exactly 0 or 1 so the
    * log is always finite.
    *
    * Scale: the plan is a projection + `TakeOrderedAndProject` — each
    * task keeps its local top-k and the driver merges `partitions × k`
    * candidate rows; no global sort, no shuffle of the data. Rows with
    * non-positive weight are excluded (they would win with probability
    * 0 anyway; filtering keeps the log's domain clean). */
  def weightedSample(df: DataFrame, key: Column, weight: Column, k: Int,
                     salt: String = "ws"): DataFrame = {
    val u = (hash60(concat(lit(salt + ":"), key.cast("string"))) + lit(0.5)) / lit(H)
    val priority = -log(u) / weight.cast("double")
    df.filter(weight.cast("double") > 0)
      .withColumn("__p", priority)
      // tie-break on the key: priorities are continuous so real ties are
      // measure-zero, but a deterministic total order is this repo's rule
      .orderBy(col("__p").asc, key.asc)
      .limit(k)
      .drop("__p")
  }

  /** Per-group variant of [[weightedSample]]: an independent k-row
    * weighted cut INSIDE every group — "top-k quality-weighted docs per
    * source", the stratified sibling of the global race. Same
    * hash-deterministic priorities; selection is a row_number over a
    * GROUP-partitioned window (parallel across groups, never a global
    * sort), so the plan is one hash-partitioned window — the
    * [[graft.ops.Rnk]] top-k-per-group shape. */
  def weightedSamplePerGroup(df: DataFrame, group: Column, key: Column,
                             weight: Column, k: Int,
                             salt: String = "ws"): DataFrame = {
    val u = (hash60(concat(lit(salt + ":"), key.cast("string"))) + lit(0.5)) / lit(H)
    val priority = -log(u) / weight.cast("double")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group).orderBy(priority.asc, key.asc)
    df.filter(weight.cast("double") > 0)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  private[ops] val WsGroupK = 5

  /** Query: the [[WsGroupK]] length-weighted winners inside every
    * source. */
  def weightedPerGroupQuery(spark: SparkSession, dir: String): DataFrame =
    weightedSamplePerGroup(Tables.documents(spark, dir)
                             .select(col("doc_id"), col("source"), col("n_chars")),
                           col("source"), col("doc_id"), col("n_chars"), WsGroupK)

  val weightedPerGroupOracle: String =
    s"""WITH t AS (
       |  SELECT doc_id, source, n_chars,
       |         (CAST(('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT) + 0.5) / $H AS u
       |  FROM documents WHERE n_chars > 0),
       |r AS (
       |  SELECT doc_id, source, n_chars,
       |         row_number() OVER (PARTITION BY source
       |                            ORDER BY -ln(u) / n_chars ASC, doc_id ASC) AS rn
       |  FROM t)
       |SELECT doc_id, source, n_chars FROM r WHERE rn <= $WsGroupK
       |""".stripMargin

  private[ops] val WsK = 150

  /** Query: a [[WsK]]-document corpus cut weighted by document length —
    * long documents are proportionally more likely to be kept. */
  def weightedQuery(spark: SparkSession, dir: String): DataFrame =
    weightedSample(Tables.documents(spark, dir)
                     .select(col("doc_id"), col("source"), col("n_chars")),
                   col("doc_id"), col("n_chars"), WsK)

  val weightedOracle: String =
    s"""WITH t AS (
       |  SELECT doc_id, source, n_chars,
       |         (CAST(('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT) + 0.5) / $H AS u
       |  FROM documents WHERE n_chars > 0)
       |SELECT doc_id, source, n_chars FROM t
       |ORDER BY -ln(u) / n_chars ASC, doc_id ASC
       |LIMIT $WsK
       |""".stripMargin

  // ----------------------------------------- length-distribution matching

  /** DISTRIBUTION-MATCHING downsample: reshape every source's document-
    * LENGTH distribution onto the global one — the curation move that
    * stops a source full of stubs (or one of mega-pages) from skewing
    * what the model sees, without touching the source mix itself
    * (that is [[TextPrep]]'s temperature mix). For each (source,
    * length-bucket) cell the target count is
    * `global_bucket_share × source_total` and the cell keeps
    * `min(1, target/actual)` of its docs by the deterministic per-doc
    * hash draw — only ever downsampling (a cell below target keeps
    * everything; nothing is invented).
    *
    * Integer end to end: the target is a DECIMAL(38,0)-exact integral
    * div (counts can be 10¹²-scale at 100 TB, and `n_bucket × n_src`
    * overflows BIGINT), the keep threshold is quota-in-[0,D) integral
    * arithmetic, and the draw is the corpus-standard `hash60` bucket —
    * so the audit hash-matches any engine. Plan shape: two doc-grain
    * scans (cell counts, then the filtered recount), three broadcast
    * dimension joins at (source)/(bucket)/1-row grain, and a broadcast
    * of the (source × 10)-cell quota table back onto the second scan —
    * no row-grain shuffle anywhere. */
  def lengthMatch(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        expr("least(n_chars div 200, 9)").as("len_bucket"))
    val sb = d.groupBy(col("source"), col("len_bucket"))
      .agg(count(lit(1)).as("n_docs"))
    val bySrc = d.groupBy(col("source")).agg(count(lit(1)).as("n_src"))
    val byBucket = d.groupBy(col("len_bucket"))
      .agg(count(lit(1)).as("n_bucket"))
    val grand = d.agg(count(lit(1)).as("grand"))
    val quota = sb
      .join(broadcast(bySrc), Seq("source"))
      .join(broadcast(byBucket), Seq("len_bucket"))
      .crossJoin(broadcast(grand))
      .withColumn("target_n",
        expr("CAST(n_bucket AS DECIMAL(38,0)) * n_src div grand"))
      .withColumn("quota_d",
        least(lit(D), expr(s"$D * target_n div n_docs")))
    val kept = d
      .withColumn("b", bucket(col("doc_id"), "lenmatch"))
      .join(broadcast(quota.select(col("source"), col("len_bucket"),
        col("quota_d").as("q"))), Seq("source", "len_bucket"))
      .filter(col("b") < col("q"))
      .groupBy(col("source"), col("len_bucket"))
      .agg(count(lit(1)).as("n_kept"))
    quota
      .join(kept, Seq("source", "len_bucket"), "left")
      .select(col("source"), col("len_bucket"), col("n_docs"),
        col("target_n"), col("quota_d"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  val lengthMatchOracle: String =
    s"""WITH d AS (
       |  SELECT doc_id, source, least(n_chars // 200, 9) AS len_bucket
       |  FROM documents),
       |sb AS (SELECT source, len_bucket, CAST(count(*) AS BIGINT) AS n_docs
       |       FROM d GROUP BY 1, 2),
       |s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_src FROM d GROUP BY 1),
       |b AS (SELECT len_bucket, CAST(count(*) AS BIGINT) AS n_bucket FROM d GROUP BY 1),
       |g AS (SELECT CAST(count(*) AS BIGINT) AS grand FROM d),
       |quota AS (
       |  SELECT sb.source, sb.len_bucket, sb.n_docs,
       |         CAST(CAST(b.n_bucket AS HUGEINT) * s.n_src // g.grand AS BIGINT) AS target_n
       |  FROM sb JOIN s USING (source) JOIN b USING (len_bucket) CROSS JOIN g),
       |q2 AS (SELECT source, len_bucket, n_docs, target_n,
       |              CAST(least($D, $D * target_n // n_docs) AS BIGINT) AS quota_d
       |       FROM quota),
       |kept AS (
       |  SELECT d.source, d.len_bucket, CAST(count(*) AS BIGINT) AS n_kept
       |  FROM d JOIN q2 ON d.source = q2.source AND d.len_bucket = q2.len_bucket
       |  WHERE CAST(CAST(('0x' || substr(md5('lenmatch:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT) % $D < q2.quota_d
       |  GROUP BY 1, 2)
       |SELECT q2.source, q2.len_bucket, q2.n_docs, q2.target_n, q2.quota_d,
       |       coalesce(k.n_kept, 0) AS n_kept
       |FROM q2 LEFT JOIN kept k
       |  ON q2.source = k.source AND q2.len_bucket = k.len_bucket
       |""".stripMargin
}
