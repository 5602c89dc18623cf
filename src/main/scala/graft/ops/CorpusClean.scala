package graft.ops

import graft.core.Caches.TrackedDataset
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composed training-corpus cleaning pipeline: language filter +
  * quality filter + exact dedup + near-dedup, as ONE declarative query
  * producing a per-document keep/drop decision with the first failing
  * rule as the reason.
  *
  * Composition is plan-level: langid and quality are shuffle-free
  * projections over one scan, exact-dedup is a hash aggregation on the
  * fingerprint, and near-dup pairs come from the LSH-verified Jaccard
  * index — the per-operator scale properties carry over unchanged. The
  * dedup policy is keep-first: the lowest doc_id of a duplicate group (or
  * near-dup pair) survives, every other member drops.
  */
object CorpusClean {

  val QualityThreshold = 0.35

  def query(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.tokens
    // ONE scan + ONE tokenization computes every per-row metric: the lang
    // score columns, the quality components, and the exact fingerprint all
    // reference the same tokens(text) subtree, which codegen's common-
    // subexpression elimination evaluates once per row inside a single
    // Project. (Composing langid()/quality()/Dedup.exact() instead re-scans
    // and re-tokenizes documents once per branch — measured 2× slower.)
    // The persist is a real barrier: the narrow profile is consumed by the
    // fingerprint rollup AND the final join, and caching it also stops
    // CollapseProject from inlining the score pipeline into the CASE chain.
    val toks = tokens(col("text"))
    val (uniq, lenScore, stop) = TextAnalysis.qualityParts
    val profileCols: Seq[org.apache.spark.sql.Column] =
      Seq(col("doc_id"),
          round(uniq * 0.4 + lenScore * 0.3 + stop * 0.3, 6).as("quality_score"),
          md5(concat_ws(" ", toks)).as("exact_fp")) ++
        TextAnalysis.langScoreCols
    val profile = graft.core.Tables.documents(spark, dir)
      .select(profileCols: _*)
      .withColumn("lang_pred", TextAnalysis.langPredExpr)
      .select(col("doc_id"), col("lang_pred"), col("quality_score"), col("exact_fp"))
      .trackPersist()

    // exact-dup flags from the cached fingerprints (keep-first: the group
    // minimum survives) — no second pass over text
    val canon = profile.groupBy(col("exact_fp"))
      .agg(min(col("doc_id")).as("canonical_id"))
    val nearDup = Dedup.jaccardPairs(spark, dir)
      .select(col("doc_b").as("doc_id")).distinct()
      .withColumn("is_near_dup", lit(true))

    profile
      .join(canon, Seq("exact_fp"))
      .join(nearDup, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("lang_pred"), col("quality_score"),
        (col("doc_id") =!= col("canonical_id")).as("is_exact_dup"),
        coalesce(col("is_near_dup"), lit(false)).as("is_near_dup"))
      .withColumn("reason",
        when(col("lang_pred") =!= "en", "lang")
          .when(col("quality_score") < QualityThreshold, "quality")
          .when(col("is_exact_dup"), "exact_dup")
          .when(col("is_near_dup"), "near_dup")
          .otherwise("keep"))
      .withColumn("keep", col("reason") === "keep")
  }

  val oracle: String = {
    // compose the already-proven per-operator oracles as CTEs
    def cte(sql: String) = sql.trim.stripSuffix(";")
    s"""WITH lang AS (
       |  SELECT doc_id, lang_pred FROM (${cte(TextAnalysis.langidOracle)}) x),
       |qual AS (
       |  SELECT doc_id, quality_score FROM (${cte(TextAnalysis.qualityOracle)}) x),
       |exact_dup AS (
       |  SELECT doc_id, true AS is_exact_dup
       |  FROM (${cte(Dedup.exactOracle)}) x WHERE is_duplicate),
       |near_dup AS (
       |  SELECT DISTINCT doc_b AS doc_id, true AS is_near_dup
       |  FROM (${cte(Dedup.jaccardPairsOracle)}) x),
       |merged AS (
       |  SELECT l.doc_id, l.lang_pred, q.quality_score,
       |         coalesce(e.is_exact_dup, false) AS is_exact_dup,
       |         coalesce(n.is_near_dup, false) AS is_near_dup
       |  FROM lang l
       |  JOIN qual q ON l.doc_id = q.doc_id
       |  LEFT JOIN exact_dup e ON l.doc_id = e.doc_id
       |  LEFT JOIN near_dup n ON l.doc_id = n.doc_id)
       |SELECT doc_id, lang_pred, quality_score, is_exact_dup, is_near_dup,
       |       CASE WHEN lang_pred <> 'en' THEN 'lang'
       |            WHEN quality_score < $QualityThreshold THEN 'quality'
       |            WHEN is_exact_dup THEN 'exact_dup'
       |            WHEN is_near_dup THEN 'near_dup'
       |            ELSE 'keep' END AS reason,
       |       CASE WHEN lang_pred <> 'en' THEN false
       |            WHEN quality_score < $QualityThreshold THEN false
       |            WHEN is_exact_dup THEN false
       |            WHEN is_near_dup THEN false
       |            ELSE true END AS keep
       |FROM merged
       |""".stripMargin
  }
}
