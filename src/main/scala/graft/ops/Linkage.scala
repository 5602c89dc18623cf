package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Fuzzy record linkage (dictionary repair): match corrupted name strings
  * back to a clean vocabulary with blocking + edit-distance verification —
  * the classic entity-resolution step between "exact dedup" and
  * "embedding similarity".
  *
  * Scale design: naive fuzzy matching is |dirty| × |clean| edit-distance
  * calls. Blocking makes it Σ_b |dirty_b| × |clean_b|: candidates must
  * share a cheap key (first two characters + a length band here — robust
  * to single-char drops after position 2), and only candidates pay the
  * O(len²) levenshtein. The clean vocabulary is DISTINCT names
  * (dimension-sized, broadcast); the match is argmin(distance) with a
  * deterministic name tiebreak.
  */
object Linkage {

  private val MaxDistance = 2

  /** Oracle scenario: part names with every 3rd character dropped for
    * 1-in-3 names (deterministic via md5 parity) are linked back to the
    * clean name vocabulary. */
  def query(spark: SparkSession, dir: String): DataFrame = {
    val clean = Tables.part(spark, dir).select(col("p_name")).distinct()
    val dirty = clean
      .filter(conv(substring(md5(col("p_name")), 1, 2), 16, 10).cast("int") % 3 === 0)
      .select(concat(substring(col("p_name"), 1, 2),
                     substring(col("p_name"), 4, 1000)).as("dirty_name"))
      .distinct()
    linkNames(spark, dirty, clean.withColumnRenamed("p_name", "clean_name"))
  }

  /** Block on (2-char prefix, ±1 length band) then verify with
    * levenshtein ≤ [[MaxDistance]]; best match per dirty name by
    * (distance, name) — deterministic. */
  def linkNames(spark: SparkSession, dirty: DataFrame, clean: DataFrame): DataFrame = {
    val d = dirty.withColumn("blk", lower(substring(col("dirty_name"), 1, 2)))
    val c = broadcast(clean.withColumn("blk", lower(substring(col("clean_name"), 1, 2))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("dirty_name"))
      .orderBy(col("distance"), col("clean_name"))
    d.join(c, Seq("blk"))
      .filter(abs(length(col("dirty_name")) - length(col("clean_name"))) <= MaxDistance)
      // thresholded levenshtein (round-14 opt): O(k·min(len)) early-exit
      // DP instead of the full O(len²) table; -1 flags distance > k, so
      // `>= 0` ≡ the old `<= MaxDistance`, and the reported distance for
      // surviving rows is the true value either way
      .withColumn("distance",
        levenshtein(col("dirty_name"), col("clean_name"), MaxDistance))
      .filter(col("distance") >= 0)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("dirty_name"), col("clean_name"), col("distance"))
  }

  val oracle: String =
    s"""WITH clean AS (SELECT DISTINCT p_name FROM part),
       |dirty AS (
       |  SELECT DISTINCT substr(p_name, 1, 2) || substr(p_name, 4) AS dirty_name
       |  FROM clean
       |  WHERE CAST(('0x' || substr(md5(p_name), 1, 2)) AS INT) % 3 = 0),
       |cand AS (
       |  SELECT d.dirty_name, c.p_name AS clean_name,
       |         levenshtein(d.dirty_name, c.p_name) AS distance
       |  FROM dirty d JOIN clean c
       |    ON lower(substr(d.dirty_name, 1, 2)) = lower(substr(c.p_name, 1, 2))
       |   AND abs(length(d.dirty_name) - length(c.p_name)) <= $MaxDistance
       |  WHERE levenshtein(d.dirty_name, c.p_name) <= $MaxDistance),
       |best AS (
       |  SELECT dirty_name, clean_name, distance,
       |         row_number() OVER (PARTITION BY dirty_name
       |                            ORDER BY distance, clean_name) AS rn
       |  FROM cand)
       |SELECT dirty_name, clean_name, CAST(distance AS INT) AS distance
       |FROM best WHERE rn = 1
       |""".stripMargin
}
