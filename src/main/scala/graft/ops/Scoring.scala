package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** IN-PLAN MODEL SCORING: apply a linear classifier (trained elsewhere —
  * a quality gate, a toxicity filter, a topic router) to every embedding
  * as a pure column expression — the inference pattern that scores
  * 100 TB without leaving the scan: weights ride the plan as a literal
  * array into the fused native dot kernel, so scoring is one
  * whole-stage-codegen projection, no shuffle, no model service in the
  * loop. The emitted LOGIT (not the sigmoid) is the oracle-compared
  * value: the dot product folds in element order on both engines and the
  * weights are exact rationals (`k/1000`), so the score hash-matches;
  * `exp` would drag libm differences into the gate for no semantic
  * gain — callers apply the monotone sigmoid downstream if they need
  * probabilities (thresholding is equivalent on the logit).
  */
object Scoring {

  private val Dim = 64
  private val Bias = 0.05

  /** Deterministic integer weight grid, derived from the corpus-standard
    * md5-60 device so both engines can rebuild it: k_d ∈ [-1000, 1000],
    * w_d = k_d / 1000. */
  private[ops] def weightGrid: Array[Int] = (0 until Dim).map { d =>
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"w:$d".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    ((java.lang.Long.parseLong(hex, 16) % 2001L) - 1000L).toInt
  }.toArray

  def scoreQuery(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val w = weightGrid.map(_ / 1000.0).toSeq
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"),
        round(call_function(graft.functions.GraftFunctions.DotRawName,
          col("embedding").cast("array<double>"), typedLit(w)) + lit(Bias), 6)
          .as("logit"))
      .withColumn("pred", col("logit") > 0.0)
  }

  val scoreOracle: String = {
    val ws = weightGrid.map(k => s"($k)/1000.0").mkString("[", ", ", "]")
    s"""WITH s AS (
       |  SELECT vec_id, label,
       |         round(list_sum(list_transform(generate_series(1, $Dim),
       |           i -> CAST(embedding AS DOUBLE[])[i] * ($ws)[i])) + $Bias, 6)
       |           AS logit
       |  FROM embeddings)
       |SELECT vec_id, label, logit, logit > 0.0 AS pred FROM s
       |""".stripMargin
  }
}
