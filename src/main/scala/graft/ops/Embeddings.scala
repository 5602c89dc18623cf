package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Embedding-column utilities beyond similarity search: L2 normalization
  * and per-label centroids/statistics — the vector-side bookkeeping a
  * training-data pipeline runs next to ANN (cluster summaries, probe
  * vectors for IVF, drift checks between corpus snapshots).
  *
  * Scale design: [[labelCentroids]] is one explode + one hash aggregation
  * — shuffle volume is rows × dims (key, double) pairs with map-side
  * partial aggregation, and the result is bounded by labels × dims
  * regardless of corpus size. Sums accumulate as exact decimals so the
  * reduction order (which Spark does not fix) cannot change the result —
  * the same discipline the money pipelines use, which is what lets the
  * operator ship a value-exact DuckDB oracle.
  */
object Embeddings {

  /** L2-normalized copy of the embedding column (unit vectors; zero
    * vectors pass through unchanged to avoid 0/0). */
  def normalizeL2(df: DataFrame, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val n2 = aggregate(v, lit(0.0), (acc, x) => acc + x * x)
    df.withColumn(vecCol,
      when(n2 > 0, transform(v, x => x / sqrt(n2))).otherwise(v))
  }

  /** Per-(label, dimension) centroid over the corpus: exact decimal sum /
    * count, emitted as scalar rows (label, dim, n, centroid) — bounded by
    * |labels| × dims, portable across engines (no array columns). */
  def labelCentroids(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("label"),
              posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "x")))
      .groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n"),
           round((sum(col("x").cast("decimal(25,10)")).cast("double") /
                  count(lit(1))), 6).as("centroid"))

  val labelCentroidsOracle: String =
    """SELECT label, CAST(i - 1 AS INT) AS dim,
      |       CAST(count(*) AS BIGINT) AS n,
      |       round(CAST(sum(CAST(v[i] AS DECIMAL(25,10))) AS DOUBLE) / count(*), 6) AS centroid
      |FROM (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |     unnest(generate_series(1, 64)) t(i)
      |GROUP BY 1, 2
      |""".stripMargin

  /** Per-label corpus statistics: count, mean vector norm, and the norm
    * spread — drift fingerprints comparable between corpus snapshots. */
  def labelStats(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val v = col("embedding").cast("array<double>")
    Tables.embeddings(spark, dir)
      .select(col("label"),
              sqrt(call_function(graft.functions.GraftFunctions.DotName, v, v))
                .as("norm"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
           round(sum(col("norm").cast("decimal(25,10)")).cast("double") /
                 count(lit(1)), 6).as("mean_norm"),
           round(min(col("norm")), 6).as("min_norm"),
           round(max(col("norm")), 6).as("max_norm"))
  }

  val labelStatsOracle: String =
    """WITH n AS (
      |  SELECT label,
      |         sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS norm
      |  FROM embeddings)
      |SELECT label, CAST(count(*) AS BIGINT) AS n,
      |       round(CAST(sum(CAST(norm AS DECIMAL(25,10))) AS DOUBLE) / count(*), 6) AS mean_norm,
      |       round(min(norm), 6) AS min_norm,
      |       round(max(norm), 6) AS max_norm
      |FROM n GROUP BY 1
      |""".stripMargin
}
