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

  private val Dim = 64

  /** Symmetric int8 quantization of the embedding column: per-vector
    * scale = max|v_i| / 127, q_i = floor(v_i/scale + 0.5) ∈ [−127, 127],
    * plus the mean squared reconstruction error. The 4× (fp32) / 8×
    * (fp64) memory cut is what makes a 100 TB ANN index fit executor
    * memory; the error column is the per-vector audit that the cut was
    * safe. Pure per-row projection — no shuffle, scan-bound.
    *
    * Engine-portability: `floor(x + 0.5)` (explicit half-up) instead of
    * `round` — IEEE multiply/divide/floor are bit-identical everywhere,
    * while native round() half-even/half-up conventions differ between
    * engines. The error fold runs IN ARRAY ORDER on both sides. */
  def quantizeInt8(spark: SparkSession, dir: String): DataFrame = {
    val v = col("embedding").cast("array<double>")
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), v.as("v"))
      .withColumn("scale",
        array_max(transform(col("v"), x => abs(x))) / lit(127.0))
      .withColumn("q",
        when(col("scale") === 0d, transform(col("v"), _ => lit(0)))
          .otherwise(transform(col("v"),
            x => floor(x / col("scale") + lit(0.5)).cast("int"))))
      .withColumn("recon_err", round(
        aggregate(
          zip_with(col("v"), col("q"),
            (x, qq) => (x - qq.cast("double") * col("scale")) *
                       (x - qq.cast("double") * col("scale"))),
          lit(0.0), (acc, e) => acc + e) / lit(Dim.toDouble), 6))
      // q ships as a comma-joined string, not array<int>: the correctness
      // driver sorts result rows with pandas, which cannot sort/hash array
      // cells (round-3 red row). Same rule labelCentroids already follows:
      // no array columns in oracle-checked output.
      .select(col("vec_id"), round(col("scale"), 6).as("scale"),
              concat_ws(",", col("q").cast("array<string>")).as("q"),
              col("recon_err"))
  }

  val quantizeOracle: String =
    s"""WITH n AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |s AS (
       |  SELECT vec_id, v,
       |         list_max(list_transform(v, x -> abs(x))) / 127 AS scale
       |  FROM n),
       |qq AS (
       |  SELECT vec_id, v, scale,
       |         CASE WHEN scale = 0 THEN list_transform(v, x -> 0)
       |              ELSE list_transform(v, x -> CAST(floor(x / scale + 0.5) AS INT))
       |         END AS q
       |  FROM s)
       |SELECT vec_id, round(scale, 6) AS scale,
       |       array_to_string(list_transform(q, x -> CAST(x AS VARCHAR)), ',') AS q,
       |       round(list_sum(list_transform(generate_series(1, $Dim),
       |               i -> (v[i] - q[i] * scale) * (v[i] - q[i] * scale)))
       |             / $Dim, 6) AS recon_err
       |FROM qq
       |""".stripMargin
}
