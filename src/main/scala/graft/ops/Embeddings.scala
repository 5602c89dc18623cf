package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Caches.TrackedDataset
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

  /** EMBEDDING-SPACE STABILITY across snapshot halves: split the corpus
    * by `vec_id % 2`, compute each label's per-split centroid, and emit
    * the cosine between the two centroids — ≈1 for a stable space; a
    * label whose halves disagree has heterogeneous or drifting
    * embeddings (re-embedding mid-corpus, label noise, a mixed
    * concept). The self-split form is the calibration baseline for the
    * cross-snapshot run (same code, two real snapshots).
    *
    * Portability discipline: centroids round to 6 dp and convert to the
    * exact micro-integer grid; all cross products and norms sum as
    * BIGINT (≤ ~10¹² here), so the only floating point is the final
    * shared IEEE division — the cosine hash-matches any engine. */
  def splitDriftCentroids(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.embeddings(spark, dir)
      .select(col("label"), (col("vec_id") % 2).as("split"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "x")))
      .groupBy(col("label"), col("split"), col("dim"))
      .agg(count(lit(1)).as("n"),
        expr("CAST(round(round(CAST(sum(CAST(x AS DECIMAL(25,10))) AS DOUBLE) / count(1), 6) * 1000000, 0) AS BIGINT)")
          .as("cm"))
    val a = c.filter(col("split") === 0)
      .select(col("label"), col("dim"), col("cm").as("cm_a"), col("n").as("n_a"))
    val b = c.filter(col("split") === 1)
      .select(col("label"), col("dim"), col("cm").as("cm_b"), col("n").as("n_b"))
    a.join(b, Seq("label", "dim"))
      .groupBy(col("label"))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        sum(col("cm_a") * col("cm_b")).as("sp"),
        sum(col("cm_a") * col("cm_a")).as("s0"),
        sum(col("cm_b") * col("cm_b")).as("s1"))
      .select(col("label"), col("n_a"), col("n_b"),
        round(col("sp").cast("double") /
          (sqrt(col("s0").cast("double")) * sqrt(col("s1").cast("double"))), 6)
          .as("cosine"))
  }

  val splitDriftCentroidsOracle: String =
    """WITH e AS (
      |  SELECT label, vec_id % 2 AS split, CAST(embedding AS DOUBLE[]) AS v
      |  FROM embeddings),
      |c AS (
      |  SELECT label, split, i AS dim, CAST(count(*) AS BIGINT) AS n,
      |         CAST(round(round(CAST(sum(CAST(v[i] AS DECIMAL(25,10))) AS DOUBLE) / count(*), 6) * 1000000, 0) AS BIGINT) AS cm
      |  FROM e, unnest(generate_series(1, 64)) t(i)
      |  GROUP BY 1, 2, 3),
      |j AS (
      |  SELECT a.label, a.n AS n_a, b.n AS n_b,
      |         a.cm AS cm_a, b.cm AS cm_b
      |  FROM c a JOIN c b ON a.label = b.label AND a.dim = b.dim
      |  WHERE a.split = 0 AND b.split = 1)
      |SELECT label, CAST(max(n_a) AS BIGINT) AS n_a, CAST(max(n_b) AS BIGINT) AS n_b,
      |       round(CAST(sum(cm_a * cm_b) AS DOUBLE) /
      |             (sqrt(CAST(sum(cm_a * cm_a) AS DOUBLE)) *
      |              sqrt(CAST(sum(cm_b * cm_b) AS DOUBLE))), 6) AS cosine
      |FROM j GROUP BY 1
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

  /** Per-label PREFIX-ENERGY audit: what share of each vector's squared
    * L2 norm lives in its first [[PrefixDims]] dimensions — the
    * truncation-quality question behind matryoshka-style dimension cuts
    * (serve 16 of 64 dims ⇒ the prefix share IS the retained cosine
    * mass: `cos(v, v_prefix) = ‖v₁₆‖ / ‖v‖`, so energy share is cos²).
    * A label whose min share is low cannot be truncated safely even if
    * the average looks fine — hence min alongside mean. One scan, two
    * fixed-order dot kernels per row, label-sized hash aggregate with
    * the repo's exact-decimal group means.
    *
    * Zero-norm vectors are explicitly NULLed out of the share (nullif on
    * the denominator, mirrored in the oracle): a 0/0 division would
    * otherwise produce NaN in Spark but a different degradation in
    * DuckDB, breaking the hash match the first time an all-zero
    * embedding lands in a snapshot. NULL shares drop out of mean/min/max
    * identically on both engines while `n` still counts the row. */
  def prefixEnergy(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val v = col("embedding").cast("array<double>")
    val dot = graft.functions.GraftFunctions.DotName
    Tables.embeddings(spark, dir)
      .select(col("label"),
        round(call_function(dot, slice(v, 1, PrefixDims),
                            slice(v, 1, PrefixDims)) /
              nullif(call_function(dot, v, v), lit(0.0)), 6).as("share"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
           round(sum(col("share").cast("decimal(25,10)")).cast("double") /
                 count(lit(1)), 6).as("mean_share"),
           round(min(col("share")), 6).as("min_share"),
           round(max(col("share")), 6).as("max_share"))
  }

  private val PrefixDims = 16

  val prefixEnergyOracle: String =
    s"""WITH s AS (
       |  SELECT label,
       |         round(list_sum(list_transform(v[1:$PrefixDims], x -> x * x)) /
       |               nullif(list_sum(list_transform(v, x -> x * x)), 0), 6) AS share
       |  FROM (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings))
       |SELECT label, CAST(count(*) AS BIGINT) AS n,
       |       round(CAST(sum(CAST(share AS DECIMAL(25,10))) AS DOUBLE) / count(*), 6)
       |         AS mean_share,
       |       round(min(share), 6) AS min_share,
       |       round(max(share), 6) AS max_share
       |FROM s GROUP BY 1
       |""".stripMargin

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

  private val KClusters = 8
  private val NProbe = 2

  /** Lloyd k-means over the embedding corpus (k = [[KClusters]], seeded
    * deterministically the same way IVF trains — md5-ranked vectors —
    * one full Lloyd iteration, then the final assignment): each vector's
    * cluster and its squared distance to the learned centroid. The
    * unsupervised twin of [[labelCentroids]] — corpus structure without
    * labels (semantic dedup shards, stratification keys, drift units).
    *
    * Scale shape per iteration: assignment is a map-only pass (centroid
    * table broadcast, k·d multiplies per row, argmin via a per-vector
    * window — parallel); the centroid update is one explode + hash
    * aggregate bounded by k × dims, with EXACT decimal sums so the mean
    * is reduction-order-free. Nothing in the plan grows faster than
    * corpus × k. More iterations repeat the same two stages; the oracle
    * pins one (seeding + update + reassign), which already exercises
    * both moving parts bit-exactly.
    *
    * Portability: distance is `n2 − 2·dot + cn2` evaluated in that
    * exact sequence on both engines; the native fused kernel computes
    * dot with the same element-order fold as the SQL
    * `list_sum(list_transform(...))`. */
  def kmeansAssign(spark: SparkSession, dir: String): DataFrame =
    kmeansCore(spark, dir).filter(col("crank") === 1)
      .select(col("vec_id"), col("centroid_id"), round(col("d2"), 6).as("d2"))

  private def dot(a: Column, b: Column): Column =
    call_function(graft.functions.GraftFunctions.DotRawName, a, b)

  /** Ranked k-means assignment frame (vec_id, v, n2, centroid_id, d2,
    * crank ≤ [[NProbe]]) — crank 1 is the home cluster ([[kmeansAssign]]);
    * rank 2 is the multi-probe candidate list ([[semanticPairs]]) — plus
    * the refined centroid table (centroid_id, cv, cn2) for
    * [[clusterQuality]]. */
  private def kmeansParts(spark: SparkSession,
                          dir: String): (DataFrame, DataFrame) = {
    import graft.core.Caches.TrackedDataset
    import spark.implicits._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("n2", dot(col("v"), col("v")))
      .trackPersist() // three consumers: seeding, two assignment passes
    // deterministic seeding, same derivation as IVF: an 8-row TakeOrdered
    // driver action (k-means training is inherently driver-coordinated)
    val seeds = vecs.withColumn("h", md5(col("vec_id").cast("string")))
      .orderBy(col("h"), col("vec_id")).limit(KClusters)
      .select(col("v"), col("n2")).collect()
    val seedDf = broadcast(seeds.zipWithIndex.map { case (r, i) =>
        (i, r.getSeq[Double](0), r.getDouble(1))
      }.toSeq.toDF("centroid_id", "cv", "cn2"))
    def assign(cent: DataFrame): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id")).orderBy(col("d2").asc, col("centroid_id"))
      vecs.crossJoin(cent)
        .withColumn("d2",
          col("n2") - lit(2.0) * dot(col("v"), col("cv")) + col("cn2"))
        .withColumn("crank", row_number().over(w))
        .filter(col("crank") <= NProbe)
        .select(col("vec_id"), col("v"), col("n2"), col("centroid_id"),
                col("d2"), col("crank"))
    }
    val cent1 = assign(seedDf)
      .filter(col("crank") === 1) // the update step uses HOME assignments only
      .select(col("centroid_id"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("centroid_id"), col("dim"))
      .agg((sum(col("x").cast("decimal(25,10)")).cast("double") /
            count(lit(1))).as("m"))
      .groupBy(col("centroid_id"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
        s => s.getField("m")).as("cv"))
      .withColumn("cn2", dot(col("cv"), col("cv")))
    (assign(broadcast(cent1)), cent1)
  }

  private def kmeansCore(spark: SparkSession, dir: String): DataFrame =
    kmeansParts(spark, dir)._1

  /** Cluster-quality audit over the k-means result (the number a corpus
    * engineer reads before trusting the shards for semantic dedup or
    * stratification): per cluster, member count, mean squared distance
    * to the learned centroid, and the squared distance to the NEAREST
    * other centroid (cohesion vs separation — the Davies-Bouldin
    * ingredients, components kept separate so no cross-engine division).
    *
    * Portability: member distances enter the mean via the micro-integer
    * fold (round to 6 dp → ×10⁶ BIGINT → integer round-half-up mean) —
    * the unigram-NLL discipline, because a double Σd2 would be
    * reduction-order-dependent. Centroid-pair distances are scalar
    * expressions over the k-row centroid table (k² = 64 rows, broadcast
    * join), same element-order dot fold both engines.
    *
    * Scale shape: everything downstream of the assignment is k-bounded;
    * the assignment itself is the [[kmeansAssign]] map-only pass. */
  def clusterQuality(spark: SparkSession, dir: String): DataFrame = {
    val (assigned, cent) = kmeansParts(spark, dir)
    val within = assigned.filter(col("crank") === 1)
      .select(col("centroid_id"),
        expr("CAST(round(round(d2, 6) * 1000000, 0) AS BIGINT)").as("d2u"))
      .groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("n"), sum(col("d2u")).as("s"))
      .select(col("centroid_id"), col("n"),
        expr("(2 * s + n) DIV (2 * n)").as("within_mean_micro"))
    val a = cent.select(col("centroid_id"), col("cv").as("av"), col("cn2").as("an2"))
    val b = cent.select(col("centroid_id").as("other_id"), col("cv").as("bv"),
      col("cn2").as("bn2"))
    val sep = a.join(broadcast(b), col("centroid_id") =!= col("other_id"))
      .withColumn("cd2",
        col("an2") - lit(2.0) * dot(col("av"), col("bv")) + col("bn2"))
      .groupBy(col("centroid_id"))
      .agg(round(min(col("cd2")), 6).as("min_sep"))
    within.join(broadcast(sep), Seq("centroid_id"))
  }

  lazy val clusterQualityOracle: String =
    s"""WITH $kmeansCtes,
       |home AS (
       |  SELECT centroid_id, d2 FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |                                 ORDER BY d2 ASC, centroid_id) AS r
       |    FROM scored1) WHERE r = 1),
       |w AS (
       |  SELECT centroid_id, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(CAST(round(round(d2, 6) * 1000000, 0) AS BIGINT)) AS BIGINT) AS s
       |  FROM home GROUP BY 1),
       |sep AS (
       |  SELECT a.centroid_id,
       |         round(min(a.cn2 - 2 * list_sum(list_transform(generate_series(1, $Dim),
       |           i -> a.cv[i] * b.cv[i])) + b.cn2), 6) AS min_sep
       |  FROM c1n a JOIN c1n b ON a.centroid_id <> b.centroid_id
       |  GROUP BY 1)
       |SELECT centroid_id, n,
       |       CAST((2 * s + n) // (2 * n) AS BIGINT) AS within_mean_micro, min_sep
       |FROM w JOIN sep USING (centroid_id)
       |""".stripMargin

  private val SemanticCosine = 0.4

  /** Semantic near-duplicate pairs, CLUSTER-BUCKETED: candidate pairs
    * meet only inside their k-means cluster, then the exact cosine
    * threshold (same [[SemanticCosine]] as the exact all-pairs audit in
    * [[Similarity.nearDupPairs]]) verifies each candidate. This is the
    * learned-partition scale path of the embedding-dedup trio — exact
    * all-pairs (audit) / hyperplane LSH (oblivious buckets) / k-means
    * shards (data-adapted buckets): pair volume drops from n² to
    * Σ_c |c|², with cluster sizes balanced by the Lloyd step. Recall vs
    * the exact audit is spec-asserted; soundness is exact (every emitted
    * pair re-verified by the true cosine). */
  def semanticPairs(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.Caches.TrackedDataset
    val ranked = kmeansCore(spark, dir)
      .select(col("vec_id"), col("v"), col("n2"), col("centroid_id"), col("crank"))
      .trackPersist() // probe side + home side of the candidate join
    val home = ranked.filter(col("crank") === 1)
    ranked.as("a").join(home.as("b"),
        col("a.centroid_id") === col("b.centroid_id") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(
        least(col("a.vec_id"), col("b.vec_id")).as("vec_id"),
        greatest(col("a.vec_id"), col("b.vec_id")).as("neighbor_id"),
        (dot(col("a.v"), col("b.v")) /
          sqrt(col("a.n2") * col("b.n2"))).as("cos"))
      .filter(col("cos") >= SemanticCosine)
      .select(col("vec_id"), col("neighbor_id"),
              round(col("cos"), 6).as("cosine"))
      .distinct() // a pair can be found via both probed clusters
  }

  val semanticPairsOracle: String =
    s"""WITH n AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |         list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)) AS n2
       |  FROM embeddings),
       |seeds AS (
       |  SELECT CAST(rn - 1 AS INT) AS centroid_id, v AS cv, n2 AS cn2 FROM (
       |    SELECT v, n2,
       |           row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
       |    FROM n) WHERE rn <= $KClusters),
       |scored0 AS (
       |  SELECT n.vec_id, n.v, s.centroid_id,
       |         n.n2 - 2 * list_sum(list_transform(generate_series(1, $Dim),
       |           i -> n.v[i] * s.cv[i])) + s.cn2 AS d2
       |  FROM n CROSS JOIN seeds s),
       |a0 AS (
       |  SELECT vec_id, v, centroid_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |                                 ORDER BY d2 ASC, centroid_id) AS r
       |    FROM scored0) WHERE r = 1),
       |m1 AS (
       |  SELECT centroid_id, i AS dim,
       |         CAST(sum(CAST(v[i] AS DECIMAL(25,10))) AS DOUBLE) / count(*) AS m
       |  FROM a0, unnest(generate_series(1, $Dim)) t(i)
       |  GROUP BY 1, 2),
       |c1 AS (
       |  SELECT centroid_id, list(m ORDER BY dim) AS cv FROM m1 GROUP BY 1),
       |c1n AS (
       |  SELECT centroid_id, cv,
       |         list_sum(list_transform(cv, x -> x * x)) AS cn2 FROM c1),
       |scored1 AS (
       |  SELECT n.vec_id, n.v, n.n2, c.centroid_id,
       |         n.n2 - 2 * list_sum(list_transform(generate_series(1, $Dim),
       |           i -> n.v[i] * c.cv[i])) + c.cn2 AS d2
       |  FROM n CROSS JOIN c1n c),
       |a1 AS (
       |  SELECT vec_id, v, n2, centroid_id, r FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |                                 ORDER BY d2 ASC, centroid_id) AS r
       |    FROM scored1) WHERE r <= $NProbe)
       |SELECT DISTINCT least(a.vec_id, b.vec_id) AS vec_id,
       |       greatest(a.vec_id, b.vec_id) AS neighbor_id,
       |       round(list_sum(list_transform(generate_series(1, $Dim),
       |               i -> a.v[i] * b.v[i])) / sqrt(a.n2 * b.n2), 6) AS cosine
       |FROM a1 a JOIN (SELECT * FROM a1 WHERE r = 1) b
       |  ON a.centroid_id = b.centroid_id AND a.vec_id <> b.vec_id
       |WHERE list_sum(list_transform(generate_series(1, $Dim),
       |        i -> a.v[i] * b.v[i])) / sqrt(a.n2 * b.n2) >= $SemanticCosine
       |""".stripMargin

  /** The shared DuckDB CTE chain for the k-means family (seeding →
    * first assignment → decimal-exact centroid update → re-score):
    * [[kmeansOracle]] ranks `scored1` to the home assignment;
    * [[clusterQualityOracle]] additionally reads the refined centroid
    * table `c1n`. Declared BEFORE both oracle vals (object init order). */
  private val kmeansCtes: String =
    s"""n AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |         list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)) AS n2
       |  FROM embeddings),
       |seeds AS (
       |  SELECT CAST(rn - 1 AS INT) AS centroid_id, v AS cv, n2 AS cn2 FROM (
       |    SELECT v, n2,
       |           row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
       |    FROM n) WHERE rn <= $KClusters),
       |scored0 AS (
       |  SELECT n.vec_id, n.v, s.centroid_id,
       |         n.n2 - 2 * list_sum(list_transform(generate_series(1, $Dim),
       |           i -> n.v[i] * s.cv[i])) + s.cn2 AS d2
       |  FROM n CROSS JOIN seeds s),
       |a0 AS (
       |  SELECT vec_id, v, centroid_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |                                 ORDER BY d2 ASC, centroid_id) AS r
       |    FROM scored0) WHERE r = 1),
       |m1 AS (
       |  SELECT centroid_id, i AS dim,
       |         CAST(sum(CAST(v[i] AS DECIMAL(25,10))) AS DOUBLE) / count(*) AS m
       |  FROM a0, unnest(generate_series(1, $Dim)) t(i)
       |  GROUP BY 1, 2),
       |c1 AS (
       |  SELECT centroid_id, list(m ORDER BY dim) AS cv FROM m1 GROUP BY 1),
       |c1n AS (
       |  SELECT centroid_id, cv,
       |         list_sum(list_transform(cv, x -> x * x)) AS cn2 FROM c1),
       |scored1 AS (
       |  SELECT n.vec_id, c.centroid_id,
       |         n.n2 - 2 * list_sum(list_transform(generate_series(1, $Dim),
       |           i -> n.v[i] * c.cv[i])) + c.cn2 AS d2
       |  FROM n CROSS JOIN c1n c)""".stripMargin

  val kmeansOracle: String =
    s"""WITH $kmeansCtes
       |SELECT vec_id, centroid_id, round(d2, 6) AS d2 FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |                               ORDER BY d2 ASC, centroid_id) AS r
       |  FROM scored1) WHERE r = 1
       |""".stripMargin

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

  // ------------------------------------------------- product quantization

  private[ops] val PqM = 4                  // subspaces
  private[ops] val PqSubDim = Dim / PqM     // 16 dims each
  private[ops] val PqK = 8                  // codes per subspace

  /** PRODUCT QUANTIZATION: train a per-subspace codebook (the [[PqM]] ×
    * [[PqK]] compressed representation behind IVF-PQ serving indexes —
    * each 64-float vector becomes [[PqM]] one-byte codes, a 64× memory
    * cut that turns billion-vector ANN from a RAM problem into a table)
    * and emit every vector's code + residual per subspace. Training is
    * the [[kmeansAssign]] recipe applied independently per subspace:
    * deterministic seeding (same md5-ranked seed vectors, sliced), one
    * decimal-exact Lloyd update, reassign. `avg(d2)` over the output is
    * the quantization distortion a recall budget is traded against;
    * more iterations repeat the same two stages (the oracle pins one,
    * exercising both moving parts bit-exactly).
    *
    * Scale shape: subspace explode is ×[[PqM]] on the scan; both
    * assignment passes are broadcast-codebook map-only scores with a
    * (vec, sub)-partitioned 8-row argmin window; the update is one hash
    * aggregate bounded by PqM × PqK × subdim. Nothing grows faster than
    * corpus × PqK. Distance is `n2 − 2·dot + cn2` in that exact
    * sequence both engines, dot folded in element order. */
  def productQuantize(spark: SparkSession, dir: String): DataFrame = {
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .trackPersist() // seeding collect + the subspace explode
    val (assigned, _) = pqModel(vecs)
    assigned.select(col("vec_id"), col("sub"), col("code"),
      round(col("d2"), 6).as("d2"))
  }

  /** PQ training + assignment as a reusable model: input (vec_id, v)
    * [persisted by the caller], output (assignments, codebook) where
    * assignments = (vec_id, sub, sv, code, d2) after the one pinned
    * Lloyd sweep and codebook = (sub, code, cv, cn2). Shared by
    * [[productQuantize]] and the IVF-PQ composed serving path
    * ([[Similarity.ivfpqTopK]]), so both gates exercise the identical
    * derivation. */
  private[ops] def pqModel(vecs: DataFrame, nSub: Int = PqM,
                           nCodes: Int = PqK): (DataFrame, DataFrame) = {
    val spark = vecs.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val subDim = Dim / nSub
    val subs = vecs
      .select(col("vec_id"), explode(array((0 until nSub).map(m =>
        struct(lit(m).as("sub"),
          slice(col("v"), m * subDim + 1, subDim).as("sv"))): _*)).as("s"))
      .select(col("vec_id"), col("s.sub").as("sub"), col("s.sv").as("sv"))
      .withColumn("sn2", dot(col("sv"), col("sv")))
      .trackPersist() // two assignment passes + the update
    val seedVecs = vecs.withColumn("h", md5(col("vec_id").cast("string")))
      .orderBy(col("h"), col("vec_id")).limit(nCodes)
      .select(col("v")).collect()
    val seedRows = for {
      (r, j) <- seedVecs.zipWithIndex
      m <- 0 until nSub
    } yield (m, j, r.getSeq[Double](0).slice(m * subDim, (m + 1) * subDim))
    val seedDf = broadcast(seedRows.toSeq.toDF("sub", "code", "cv")
      .withColumn("cn2", dot(col("cv"), col("cv"))))
    def assign(cb: DataFrame): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id"), col("sub"))
        .orderBy(col("d2").asc, col("code"))
      subs.join(cb, Seq("sub"))
        .withColumn("d2",
          col("sn2") - lit(2.0) * dot(col("sv"), col("cv")) + col("cn2"))
        .withColumn("r", row_number().over(w)).filter(col("r") === 1)
        .select(col("vec_id"), col("sub"), col("sv"), col("code"), col("d2"))
    }
    val cb1 = assign(seedDf)
      .select(col("sub"), col("code"), posexplode(col("sv")).as(Seq("dim", "x")))
      .groupBy(col("sub"), col("code"), col("dim"))
      .agg((sum(col("x").cast("decimal(25,10)")).cast("double") /
            count(lit(1))).as("m"))
      .groupBy(col("sub"), col("code"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
        s => s.getField("m")).as("cv"))
      .withColumn("cn2", dot(col("cv"), col("cv")))
    (assign(broadcast(cb1)), cb1)
  }

  val productQuantizeOracle: String =
    s"""WITH n AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |ms AS (SELECT CAST(unnest(generate_series(0, ${PqM - 1})) AS INT) AS sub),
       |sn AS (
       |  SELECT vec_id, sub,
       |         list_slice(v, sub * $PqSubDim + 1, sub * $PqSubDim + $PqSubDim) AS sv,
       |         list_sum(list_transform(
       |           list_slice(v, sub * $PqSubDim + 1, sub * $PqSubDim + $PqSubDim),
       |           x -> x * x)) AS sn2
       |  FROM n CROSS JOIN ms),
       |seedv AS (
       |  SELECT v, row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
       |  FROM n),
       |seedn AS (
       |  SELECT sub, CAST(rn - 1 AS INT) AS code,
       |         list_slice(v, sub * $PqSubDim + 1, sub * $PqSubDim + $PqSubDim) AS cv,
       |         list_sum(list_transform(
       |           list_slice(v, sub * $PqSubDim + 1, sub * $PqSubDim + $PqSubDim),
       |           x -> x * x)) AS cn2
       |  FROM seedv CROSS JOIN ms WHERE rn <= $PqK),
       |scored0 AS (
       |  SELECT s.vec_id, s.sub, s.sv, c.code,
       |         s.sn2 - 2 * list_sum(list_transform(generate_series(1, $PqSubDim),
       |           i -> s.sv[i] * c.cv[i])) + c.cn2 AS d2
       |  FROM sn s JOIN seedn c ON s.sub = c.sub),
       |a0 AS (
       |  SELECT vec_id, sub, sv, code FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id, sub
       |                                 ORDER BY d2 ASC, code) AS r
       |    FROM scored0) WHERE r = 1),
       |m1 AS (
       |  SELECT sub, code, i AS dim,
       |         CAST(sum(CAST(sv[i] AS DECIMAL(25,10))) AS DOUBLE) / count(*) AS m
       |  FROM a0, unnest(generate_series(1, $PqSubDim)) t(i)
       |  GROUP BY 1, 2, 3),
       |c1 AS (SELECT sub, code, list(m ORDER BY dim) AS cv FROM m1 GROUP BY 1, 2),
       |c1n AS (
       |  SELECT sub, code, cv,
       |         list_sum(list_transform(cv, x -> x * x)) AS cn2 FROM c1),
       |scored1 AS (
       |  SELECT s.vec_id, s.sub, c.code,
       |         s.sn2 - 2 * list_sum(list_transform(generate_series(1, $PqSubDim),
       |           i -> s.sv[i] * c.cv[i])) + c.cn2 AS d2
       |  FROM sn s JOIN c1n c ON s.sub = c.sub)
       |SELECT vec_id, sub, code, round(d2, 6) AS d2 FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id, sub
       |                               ORDER BY d2 ASC, code) AS r
       |  FROM scored1) WHERE r = 1
       |""".stripMargin

  /** Uncentered Gram (second-moment) matrix of the embedding corpus:
    * `G[i][j] = E[x_i·x_j]` for `i ≤ j` — the d(d+1)/2-cell input PCA /
    * whitening / feature-correlation audits start from (covariance is
    * `G − μμᵀ` with the [[labelCentroids]]-style means). Scale shape:
    * one explode to (vec, dim, value), one equi-self-join on vec_id
    * (per-vector fan-out is the fixed d(d+1)/2, never corpus²), and a
    * map-side-combined aggregate into d(d+1)/2 cells — output is
    * dimension-bounded, not data-bounded. Sums accumulate the exact
    * DECIMAL(25,10) cast of each product (the [[labelCentroids]]
    * portability pattern), so both engines fold identically. */
  def gramMatrix(spark: SparkSession, dir: String): DataFrame = {
    val x = graft.core.Spread(Tables.embeddings(spark, dir)
        .select(col("vec_id"),
                posexplode(col("embedding").cast("array<double>"))
                  .as(Seq("i", "xi"))))
      .trackPersist()
    val a = x.select(col("vec_id"), col("i"), col("xi"))
    val b = x.select(col("vec_id"), col("i").as("j"), col("xi").as("xj"))
    // `+ 0.0` collapses IEEE signed zeros: a tiny negative mean rounds to
    // -0.0 in DuckDB but +0.0 in Spark (whose round drops the sign), and
    // the correctness driver's string-sorted row compare treats "-0.0"
    // and "0.0" as different keys — one such cell misaligns the whole
    // sorted frame (surfaced at sf0.1: cell (17,52) ≈ -4e-8)
    a.join(b, Seq("vec_id")).filter(col("i") <= col("j"))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n"),
           (round(sum((col("xi") * col("xj")).cast("decimal(25,10)"))
                   .cast("double") / count(lit(1)), 6) + lit(0.0)).as("gram"))
  }

  val gramMatrixOracle: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |x AS (SELECT vec_id, i, v[i] AS xi
       |      FROM e, unnest(generate_series(1, $Dim)) t(i))
       |SELECT CAST(a.i - 1 AS INT) AS i, CAST(b.i - 1 AS INT) AS j,
       |       CAST(count(*) AS BIGINT) AS n,
       |       round(CAST(sum(CAST(a.xi * b.xi AS DECIMAL(25,10))) AS DOUBLE)
       |             / count(*), 6) + 0.0 AS gram
       |FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
       |GROUP BY 1, 2
       |""".stripMargin

  /** Per-dimension z-score standardization of the embedding corpus —
    * the preprocessing most vector consumers (k-means, linear probes,
    * quantizers) assume. Per-dim mean and population std come from
    * EXACT decimal power sums (the [[Stats.moments]] discipline — no
    * Welford-order flap at 1000 executors) broadcast back as a d-row
    * table; output is per-(vector, dimension) scalar rows (the oracle
    * portability rule — no array/string-formatted vectors in checked
    * output). Variance is clamped at 0 before the sqrt (exact sums cast
    * to double can land a constant dimension at −1e−12 — the clamp is
    * identical on both engines), and zero-std dims standardize to 0. */
  def standardize(spark: SparkSession, dir: String): DataFrame = {
    val x = graft.core.Spread(Tables.embeddings(spark, dir)
        .select(col("vec_id"),
                posexplode(col("embedding").cast("array<double>"))
                  .as(Seq("i", "xi"))))
      .trackPersist()
    val stats = x.groupBy(col("i"))
      .agg(count(lit(1)).as("n"),
           sum(col("xi").cast("decimal(25,10)")).cast("double").as("sx"),
           sum((col("xi") * col("xi")).cast("decimal(25,10)")).cast("double")
             .as("sxx"))
      .select(col("i"),
              (col("sx") / col("n")).as("mu"),
              sqrt(greatest((col("sxx") - col("sx") * col("sx") / col("n")) /
                              col("n"), lit(0d))).as("sigma"))
    x.join(broadcast(stats), Seq("i"))
      .select(col("vec_id"), col("i"),
        when(col("sigma") === 0d, lit(0d))
          .otherwise(round((col("xi") - col("mu")) / col("sigma"), 6)).as("z"))
  }

  val standardizeOracle: String =
    s"""WITH x AS (
       |  SELECT vec_id, CAST(i - 1 AS INT) AS i, v[i] AS xi
       |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |       unnest(generate_series(1, $Dim)) t(i)),
       |st AS (
       |  SELECT i,
       |         CAST(sum(CAST(xi AS DECIMAL(25,10))) AS DOUBLE) / count(*) AS mu0,
       |         CAST(sum(CAST(xi AS DECIMAL(25,10))) AS DOUBLE) AS sx,
       |         CAST(sum(CAST(xi * xi AS DECIMAL(25,10))) AS DOUBLE) AS sxx,
       |         CAST(count(*) AS BIGINT) AS n
       |  FROM x GROUP BY 1),
       |ms AS (
       |  SELECT i, sx / n AS mu,
       |         sqrt(greatest((sxx - sx * sx / n) / n, 0)) AS sigma
       |  FROM st)
       |SELECT vec_id, x.i,
       |       CASE WHEN sigma = 0 THEN 0.0
       |            ELSE round((xi - mu) / sigma, 6) END AS z
       |FROM x JOIN ms ON x.i = ms.i
       |""".stripMargin

  /** Per-vector outlier score over the standardized dims: Σ z²
    * (Mahalanobis with diagonal covariance) — the cheap corpus-outlier
    * flag that rides one aggregate over [[standardize]]'s output. */
  def outlierScores(spark: SparkSession, dir: String): DataFrame =
    standardize(spark, dir)
      .groupBy(col("vec_id"))
      .agg(round(sum((col("z") * col("z")).cast("decimal(25,10)"))
                   .cast("double"), 6).as("z2_sum"),
           count(lit(1)).as("dims"))

  lazy val outlierScoresOracle: String =
    s"""WITH z AS (${standardizeOracle.trim.stripSuffix(";")})
       |SELECT vec_id,
       |       round(CAST(sum(CAST(z * z AS DECIMAL(25,10))) AS DOUBLE), 6) AS z2_sum,
       |       CAST(count(*) AS BIGINT) AS dims
       |FROM z GROUP BY 1
       |""".stripMargin
}
