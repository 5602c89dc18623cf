package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Caches.TrackedDataset
import graft.core.Tables

/** Distributed descriptive statistics with ORDER-INDEPENDENT results.
  *
  * Spark's builtin `corr`/`stddev`/`variance` stream doubles through
  * Welford-style updates whose result depends on partition order — fine
  * for analytics, unusable for a bit-exact cross-engine gate and a source
  * of run-to-run flap at 1000 executors. Here every moment is assembled
  * from EXACT decimal power sums (the corpus stores money at 2 dp and
  * quantities as integers, so x, x², xy are exact in decimal), and the
  * closed-form moment formulas run on the driver side of the aggregation
  * in double — deterministic at any parallelism, one shuffle of a few
  * decimal cells per group.
  */
object Stats {

  /** Per-returnflag moments over lineitem: count, means, population
    * variance/stddev of extendedprice, and the quantity↔extendedprice
    * Pearson correlation — all from exact decimal sums. */
  def moments(spark: SparkSession, dir: String): DataFrame = {
    val x = col("l_quantity").cast("decimal(9,2)")          // integral ≤ 50
    val y = col("l_extendedprice").cast("decimal(12,2)")    // exact at 2 dp
    val sums = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), x.as("x"), y.as("y"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
           sum(col("x")).cast("double").as("sx"),
           sum(col("y")).cast("double").as("sy"),
           sum((col("x") * col("x")).cast("decimal(20,4)")).cast("double").as("sxx"),
           sum((col("y") * col("y")).cast("decimal(27,4)")).cast("double").as("syy"),
           sum((col("x") * col("y")).cast("decimal(23,4)")).cast("double").as("sxy"))
    val n = col("n").cast("double")
    val varY = (col("syy") - col("sy") * col("sy") / n) / n
    val corr = (n * col("sxy") - col("sx") * col("sy")) /
      sqrt((n * col("sxx") - col("sx") * col("sx")) *
           (n * col("syy") - col("sy") * col("sy")))
    sums.select(
      col("l_returnflag"), col("n"),
      round(col("sx") / n, 6).as("mean_qty"),
      round(col("sy") / n, 6).as("mean_price"),
      round(varY, 6).as("var_price"),
      round(sqrt(varY), 6).as("stddev_price"),
      round(corr, 6).as("corr_qty_price"))
  }

  val momentsOracle: String =
    """WITH s AS (
      |  SELECT l_returnflag,
      |         CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) AS sx,
      |         CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
      |         CAST(sum(CAST(CAST(l_quantity AS DECIMAL(9,2)) * CAST(l_quantity AS DECIMAL(9,2)) AS DECIMAL(20,4))) AS DOUBLE) AS sxx,
      |         CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2)) AS DECIMAL(27,4))) AS DOUBLE) AS syy,
      |         CAST(sum(CAST(CAST(l_quantity AS DECIMAL(9,2)) * CAST(l_extendedprice AS DECIMAL(12,2)) AS DECIMAL(23,4))) AS DOUBLE) AS sxy
      |  FROM lineitem GROUP BY 1)
      |SELECT l_returnflag, n,
      |       round(sx / n, 6) AS mean_qty,
      |       round(sy / n, 6) AS mean_price,
      |       round((syy - sy * sy / n) / n, 6) AS var_price,
      |       round(sqrt((syy - sy * sy / n) / n), 6) AS stddev_price,
      |       round((n * sxy - sx * sy) /
      |             sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr_qty_price
      |FROM s
      |""".stripMargin

  /** Exact per-group quantiles via the `percentile` AGGREGATE (linear
    * interpolation, same definition as DuckDB's quantile_cont). Groups
    * aggregate independently — no global sort, no single-partition
    * window; the per-group value buffer is the only memory cost, which
    * is what `approx_percentile` trades away at larger group sizes
    * (`Exp.approxTiers` is the sketch variant). */
  def groupQuantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"),
           round(expr("percentile(c_acctbal, 0.25)"), 6).as("q25"),
           round(expr("percentile(c_acctbal, 0.5)"), 6).as("q50"),
           round(expr("percentile(c_acctbal, 0.75)"), 6).as("q75"))

  val groupQuantilesOracle: String =
    """SELECT c_nationkey,
      |       CAST(count(*) AS BIGINT) AS n,
      |       round(quantile_cont(c_acctbal, 0.25), 6) AS q25,
      |       round(quantile_cont(c_acctbal, 0.5), 6) AS q50,
      |       round(quantile_cont(c_acctbal, 0.75), 6) AS q75
      |FROM customer GROUP BY 1
      |""".stripMargin

  /** Per-group winsorization: clip a value column to its group's [p05,
    * p95] — the robust-preprocessing step that tames outliers before
    * normalization or model fitting. The quantile table is group-sized
    * and BROADCAST back onto the stream, so the clip pass stays map-side
    * (one aggregation + one broadcast join, no second shuffle of the
    * fact). Clipped values and both bounds are emitted so downstream can
    * audit what moved. */
  def winsorize(spark: SparkSession, dir: String): DataFrame = {
    // same Spread rationale as [[mad]]: parallel percentile partials on
    // the under-split local scan, one persisted cut for both passes
    val li = graft.core.Spread(Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
                col("l_extendedprice")))
      .trackPersist()
    val bounds = li
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.05)").as("lo"),
           expr("percentile(l_extendedprice, 0.95)").as("hi"))
    li
      .join(broadcast(bounds), Seq("l_returnflag"))
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_extendedprice"),
        round(col("lo"), 6).as("p05"),
        round(col("hi"), 6).as("p95"),
        round(least(greatest(col("l_extendedprice"), col("lo")), col("hi")), 6)
          .as("clipped"))
  }

  val winsorizeOracle: String =
    """WITH b AS (
      |  SELECT l_returnflag,
      |         quantile_cont(l_extendedprice, 0.05) AS lo,
      |         quantile_cont(l_extendedprice, 0.95) AS hi
      |  FROM lineitem GROUP BY 1)
      |SELECT l_orderkey, l_linenumber, l.l_returnflag, l_extendedprice,
      |       round(lo, 6) AS p05, round(hi, 6) AS p95,
      |       round(least(greatest(l_extendedprice, lo), hi), 6) AS clipped
      |FROM lineitem l JOIN b ON l.l_returnflag = b.l_returnflag
      |""".stripMargin

  /** Fixed-width histogram of the text quality score: 10 buckets over
    * [0, 1], score 1.0 clamped into the top bucket. The input score is
    * already rounded to 6 dp, so the bucket arithmetic is deterministic.
    * One aggregation; output bounded by the bucket count. */
  def qualityHistogram(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.quality(spark, dir)
      .select(least(floor(col("quality_score") * 10).cast("int"), lit(9)).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
      .withColumn("lo", round(col("bucket").cast("double") / 10, 1))
      .withColumn("hi", round((col("bucket") + 1).cast("double") / 10, 1))
      .select(col("bucket"), col("lo"), col("hi"), col("n"))

  /** Equi-DEPTH histogram of lineitem prices: decile bin edges come from
    * the digest-narrowed EXACT quantiles ([[Sketches.exactQuantiles]] —
    * two scans + state-sized driver traffic, no single-partition sort),
    * and a third scan buckets every row against the 9 collected edge
    * literals (a broadcast-free map-only pass) into a 10-row count
    * table. Bucket id = number of edges strictly below the value, so
    * heavy ties collapse buckets identically on every engine; each
    * non-first bucket reports its lower edge. The equi-WIDTH companion
    * is [[qualityHistogram]]. */
  def equiDepthHistogram(spark: SparkSession, dir: String): DataFrame = {
    val value = expr("CAST(round(l_extendedprice * 100) AS LONG)")
    // ONE persisted (grp, v) cut serves the quantile passes AND the
    // bucketing scan below (round-14 opt: the bucketing pass previously
    // re-scanned lineitem and re-evaluated the cents cast per row)
    val valued = Sketches.valuedCut(Tables.lineitem(spark, dir), lit("_"),
      value)
    val edges = Sketches.groupedExactQuantilesOf(valued, (10 to 90 by 10))
      .collect().map(r => (r.getInt(1), r.getLong(2))).sortBy(_._1)
    val v = col("v")
    val bucket = edges.map { case (_, e) =>
      when(v > lit(e), 1).otherwise(0): Column
    }.reduce(_ + _).cast("int")
    val lowerEdge = edges.foldLeft(lit(null).cast("long")) {
      case (acc, (pct, e)) => when(col("bucket") * 10 === pct, lit(e)).otherwise(acc)
    }
    valued.select(col("v"))
      .withColumn("bucket", bucket)
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_rows"))
      .withColumn("lower_edge_cents", lowerEdge)
      .select(col("bucket"), col("lower_edge_cents"), col("n_rows"))
  }

  val equiDepthHistogramOracle: String =
    """WITH s AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v
      |           FROM lineitem WHERE l_extendedprice IS NOT NULL),
      |r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM s),
      |qs(pct) AS (VALUES (10), (20), (30), (40), (50), (60), (70), (80), (90)),
      |edges AS (
      |  SELECT qs.pct, r.v AS e
      |  FROM qs JOIN r ON r.rn = (qs.pct * (SELECT count(*) FROM s) + 99) // 100),
      |b AS (
      |  SELECT v, (SELECT count(*) FROM edges WHERE s.v > edges.e) AS bucket
      |  FROM s)
      |SELECT CAST(bucket AS INT) AS bucket,
      |       (SELECT CAST(e AS BIGINT) FROM edges WHERE pct = bucket * 10)
      |         AS lower_edge_cents,
      |       CAST(count(*) AS BIGINT) AS n_rows
      |FROM b GROUP BY bucket
      |""".stripMargin

  /** Per-group robust location/scale: median, MAD (median absolute
    * deviation), and the Gaussian-consistent robust sigma (1.4826 × MAD)
    * — the outlier-resistant alternative to mean/stddev that winsorize
    * and anomaly thresholds should be fed from when the data is
    * heavy-tailed. Two aggregations (median, then median-of-deviations)
    * with the group-sized median table BROADCAST between them — the fact
    * shuffles once per aggregation, never by itself.
    *
    * Deviations are rounded to 6 dp BEFORE the second percentile: the
    * group median may interpolate (and so carry engine-specific last-ulp
    * noise); the deviation of 2-dp money from it has an exact ≤3-dp
    * decimal value, which the round recovers bit-identically on both
    * engines — without it the deviation ORDER could differ at a ulp tie
    * and move the interpolated MAD. */
  def mad(spark: SparkSession, dir: String): DataFrame = {
    // Spread + persist: percentile() partials buffer every value, so an
    // under-split scan serializes the buffer build on one core, and the
    // narrow cut feeds two passes (median, then deviations)
    val li = graft.core.Spread(Tables.lineitem(spark, dir)
        .select(col("l_returnflag"), col("l_extendedprice").as("x")))
      .trackPersist()
    val med = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(x, 0.5)").as("med"))
    li.join(broadcast(med), Seq("l_returnflag"))
      .withColumn("dev", round(abs(col("x") - col("med")), 6))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
           round(max(col("med")), 6).as("median"),
           round(expr("percentile(dev, 0.5)"), 6).as("mad"),
           round(expr("percentile(dev, 0.5)") * 1.4826, 6).as("robust_sigma"))
  }

  val madOracle: String =
    """WITH m AS (
      |  SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS med
      |  FROM lineitem GROUP BY 1),
      |d AS (
      |  SELECT l.l_returnflag, med,
      |         round(abs(l_extendedprice - med), 6) AS dev
      |  FROM lineitem l JOIN m USING (l_returnflag))
      |SELECT l_returnflag,
      |       CAST(count(*) AS BIGINT) AS n,
      |       round(max(med), 6) AS median,
      |       round(quantile_cont(dev, 0.5), 6) AS mad,
      |       round(quantile_cont(dev, 0.5) * 1.4826, 6) AS robust_sigma
      |FROM d GROUP BY 1
      |""".stripMargin

  val qualityHistogramOracle: String = {
    def cte(sql: String) = sql.trim.stripSuffix(";")
    s"""WITH q AS (${cte(TextAnalysis.qualityOracle)})
       |SELECT bucket, round(CAST(bucket AS DOUBLE) / 10, 1) AS lo,
       |       round(CAST(bucket + 1 AS DOUBLE) / 10, 1) AS hi,
       |       CAST(count(*) AS BIGINT) AS n
       |FROM (SELECT least(CAST(floor(quality_score * 10) AS INT), 9) AS bucket FROM q)
       |GROUP BY 1
       |""".stripMargin
  }

  /** Corpus-percentile calibration of the quality score: every doc
    * tagged with its exact global rank and integer micro-percentile
    * `(rank−1)·10⁶ DIV (N−1)` — the normalization a quality-threshold
    * policy ("drop the bottom 20%") needs, stable across corpora whose
    * raw score distributions differ. Rank comes from the distributed
    * [[Rnk.globalRank]] (range-partition + partitioned rank + broadcast
    * offsets — no single-partition window); the total count rides a
    * broadcast one-row frame. All integer arithmetic past the 6-dp
    * score, so the SQL oracle reproduces it bit-for-bit. */
  def qualityPercentile(spark: SparkSession, dir: String): DataFrame = {
    val q = TextAnalysis.quality(spark, dir)
      .select(col("doc_id"), col("quality_score"))
    val ranked = Rnk.globalRank(q, Seq(col("quality_score"), col("doc_id")),
      "rank")
    ranked.crossJoin(broadcast(q.agg(count(lit(1)).as("n_total"))))
      .select(col("doc_id"), col("quality_score"), col("rank"),
        expr("CAST((rank - 1) * 1000000 DIV greatest(n_total - 1, 1) AS BIGINT)")
          .as("pctile_micro"))
  }

  val qualityPercentileOracle: String = {
    def cte(sql: String) = sql.trim.stripSuffix(";")
    s"""WITH q AS (${cte(TextAnalysis.qualityOracle)}),
       |r AS (SELECT doc_id, quality_score,
       |             row_number() OVER (ORDER BY quality_score, doc_id) AS rank
       |      FROM q),
       |n AS (SELECT count(*) AS n_total FROM q)
       |SELECT doc_id, quality_score, CAST(rank AS BIGINT) AS rank,
       |       CAST((rank - 1) * 1000000 // greatest(n_total - 1, 1) AS BIGINT) AS pctile_micro
       |FROM r CROSS JOIN n
       |""".stripMargin
  }

  // ------------------------------------------------- correlation matrix

  /** Columns of the correlation matrix, with their integer-grid scale
    * (cents / basis points) — the repo-wide exact-sum discipline: scaled
    * values are exact longs, so every moment accumulates exactly in
    * DECIMAL(38,0) and the only floating-point step is the final
    * ratio. */
  private val CorrCols: Seq[(String, String, Long)] = Seq(
    ("l_quantity", "quantity", 100L),
    ("l_extendedprice", "extendedprice", 100L),
    ("l_discount", "discount", 10000L),
    ("l_tax", "tax", 10000L))

  /** Pairwise Pearson correlations over the lineitem measures — the
    * ANALYZE-style dependency profile a planner (or a feature-selection
    * pass) reads before trusting independence assumptions. ONE scan and
    * ONE hash aggregate produce every raw moment (n, Σx, Σx², Σxy for
    * all 6 pairs) as exact DECIMAL(38,0) on the columns' integer grids;
    * the 6 output rows are then a pure projection —
    * `corr = (nΣxy − ΣxΣy) / (√(nΣx²−(Σx)²) · √(nΣy²−(Σy)²))` — where
    * the decimal→double conversion is the IEEE round-to-nearest both
    * engines share. No per-pair jobs, no corr() built-in (whose
    * accumulation order is partition-dependent).
    *
    * Exactness at ANY n — CENTERED arithmetic: Pearson r is invariant
    * under per-column integer shifts, and the invariance is EXACT on
    * the grid (`nΣx'y' − Σx'Σy' ≡ nΣxy − ΣxΣy` as an integer identity
    * for x' = x − cₓ), so the moments pass first computes the integer
    * mean shift `cₓ = Σx div n` (one cheap 4-column pre-aggregate) and
    * accumulates moments of the CENTERED values. Cross terms then grow
    * as n²·var instead of n²·x̄² — with the fixture measures' spreads
    * that is ~10 digits of extra headroom over the old uncentered
    * bound, and a mean-dominated column (the adversarial case: huge
    * offset, small variance — exactly where the old form overflowed
    * DECIMAL(38,0)) costs nothing. The final doubles are bit-identical
    * to the uncentered formula's, so the oracle stays byte-for-byte
    * unchanged; GraftProperties pins r against an exact BigDecimal
    * replay at magnitudes that overflow the uncentered form.
    * (`div` truncation matches DuckDB `//` flooring because the
    * measures are non-negative — the documented precondition.)
    *
    * Accumulation (round-14): every moment is a
    * [[graft.functions.Int128Sum]] over LONG grid values — exact
    * 128-bit two-long-limb sums, zero allocation per row — instead of
    * `sum(DECIMAL(38,0))`, whose per-row BigDecimal adds were ~95% of
    * this query's steady-state cost (profiled: the 600k-row moments
    * pass dropped 2.5 s → 1.1 s; results bit-identical, law-tested in
    * Int128SumSpec and the ScalaCheck replay). Domain this buys into:
    * centered values and their pairwise products must fit a long —
    * holds whenever a column's value SPAN on its grid is < 2^31, vs
    * the measures' ≤ 2^24 spans; ANSI raises rather than corrupts
    * outside it. */
  def corrMatrix(spark: SparkSession, dir: String): DataFrame =
    corrMatrixOf(Tables.lineitem(spark, dir), CorrCols)

  /** Generic centered core over any frame + (column, name, grid scale)
    * spec — see [[corrMatrix]]. */
  private[graft] def corrMatrixOf(src: DataFrame,
                                  cols: Seq[(String, String, Long)]): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(src.sparkSession)
    import graft.functions.GraftFunctions.Int128SumName
    def sum128(e: Column): Column = call_function(Int128SumName, e)
    val scaled = cols.map { case (c, name, s) =>
      expr(s"CAST(round($c * $s) AS BIGINT)").as(name)
    }
    val base = src.select(scaled: _*)
    // pass 1: integer mean shifts (4 sums + count). Centering costs a
    // second column-pruned scan — measured 1.8 s → 3.6 s at sf0.1 —
    // bought deliberately: it removes the data-magnitude term from the
    // exactness bound (round-7 verdict item 9). The raw sums cross
    // 2^63 long before DECIMAL(38,0) saturates — Int128Sum carries
    // them exactly
    val shifts = base.agg(count(lit(1)).cast("decimal(38,0)").as("n0"),
      cols.map { case (_, n, _) => sum128(col(n)).as(s"m_$n") }: _*)
    // pass 2: centered values (longs — the mean fits by construction),
    // then the one moment aggregate
    val centered = base.crossJoin(broadcast(shifts))
      .select(cols.map { case (_, n, _) =>
        (col(n) - expr(s"CAST(m_$n div n0 AS BIGINT)")).as(n)
      }: _*)
    val aggs =
      cols.map { case (_, n, _) => sum128(col(n)).as(s"s_$n") } ++
      cols.map { case (_, n, _) => sum128(col(n) * col(n)).as(s"ss_$n") } ++
      cols.combinations(2).toSeq.map { case Seq((_, a, _), (_, b, _)) =>
        sum128(col(a) * col(b)).as(s"sp_${a}_$b")
      }
    val m = centered.agg(count(lit(1)).cast("decimal(38,0)").as("n"),
                         aggs: _*)
    val pairRows = cols.combinations(2).toSeq.map {
      case Seq((_, a, _), (_, b, _)) =>
        struct(lit(a).as("col_a"), lit(b).as("col_b"),
          round(
            (col("n") * col(s"sp_${a}_$b") - col(s"s_$a") * col(s"s_$b"))
              .cast("double") /
            (sqrt((col("n") * col(s"ss_$a") - col(s"s_$a") * col(s"s_$a"))
               .cast("double")) *
             sqrt((col("n") * col(s"ss_$b") - col(s"s_$b") * col(s"s_$b"))
               .cast("double"))), 6).as("pearson_r"))
    }
    m.select(explode(array(pairRows: _*)).as("p"))
      .select(col("p.col_a"), col("p.col_b"), col("p.pearson_r"))
  }

  val corrMatrixOracle: String = {
    val sums = CorrCols.map { case (c, n, s) =>
      s"sum(CAST(round($c * $s) AS HUGEINT)) AS s_$n" }
    val sqs = CorrCols.map { case (c, n, s) =>
      s"sum(CAST(round($c * $s) AS HUGEINT) * CAST(round($c * $s) AS HUGEINT)) AS ss_$n" }
    val prods = CorrCols.combinations(2).toSeq.map {
      case Seq((ca, a, sa), (cb, b, sb)) =>
        s"sum(CAST(round($ca * $sa) AS HUGEINT) * CAST(round($cb * $sb) AS HUGEINT)) AS sp_${a}_$b" }
    val branches = CorrCols.combinations(2).toSeq.map {
      case Seq((_, a, _), (_, b, _)) =>
        s"""SELECT '$a' AS col_a, '$b' AS col_b,
           |  round(CAST(n * sp_${a}_$b - s_$a * s_$b AS DOUBLE) /
           |        (sqrt(CAST(n * ss_$a - s_$a * s_$a AS DOUBLE)) *
           |         sqrt(CAST(n * ss_$b - s_$b * s_$b AS DOUBLE))), 6)
           |    AS pearson_r
           |FROM m""".stripMargin }
    s"""WITH m AS (
       |  SELECT CAST(count(*) AS HUGEINT) AS n,
       |         ${(sums ++ sqs ++ prods).mkString(",\n         ")}
       |  FROM lineitem)
       |${branches.mkString("\nUNION ALL\n")}
       |""".stripMargin
  }

  // ------------------------------------------------------ A/B significance

  /** TWO-PROPORTION Z-TEST for a hash-split experiment: users split into
    * arms by the deterministic assignment hash (the [[graft.ops.Sampling]]
    * device — stable under reruns and repartitioning), conversion =
    * "made a purchase of value ≥ 150" (every fixture user purchases
    * SOMETHING, so plain any-purchase conversion is 1.0 in both arms
    * and the pooled variance degenerates to zero), and the pooled z
    * statistic decides whether the arms differ. The analytics primitive
    * behind every experimentation readout, exact where it can be: user
    * sets and conversion counts are exact integers; the z formula is one
    * shared-structure IEEE expression over those integers, so the
    * statistic hash-matches any engine. |z| ≥ 1.96 flags 5%
    * significance. One distinct-user aggregate, one arm-grain regroup,
    * 1-row output — nothing user-cardinality-sized leaves the shuffle. */
  def abTest(spark: SparkSession, dir: String): DataFrame = {
    val users = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase" && col("value") >= 150.0,
          1).otherwise(0)).as("converted"))
      .withColumn("arm", Sampling.bucket(col("user_id"), "ab") % 2)
    val arms = users.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("converted")).as("c"))
    val a = arms.filter(col("arm") === 0)
      .select(col("n").as("n_a"), col("c").as("conv_a"))
    val b = arms.filter(col("arm") === 1)
      .select(col("n").as("n_b"), col("c").as("conv_b"))
    a.crossJoin(b)
      .withColumn("p_pool",
        (col("conv_a") + col("conv_b")).cast("double") /
          (col("n_a") + col("n_b")).cast("double"))
      .withColumn("z_raw",
        (col("conv_a").cast("double") / col("n_a").cast("double") -
         col("conv_b").cast("double") / col("n_b").cast("double")) /
          sqrt(col("p_pool") * (lit(1.0) - col("p_pool")) *
            (lit(1.0) / col("n_a").cast("double") +
             lit(1.0) / col("n_b").cast("double"))))
      .select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
        expr("CAST(conv_a * 1000000 div n_a AS BIGINT)").as("rate_a_ppm"),
        expr("CAST(conv_b * 1000000 div n_b AS BIGINT)").as("rate_b_ppm"),
        round(col("z_raw"), 6).as("z"),
        // threshold the UNROUNDED statistic, same as the oracle — a z
        // within 5e-7 of ±1.96 must not flip the flag on one side only
        (abs(col("z_raw")) >= 1.96).as("significant"))
  }

  val abTestOracle: String =
    """WITH u AS (
      |  SELECT user_id,
      |         CAST(max(CASE WHEN event_type = 'purchase' AND value >= 150.0 THEN 1 ELSE 0 END) AS BIGINT) AS converted,
      |         CAST(CAST(('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT) % 10000 % 2 AS arm
      |  FROM events GROUP BY 1),
      |arms AS (
      |  SELECT arm, CAST(count(*) AS BIGINT) AS n, CAST(sum(converted) AS BIGINT) AS c
      |  FROM u GROUP BY 1),
      |w AS (
      |  SELECT a.n AS n_a, a.c AS conv_a, b.n AS n_b, b.c AS conv_b,
      |         (a.c + b.c) * 1.0 / (a.n + b.n) AS p_pool
      |  FROM arms a CROSS JOIN arms b WHERE a.arm = 0 AND b.arm = 1)
      |SELECT n_a, conv_a, n_b, conv_b,
      |       CAST(conv_a * 1000000 // n_a AS BIGINT) AS rate_a_ppm,
      |       CAST(conv_b * 1000000 // n_b AS BIGINT) AS rate_b_ppm,
      |       round((conv_a * 1.0 / n_a - conv_b * 1.0 / n_b) /
      |             sqrt(p_pool * (1.0 - p_pool) * (1.0 / n_a + 1.0 / n_b)), 6) AS z,
      |       abs((conv_a * 1.0 / n_a - conv_b * 1.0 / n_b) /
      |           sqrt(p_pool * (1.0 - p_pool) * (1.0 / n_a + 1.0 / n_b))) >= 1.96 AS significant
      |FROM w
      |""".stripMargin

  // ---------------------------------------------------- Neyman allocation

  private val NeymanBudget = 2000L

  /** NEYMAN (optimal) ALLOCATION of a sampling budget across strata:
    * n_h ∝ N_h·S_h — big, high-variance strata earn more samples than
    * proportional allocation gives them; the survey-sampling upgrade to
    * [[graft.ops.Sampling.stratified]]'s flat rates. Per-stratum std
    * comes from exact decimal power sums (population variance,
    * `clamp ≥ 0` before the sqrt); the weights N_h·S_h convert to the
    * exact micro-integer grid so the ALLOCATION arithmetic (shares,
    * floors) is pure BIGINT and engine-identical. Output: per source,
    * size, std (micro), and the allocated sample count for a
    * [[NeymanBudget]]-document budget. */
  def neymanAllocation(spark: SparkSession, dir: String): DataFrame = {
    val m = Tables.documents(spark, dir)
      .select(col("source"), col("n_chars").cast("decimal(38,0)").as("x"))
      .groupBy(col("source"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("x")).as("s"), sum(col("x") * col("x")).as("ss"))
      .withColumn("var",
        greatest((col("n") * col("ss") - col("s") * col("s")).cast("double") /
          (col("n") * col("n")).cast("double"), lit(0.0)))
      .withColumn("w_micro",
        expr("CAST(round(CAST(n AS DOUBLE) * sqrt(var) * 1000000, 0) AS BIGINT)"))
    val tot = m.agg(sum(col("w_micro")).as("w_tot"))
    m.crossJoin(broadcast(tot))
      .select(col("source"),
        col("n").cast("long").as("n_docs"),
        expr("CAST(round(sqrt(var) * 1000000, 0) AS BIGINT)").as("std_micro"),
        expr(s"CAST($NeymanBudget * w_micro div w_tot AS BIGINT)").as("alloc_n"))
  }

  val neymanAllocationOracle: String =
    s"""WITH m AS (
       |  SELECT source, CAST(count(*) AS HUGEINT) AS n,
       |         sum(CAST(n_chars AS HUGEINT)) AS s,
       |         sum(CAST(n_chars AS HUGEINT) * CAST(n_chars AS HUGEINT)) AS ss
       |  FROM documents GROUP BY 1),
       |v AS (
       |  SELECT source, n,
       |         greatest(CAST(n * ss - s * s AS DOUBLE) / CAST(n * n AS DOUBLE), 0.0) AS var
       |  FROM m),
       |w AS (
       |  SELECT source, n, var,
       |         CAST(round(CAST(n AS DOUBLE) * sqrt(var) * 1000000, 0) AS BIGINT) AS w_micro
       |  FROM v),
       |t AS (SELECT CAST(sum(w_micro) AS BIGINT) AS w_tot FROM w)
       |SELECT source, CAST(n AS BIGINT) AS n_docs,
       |       CAST(round(sqrt(var) * 1000000, 0) AS BIGINT) AS std_micro,
       |       CAST($NeymanBudget * w_micro // w_tot AS BIGINT) AS alloc_n
       |FROM w CROSS JOIN t
       |""".stripMargin
}
