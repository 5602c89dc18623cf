package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Dataset profiling — the summary statistics a data-quality system
  * computes before trusting a feed (the reference is exactly such a
  * system: duplicate gates, reconciliation, mismatch summaries; these
  * operators extend that family with per-column and distributional
  * profiles).
  *
  * Both operators are single-scan: completeness unpivots columns into
  * rows with one `stack` projection (rows × columns cells through ONE
  * hash aggregate — no per-column jobs, no driver loop over columns),
  * Benford is a projection + 9-group aggregate. Both scale as pure
  * map-side-combinable aggregations.
  */
object Profiling {

  /** Per-column completeness/cardinality profile of the customer table:
    * row count, nulls, distinct values. Values are profiled via their
    * string form — distinct COUNTS are formatting-independent because
    * round-trip double formatting is injective in any engine, which is
    * what makes the result portable. `n_distinct` excludes nulls (SQL
    * count-distinct semantics on both engines). */
  def completeness(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal",
                   "c_mktsegment")
    val stackArgs = cols.map(c => s"'$c', CAST($c AS STRING)").mkString(", ")
    Tables.customer(spark, dir)
      .select(expr(s"stack(${cols.size}, $stackArgs) AS (column_name, v)"))
      .groupBy(col("column_name"))
      .agg(count(lit(1)).as("n_rows"),
           sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
           countDistinct(col("v")).as("n_distinct"))
  }

  val completenessOracle: String = {
    val cols = Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal",
                   "c_mktsegment")
    val branches = cols.map(c =>
      s"SELECT '$c' AS column_name, CAST($c AS VARCHAR) AS v FROM customer")
      .mkString("\n  UNION ALL ")
    s"""WITH cells AS (
       |  $branches)
       |SELECT column_name,
       |       CAST(count(*) AS BIGINT) AS n_rows,
       |       CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       |       CAST(count(DISTINCT v) AS BIGINT) AS n_distinct
       |FROM cells GROUP BY 1
       |""".stripMargin
  }

  /** Leading-digit (Benford) profile of order amounts: digit 1–9 counts
    * and shares. Genuinely transactional amounts follow Benford's law
    * closely; a synthetic or truncated feed does not — a one-row-per-
    * digit fingerprint that catches distribution swaps between loads. */
  def benford(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.orders(spark, dir)
      .select(substring(floor(col("o_totalprice")).cast("long").cast("string"),
        1, 1).cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val total = d.agg(sum(col("n")).as("n_total"))
    d.crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
              round(col("n").cast("double") / col("n_total"), 6).as("share"))
  }

  /** k-anonymity / l-diversity audit over the customer table: group by
    * the quasi-identifier pair (nation, market segment) and report each
    * equivalence class's size, the number of distinct sensitive values
    * (account balance) inside it, and whether the class is re-identifiable
    * (size below k) — the privacy gate a dataset passes before leaving a
    * governed zone. One hash aggregate; output is quasi-identifier-sized,
    * never row-sized, so the plan is a single map-side-combinable shuffle
    * at any corpus scale. */
  private val KAnon = 8L

  def kAnonymity(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("class_size"),
           countDistinct(col("c_acctbal")).as("l_diversity"))
      .withColumn("at_risk", col("class_size") < KAnon)

  val kAnonymityOracle: String =
    s"""SELECT c_nationkey, c_mktsegment,
       |       CAST(count(*) AS BIGINT) AS class_size,
       |       CAST(count(DISTINCT c_acctbal) AS BIGINT) AS l_diversity,
       |       count(*) < $KAnon AS at_risk
       |FROM customer GROUP BY 1, 2
       |""".stripMargin

  /** Samarati-style GENERALIZATION ladder for the k-anonymity gate: walk
    * one suppression branch of the quasi-identifier lattice — from the
    * full (nation, segment, coarse-balance) identifier up to no
    * identifier at all — and report each level's equivalence-class
    * profile, flagging the LEAST-generalized level that satisfies k
    * (the release answer: "how much detail can this extract keep?").
    * Each level is one map-side-combinable hash aggregate folded to a
    * class-profile row; the level table is 4 rows, so the chosen-level
    * comparison is a broadcast against a 1-row minimum. Scales as four
    * aggregates over the governed table, independent of class skew. */
  def kAnonGeneralization(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    def profile(level: Int, desc: String, keys: Seq[Column]): DataFrame = {
      val grouped =
        if (keys.isEmpty) cust.groupBy(lit(1).as("__all"))
        else cust.groupBy(keys: _*)
      grouped.agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("n_classes"),
             min(col("c")).as("min_class_size"),
             sum(when(col("c") < KAnon, 1L).otherwise(0L)).as("n_small_classes"))
        .select(lit(level).as("level"), lit(desc).as("generalization"),
                col("n_classes"), col("min_class_size"), col("n_small_classes"))
    }
    val levels = Seq(
      profile(0, "nation,segment,acctbal_k",
        Seq(col("c_nationkey"), col("c_mktsegment"),
            expr("CAST(floor(c_acctbal / 1000) AS BIGINT)").as("bal_k"))),
      profile(1, "nation,segment", Seq(col("c_nationkey"), col("c_mktsegment"))),
      profile(2, "nation", Seq(col("c_nationkey"))),
      profile(3, "none", Seq.empty)
    ).reduce(_ union _)
    val ok = levels.filter(col("min_class_size") >= KAnon)
      .agg(min(col("level")).as("lv"))
    levels.crossJoin(broadcast(ok))
      .select(col("level"), col("generalization"), col("n_classes"),
              col("min_class_size"), col("n_small_classes"),
              (col("min_class_size") >= KAnon).as("k_ok"),
              coalesce(col("level") === col("lv"), lit(false)).as("chosen"))
  }

  val kAnonGeneralizationOracle: String = {
    def lvl(level: Int, desc: String, groupBy: Option[String]) = {
      val inner = groupBy match {
        case Some(g) => s"SELECT count(*) AS c FROM customer GROUP BY $g"
        case None    => s"SELECT count(*) AS c FROM customer"
      }
      s"""SELECT $level AS level, '$desc' AS generalization,
         |       CAST(count(*) AS BIGINT) AS n_classes,
         |       CAST(min(c) AS BIGINT) AS min_class_size,
         |       CAST(sum(CASE WHEN c < $KAnon THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_small_classes
         |FROM ($inner)""".stripMargin
    }
    val union = Seq(
      lvl(0, "nation,segment,acctbal_k",
        Some("c_nationkey, c_mktsegment, floor(c_acctbal / 1000)")),
      lvl(1, "nation,segment", Some("c_nationkey, c_mktsegment")),
      lvl(2, "nation", Some("c_nationkey")),
      lvl(3, "none", None)).mkString("\nUNION ALL\n")
    s"""WITH u AS (
       |$union),
       |ok AS (SELECT min(level) AS lv FROM u WHERE min_class_size >= $KAnon)
       |SELECT level, generalization, n_classes, min_class_size,
       |       n_small_classes, min_class_size >= $KAnon AS k_ok,
       |       coalesce(level = lv, FALSE) AS chosen
       |FROM u CROSS JOIN ok
       |""".stripMargin
  }

  private val DriftBinWidth = 50L

  /** Train/valid distribution drift on a numeric feature (document
    * length): fixed-width bins, per-split counts, and the per-bin share
    * difference in ppm — the PSI-shaped split-health check that catches
    * a leaky or skewed split before training (a sound hash split shows
    * near-zero drift; systematic drift means the split key correlates
    * with the feature). Log-free by design: shares are integer
    * `n·1e6 div total` so the result is exact on any engine. One scan,
    * one bin-sized hash aggregate, a 1-row totals broadcast. */
  def splitDrift(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(expr(s"n_chars div $DriftBinWidth").as("bin"),
              Sampling.split(col("doc_id"), 0.8, 0.1).as("split"))
      .filter(col("split") =!= "test")
    val bins = d.groupBy(col("bin"))
      .agg(sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
           sum(when(col("split") === "valid", 1L).otherwise(0L)).as("n_valid"))
    val tot = bins.agg(sum(col("n_train")).as("t_train"),
                       sum(col("n_valid")).as("t_valid"))
    bins.crossJoin(broadcast(tot))
      .select(col("bin"), col("n_train"), col("n_valid"),
        expr("abs(n_train * 1000000 div t_train - n_valid * 1000000 div t_valid)")
          .as("diff_ppm"))
  }

  val splitDriftOracle: String = {
    val dd = 10000L
    s"""WITH s AS (
       |  SELECT n_chars // $DriftBinWidth AS bin,
       |         CASE WHEN CAST(CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT) % $dd < ${(0.8 * dd).toLong} THEN 'train'
       |              WHEN CAST(CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT) % $dd < ${(0.9 * dd).toLong} THEN 'valid'
       |              ELSE 'test' END AS split
       |  FROM documents),
       |bins AS (
       |  SELECT bin,
       |         CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
       |         CAST(sum(CASE WHEN split = 'valid' THEN 1 ELSE 0 END) AS BIGINT) AS n_valid
       |  FROM s WHERE split <> 'test' GROUP BY 1),
       |tot AS (
       |  SELECT CAST(sum(n_train) AS BIGINT) AS t_train,
       |         CAST(sum(n_valid) AS BIGINT) AS t_valid FROM bins)
       |SELECT CAST(bin AS BIGINT) AS bin, n_train, n_valid,
       |       abs(n_train * 1000000 // t_train - n_valid * 1000000 // t_valid) AS diff_ppm
       |FROM bins CROSS JOIN tot
       |""".stripMargin
  }

  val benfordOracle: String =
    """WITH d AS (
      |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
      |         count(*) AS n
      |  FROM orders GROUP BY 1),
      |t AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM d)
      |SELECT digit, CAST(n AS BIGINT) AS n,
      |       round(CAST(n AS DOUBLE) / n_total, 6) AS share
      |FROM d CROSS JOIN t
      |""".stripMargin

  /** Association profile between two categorical columns — here event
    * type × weekday: the joint-count cell table with per-cell PMI and
    * the total mutual information, the feature-dependence check a
    * pipeline runs before treating columns as independent (stratifiers,
    * leakage hunts). Deterministic log discipline as the unigram-NLL
    * path: each ln term rounds to 6 dp, scales to integer micros, and
    * every downstream fold is exact integer arithmetic (a raw double
    * Σ p·ln(...) would be partition-order-dependent). Shape: one shuffle
    * of the fact into |X|·|Y| cells; marginals and the MI total ride
    * broadcast one-row/tiny frames. Weekday is epoch-day mod 7 (0 =
    * Thursday) — the [[TimeSeries.weekdayAnomalies]] mapping that
    * sidesteps the engines' dayofweek() numbering mismatch. */
  def typeWeekdayAssociation(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.Caches.TrackedDataset
    val e = Tables.events(spark, dir).select(
      col("event_type").as("x"),
      pmod(datediff(to_date(col("ts")), lit("1970-01-01")), lit(7))
        .cast("int").as("y"))
    val cells = e.groupBy(col("x"), col("y")).agg(count(lit(1)).as("n_xy"))
      .trackPersist()
    val nx = cells.groupBy(col("x")).agg(sum(col("n_xy")).as("n_x"))
    val ny = cells.groupBy(col("y")).agg(sum(col("n_xy")).as("n_y"))
    val tot = cells.agg(sum(col("n_xy")).as("n_total"))
    val scored = cells
      .join(broadcast(nx), Seq("x")).join(broadcast(ny), Seq("y"))
      .crossJoin(broadcast(tot))
      .withColumn("pmi_micro",
        round(round(log(col("n_xy").cast("double") * col("n_total") /
                        (col("n_x") * col("n_y"))), 6) * 1000000d, 0)
          .cast("long"))
      .trackPersist()
    val mi = scored.agg(sum(col("n_xy") * col("pmi_micro")).as("s"),
                        max(col("n_total")).as("nt"))
    scored.crossJoin(broadcast(mi))
      .select(col("x").as("event_type"), col("y").as("dow"),
              col("n_xy"), col("n_x"), col("n_y"), col("n_total"),
              (col("pmi_micro").cast("double") / 1e6).as("pmi"),
              round(col("s").cast("double") / 1e6 / col("nt"), 6).as("mi_total"))
  }

  val typeWeekdayAssociationOracle: String =
    """WITH e AS (
      |  SELECT event_type AS x,
      |         CAST(date_diff('day', DATE '1970-01-01',
      |                        CAST(CAST(ts AS TIMESTAMP) AS DATE)) % 7 AS INT) AS y
      |  FROM events),
      |cells AS (SELECT x, y, CAST(count(*) AS BIGINT) AS n_xy FROM e GROUP BY 1, 2),
      |nx AS (SELECT x, CAST(sum(n_xy) AS BIGINT) AS n_x FROM cells GROUP BY 1),
      |ny AS (SELECT y, CAST(sum(n_xy) AS BIGINT) AS n_y FROM cells GROUP BY 1),
      |tot AS (SELECT CAST(sum(n_xy) AS BIGINT) AS n_total FROM cells),
      |scored AS (
      |  SELECT x, y, n_xy, n_x, n_y, n_total,
      |         CAST(round(round(ln(CAST(n_xy AS DOUBLE) * n_total / (n_x * n_y)), 6)
      |              * 1000000, 0) AS BIGINT) AS pmi_micro
      |  FROM cells JOIN nx USING (x) JOIN ny USING (y), tot),
      |mi AS (SELECT CAST(sum(n_xy * pmi_micro) AS BIGINT) AS s,
      |              max(n_total) AS nt FROM scored)
      |SELECT x AS event_type, y AS dow, n_xy, n_x, n_y, n_total,
      |       CAST(pmi_micro AS DOUBLE) / 1e6 AS pmi,
      |       round(CAST(s AS DOUBLE) / 1e6 / nt, 6) AS mi_total
      |FROM scored, mi
      |""".stripMargin

  // ------------------------------------------------- randomized response

  /** Flip probability in [[graft.ops.Sampling.D]]-ths: 1/4 — local DP
    * with epsilon = ln(p_keep/p_flip) = ln 3. */
  private val RrFlip = 2500L

  /** RANDOMIZED-RESPONSE release of a sensitive rate — local
    * differential privacy with everything in INTEGER arithmetic so the
    * release is bit-portable: each user's true bit ("high-value
    * purchaser": any purchase ≥ 150) is reported FLIPPED when the
    * user's deterministic md5 bucket lands under [[RrFlip]] of
    * [[Sampling.D]] (the engine's seedless randomness device — in a
    * real deployment the flip would be client-side true randomness;
    * the mechanism, estimator, and arithmetic are identical). The
    * unbiased estimate inverts the flip channel:
    * pi_hat = (r − f)/(1 − 2f), emitted in ppm by integer division,
    * beside the true rate so the gate also audits estimator error.
    * One user-grain aggregate + one 1-row fold; nothing row-sized
    * leaves the shuffle. */
  def randomizedResponse(spark: SparkSession, dir: String): DataFrame = {
    val users = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase" && col("value") >= 150.0,
          1L).otherwise(0L)).as("t"))
      .withColumn("flip",
        (Sampling.bucket(col("user_id"), "rr") < RrFlip).cast("long"))
      .withColumn("r", (col("t") + col("flip")) % 2)
    users.agg(count(lit(1)).as("n_users"),
        sum(col("t")).as("true_ones"),
        sum(col("r")).as("reported_ones"))
      .select(col("n_users"), col("true_ones"), col("reported_ones"),
        lit(RrFlip * 1000000L / Sampling.D).as("flip_ppm"),
        expr(s"CAST((reported_ones * ${Sampling.D} - n_users * $RrFlip) * 1000000 div " +
             s"(n_users * (${Sampling.D} - 2 * $RrFlip)) AS BIGINT)").as("pi_hat_ppm"),
        expr("CAST(true_ones * 1000000 div n_users AS BIGINT)").as("pi_true_ppm"))
  }

  val randomizedResponseOracle: String =
    s"""WITH u AS (
       |  SELECT user_id,
       |         CAST(max(CASE WHEN event_type = 'purchase' AND value >= 150.0
       |                       THEN 1 ELSE 0 END) AS BIGINT) AS t,
       |         CASE WHEN CAST(CAST(('0x' || substr(md5('rr:' || CAST(user_id AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT) % ${Sampling.D} < $RrFlip
       |              THEN 1 ELSE 0 END AS flip
       |  FROM events GROUP BY user_id),
       |a AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_users,
       |         CAST(sum(t) AS BIGINT) AS true_ones,
       |         CAST(sum((t + flip) % 2) AS BIGINT) AS reported_ones
       |  FROM u)
       |SELECT n_users, true_ones, reported_ones,
       |       ${RrFlip * 1000000L / 10000L} AS flip_ppm,
       |       CAST((reported_ones * ${Sampling.D} - n_users * $RrFlip) * 1000000 //
       |            (n_users * (${Sampling.D} - 2 * $RrFlip)) AS BIGINT) AS pi_hat_ppm,
       |       CAST(true_ones * 1000000 // n_users AS BIGINT) AS pi_true_ppm
       |FROM a
       |""".stripMargin
}
