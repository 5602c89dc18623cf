package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the engine.
  *
  * Replaces the reference's ad-hoc `init_spark()`
  * (reference: ETL_Airflow/dags/tasks/utils.py:10-31) with a single place
  * that pins the settings that matter for determinism and scale:
  *   - UTC session time zone (reference results depended on wall-clock/locale)
  *   - AQE on (runtime skew-join + partition coalescing; the reference ran
  *     stock defaults on a 2-core worker)
  *   - shuffle partitions sized to the local core count, not 200.
  */
object Sessions {

  /** Join-strategy settings shared by EVERY engine entrypoint (this
    * factory, Bench, Verify, the plan tools) — before round 14 the
    * bench/verify mains built bare sessions and measured a different
    * engine configuration than [[local]] shipped (28 registry plans
    * carried SortMergeJoins the engine session would not plan).
    * All three are scale-adaptive, not local-core tuning:
    *  - preferSortMergeJoin=false lets the planner pick shuffled-hash
    *    (no sort of either side) when its size conditions hold; with
    *    large estimated inputs it still falls back to sort-merge — the
    *    guide's recommended baseline (spark_optimization_guide §3.1/§9);
    *  - the AQE local-map threshold converts a planned sort-merge to
    *    shuffled-hash at RUNTIME when every post-shuffle partition fits
    *    a 128 MB local map — at 100 TB partitions exceed it and the
    *    sort-merge stands, so the rewrite self-disables at scale;
    *  - the 64 MB broadcast threshold is [[local]]'s long-standing
    *    value (estimates, not actuals — guide §3.1 puts the comfortable
    *    broadcast range far above it). */
  val joinTuning: Seq[(String, String)] = Seq(
    "spark.sql.join.preferSortMergeJoin" -> "false",
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold" ->
      (128L * 1024 * 1024).toString,
    "spark.sql.autoBroadcastJoinThreshold" -> (64L * 1024 * 1024).toString)

  /** Apply [[joinTuning]] to any session builder. */
  def tune(b: SparkSession.Builder): SparkSession.Builder =
    joinTuning.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }

  def local(cores: Int = Runtime.getRuntime.availableProcessors(),
            shufflePartitions: Option[Int] = None,
            appName: String = "graft"): SparkSession = {
    val sp = shufflePartitions.getOrElse(math.max(cores, 4))
    val b = tune(SparkSession
      .builder())
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", sp.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // graft's optimizer rules (NormalizeTrimJoins, FuseDotProduct) are
      // semantics-preserving — every engine session runs with them live
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

/** Injected load date ("run date") for snapshot stamping.
  *
  * The reference stamps `DAY_DT` with `current_date()` at load time
  * (reference: ingestion_task.py:49), which made runs non-reproducible and
  * forced whole-file forks for backfills
  * (reference: adhoc_load_sales_20250707_file.py:48). Here the date is a
  * pipeline parameter.
  */
final case class RunDate(value: java.time.LocalDate) {
  def sqlDate: java.sql.Date = java.sql.Date.valueOf(value)
  def minusDays(n: Long): RunDate = RunDate(value.minusDays(n))
  override def toString: String = value.toString
}

object RunDate {
  def apply(iso: String): RunDate = RunDate(java.time.LocalDate.parse(iso))
  /** Fixed default for tests/benchmarks — never the wall clock. */
  val default: RunDate = RunDate("2024-06-01")
}
