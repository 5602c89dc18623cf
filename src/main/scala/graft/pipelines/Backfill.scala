package graft.pipelines

import org.apache.spark.sql.SparkSession
import graft.connect.Warehouse
import graft.core.RunDate

/** Date-range backfill driver — the engine answer to the reference's
  * backfill story, which FORKED whole pipeline files to stamp
  * `current_date() - 1` (reference: adhoc_load_sales_20250707_file.py:
  * 20,48,257,389). Here the load date is an injected parameter
  * (SURVEY §1.1), so a backfill is just the same pipeline over a date
  * range — no forked code, no wall-clock dependence.
  *
  * Idempotence contract: the warehouse history write is a DAY-SCOPED
  * dynamic partition overwrite ([[graft.connect.ParquetWarehouse
  * .appendHistory]]), so re-running any sub-range rewrites exactly those
  * days' partitions. A crashed backfill is resumed by re-running the
  * same range; days already complete are rewritten identically, the torn
  * day is healed, other days are untouched — recovery and normal
  * operation are the same code path.
  *
  * Scale: days run SEQUENTIALLY by design. Each day's mart is itself a
  * fully parallel Spark job; running days concurrently would only
  * interleave two shuffles over the same executors, while sequential
  * days keep each job's shuffle partitions sized as tuned. For a 1000-day
  * backfill the loop is 1000 independent jobs — resumable at day
  * granularity, trivially chunkable across clusters by range.
  */
object Backfill {

  /** Inclusive [from, to] as RunDates, oldest first. */
  def dateRange(from: String, to: String): Seq[RunDate] = {
    val f = java.time.LocalDate.parse(from)
    val t = java.time.LocalDate.parse(to)
    require(!f.isAfter(t), s"backfill range is inverted: $from > $to")
    Iterator.iterate(f)(_.plusDays(1)).takeWhile(!_.isAfter(t))
      .map(RunDate(_)).toSeq
  }

  /** Materialize `marts` for every date in [from, to] (inclusive,
    * oldest first — the reference DAG's mart ordering within each day).
    * Returns (date, mart) → snapshot rows, insertion-ordered. */
  def marts(spark: SparkSession, dir: String, from: String, to: String,
            warehouse: Warehouse,
            marts: Seq[Marts.Mart] = Marts.all): Seq[((String, String), Long)] =
    for {
      d <- dateRange(from, to)
      m <- marts
    } yield (d.value.toString, m.name) ->
      Marts.materialize(spark, dir, m, d, warehouse)
}
