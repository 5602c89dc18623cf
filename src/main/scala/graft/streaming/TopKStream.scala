package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.Sketches

/** Streaming heavy-hitter nomination: a capacity-`m` Misra-Gries summary
  * per group key, maintained across micro-batches with the mergeable-
  * summaries construction (Agarwal et al., PODS'12 — the same
  * [[Sketches.mgMerge]] the batch operator uses per partition).
  *
  * Per trigger, each group folds its new rows into a batch-local MG
  * summary (bounded memory even if a batch is huge) and merges it into
  * the running state; the merged summary keeps the MG bound for the
  * CONCATENATED stream: for every key,
  * `trueCount(k) − N/m ≤ est(k) ≤ trueCount(k)`, so any key with global
  * frequency above N/m is guaranteed present in the state no matter how
  * its occurrences are spread across batches. State per group is at most
  * m counters — constant, never row-scaled; this is the unbounded-stream
  * analogue of the batch nominate-then-verify pass
  * ([[Sketches.heavyHitters]]), whose exact verification needs the full
  * data and therefore stays batch.
  *
  * Emitted rows carry the MG estimate, a LOWER bound on the true count —
  * downstream exact verification (the batch pass over the nominated
  * keys) stays cheap because the candidate set is m-bounded. */
object TopKStream {

  /** One stream element: a group (the report dimension) and a key. */
  final case class Keyed(grp: String, k: String)

  /** State: the running MG counters for one group. */
  final case class MgState(counters: Map[String, Long], n: Long)

  /** A nomination: MG estimate `est` (≤ true count) for key `k` in
    * group `grp`, with the stream length `n` seen so far — the error
    * bound `n/m` travels with the summary. */
  final case class Nomination(grp: String, k: String, est: Long, n: Long)

  private def step(m: Int)(grp: String, rows: Iterator[Keyed],
                           state: GroupState[MgState]): Iterator[Nomination] = {
    val prev = state.getOption.getOrElse(MgState(Map.empty, 0L))
    var batchN = 0L
    val batchSummary = Sketches.mgCounters(rows.map { r => batchN += 1; r.k }, m)
    val merged = Sketches.mgMerge(prev.counters, batchSummary.toMap, m)
    val next = MgState(merged, prev.n + batchN)
    state.update(next)
    next.counters.iterator.map { case (k, c) => Nomination(grp, k, c, next.n) }
  }

  /** Update-mode stream of per-group nominations after each trigger. */
  def nominations(ds: Dataset[Keyed], m: Int): Dataset[Nomination] = {
    require(m >= 1, s"Misra-Gries capacity must be >= 1, got $m")
    import ds.sparkSession.implicits._
    ds.groupByKey(_.grp)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(step(m))
  }
}
