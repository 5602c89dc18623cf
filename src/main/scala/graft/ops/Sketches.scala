package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Caches.TrackedDataset
import graft.core.Tables

/** Sketch-based approximate aggregation — the paths that replace a
  * full-key shuffle with mergeable fixed-size state when key cardinality
  * is itself the problem (companions to the Bloom contamination probe and
  * the HLL cardinality profile).
  *
  * [[heavyHitters]] finds frequent keys WITHOUT `groupBy(key)` over the
  * full keyspace, in two passes:
  *
  *  1. NOMINATION — per-partition Misra-Gries summaries of capacity `m`
  *     (the mergeable-summaries construction: MG counters undercount a
  *     key's partition-local frequency by at most N_p/m, so a key absent
  *     from a partition's summary has local count ≤ N_p/m). Taking the
  *     UNION of summary keys across partitions therefore guarantees that
  *     every key with GLOBAL count > N/m is nominated — under ANY
  *     partitioning, including a heavy key spread so thinly that it is
  *     never a local top-k member. (The previous local-top-2k nomination
  *     lacked exactly this guarantee and could silently miss a global
  *     heavy hitter; see SketchesSpec's adversarial-partitioning test.)
  *  2. VERIFICATION — exact counts for the nominated keys only, via a
  *     broadcast semi-join (candidates ≤ partitions × m rows, KB-sized)
  *     and one hash aggregate. The output is exact, so it is fully
  *     oracle-checkable; the CMS estimate path ([[heavyHittersEstimate]])
  *     remains for the case where even the verification pass is too
  *     expensive, spec-bounded by the standard ε·N CMS guarantee.
  *
  * Shuffle volume is partitions × m candidate rows plus one filtered
  * aggregate — independent of key cardinality.
  */
object Sketches {

  /** Union of per-partition Misra-Gries(m) summary keys, as a 1-column
    * DataFrame ("k"). Guarantee: contains every key whose GLOBAL count
    * exceeds N/m, regardless of how rows are partitioned. Output size is
    * at most numPartitions × m rows (driver never sees the data — the
    * result stays distributed for the verification join). */
  /** The Misra-Gries counter core shared by [[nominate]] and
    * [[mgSummary]]: at most `m` counters; a full table decrements all
    * (O(m) per trigger, amortized O(1)/row — each decrement retires m
    * prior increments). */
  private[graft] def mgCounters(it: Iterator[String],
                                m: Int): scala.collection.mutable.HashMap[String, Long] = {
    val counters = scala.collection.mutable.HashMap.empty[String, Long]
    it.foreach { s =>
      counters.get(s) match {
        case Some(c) => counters.update(s, c + 1L)
        case None if counters.size < m => counters.update(s, 1L)
        case None =>
          val dead = List.newBuilder[String]
          counters.foreach { case (k, c) =>
            if (c == 1L) dead += k else counters.update(k, c - 1L)
          }
          dead.result().foreach(counters.remove)
      }
    }
    counters
  }

  def nominate(df: DataFrame, key: Column, m: Int): DataFrame = {
    require(m >= 1, s"Misra-Gries capacity must be >= 1, got $m")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(key.cast("string").as("k")).na.drop().as[String]
      .mapPartitions(it => mgCounters(it, m).keysIterator)
      .toDF("k").distinct()
  }

  /** Top-`k` keys by EXACT count, found without a full-keyspace shuffle:
    * Misra-Gries nomination (sound for any key with count > N/m) followed
    * by an exact count of the candidates only. Returns (key, cnt) sorted
    * by count descending, key ascending. The result equals the true
    * top-k whenever the k-th heaviest key has count > N/m — size `m`
    * accordingly (default 1024 tolerates a top-k threshold down to
    * 0.1% of N). */
  def heavyHitters(df: DataFrame, key: Column, k: Int = 5,
                   m: Int = 1024): DataFrame = {
    val keyed = df.select(key.cast("string").as("k")).na.drop()
    val candidates = nominate(df, key, m)
    keyed.join(broadcast(candidates), "k")
      .groupBy(col("k").as("key")).agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("key")).limit(k)
      .select(col("key"), col("cnt"))
  }

  /** Estimate-only variant for when even one verification aggregate is
    * too much: same sound nomination, but counts come from a single
    * mergeable count-min-sketch aggregate probed driver-side (the sketch
    * is KB-sized by construction). CMS-standard bounds: estimates never
    * undercount and overshoot by at most ε·N with confidence `conf`
    * (spec-bounded in SketchesSpec). */
  def heavyHittersEstimate(df: DataFrame, key: Column, k: Int = 5,
                           m: Int = 1024, eps: Double = 0.0001,
                           conf: Double = 0.99): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df.select(key.cast("string").as("k")).na.drop()
    val candidates = nominate(df, key, m).as[String].collect().sorted
    val bytes = keyed
      .agg(count_min_sketch(col("k"), lit(eps), lit(conf), lit(42)))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(bytes))
    candidates.map(c => (c, cms.estimateCount(c)))
      .sortBy { case (c, n) => (-n, c) }.take(k)
      .toSeq.toDF("key", "est")
  }

  // --------------------------------------------------- mergeable summaries

  /** One Misra-Gries(m) summary per partition, merged driver-side with
    * [[mgMerge]] into a single capacity-m summary for the whole frame.
    * Driver traffic is partitions × m counters — state, not data. The
    * result satisfies the MG bound: for every key,
    * `count(k) − N/m ≤ summary(k) ≤ count(k)` (absent keys read 0). */
  def mgSummary(df: DataFrame, key: Column, m: Int): Map[String, Long] = {
    require(m >= 1, s"Misra-Gries capacity must be >= 1, got $m")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(key.cast("string").as("k")).na.drop().as[String]
      .mapPartitions(it => Iterator.single(mgCounters(it, m).toMap))
      .collect().foldLeft(Map.empty[String, Long])(mgMerge(_, _, m))
  }

  /** Merge two Misra-Gries summaries into one of capacity `m` (the
    * mergeable-summaries construction — Agarwal et al., PODS'12): sum
    * counters keywise, then subtract the (m+1)-th largest counter from
    * every key and drop the non-positive. The 1/m error bound holds for
    * the COMBINED stream, so unboundedly many merges keep bounded state
    * with a known guarantee — the streaming heavy-hitter state shape
    * (one summary per micro-batch folded into a running summary). */
  def mgMerge(a: Map[String, Long], b: Map[String, Long], m: Int): Map[String, Long] = {
    val summed = (a.keySet ++ b.keySet).iterator
      .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    if (summed.size <= m) summed
    else {
      val cut = summed.values.toIndexedSeq.sorted(Ordering[Long].reverse)(m)
      summed.iterator.map { case (k, c) => k -> (c - cut) }
        .filter(_._2 > 0L).toMap
    }
  }

  // ------------------------------------------------------------- q-digest

  /** Deterministic mergeable quantile summary (q-digest — Shrivastava et
    * al. 2004; mergeability per Agarwal et al., PODS'12) over a
    * non-negative integer domain `[0, 2^bits)`: a counted subset of
    * binary-trie nodes, compressed so at most ~3k nodes survive, with the
    * rank guarantee `|rank(quantile(q)) − q·N| ≤ (bits/k)·N`.
    *
    * This is the quantile member of the mergeable-state family
    * ([[mgSummary]] for frequencies, HLL for cardinality, CMS for point
    * counts): per-partition digests merge associatively into one digest
    * whose guarantee holds for the COMBINED stream, so the same state
    * shape serves distributed aggregation (partitions × KB of state to
    * the driver — never data) and streaming (one digest per micro-batch
    * folded into a running digest, like the MG heavy-hitter state).
    * Unlike `approx_percentile`'s sampling-based internal state, the
    * digest is DETERMINISTIC — same multiset in, same digest out, under
    * any partitioning and any merge order (compression depends only on
    * the node-count map and N).
    *
    * Node ids are heap-style: root 1, children `2i`/`2i+1`, leaf for
    * value v = `2^bits + v`. Values must be pre-scaled to the integer
    * grid by the caller (the repo-wide exact-arithmetic discipline —
    * money is DECIMAL cents, not doubles). */
  object QDigest {

    /** Compress a node→count map to the q-digest property: any child
      * pair whose (parent + left + right) weight is ≤ ⌊N/k⌋ folds into
      * the parent, bottom-up. Deterministic: pure function of (nodes, N,
      * threshold). */
    private def compress(nodes: scala.collection.mutable.HashMap[Long, Long],
                         bits: Int, threshold: Long): Unit = {
      var level = bits
      while (level >= 1) {
        val ids = nodes.keysIterator
          .filter(id => 64 - java.lang.Long.numberOfLeadingZeros(id) - 1 == level)
          .toArray.sorted
        ids.foreach { id =>
          val c = nodes.getOrElse(id, 0L)
          if (c > 0L || nodes.contains(id)) {
            val sib = id ^ 1L
            val parent = id >>> 1
            val combined = c + nodes.getOrElse(sib, 0L) + nodes.getOrElse(parent, 0L)
            if (combined <= threshold) {
              nodes.update(parent, combined)
              nodes.remove(id)
              nodes.remove(sib)
            }
          }
        }
        level -= 1
      }
    }

    /** Incremental builder with BOUNDED working memory: leaf counts
      * accumulate in a node map that is compressed in place whenever it
      * exceeds `8·k` entries (against the running-N threshold, which only
      * grows — so every intermediate fold is also legal for the final
      * threshold and the ε = bits/k guarantee is preserved, exactly as
      * for [[merge]] folds). Without this, a distinct-value-heavy
      * partition would hold one map entry per distinct value — fine at
      * test scale, unbounded at 100 TB. Still deterministic for a given
      * input ORDER (compression points are a pure function of the
      * prefix), which is what per-partition builds provide. */
    final class Builder(bits: Int, k: Int) {
      require(bits >= 1 && bits <= 40, s"bits must be in [1,40], got $bits")
      require(k >= 1, s"k must be >= 1, got $k")
      private val leafBase = 1L << bits
      private val nodes = scala.collection.mutable.HashMap.empty[Long, Long]
      private var n = 0L

      def add(v: Long, count: Long = 1L): Unit = {
        require(v >= 0 && v < leafBase, s"value $v outside [0, 2^$bits)")
        require(count > 0, s"count must be positive, got $count")
        val leaf = leafBase + v
        nodes.update(leaf, nodes.getOrElse(leaf, 0L) + count)
        n += count
        if (nodes.size > 8 * k) compress(nodes, bits, n / k)
      }

      def result(): Map[Long, Long] = {
        compress(nodes, bits, n / k)
        nodes.toMap
      }
    }

    /** Build a digest from raw values. `bits` bounds the domain
      * (`0 ≤ v < 2^bits`); `k` trades size (≤ ~3k nodes) for rank error
      * (≤ bits/k of N). Working memory is bounded (see [[Builder]]). */
    def fromValues(values: Iterator[Long], bits: Int, k: Int): Map[Long, Long] = {
      val b = new Builder(bits, k)
      values.foreach(b.add(_))
      b.result()
    }

    /** Merge two digests built with the same (bits, k): sum counts
      * nodewise, recompress against the combined N. The rank guarantee
      * holds for the combined stream, so folds of unbounded depth keep
      * bounded state — the streaming shape. */
    def merge(a: Map[Long, Long], b: Map[Long, Long], bits: Int, k: Int): Map[Long, Long] = {
      val nodes = scala.collection.mutable.HashMap.empty[Long, Long]
      a.foreach { case (id, c) => nodes.update(id, nodes.getOrElse(id, 0L) + c) }
      b.foreach { case (id, c) => nodes.update(id, nodes.getOrElse(id, 0L) + c) }
      val n = nodes.valuesIterator.sum
      compress(nodes, bits, n / k)
      nodes.toMap
    }

    /** Fold MANY digests in one pass: sum all node maps, compress ONCE
      * against the combined N. Equivalent guarantee to a [[merge]] fold
      * (the bound is a property of the final compress threshold), but
      * O(total nodes) instead of one full compress per fold step — the
      * driver-side cost of folding `partitions` digests drops from
      * `partitions × compress` to one compress. */
    def mergeAll(digests: Seq[Map[Long, Long]], bits: Int, k: Int): Map[Long, Long] = {
      require(digests.nonEmpty, "mergeAll of no digests")
      val nodes = scala.collection.mutable.HashMap.empty[Long, Long]
      digests.foreach(_.foreach { case (id, c) =>
        nodes.update(id, nodes.getOrElse(id, 0L) + c)
      })
      val n = nodes.valuesIterator.sum
      compress(nodes, bits, n / k)
      nodes.toMap
    }

    /** Quantile estimate: walk nodes in postorder of their value
      * intervals (increasing upper bound, inner nodes before enclosing
      * ones) accumulating counts until `q·N` is covered; report the
      * current node's interval maximum. True rank of the result is
      * within `(bits/k)·N` of `q·N`. */
    def quantile(digest: Map[Long, Long], bits: Int, q: Double): Long = {
      require(q >= 0.0 && q <= 1.0, s"quantile must be in [0,1], got $q")
      require(digest.nonEmpty, "quantile of an empty digest")
      val n = digest.valuesIterator.sum
      val target = math.max(1L, math.ceil(q * n).toLong)
      val spans = digest.toSeq.map { case (id, c) =>
        val depth = 64 - java.lang.Long.numberOfLeadingZeros(id) - 1
        val width = 1L << (bits - depth)
        val lo = (id - (1L << depth)) * width
        (lo + width - 1, -lo, c) // sort: hi asc, contained-first via -lo
      }.sortBy(s => (s._1, s._2))
      var acc = 0L
      var i = 0
      while (i < spans.length - 1 && acc + spans(i)._3 < target) {
        acc += spans(i)._3
        i += 1
      }
      spans(i)._1
    }

    /** Distributed build: one digest per partition, folded driver-side.
      * Driver traffic is partitions × digest size (≤ ~3k nodes each) —
      * state, not data. */
    def summary(df: DataFrame, value: Column, bits: Int, k: Int): Map[Long, Long] = {
      val spark = df.sparkSession
      import spark.implicits._
      df.select(value.cast("long").as("v")).na.drop().as[Long]
        .mapPartitions(it => Iterator.single(fromValues(it, bits, k)))
        .collect()
        .foldLeft(Map.empty[Long, Long])(merge(_, _, bits, k))
    }
  }

  /** Exact discrete quantiles at scale via digest narrowing — the same
    * sound nominate-then-verify shape as [[heavyHitters]]: the q-digest
    * (pass 1, state-sized driver traffic) brackets each requested
    * quantile inside a CLOSED value window [lo, hi] guaranteed to
    * contain the true answer even under arbitrarily heavy ties: for any
    * digest estimate `e` at rank target t, `count(≤ e) ≥ t` (every span
    * accumulated by the walk lies fully at or below `e`) and
    * `count(< e) ≤ t − 1 + bits·⌊N/k⌋` (mass below `e` outside the
    * accumulated spans sits in the ≤ `bits` straddling ancestor nodes,
    * each ≤ ⌊N/k⌋ after compression — leaves can be huge but cannot
    * straddle). Cutting lo at rank (q−2ε)·N and hi at (q+2ε)·N with
    * ε = bits/k therefore gives `count(< lo) < ⌈q·N⌉ ≤ count(≤ hi)`
    * whenever ε·N ≥ 1, i.e. the value at rank ⌈q·N⌉ is inside [lo, hi]
    * — a tied block of any multiplicity stays in the window because lo
    * itself is included. Pass 2 verifies exactly — one aggregate for
    * the strictly-below counts, then a
    * per-window cumulative count over the GROUPED distinct values (a
    * window partitioned by quantile, never a single-partition sort of
    * the data). Total cost: two scans + one aggregate over ~4ε·N rows,
    * independent of how wide the full value distribution is.
    *
    * Quantiles are integer PERCENTS and the rank target is pure integer
    * arithmetic `(pct·N + 99) / 100` = ⌈pct·N/100⌉ (PostgreSQL
    * `percentile_disc` convention: smallest value whose cumulative count
    * reaches the target) so an SQL oracle can reproduce it bit-exactly —
    * no double rounding on either side.
    *
    * Returns (q_pct, value_cents) sorted by q_pct. */
  def exactQuantiles(df: DataFrame, value: Column, percents: Seq[Int],
                     bits: Int = 24, k: Int = 1024): DataFrame =
    groupedExactQuantiles(df, lit("_"), value, percents, bits, k)
      .drop("grp")

  /** Per-group variant of [[exactQuantiles]] for bounded-cardinality
    * dimensions (report axes, status flags — state is groups ×
    * partitions × digest, so cardinality-bounded by contract): one scan
    * builds a digest PER GROUP per partition (memory-bounded builders),
    * the driver folds per group (one [[QDigest.mergeAll]] compress, not
    * one per partition), and verification resolves every (group,
    * percentile) pair simultaneously: below-window counts as one
    * MAP-SIDE conditional aggregate (zero data rows shuffled — the
    * (group, pct) pairs are a fixed bounded schema), then a broadcast
    * range join that only in-window rows (≈ 4ε·N per pair) survive.
    * Returns (grp, q_pct, value_cents). */
  def groupedExactQuantiles(df: DataFrame, group: Column, value: Column,
                            percents: Seq[Int], bits: Int = 24,
                            k: Int = 1024): DataFrame =
    groupedExactQuantilesOf(valuedCut(df, group, value), percents, bits, k)

  /** The Spread + persisted (grp, v) cut both quantile passes read —
    * exposed (round-14 opt) so callers that ALSO scan the values
    * afterwards ([[graft.ops.Stats.equiDepthHistogram]]'s bucketing
    * pass) reuse one cut instead of re-scanning the source. */
  private[ops] def valuedCut(df: DataFrame, group: Column,
                             value: Column): DataFrame =
    graft.core.Spread(
        df.select(group.cast("string").as("grp"),
                  value.cast("long").as("v")).na.drop())
      .trackPersist()

  /** [[groupedExactQuantiles]] over a pre-built [[valuedCut]] frame. */
  private[ops] def groupedExactQuantilesOf(valued: DataFrame,
                                           percents: Seq[Int], bits: Int = 24,
                                           k: Int = 1024): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100),
      s"percents must be in [1,100], got $percents")
    val spark = valued.sparkSession
    import spark.implicits._

    // pass 1: per-partition per-group digests, folded per group on the
    // driver — traffic is groups × partitions × (≤3k nodes), never data
    val digests: Map[String, Map[Long, Long]] = valued.as[(String, Long)]
      .mapPartitions { it =>
        val builders = scala.collection.mutable.HashMap.empty[String, QDigest.Builder]
        it.foreach { case (g, v) =>
          builders.getOrElseUpdate(g, new QDigest.Builder(bits, k)).add(v)
        }
        builders.iterator.map { case (g, b) => (g, b.result()) }
      }
      .collect()
      .groupBy(_._1)
      .map { case (g, ds) => g -> QDigest.mergeAll(ds.map(_._2).toSeq, bits, k) }
    require(digests.nonEmpty, "exactQuantiles of an empty frame")

    val eps = bits.toDouble / k
    val domainMax = (1L << bits) - 1
    val bounds = (for {
      (g, digest) <- digests.toSeq.sortBy(_._1)
      n = digest.valuesIterator.sum
      pct <- percents.sorted
    } yield {
      val target = (pct * n + 99L) / 100L
      val q = pct / 100.0
      // closed window provably containing the group's value at rank
      // `target`: count(< lo) < target ≤ count(≤ hi) whenever ε·N ≥ 1
      // (tie-safe rank bounds in the docstring above); degenerate
      // tiny-N groups fall back to the full domain
      val (lo, hi) =
        if (eps * n < 1.0) (0L, domainMax)
        else (if (q - 2 * eps <= 0.0) 0L
              else QDigest.quantile(digest, bits, q - 2 * eps),
              QDigest.quantile(digest, bits, math.min(1.0, q + 2 * eps)))
      (g, pct, target, lo, hi)
    })

    // pass 2a: exact count strictly below every window's lower edge, as
    // ONE map-side conditional aggregate — (group, pct) pairs are
    // bounded by contract, so the per-pair `when` columns are a fixed
    // schema and NOT A SINGLE DATA ROW is shuffled (the old
    // sentinel-row formulation shuffled every below-window row into the
    // verification aggregate: ~2M of 3M joined rows at sf0.1)
    val belowAggs = bounds.zipWithIndex.map { case ((g, _, _, lo, _), i) =>
      sum(when(col("grp") === lit(g) && col("v") < lit(lo), 1L)
        .otherwise(0L)).as(s"b$i")
    }
    val belowRow = valued.agg(belowAggs.head, belowAggs.tail: _*).head()
    val windows = bounds.zipWithIndex.map { case ((g, pct, target, lo, hi), i) =>
      (g, pct, lo, hi, target - belowRow.getLong(i))
    }.toDF("wgrp", "q_pct", "lo", "hi", "need")

    // pass 2b: residual rank inside each (tiny) window — only in-window
    // rows survive the broadcast range join (≈ 4ε·N per pair), and the
    // cumulative window is PARTITIONED by (group, quantile) over input
    // already grouped to ≤ window-width rows
    val cumWin = org.apache.spark.sql.expressions.Window
      .partitionBy("wgrp", "q_pct").orderBy("v")
      .rowsBetween(Long.MinValue, 0)
    valued
      .join(broadcast(windows),
        col("grp") === col("wgrp") && col("v") >= col("lo") && col("v") <= col("hi"))
      .groupBy(col("wgrp"), col("q_pct"), col("need"), col("v"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(cumWin))
      .where(col("cum") >= col("need"))
      .groupBy(col("wgrp").as("grp"), col("q_pct"))
      .agg(min(col("v")).as("value_cents"))
      // total order on a ≤ groups×percents-row result without orderBy's
      // range exchange (round-14 opt: RangePartitioner adds a sampling
      // pass + an exchange for a frame this size); coalesce(1) merges
      // the final aggregate into one task and the in-task sort is total
      .coalesce(1)
      .sortWithinPartitions(col("grp"), col("q_pct"))
  }

  /** Oracle-gated query: exact price percentiles (cents grid) on
    * lineitem, computed through the digest-narrowed two-pass — the
    * result is EXACT, so DuckDB's row_number-based percentile_disc
    * reproduces it bit-for-bit. */
  def exactQuantilesQuery(spark: SparkSession, dir: String): DataFrame =
    exactQuantiles(Tables.lineitem(spark, dir),
      expr("CAST(round(l_extendedprice * 100) AS LONG)"),
      Seq(25, 50, 75, 90, 99))

  /** Oracle-gated query: exact price percentiles PER RETURN FLAG — the
    * grouped digest narrowing, verified against DuckDB's partitioned
    * row_number percentile_disc. */
  def quantilesByFlagQuery(spark: SparkSession, dir: String): DataFrame =
    groupedExactQuantiles(Tables.lineitem(spark, dir), col("l_returnflag"),
      expr("CAST(round(l_extendedprice * 100) AS LONG)"),
      Seq(25, 50, 75, 90, 99))

  val quantilesByFlagOracle: String =
    """WITH s AS (SELECT CAST(l_returnflag AS VARCHAR) AS grp,
      |                  CAST(round(l_extendedprice * 100) AS BIGINT) AS v
      |           FROM lineitem
      |           WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL),
      |     r AS (SELECT grp, v,
      |                  row_number() OVER (PARTITION BY grp ORDER BY v) AS rn
      |           FROM s),
      |     n AS (SELECT grp, count(*) AS cnt FROM s GROUP BY grp),
      |     qs(pct) AS (VALUES (25), (50), (75), (90), (99))
      |SELECT r.grp, qs.pct AS q_pct, r.v AS value_cents
      |FROM qs CROSS JOIN n
      |JOIN r ON r.grp = n.grp AND r.rn = (qs.pct * n.cnt + 99) // 100
      |ORDER BY r.grp, q_pct
      |""".stripMargin

  val exactQuantilesOracle: String =
    """WITH s AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v
      |           FROM lineitem WHERE l_extendedprice IS NOT NULL),
      |     r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM s),
      |     qs(pct) AS (VALUES (25), (50), (75), (90), (99))
      |SELECT qs.pct AS q_pct, r.v AS value_cents
      |FROM qs JOIN r ON r.rn = (qs.pct * (SELECT count(*) FROM s) + 99) // 100
      |ORDER BY q_pct
      |""".stripMargin

  /** Oracle-gated query: top event types by EXACT verified count (the
    * candidate set comes from the sound Misra-Gries nomination; the
    * count is a real aggregate over the nominated keys). */
  def heavyHittersQuery(spark: SparkSession, dir: String): DataFrame =
    heavyHitters(Tables.events(spark, dir), col("event_type"))

  val heavyHittersOracle: String =
    """SELECT CAST(event_type AS VARCHAR) AS key, count(*) AS cnt
      |FROM events WHERE event_type IS NOT NULL
      |GROUP BY 1 ORDER BY cnt DESC, key LIMIT 5
      |""".stripMargin

  // ------------------------------------------- grouped heavy hitters
  /** Union of per-(partition, group) Misra-Gries(m) summary keys.
    * Per-group guarantee, same argument as [[nominate]] applied within
    * each group's sub-stream: inside one partition the group's MG
    * undercounts any of its keys by at most N_{p,g}/m, so a key of
    * group g absent from EVERY partition's g-summary has total count
    * ≤ Σ_p N_{p,g}/m = N_g/m — every key with in-group count > N_g/m
    * is nominated under ANY partitioning. State is
    * partitions × groups × m counters (groups bounded by contract —
    * report dimensions, not user ids). */
  def nominateGrouped(df: DataFrame, group: Column, key: Column,
                      m: Int): DataFrame = {
    require(m >= 1, s"Misra-Gries capacity must be >= 1, got $m")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(group.cast("string").as("grp"), key.cast("string").as("k"))
      .na.drop().as[(String, String)]
      .mapPartitions { it =>
        val perGroup = scala.collection.mutable.HashMap
          .empty[String, scala.collection.mutable.HashMap[String, Long]]
        it.foreach { case (g, s) =>
          val counters = perGroup.getOrElseUpdate(g,
            scala.collection.mutable.HashMap.empty[String, Long])
          counters.get(s) match {
            case Some(c) => counters.update(s, c + 1L)
            case None if counters.size < m => counters.update(s, 1L)
            case None =>
              val dead = List.newBuilder[String]
              counters.foreach { case (k, c) =>
                if (c == 1L) dead += k else counters.update(k, c - 1L)
              }
              dead.result().foreach(counters.remove)
          }
        }
        perGroup.iterator.flatMap { case (g, cs) => cs.keysIterator.map((g, _)) }
      }
      .toDF("grp", "k").distinct()
  }

  /** Top-`k` keys PER GROUP by EXACT count — the grouped companion to
    * [[heavyHitters]] (and the frequency partner of
    * [[groupedExactQuantiles]]): per-(partition, group) Misra-Gries
    * nomination (sound for any key with in-group count > N_g/m), then
    * one exact aggregate over the nominated (group, key) pairs only and
    * a rank window PARTITIONED by group over the (tiny) verified
    * candidate table. No full-keyspace-per-group shuffle anywhere;
    * output is exact, so fully oracle-checkable whenever each group's
    * k-th key clears N_g/m. */
  def groupedHeavyHitters(df: DataFrame, group: Column, key: Column,
                          k: Int = 5, m: Int = 1024): DataFrame = {
    val keyed = df.select(group.cast("string").as("grp"),
                          key.cast("string").as("k")).na.drop()
    val candidates = nominateGrouped(df, group, key, m)
    val rankWin = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy(desc("cnt"), asc("k"))
    keyed.join(broadcast(candidates), Seq("grp", "k"))
      .groupBy(col("grp"), col("k")).agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(rankWin))
      .filter(col("rank") <= k)
      .select(col("grp"), col("k").as("key"), col("cnt"), col("rank"))
  }

  /** Oracle-gated query: top-3 users per event type by exact count —
    * the per-dimension frequent-keys table (top contributors per feed,
    * top URLs per source) computed without a per-group full-keyspace
    * shuffle. */
  def groupedHeavyHittersQuery(spark: SparkSession, dir: String): DataFrame =
    groupedHeavyHitters(Tables.events(spark, dir), col("event_type"),
      col("user_id"), k = 3)

  val groupedHeavyHittersOracle: String =
    """WITH c AS (
      |  SELECT CAST(event_type AS VARCHAR) AS grp,
      |         CAST(user_id AS VARCHAR) AS key, count(*) AS cnt
      |  FROM events WHERE event_type IS NOT NULL AND user_id IS NOT NULL
      |  GROUP BY 1, 2),
      |r AS (
      |  SELECT grp, key, cnt,
      |         row_number() OVER (PARTITION BY grp ORDER BY cnt DESC, key) AS rank
      |  FROM c)
      |SELECT grp, key, CAST(cnt AS BIGINT) AS cnt, CAST(rank AS INT) AS rank
      |FROM r WHERE rank <= 3
      |""".stripMargin
}
