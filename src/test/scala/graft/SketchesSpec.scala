package graft

import org.apache.spark.sql.functions._
import graft.ops.Sketches

/** Soundness of heavy-hitter candidate nomination (round-5 verdict item:
  * the old local-top-2k nomination could silently miss a global heavy
  * hitter under adversarial partitioning; Misra-Gries union cannot). */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  /** 8 partitions; each holds 12 disjoint local keys of count 10 and the
    * SAME shared key "hh" with count 9 — so "hh" is below every local
    * top-10 by name, yet globally heaviest (72 vs 10). */
  private def adversarial = {
    val rdd = spark.sparkContext.parallelize(0 until 8, 8)
      .mapPartitionsWithIndex { case (i, _) =>
        val locals = (0 until 12).flatMap(j => Seq.fill(10)(s"p${i}_k$j"))
        (locals ++ Seq.fill(9)("hh")).iterator
      }
    rdd.toDF("k")
  }

  test("local-top-2k nomination (the old scheme) misses the global heavy hitter") {
    // inline reimplementation of the pre-round-5 nomination: per-partition
    // exact counts, keep only the top-2k NAMES — the scheme this spec
    // exists to rule out
    val k = 5
    val missed = adversarial.as[String].mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach(s => m.update(s, m.getOrElse(s, 0L) + 1L))
      m.toSeq.sortBy { case (s, n) => (-n, s) }.take(2 * k).map(_._1).iterator
    }.distinct().collect()
    assert(!missed.contains("hh"),
      "fixture must put hh below every local top-2k for the test to bite")
  }

  test("Misra-Gries nomination catches the spread-thin heavy hitter") {
    val cands = Sketches.nominate(adversarial, col("k"), m = 64)
      .as[String].collect()
    assert(cands.contains("hh"))
  }

  test("heavyHitters ranks the spread-thin key first, with its exact count") {
    val top = Sketches.heavyHitters(adversarial, col("k"), k = 5, m = 64)
      .as[(String, Long)].collect()
    assert(top.head == ("hh", 72L), s"got ${top.toSeq}")
    // remaining rows are count-10 locals in key order
    assert(top.tail.forall(_._2 == 10L))
  }

  test("MG guarantee: every key with count > N/m is nominated, any partitioning") {
    // deterministic skew: key f"k%02d" appears i times, i = 1..60
    val rows = (1 to 60).flatMap(i => Seq.fill(i)(f"k$i%02d"))
    val n = rows.size // 1830
    val m = 40        // N/m = 45.75 -> keys k46..k60 MUST be nominated
    val df = rows.toDF("k").repartition(7) // scramble the layout
    val cands = Sketches.nominate(df, col("k"), m).as[String].collect().toSet
    (46 to 60).foreach { i =>
      assert(cands.contains(f"k$i%02d"),
        s"key with count $i > ${n.toDouble / m} must be nominated")
    }
  }

  test("mgSummary satisfies the MG counter bound on both sides") {
    val rows = (1 to 20).flatMap(i => Seq.fill(i)(f"k$i%02d"))
    val n = rows.size // 210
    val m = 16
    val s = Sketches.mgSummary(rows.toDF("k").repartition(4), col("k"), m)
    assert(s.size <= m, "merged summary must respect the capacity")
    (1 to 20).foreach { i =>
      val c = i.toLong
      val est = s.getOrElse(f"k$i%02d", 0L)
      assert(est <= c, s"MG must never overcount (k$i)")
      assert(est >= c - n / m - 1, s"undercount beyond N/m (k$i: $est vs $c)")
    }
  }

  test("streaming twin: MG summaries folded across micro-batches keep the guarantee") {
    // heavy keys sliced ROUND-ROBIN across 5 micro-batches — each batch
    // sees only a fifth of any key, the adversarial case for streaming
    val all = (1 to 20).flatMap(i => Seq.fill(i)(f"k$i%02d"))
    val batches = all.zipWithIndex.groupBy(_._2 % 5).toSeq.sortBy(_._1)
      .map(_._2.map(_._1))
    val m = 16
    var state = Map.empty[String, Long]
    for (b <- batches)
      state = Sketches.mgMerge(state,
        Sketches.mgSummary(b.toDF("k").repartition(3), col("k"), m), m)
    assert(state.size <= m, "running state stays capacity-bounded")
    val n = all.size // 210; N/m = 13.125
    (1 to 20).foreach { i =>
      val c = i.toLong
      val est = state.getOrElse(f"k$i%02d", 0L)
      assert(est <= c, s"merged MG must never overcount (k$i)")
      if (c > n.toDouble / m)
        assert(est > 0, s"key with count $c > N/m must survive the merges (k$i)")
    }
  }

  test("heavyHitters equals the exact top-k on skewed data") {
    val rows = (1 to 60).flatMap(i => Seq.fill(i)(f"k$i%02d"))
    val df = rows.toDF("k").repartition(5)
    val got = Sketches.heavyHitters(df, col("k"), k = 7, m = 64)
      .as[(String, Long)].collect().toSeq
    val want = (0 until 7).map(j => (f"k${60 - j}%02d", (60 - j).toLong))
    assert(got == want)
  }

  // -------------------------------------------------------------- q-digest
  import Sketches.QDigest

  /** Exact rank of `x` (count of values ≤ x) in sorted `vs`. */
  private def rankOf(vs: Array[Long], x: Long): Long = {
    var lo = 0; var hi = vs.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (vs(mid) <= x) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }

  private val QdBits = 24
  private val QdK = 512

  test("qdigest: rank error within (bits/k)·N on real prices, any quantile") {
    val prices = spark.read.parquet(s"$sf/lineitem.parquet")
      .select((col("l_extendedprice") * 100).cast("long").as("cents"))
    val vs = prices.as[Long].collect().sorted
    val n = vs.length.toLong
    val d = QDigest.summary(prices, col("cents"), QdBits, QdK)
    val eps = QdBits.toDouble / QdK
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = QDigest.quantile(d, QdBits, q)
      val r = rankOf(vs, est)
      assert(math.abs(r - q * n) <= eps * n + 1,
        s"q=$q est=$est rank=$r target=${q * n} tol=${eps * n}")
    }
  }

  test("qdigest: deterministic and partition-invariant — same multiset, same digest") {
    val vals = (0 until 5000).map(i => ((i * 37) % 1000).toLong)
    // worst-case clustering: sorted input, so every partition holds one
    // contiguous value range
    val sortedDf = vals.sorted.toDF("v").repartitionByRange(8, col("v"))
    val shuffledDf = vals.toDF("v").repartition(8)
    val a = QDigest.summary(sortedDf, col("v"), 10, 64)
    val b = QDigest.summary(shuffledDf, col("v"), 10, 64)
    // identical GUARANTEE under both layouts (the digest itself may
    // differ by merge grouping): both within bound at every decile
    val sorted = vals.sorted.toArray
    for (q <- 1 to 9; dd <- Seq(a, b)) {
      val est = QDigest.quantile(dd, 10, q / 10.0)
      val r = rankOf(sorted, est)
      assert(math.abs(r - q / 10.0 * vals.size) <= (10.0 / 64) * vals.size + 1)
    }
    // and a single-builder digest is bit-deterministic
    val d1 = QDigest.fromValues(vals.iterator.map(identity), 10, 64)
    val d2 = QDigest.fromValues(vals.iterator.map(identity), 10, 64)
    assert(d1 == d2)
  }

  test("qdigest: merge keeps the combined-stream bound at any fold depth") {
    val rng = new scala.util.Random(7)
    val batches = (0 until 16).map(_ => Array.fill(500)(rng.nextInt(4096).toLong))
    val all = batches.flatten.sorted.toArray
    val n = all.length.toLong
    // fold like a streaming consumer: one digest per micro-batch merged
    // into a running digest
    val folded = batches.map(b => QDigest.fromValues(b.iterator, 12, 128))
      .foldLeft(Map.empty[Long, Long])(QDigest.merge(_, _, 12, 128))
    assert(folded.valuesIterator.sum == n)
    val eps = 12.0 / 128
    for (q <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val est = QDigest.quantile(folded, 12, q)
      val r = rankOf(all, est)
      assert(math.abs(r - q * n) <= eps * n + 1,
        s"q=$q est=$est rank=$r tol=${eps * n}")
    }
  }

  test("qdigest: compressed size is bounded by ~3k nodes regardless of N") {
    val rng = new scala.util.Random(11)
    val big = Array.fill(200000)(math.abs(rng.nextLong()) % (1L << 20))
    val d = QDigest.fromValues(big.iterator, 20, 64)
    assert(d.size <= 3 * 64,
      s"digest has ${d.size} nodes, bound is ${3 * 64}")
    assert(d.valuesIterator.sum == big.length.toLong)
  }

  test("exactQuantiles equals brute-force percentile_disc on real prices") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val cents = li.select(expr("CAST(round(l_extendedprice * 100) AS LONG)").as("v"))
    val vs = cents.as[Long].collect().sorted
    val n = vs.length.toLong
    val pcts = Seq(1, 25, 50, 75, 90, 99, 100)
    val got = Sketches.exactQuantiles(cents, col("v"), pcts)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val want = pcts.map { p =>
      val target = (p * n + 99L) / 100L
      (p, vs((target - 1).toInt))
    }
    assert(got == want)
  }

  test("exactQuantiles is exact on a tie-heavy multiset and tiny N fallback") {
    // 90% of mass on one value: windows collapse onto the tie block
    val vals = Array.fill(9000)(500L) ++ (0 until 1000).map(i => i.toLong)
    val df = vals.toSeq.toDF("v").repartition(8)
    val sorted = vals.sorted
    val got = Sketches.exactQuantiles(df, col("v"), Seq(10, 50, 95), bits = 12, k = 256)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val want = Seq(10, 50, 95).map { p =>
      val t = (p * vals.length.toLong + 99L) / 100L
      (p, sorted((t - 1).toInt))
    }
    assert(got == want)
    // tiny N (ε·N < 1): full-domain fallback still exact
    val tiny = Seq(7L, 3L, 9L, 1L).toDF("v")
    val gotTiny = Sketches.exactQuantiles(tiny, col("v"), Seq(50, 100), bits = 8, k = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(gotTiny == Seq((50, 3L), (100, 9L)))
  }

  test("groupedExactQuantiles equals per-group brute force on real data") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val df = li.select(col("l_returnflag").as("g"),
      expr("CAST(round(l_extendedprice * 100) AS LONG)").as("v"))
    val pcts = Seq(25, 50, 90)
    val got = Sketches.groupedExactQuantiles(df, col("g"), col("v"), pcts)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    val byG = df.as[(String, Long)].collect().groupBy(_._1)
      .map { case (g, vs) => g -> vs.map(_._2).sorted }
    val want = (for {
      (g, vs) <- byG.toSeq
      p <- pcts
    } yield {
      val t = (p * vs.length.toLong + 99L) / 100L
      (g, p, vs((t - 1).toInt))
    }).sortBy(x => (x._1, x._2))
    assert(got == want)
  }

  test("groupedHeavyHitters: per-group nomination catches a spread-thin " +
       "heavy key in ONE group without polluting the other") {
    // group A: the adversarial layout (heavy key "hh" below every local
    // top, 8 partitions); group B: plain skewed data where "top" leads
    val rdd = spark.sparkContext.parallelize(0 until 8, 8)
      .mapPartitionsWithIndex { case (i, _) =>
        val aLocals = (0 until 12).flatMap(j => Seq.fill(10)(("A", s"p${i}_k$j")))
        val aHeavy = Seq.fill(9)(("A", "hh"))
        val b = Seq.fill(20)(("B", "top")) ++ Seq.fill(3)(("B", s"b$i"))
        (aLocals ++ aHeavy ++ b).iterator
      }
    val df = rdd.toDF("g", "k")
    val got = Sketches.groupedHeavyHitters(df, col("g"), col("k"), k = 2, m = 64)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
    val a = got.filter(_._1 == "A")
    val b = got.filter(_._1 == "B")
    assert(a.head == ("A", "hh", 72L, 1), s"got ${a.toSeq}")
    assert(b.head == ("B", "top", 160L, 1), s"got ${b.toSeq}")
    assert(got.forall(_._4 <= 2) && a.length == 2 && b.length == 2)
  }

  test("groupedHeavyHitters equals exact per-group top-k on real events") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_type").as("g"), col("user_id").cast("string").as("k"))
    val want = ev.as[(String, String)].collect()
      .groupBy(identity).map { case ((g, k), rows) => (g, k, rows.length.toLong) }
      .groupBy(_._1).flatMap { case (_, rows) =>
        rows.toSeq.sortBy { case (_, k, n) => (-n, k) }.take(3)
          .zipWithIndex.map { case ((g, k, n), i) => (g, k, n, i + 1) }
      }.toSeq.sorted
    val got = Sketches.groupedHeavyHitters(ev, col("g"), col("k"), k = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
      .toSeq.sorted
    assert(got == want)
  }

  test("groupedExactQuantiles: a tiny group among large ones hits the " +
       "full-domain fallback and stays exact") {
    // group "t" has 3 rows (eps*n < 1 → full-domain window); "big" has
    // enough rows for real digest narrowing — both must be exact
    val big = (1 to 5000).map(i => ("big", (i * 7 % 1000).toLong))
    val tiny = Seq(("t", 42L), ("t", 7L), ("t", 99L))
    val df = spark.createDataFrame(big ++ tiny).toDF("g", "v")
    val got = Sketches.groupedExactQuantiles(df, col("g"), col("v"), Seq(50, 100))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    def pct(vs: Seq[Long], p: Int): Long = {
      val sorted = vs.sorted
      sorted(((p * vs.length.toLong + 99L) / 100L - 1).toInt)
    }
    val want = Seq(
      ("big", 50, pct(big.map(_._2), 50)), ("big", 100, pct(big.map(_._2), 100)),
      ("t", 50, pct(tiny.map(_._2), 50)), ("t", 100, pct(tiny.map(_._2), 100)))
    assert(got.sorted == want.sorted)
    graft.core.Caches.release(spark)
  }

  test("qdigest builder: working memory stays bounded on a distinct-heavy stream") {
    // 200k distinct ascending values (worst case for leaf accumulation):
    // periodic compression must keep the final digest at sketch size and
    // the guarantee intact
    val n = 200000
    val d = QDigest.fromValues((0 until n).iterator.map(_.toLong), 18, 64)
    assert(d.size <= 3 * 64, s"digest has ${d.size} nodes")
    assert(d.valuesIterator.sum == n.toLong)
    val eps = 18.0 / 64
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val est = QDigest.quantile(d, 18, q)
      // values are 0..n-1, so rank(est) = est+1 exactly
      assert(math.abs((est + 1) - q * n) <= eps * n + 1,
        s"q=$q est=$est tol=${eps * n}")
    }
  }

  test("qdigest: domain and argument guards fail loudly") {
    intercept[IllegalArgumentException] {
      QDigest.fromValues(Iterator(-1L), 10, 64)
    }
    intercept[IllegalArgumentException] {
      QDigest.fromValues(Iterator(1024L), 10, 64)
    }
    intercept[IllegalArgumentException] {
      QDigest.quantile(Map.empty, 10, 0.5)
    }
  }
}
