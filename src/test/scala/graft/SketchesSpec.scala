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
}
