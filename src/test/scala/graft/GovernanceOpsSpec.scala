package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Stats, Temporal}

/** Corpus-governance operators: asymmetric containment dedup, the
  * cross-source duplication matrix, quality-percentile calibration, and
  * half-life-decayed engagement. Each is checked against an independent
  * Scala recomputation on real fixture data (plus a planted fixture for
  * the asymmetry claim), never against itself. */
class GovernanceOpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------- containment
  test("containment flags a quoted doc that Jaccard misses, directed") {
    // doc 1 is quoted whole inside doc 2; the wrapper is large enough
    // that Jaccard (inter/union) stays far below 0.8 while containment
    // (inter/min) is exactly 1.0
    val quoted = "alpha beta gamma delta epsilon zeta"
    val wrapper = (1 to 40).map(i => s"filler$i").mkString(" ")
    val d = Seq(
      (1L, quoted),
      (2L, s"$wrapper $quoted ${(41 to 80).map(i => s"pad$i").mkString(" ")}"),
      (3L, "totally unrelated words with no overlap at all here")
    ).toDF("doc_id", "text")
    val got = Dedup.containmentPairsOf(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 2L, 1.0)))
    graft.core.Caches.release(spark)
  }

  test("containment ties break toward the smaller doc_id") {
    val same = "one two three four five"
    val d = Seq((7L, same), (4L, same)).toDF("doc_id", "text")
    val got = Dedup.containmentPairsOf(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((4L, 7L, 1.0)))
    graft.core.Caches.release(spark)
  }

  // ------------------------------------------------ cross-source matrix
  test("crossSourceMatrix equals brute-force pair enumeration") {
    // group labels come from the (independently oracle-gated) cluster
    // op; what is NEW here — the pair combinatorics per source pair —
    // is recomputed by brute-force doc-pair enumeration
    val labeled = Dedup.clusters(spark, sf)
      .join(spark.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id"), col("source")), Seq("doc_id"))
      .as[(Long, Long, String)].collect()
    val pairTally = collection.mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    val groupTally = collection.mutable.Map.empty[(String, String),
      collection.mutable.Set[Long]]
    for {
      Seq((ida, ca, sa), (idb, cb, sb)) <- labeled.toSeq.combinations(2)
      if ca == cb && ida != idb
    } {
      val k = if (sa <= sb) (sa, sb) else (sb, sa)
      pairTally(k) += 1
      groupTally.getOrElseUpdate(k, collection.mutable.Set.empty) += ca
    }
    val want = pairTally.toSeq.map { case (k, n) =>
      (k._1, k._2, n, groupTally(k).size.toLong)
    }.sorted
    val got = Dedup.crossSourceMatrix(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
    assert(want.nonEmpty, "fixture has no duplicate groups to test")
    assert(got == want)
    graft.core.Caches.release(spark)
  }

  // ------------------------------------------- quality percentile rank
  test("qualityPercentile equals the single-window rank formula") {
    val scores = graft.ops.TextAnalysis.quality(spark, sf)
      .select(col("doc_id"), col("quality_score"))
      .as[(Long, Double)].collect().sortBy(x => (x._2, x._1))
    val n = scores.length.toLong
    val want = scores.zipWithIndex.map { case ((id, q), i) =>
      (id, q, i + 1L, i.toLong * 1000000L / math.max(n - 1, 1L))
    }.sortBy(_._1).toSeq
    val got = Stats.qualityPercentile(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got == want)
    graft.core.Caches.release(spark)
  }

  // ------------------------------------------------------- gram matrix
  test("gramMatrix equals driver-side exact outer-product sums") {
    val vs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    val d = vs.head.length
    val want = (for {
      i <- 0 until d; j <- i until d
    } yield {
      val s = vs.map(v => BigDecimal(v(i) * v(j))
        .setScale(10, BigDecimal.RoundingMode.HALF_UP)).sum
      ((i, j), (vs.length.toLong,
        (s / vs.length).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }).toMap
    val got = graft.ops.Embeddings.gramMatrix(spark, sf)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.size == d * (d + 1) / 2)
    val diffs = want.keys.filter(k => got(k) != want(k))
    assert(diffs.isEmpty, s"first mismatches: ${diffs.take(3).map(k => (k, got(k), want(k)))}")
    graft.core.Caches.release(spark)
  }

  // ------------------------------------------------- decayed engagement
  test("decayedEngagement equals driver-side integer decay") {
    val anchor = java.time.LocalDate.parse("2024-02-01")
    val ev = graft.core.Tables.events(spark, sf)
      .select(col("user_id"), col("value"),
        col("ts").cast("date").cast("string").as("d"))
      .as[(Long, Double, String)].collect()
    val want = ev.groupBy(_._1).map { case (u, rows) =>
      val decayed = rows.map { case (_, v, d) =>
        val age = java.time.temporal.ChronoUnit.DAYS
          .between(java.time.LocalDate.parse(d), anchor).max(0L)
        val weeks = math.min(age / 7, 60L)
        (math.round(v * 100) * 1000000L) / (1L << weeks)
      }.sum
      (u, decayed, rows.length.toLong)
    }.toSeq.sortBy(_._1)
    val got = Temporal.decayedEngagement(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got == want)
  }

  // --------------------------------------------------------- fk orphans
  test("fkOrphans: planted orphans are counted by rows AND distinct keys") {
    val child = Seq((1L, 10L), (2L, 10L), (3L, 20L), (4L, 99L), (5L, 99L),
                    (6L, 77L)).toDF("id", "fk")
    val parent = Seq(10L, 20L).toDF("pk")
    val got = graft.validate.Validator
      .auditRelation("child->parent", child, "fk", parent, "pk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // 3 orphan rows (fk 99 twice, 77 once) over 2 distinct missing keys
    assert(got.toSeq == Seq(("child->parent", 6L, 3L, 2L)))
  }

  test("fkOrphans: the real warehouse audits clean (and proves all six edges run)") {
    val got = graft.validate.Validator.fkOrphans(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    assert(got.length == 6)
    assert(got.forall { case (_, orphans, missing) => orphans == 0L && missing == 0L },
      s"unexpected orphans: ${got.toSeq}")
  }
}
