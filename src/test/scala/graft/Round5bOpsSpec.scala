package graft

import org.apache.spark.sql.functions._
import graft.ops.{Sampling, Temporal, TextPrep}

/** Round-5 additions, batch 2: weighted sampling (Efraimidis–Spirakis),
  * point-in-time trailing features, and the corpus balance audit. Each
  * is checked against an independent recomputation or a hand-computed
  * fixture, never against itself. */
class Round5bOpsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // ---------------------------------------------------- weighted sample

  /** JVM-side mirror of the operator's priority: first 15 md5 hex chars
    * as a long (hash60), uniform (h+0.5)/2^60, exponential race. */
  private def priority(key: Long, w: Double): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"ws:$key".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    val h = java.lang.Long.parseLong(hex, 16)
    -math.log((h + 0.5) / Sampling.H) / w
  }

  test("weightedSample equals an independent JVM recompute of the race") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("n_chars"))
    val want = docs.as[(Long, Long)].collect()
      .filter(_._2 > 0)
      .sortBy { case (id, w) => (priority(id, w.toDouble), id) }
      .take(40).map(_._1).toSet
    val got = Sampling.weightedSample(docs, col("doc_id"), col("n_chars"), 40)
      .select("doc_id").as[Long].collect().toSet
    assert(got == want)
    assert(got.size == 40)
  }

  test("weightedSample is stable under repartitioning and biased by weight") {
    // 200 heavy keys (w=500) vs 200 light keys (w=1): a 100-row sample
    // should be overwhelmingly heavy — P(light key beats a heavy key's
    // Exp(500) clock) is tiny — and identical across partitionings
    val df = (0L until 400L)
      .map(k => (k, if (k < 200) 500 else 1))
      .toDF("k", "w")
    val a = Sampling.weightedSample(df, col("k"), col("w"), 100)
      .select("k").as[Long].collect().toSet
    val b = Sampling.weightedSample(df.repartition(13), col("k"), col("w"), 100)
      .select("k").as[Long].collect().toSet
    assert(a == b)
    assert(a.count(_ < 200) > 90, s"heavy keys in sample: ${a.count(_ < 200)}")
  }

  test("weightedSamplePerGroup: independent k-cut per group, same race") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val rows = docs.as[(Long, String, Long)].collect().filter(_._3 > 0)
    val want = rows.groupBy(_._2).toSeq.flatMap { case (_, g) =>
      g.sortBy { case (id, _, w) => (priority(id, w.toDouble), id) }.take(3)
    }.map(_._1).toSet
    val got = Sampling.weightedSamplePerGroup(docs, col("source"),
        col("doc_id"), col("n_chars"), 3)
      .select("doc_id").as[Long].collect().toSet
    assert(got == want)
    // every source contributes min(3, |source|)
    val perSrc = rows.groupBy(_._2).view.mapValues(g => math.min(3, g.size)).toMap
    assert(got.size == perSrc.values.sum)
  }

  test("weightedSample drops non-positive weights") {
    val df = Seq((1L, 10), (2L, 0), (3L, -5)).toDF("k", "w")
    val got = Sampling.weightedSample(df, col("k"), col("w"), 10)
      .select("k").as[Long].collect().toSet
    assert(got == Set(1L))
  }

  // ------------------------------------------------------- PIT features

  test("pitFeatures: strict day-exclusive trailing frame, duplicates see " +
       "identical features") {
    val dir = tmp("graft_pit")
    // customer 1: orders on days 0, 30, 100, 121 (+ a same-day duplicate
    // of the day-100 order); customer 2: a single order
    val base = java.sql.Date.valueOf("1990-01-01").toLocalDate
    def d(days: Int) = java.sql.Date.valueOf(base.plusDays(days))
    Seq(
      (10L, 1L, d(0), 10.00),
      (11L, 1L, d(30), 20.00),
      (12L, 1L, d(100), 40.00),
      (12L, 1L, d(100), 40.00), // planted duplicate orderkey, same day
      (13L, 1L, d(121), 80.00),
      (20L, 2L, d(50), 5.00)
    ).toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Temporal.pitFeatures(spark, dir)
      .select("o_orderkey", "day", "prior_cnt_90d", "prior_cents_90d")
      .as[(Long, Int, Long, Long)].collect().toSeq
      .map(r => (r._1, r._2, r._3, r._4))
    // day 0: nothing prior; day 30: the day-0 order; day 100: frame
    // [10, 99] → only day 30 (both duplicates excluded from each other:
    // RANGE ends at 1 PRECEDING); day 121: frame [31, 120] → the two
    // day-100 rows, NOT day 30
    val want = Seq(
      (10L, 0, 0L, 0L),
      (11L, 30, 1L, 1000L),
      (12L, 100, 1L, 2000L),
      (12L, 100, 1L, 2000L),
      (13L, 121, 2L, 8000L),
      (20L, 50, 0L, 0L))
    assert(got.sorted == want.sorted)
  }

  // ------------------------------------------------- retraction IVM

  test("applyDeltas: fully-retracted groups vanish, partial ones shrink") {
    import graft.ops.Rollup
    val ts1 = java.sql.Timestamp.valueOf("2024-01-05 10:00:00")
    val ts2 = java.sql.Timestamp.valueOf("2024-01-06 10:00:00")
    val base = Seq(
      (ts1, "click", 10.0), (ts1, "click", 20.0),
      (ts2, "view", 5.0)
    ).toDF("ts", "event_type", "value")
    val state = Rollup.dailyState(base)
    // retract one of the two clicks and THE ONLY view
    val retract = Seq((ts1, "click", 20.0), (ts2, "view", 5.0))
      .toDF("ts", "event_type", "value")
    val got = Rollup.present(
        Rollup.applyDeltas(state, Rollup.signedState(retract, lit(-1))))
      .as[(java.sql.Date, String, Long, Double, Double)].collect()
    // the view group is GONE (not a zero row); clicks shrink to one row
    assert(got.toSeq == Seq(
      (java.sql.Date.valueOf("2024-01-05"), "click", 1L, 10.0, 10.0)))
  }

  // ------------------------------------------- streaming heavy hitters

  test("TopKStream: MG state keeps the concatenated-stream bound across " +
       "batches and never exceeds m counters") {
    import graft.streaming.TopKStream
    import graft.streaming.TopKStream.Keyed
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val m = 50
    val input = MemoryStream[Keyed]
    val q = TopKStream.nominations(input.toDS(), m)
      .writeStream.format("memory").queryName("mg_out")
      .outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_mg_ckpt").toString)
      .start()
    try {
      // 4 batches: 300 distinct noise keys each (count 1) + a heavy key
      // appearing 30 times per batch — spread thin relative to any
      // single batch's volume but globally heavy
      val batches = (0 until 4).map { b =>
        val noise = (0 until 300).map(i => Keyed("all", s"noise_${b}_$i"))
        val heavy = Seq.fill(30)(Keyed("all", "HEAVY"))
        new scala.util.Random(b).shuffle(noise ++ heavy)
      }
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val last = spark.table("mg_out")
        .as[TopKStream.Nomination].collect()
        .groupBy(_.n).maxBy(_._1)._2.toSeq
      val totalN = 4 * 330
      assert(last.forall(_.n == totalN))
      assert(last.size <= m, s"state grew past m: ${last.size}")
      val heavyEst = last.find(_.k == "HEAVY")
      // true count 120 > N/m = 26.4 → guaranteed present, estimate
      // within the MG bound [true − N/m, true]
      assert(heavyEst.isDefined, "globally heavy key missing from state")
      assert(heavyEst.get.est <= 120L &&
             heavyEst.get.est >= 120L - totalN / m,
             s"estimate ${heavyEst.get.est} outside MG bound")
    } finally q.stop()
  }

  // ------------------------------------------------- bucketed anti-entropy

  test("bucketDiff: one lost row flips exactly one bucket; a tampered " +
       "cell flips one bucket with equal counts") {
    import graft.reconcile.Reconcile
    val rows = (1L to 1000L).map(k => (k, s"name_$k")).toDF("k", "name")
    // lost row: counts differ in that row's bucket only
    val lost = Reconcile.bucketDiff(rows, rows.filter(col("k") =!= 17L),
        Seq("k", "name"), buckets = 64).collect()
    assert(lost.length == 1)
    assert(lost(0).getAs[Long]("n_src") == lost(0).getAs[Long]("n_tgt") + 1)
    // tampered cell: same cardinality, checksum-only divergence
    val tampered = rows.withColumn("name",
      when(col("k") === 400L, lit("EVIL")).otherwise(col("name")))
    val diff = Reconcile.bucketDiff(rows, tampered, Seq("k", "name"),
        buckets = 64).collect()
    // the flipped row hashes into a new bucket: at most 2 buckets move,
    // and every divergent bucket has equal-or-off-by-one counts
    assert(diff.nonEmpty && diff.length <= 2)
    assert(Reconcile.bucketDiff(rows, rows, Seq("k", "name")).isEmpty)
  }

  // ---------------------------------------------------- CDC extraction

  test("Cdc.extract emits the minimal feed and round-trips through upsert") {
    import graft.ops.Cdc
    val prev = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "name", "v")
    val next = Seq((2L, "b", 20L), (3L, "C", 31L), (4L, "d", 40L))
      .toDF("k", "name", "v")
    val feed = Cdc.extract(prev, next, Seq("k"))
      .as[(Long, String, Long, String)].collect().toSet
    // minimal: unchanged key 2 emits nothing; delete carries old payload
    assert(feed == Set(
      (1L, "a", 10L, "delete"),
      (3L, "C", 31L, "update"),
      (4L, "d", 40L, "insert")))
    val applied = Cdc.upsert(prev, Cdc.extract(prev, next, Seq("k")), Seq("k"))
      .as[(Long, String, Long)].collect().toSet
    assert(applied == next.as[(Long, String, Long)].collect().toSet)
  }

  // ---------------------------------------------------- FK discovery

  test("fkDiscovery: containment equals a driver-side set computation " +
       "and the planted false edge scores below the true edges") {
    import graft.validate.Validator
    val got = Validator.fkDiscovery(spark, sf)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    def distinctOf(t: String, c: String): Set[Long] =
      spark.read.parquet(s"$sf/$t.parquet").select(col(c).cast("long"))
        .na.drop().distinct().as[Long].collect().toSet
    got.foreach { case (edge, (n, hits, micro)) =>
      val Array(childSide, parentSide) = edge.split("->")
      val Array(ct, cc) = childSide.split("\\.")
      val Array(pt, pc) = parentSide.split("\\.")
      val child = distinctOf(ct, cc); val parent = distinctOf(pt, pc)
      assert(n == child.size.toLong, edge)
      assert(hits == (child intersect parent).size.toLong, edge)
      assert(micro == hits * 1000000L / n, edge)
    }
    val falseEdge = got("orders.o_orderkey->customer.c_custkey")._3
    val trueEdge = got("orders.o_custkey->customer.c_custkey")._3
    assert(falseEdge < trueEdge, s"false $falseEdge !< true $trueEdge")
  }

  // ------------------------------------------------- cluster quality

  test("clusterQuality: partitions the corpus, positive separation, and " +
       "micro-mean matches the gated assignment frame") {
    import graft.ops.Embeddings
    val q = Embeddings.clusterQuality(spark, sf)
      .as[(Int, Long, Long, Double)].collect()
    val nVecs = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(q.map(_._2).sum == nVecs)        // every vector in exactly one cluster
    assert(q.forall(_._4 > 0.0))            // refined centroids are distinct
    assert(q.forall(_._3 >= 0L))
    // recompute the micro-mean from the independently gated assignment
    val d2 = Embeddings.kmeansAssign(spark, sf)
      .select(col("centroid_id"),
        expr("CAST(round(d2 * 1000000, 0) AS BIGINT)").as("u"))
      .as[(Int, Long)].collect().groupBy(_._1)
    q.foreach { case (c, n, mean, _) =>
      val us = d2(c).map(_._2)
      assert(n == us.length.toLong, s"cluster $c size")
      val s = us.sum
      assert(mean == (2 * s + n) / (2 * n), s"cluster $c micro-mean")
    }
    spark.catalog.clearCache()
  }

  // ------------------------------------------------------ corpus balance

  test("corpusBalance: entropy ln(2) for a 50/50 source, 0 for monolingual") {
    val dir = tmp("graft_bal")
    Seq(
      (1L, "A", "en", 100),
      (2L, "A", "en", 100),
      (3L, "A", "de", 100),
      (4L, "A", "de", 100),
      (5L, "B", "en", 300),
      (6L, "B", "en", 300)
    ).toDF("doc_id", "source", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextPrep.corpusBalance(spark, dir)
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val a = got("A"); val b = got("B")
    assert(a._2 == 4L && a._3 == 400L)
    assert(math.abs(a._4 - math.log(2)) < 1e-6)
    assert(a._5 == 0.4)
    assert(b._2 == 2L && b._3 == 600L)
    assert(b._4 == 0.0)
    assert(b._5 == 0.6)
  }
}
