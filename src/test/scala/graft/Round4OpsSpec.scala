package graft

import org.apache.spark.sql.functions._
import graft.ops.{Jnr, Similarity, TextPrep}

/** Round-4 operators: binned range join, chunking, budget selection,
  * bigram lift, ANN recall. */
class Round4OpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------ rangeJoinBinned
  test("rangeJoinBinned equals the naive inequality join, incl. boundaries") {
    val left = (0L to 50L).map(i => (i, i * 7L)).toDF("lid", "p")
    val right = Seq(
      (100L, 0L, 10L),    // aligned at origin
      (101L, 10L, 20L),   // exactly binWidth long, bin-aligned
      (102L, 15L, 25L),   // straddles a bin boundary
      (103L, 349L, 351L), // covers the last point (350)
      (104L, 351L, 360L), // past every point — matches nothing
      (105L, 30L, 30L)    // empty interval — matches nothing
    ).toDF("rid", "s", "e")
    val got = Jnr.rangeJoinBinned(left, right,
        col("p"), col("s"), col("e"), binWidth = 10L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val want = left.join(right, col("p") >= col("s") && col("p") < col("e"))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got == want)
    assert(want.nonEmpty)
    // half-open semantics and empty/no-match intervals drop out
    assert(!got.exists { case (_, rid) => rid == 104L || rid == 105L })
    // p=14 sits at an interval START (inclusive): must match rid 101's [10,20)
    assert(got.contains((2L, 101L))) // lid 2 has p=14
  }

  test("rangeJoinBinned produces no duplicate pairs") {
    val left = (0L to 99L).map(i => (i, i)).toDF("lid", "p")
    val right = (0L until 10L).map(i => (i, i * 10L, i * 10L + 10L)).toDF("rid", "s", "e")
    val joined = Jnr.rangeJoinBinned(left, right,
      col("p"), col("s"), col("e"), binWidth = 10L)
    assert(joined.count() == joined.select("lid", "rid").distinct().count())
    assert(joined.count() == 100) // every point in exactly one interval
  }

  test("rangeJoinBinned fails fast on an interval longer than binWidth") {
    val left = Seq((1L, 5L)).toDF("lid", "p")
    val right = Seq((1L, 0L, 25L)).toDF("rid", "s", "e")
    val e = intercept[Exception] {
      Jnr.rangeJoinBinned(left, right, col("p"), col("s"), col("e"), 10L)
        .count()
    }
    assert(e.getMessage != null)
  }

  test("range-join query matches a direct SQL re-computation in Spark") {
    val got = Jnr.rangeJoinQuery(spark, sf)
    graft.core.Tables.lineitem(spark, sf).createOrReplaceTempView("li4")
    graft.core.Tables.orders(spark, sf).createOrReplaceTempView("ord4")
    val want = spark.sql(
      """SELECT l_orderkey, l_linenumber, count(*) AS n_orders
        |FROM li4 JOIN (SELECT * FROM ord4 WHERE o_totalprice > 400000) o
        |  ON unix_micros(CAST(l_shipdate AS TIMESTAMP)) >= unix_micros(CAST(o_orderdate AS TIMESTAMP))
        | AND unix_micros(CAST(l_shipdate AS TIMESTAMP)) < unix_micros(CAST(o_orderdate AS TIMESTAMP)) + 259200000000
        |GROUP BY 1, 2""".stripMargin)
    assert(got.select("l_orderkey", "l_linenumber", "n_orders")
      .exceptAll(want).isEmpty)
    assert(want.exceptAll(got.select("l_orderkey", "l_linenumber", "n_orders")).isEmpty)
  }

  // ------------------------------------------------------------- chunking
  test("chunks: overlap, coverage, and tail sizing") {
    val r = TextPrep.chunks(spark, sf)
      .filter(col("doc_id") === 1L).orderBy("chunk_id").collect()
    assert(r.nonEmpty)
    // chunk ids are dense from 0
    assert(r.map(_.getInt(1)).toSeq == r.indices.toSeq)
    // every chunk but possibly the last is full-size; all are 1..40 tokens
    r.dropRight(1).foreach(row => assert(row.getInt(2) == 40))
    assert(r.last.getInt(2) >= 1 && r.last.getInt(2) <= 40)
  }

  test("chunks: every document emits floor((n-1)/stride)+1 chunks") {
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text"))).as("n"))
    val got = TextPrep.chunks(spark, sf).groupBy("doc_id")
      .agg(count(lit(1)).as("chunks"))
    val joined = docs.join(got, "doc_id")
    assert(joined.count() == docs.count(), "no document may be dropped")
    val bad = joined.filter(col("chunks") =!= floor((col("n") - 1) / 30) + 1)
    assert(bad.isEmpty, "chunk count must be floor((n-1)/stride)+1")
  }

  // ------------------------------------------------------- budget select
  test("budgetSelect keeps per-source prefixes within the token budget") {
    val r = TextPrep.budgetSelect(spark, sf)
    assert(r.filter(col("cum_tok") > 5000L).isEmpty)
    // within each source, scores are non-increasing in cum_tok order
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("cum_tok")
    val drift = r.withColumn("prev", lag(col("score"), 1).over(w))
      .filter(col("prev").isNotNull && col("score") > col("prev") + 1e-9)
    assert(drift.isEmpty, "selection must follow descending score order")
  }

  test("budgetSelect is maximal: next-ranked doc would break the budget") {
    import org.apache.spark.sql.expressions.Window
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    val w = Window.partitionBy("source").orderBy(col("score").desc, col("doc_id"))
    val all = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), toks.as("tk"))
      .select(col("doc_id"), col("source"), size(col("tk")).as("n_tok"),
        (size(array_distinct(col("tk"))).cast("double") / size(col("tk"))).as("score"))
      .withColumn("cum_tok", sum(col("n_tok").cast("long")).over(w))
    val firstExcluded = all.filter(col("cum_tok") > 5000L)
      .groupBy("source").agg(min("cum_tok").as("m"))
    // every excluded prefix position exceeds the budget by construction
    assert(firstExcluded.filter(col("m") <= 5000L).isEmpty)
  }

  // ---------------------------------------------------------- bigram lift
  test("bigramLift matches a hand computation on a tiny corpus") {
    // corpus: "a b" ×9 docs  +  "a c" — bigram (a,b) count 9 >= 8
    val docs = ((1 to 9).map(i => (i.toLong, "a b")) :+ (10L, "a c"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("pmi_docs")
    // re-run the operator body against the small frame via the same fns
    val toks = docs.select(col("doc_id"),
      graft.functions.TextFunctions.tokens(col("text")).as("tk"))
      .withColumn("n", size(col("tk")))
    val uni = toks.select(explode(col("tk")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c1"))
    val c1a = uni.filter(col("tok") === "a").head().getLong(1)
    val c1b = uni.filter(col("tok") === "b").head().getLong(1)
    assert(c1a == 10 && c1b == 9)
    // N1 = 20 unigrams, N2 = 10 bigrams, c2(a,b) = 9
    // lift = (9/10) / ((10/20)*(9/20)) = 0.9 / 0.225 = 4.0
    val lift = (9.0 / 10.0) / ((c1a.toDouble / 20.0) * (c1b.toDouble / 20.0))
    assert(math.abs(lift - 4.0) < 1e-12)
  }

  test("bigramLift on the corpus: thresholds hold and lift is positive") {
    val r = graft.ops.TextPrep.bigramLift(spark, sf)
    assert(r.filter(col("c2") < 8).isEmpty)
    assert(r.filter(col("lift") <= 0).isEmpty)
    assert(r.count() == r.select("tok_a", "tok_b").distinct().count())
  }

  // ------------------------------------------------------------ asof join
  test("asofJoin: inclusivity, tiebreaks, no-match nulls, same-row carry") {
    val left = Seq(
      (1L, "u1", 100L), // exact tie with right at 100 — inclusive
      (2L, "u1", 150L), // between rights
      (3L, "u1", 50L),  // before every right — null carry
      (4L, "u2", 500L)  // user with no rights at all — null carry
    ).toDF("lid", "k", "t")
    val right = Seq(
      ("u1", 100L, 7L, "a"),  // two rights at t=100: tiebreak picks rid 9
      ("u1", 100L, 9L, "b"),
      ("u1", 120L, 1L, "c")
    ).toDF("k", "rt", "rid", "payload")
    val got = graft.ops.Temporal.asofJoin(left, right, Seq("k"),
        "t", "rt", "rid", Seq("rid", "payload", "rt"))
      .select(col("lid"), col("__asof_rid"), col("__asof_payload"), col("__asof_rt"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(got(1L) == (Some(9L), Some("b"), Some(100L))) // tie: max rid, SAME row's payload
    assert(got(2L) == (Some(1L), Some("c"), Some(120L))) // latest <= 150
    assert(got(3L) == (None, None, None))
    assert(got(4L) == (None, None, None))
  }

  test("asofJoin: null carried FIELD still comes from the latest right row") {
    // the latest right row has payload=null — the carry must report that
    // null, not stitch the older row's non-null payload (per-column
    // ignoreNulls would); regression for the struct-carry fix
    val left = Seq((1L, "u", 300L)).toDF("lid", "k", "t")
    val right = Seq(
      ("u", 100L, 1L, Some("x")),
      ("u", 200L, 2L, None: Option[String])
    ).toDF("k", "rt", "rid", "payload")
    val row = graft.ops.Temporal.asofJoin(left, right, Seq("k"),
        "t", "rt", "rid", Seq("rid", "payload"))
      .select(col("__asof_rid"), col("__asof_payload")).head()
    assert(row.getLong(0) == 2L, "latest right row must win")
    assert(row.isNullAt(1), "its null payload must carry as null, not 'x'")
  }

  test("rangeJoinBinned: null points/bounds drop like the naive join") {
    val left = Seq((1L, Some(5L)), (2L, None: Option[Long])).toDF("lid", "p")
    val right = Seq(
      (10L, Some(0L), Some(10L)),
      (11L, Some(0L), None: Option[Long]), // open-ended: no match, no crash
      (12L, None: Option[Long], Some(10L))
    ).toDF("rid", "s", "e")
    val got = graft.ops.Jnr.rangeJoinBinned(left, right,
        col("p"), col("s"), col("e"), binWidth = 10L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L)))
  }

  test("asofQuery: every purchase row, gaps non-negative, views precede") {
    val r = graft.ops.Temporal.asofQuery(spark, sf)
    val purchases = graft.core.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(r.count() == purchases)
    assert(r.filter(col("gap_seconds") < 0).isEmpty)
    // matched view ids must actually be view events
    val views = graft.core.Tables.events(spark, sf)
      .filter(col("event_type") === "view").select(col("event_id").as("view_event_id"))
    assert(r.filter(col("view_event_id").isNotNull)
      .join(views, Seq("view_event_id"), "left_anti").isEmpty)
  }

  // --------------------------------------------------------- source drift
  test("sourceDrift equals a naive full-vocabulary TV computation") {
    val naive = {
      val tok = graft.core.Tables.documents(spark, sf)
        .select(col("source"), explode(
          graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
      val st = tok.groupBy("source", "tok").agg(count(lit(1)).as("cs"))
      val g = st.groupBy("tok").agg(sum("cs").as("c"))
      val ns = st.groupBy("source").agg(sum("cs").as("n_tok"))
      val n = st.agg(sum("cs")).head().getLong(0)
      // full sources × vocab grid (fine at sf0.001; the operator avoids it)
      val grid = ns.crossJoin(g)
        .join(st, Seq("source", "tok"), "left")
        .withColumn("cs", coalesce(col("cs"), lit(0L)))
      grid.withColumn("term",
          abs(col("cs").cast("double") / col("n_tok") -
              (col("c") - col("cs")).cast("double") / (lit(n) - col("n_tok"))))
        .groupBy("source").agg((sum("term") / 2).as("tv_naive"))
    }
    val got = graft.ops.TextPrep.sourceDrift(spark, sf)
    val cmp = got.join(naive, "source")
      .filter(abs(col("tv") - col("tv_naive")) > 1e-6)
    assert(cmp.isEmpty, "algebraic absent-token fold must equal the naive grid")
    assert(got.filter(col("tv") < 0 || col("tv") > 1).isEmpty)
    graft.core.Caches.release(spark)
  }

  // ------------------------------------------------------ temperature mix
  test("temperatureMix flattens a skewed source distribution (alpha=0.5)") {
    // 900 vs 100 docs: sqrt weights 30 vs 10 → allocations 187.5 vs 62.5
    // of budget 250 → keep rates ~0.2083 vs ~0.625: the SMALL source keeps
    // a ~3x larger fraction, but the BIG source still contributes more
    val docs = ((1 to 900).map(i => (i.toLong, "big")) ++
                (1001 to 1100).map(i => (i.toLong, "small")))
      .toDF("doc_id", "source")
    val r = graft.ops.Packing.temperatureMixOf(docs)
    val rates = r.select("source", "keep_rate").distinct().collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(math.abs(rates("big") - 250.0 * (30.0 / 40.0) / 900.0) < 1e-4)
    assert(math.abs(rates("small") - 250.0 * (10.0 / 40.0) / 100.0) < 1e-4)
    assert(rates("small") > rates("big") * 2.5)
    val kept = r.groupBy("source").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    // md5 buckets are uniform enough that achieved ≈ nominal (±35%)
    assert(math.abs(kept("big") - 900 * rates("big")) < 900 * rates("big") * 0.35)
    assert(kept("big") > kept("small"), "alpha=0.5 flattens, it does not invert")
  }

  test("temperatureMix caps tiny sources at keep_rate 1.0") {
    val docs = ((1 to 500).map(i => (i.toLong, "big")) ++
                Seq((9001L, "tiny"), (9002L, "tiny")))
      .toDF("doc_id", "source")
    val r = graft.ops.Packing.temperatureMixOf(docs)
    val tinyRate = r.filter(col("source") === "tiny")
      .select("keep_rate").distinct().collect()
    // allocation 250·(√2/(√2+√500))/2 > 1 → capped
    assert(tinyRate.isEmpty || tinyRate.head.getDouble(0) == 1.0)
  }

  // ----------------------------------------------------------- survivors
  test("dedup survivors = corpus minus non-canonical cluster members") {
    val docs = graft.core.Tables.documents(spark, sf).count()
    val cl = graft.ops.Dedup.clusters(spark, sf)
    val dropped = cl.filter(col("doc_id") =!= col("cluster_id")).count()
    val s = graft.ops.Dedup.survivors(spark, sf)
    assert(s.count() == docs - dropped)
    // every canonical is its own cluster id; every member appears once
    val canon = s.filter(col("status") === "canonical").count()
    assert(canon == cl.filter(col("doc_id") === col("cluster_id")).count())
    assert(s.select("doc_id").distinct().count() == s.count())
    graft.core.Caches.release(spark)
  }

  // ------------------------------------------------------------ profiling
  test("completeness profile: n_rows constant, nulls+distinct bounded") {
    val r = graft.ops.Profiling.completeness(spark, sf).collect()
    assert(r.length == 5)
    val nRows = r.map(_.getLong(1)).toSet
    assert(nRows.size == 1, "every column profiles the same row count")
    r.foreach { row =>
      assert(row.getLong(2) >= 0 && row.getLong(2) <= row.getLong(1))
      assert(row.getLong(3) <= row.getLong(1) - row.getLong(2),
        "distinct (null-excluded) cannot exceed non-null rows")
    }
    // key column is unique and non-null
    val key = r.find(_.getString(0) == "c_custkey").get
    assert(key.getLong(2) == 0 && key.getLong(3) == key.getLong(1))
  }

  test("benford: shares sum to 1 and digit 1 dominates digit 9") {
    val r = graft.ops.Profiling.benford(spark, sf).collect()
      .map(row => row.getInt(0) -> (row.getLong(1), row.getDouble(2))).toMap
    assert(r.keySet.subsetOf((1 to 9).toSet))
    assert(math.abs(r.values.map(_._2).sum - 1.0) < 1e-3)
    // totalprice is a sum of many positive terms — low digits dominate
    assert(r(1)._1 > r(9)._1)
  }

  test("nll bucket sampling: tapering rates produce a decreasing keep profile") {
    val sampled = graft.ops.TextAnalysis.nllBucketSample(spark, sf)
    val total = graft.core.Tables.documents(spark, sf).count()
    val perBucket = sampled.groupBy("nll_bucket").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val bucketSize = total / 5.0
    // bucket 1 kept at 100%: exactly its full quintile
    assert(math.abs(perBucket(1) - bucketSize) <= 1)
    // monotone taper within sampling noise: last bucket well below first
    assert(perBucket.getOrElse(5, 0L) < perBucket(1) / 4)
    graft.core.Caches.release(spark)
  }

  // ----------------------------------------------------------- ANN recall
  test("annRecall emits one bounded row per method, consistent with sets") {
    val r = Similarity.annRecall(spark, sf).collect()
      .map(row => row.getString(0) ->
        (row.getLong(1), row.getLong(2), row.getDouble(3))).toMap
    assert(r.keySet == Set("lsh", "ivf_lo", "ivf_mid", "ivf", "ivfpq"))
    r.values.foreach { case (t, m, rec) =>
      assert(t > 0 && m >= 0 && m <= t)
      assert(rec >= 0.0 && rec <= 1.0)
      assert(math.abs(rec - math.round(m.toDouble / t * 1e6) / 1e6) < 1e-9)
    }
    // probe-budget sweep: recall is monotone in the budget, and the
    // DEFAULT budget (the one ivfTopK serves) meets the gated floor —
    // measured 0.818 at sf0.01, 0.7745 at sf0.1 with corpus-derived
    // cents = ceil(sqrt(n)), nprobe = ceil(2*cents/5)
    assert(r("ivf_lo")._3 <= r("ivf_mid")._3 + 1e-9)
    assert(r("ivf_mid")._3 <= r("ivf")._3 + 1e-9)
    assert(r("ivf")._3 >= 0.7,
      s"default-budget IVF recall ${r("ivf")._3} below the 0.7 floor")
    graft.core.Caches.release(spark)
  }
}
