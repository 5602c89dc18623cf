package graft

/** Physical-plan regression guards: the scale properties argued in the
  * scaladocs must be visible in the executed plans, not just intended.
  * If an edit reintroduces a shuffle, loses a pushed filter, or widens a
  * scan, these fail before any benchmark notices.
  */
class PlanGuardSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("supplier mart: dims broadcast, status filter pushed to the orders scan") {
    val p = plan(graft.pipelines.SupplierPerformance.build(spark, sf))
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("PushedFilters"))
    assert(p.contains("Not(EqualTo(o_orderstatus,F))"),
      "status filter must reach the parquet scan")
  }

  test("text stats: single pruned scan, no shuffle") {
    val df = graft.ops.TextAnalysis.stats(spark, sf)
    val p = plan(df)
    assert("FileScan".r.findAllIn(p).length == 1)
    assert(!p.contains("Exchange hashpartitioning"), "stats must be shuffle-free")
    // column pruning: only doc_id and text are read
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(readSchema.contains("doc_id") && readSchema.contains("text"))
    assert(!readSchema.contains("lang") && !readSchema.contains("source"))
  }

  test("product mart: rollup aggregates below the join with part") {
    val p = plan(graft.pipelines.ProductPerformance.build(spark, sf))
    // the partial aggregate must appear under the join, i.e. at least two
    // HashAggregates (partial+final) and no shuffle of raw lineitem by partkey
    assert("HashAggregate".r.findAllIn(p).length >= 2)
    assert(!p.contains("Hint (strategy=broadcast) is not supported"))
  }

  test("multimodal features: payload-derived projection over one scan") {
    val p = plan(graft.ops.Multimodal.features(spark, sf))
    assert("FileScan".r.findAllIn(p).length == 1)
    assert(!p.contains("Exchange hashpartitioning"))
  }

  test("pii scrub: shuffle-free single scan") {
    val p = plan(graft.ops.PiiScrub.query(spark, sf))
    assert("FileScan".r.findAllIn(p).length == 1)
    assert(!p.contains("Exchange hashpartitioning"))
  }

  test("sampling: shuffle-free single scan") {
    val p = plan(graft.ops.Sampling.query(spark, sf))
    assert("FileScan".r.findAllIn(p).length == 1)
    assert(!p.contains("Exchange hashpartitioning"))
  }

  test("ivf: centroid assignment is a broadcast nested loop, no shuffle before it") {
    val p = plan(graft.ops.Similarity.ivfTopK(spark, sf))
    // the 8-row centroid table must broadcast; the corpus side must not
    // shuffle to meet it
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "centroids must be broadcast")
  }

  test("event pivot: one shuffle, no distinct-values pre-job") {
    val p = plan(graft.ops.Reshape.eventPivot(spark, sf))
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 1,
      "explicit pivot values must compile to a single-shuffle conditional agg")
  }

  test("unpivot: projection + generator, shuffle-free") {
    val p = plan(graft.ops.Reshape.partUnpivot(spark, sf))
    assert(!p.contains("Exchange hashpartitioning"))
    assert("FileScan".r.findAllIn(p).length == 1)
  }

  test("scd2: closed history is appended, not joined") {
    val base = graft.core.Tables.supplier(spark, sf)
      .select(org.apache.spark.sql.functions.col("s_suppkey"),
              org.apache.spark.sql.functions.col("s_name"))
    val hist = base
      .withColumn("effective_from",
        org.apache.spark.sql.functions.lit(java.sql.Date.valueOf("2024-06-01")))
      .withColumn("effective_to",
        org.apache.spark.sql.functions.lit(null).cast("date"))
    val p = plan(graft.ops.Scd2.merge(hist, base, Seq("s_suppkey"),
      Seq("s_name"), java.sql.Date.valueOf("2024-06-02")))
    // exactly the open-vs-snapshot join: one join in the whole plan
    assert("Join".r.findAllIn(p).length <= "SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin".r
      .findAllIn(p).length * 2, "sanity")
    assert("SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin".r.findAllIn(p).length == 1,
      "scd2 must plan exactly one join (open slice vs snapshot)")
  }

  test("stats moments: one aggregation pass over a pruned 3-column scan") {
    val p = plan(graft.ops.Stats.moments(spark, sf))
    assert("FileScan".r.findAllIn(p).length == 1)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(readSchema.contains("l_returnflag") && readSchema.contains("l_quantity")
      && readSchema.contains("l_extendedprice"))
    assert(!readSchema.contains("l_shipdate"), "scan must prune unused columns")
  }

  test("range join: equi-join on bins, never a nested-loop/cartesian plan") {
    val p = plan(graft.ops.Jnr.rangeJoinQuery(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "the bin rewrite exists precisely to avoid the nested-loop fallback")
    assert("SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin".r.findAllIn(p).nonEmpty)
    // selective order filter must reach the scan
    assert(p.contains("GreaterThan(o_totalprice,400000.0)"),
      "interval-side filter must push into the parquet scan")
  }

  test("asof join: one shuffle for the window, no join operator at all") {
    val p = plan(graft.ops.Temporal.asofQuery(spark, sf))
    assert(!p.contains("Join"), "asof compiles to union + window, not a join")
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      "exactly the per-key window shuffle")
  }

  test("source drift: no vocab-by-sources grid (no nested-loop expansion)") {
    val p = plan(graft.ops.TextPrep.sourceDrift(spark, sf))
    assert(!p.contains("CartesianProduct"),
      "absent-token fold must stay algebraic; 1-row totals broadcast instead")
    graft.core.Caches.release(spark)
  }

  test("lexical search: per-row tf kernels, no explode, distributed top-k") {
    val p = plan(graft.ops.Retrieval.lexicalTopK(spark, sf))
    assert(!p.contains("Generate"), "tf must come from array kernels, not explode")
    assert(p.contains("TakeOrderedAndProject"),
      "top-k must be the distributed TakeOrdered, not a global sort")
    assert("FileScan".r.findAllIn(p).length <= 2,
      "one scan for scoring, one for the 1-row df aggregate")
  }

  test("kmeans: assignment joins are broadcast, update is the only big shuffle") {
    val p = plan(graft.ops.Embeddings.kmeansAssign(spark, sf))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("SortMergeJoin"),
      "corpus must never shuffle to meet the centroid table — broadcast only")
    graft.core.Caches.release(spark)
  }

  test("semantic dedup: candidates meet in an equi-join on centroid_id, " +
       "never a cartesian pair join") {
    val p = plan(graft.ops.Embeddings.semanticPairs(spark, sf))
    assert(!p.contains("CartesianProduct"),
      "pair volume must be bucket-bounded, not all-pairs")
    assert("SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r.findAllIn(p).nonEmpty,
      "the candidate join must be an equi-join")
    graft.core.Caches.release(spark)
  }

  test("event transitions: one window shuffle, denominator broadcast back") {
    val p = plan(graft.ops.Funnel.transitions(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      "the per-prev out-degree table must broadcast, not shuffle the pairs")
  }

  test("q3 shipping priority: date filters pushed, distributed top-10") {
    val p = plan(graft.pipelines.Olap.shippingPriority(spark, sf))
    assert(p.contains("TakeOrderedAndProject"),
      "top-10 must be TakeOrdered, not a global sort")
    assert("PushedFilters: \\[[^\\]]*l_shipdate".r.findFirstIn(p).isDefined ||
           p.contains("GreaterThan(l_shipdate"),
      "lineitem date filter must reach the parquet scan")
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"),
      "segment filter must reach the customer scan")
  }

  test("q10 returned items: return-flag filter pushed, nation broadcast") {
    val p = plan(graft.pipelines.Olap.returnedItemReport(spark, sf))
    assert(p.contains("EqualTo(l_returnflag,R)"),
      "return-flag filter must reach the lineitem scan")
    assert(p.contains("BroadcastHashJoin"), "nation must broadcast")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("weekday anomalies: 7-row baseline broadcast, scan stays pruned") {
    val p = plan(graft.ops.TimeSeries.weekdayAnomalies(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      "the weekday baseline must broadcast back onto the daily counts")
    assert(!p.contains("CartesianProduct"))
  }

  test("digest quantiles: bounds broadcast onto the stream, cumulative " +
       "window partitioned by (group, quantile)") {
    val p = plan(graft.ops.Sketches.quantilesByFlagQuery(spark, sf))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "verification windows must broadcast, never shuffle the stream by them")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("windowspecdefinition(wgrp"),
      "the cumulative window must be partitioned (wgrp, q_pct)")
    graft.core.Caches.release(spark)
  }

  test("containment: same inverted-index shape as jaccard — equi-join on " +
       "shingle hash, no cartesian") {
    val p = plan(graft.ops.Dedup.containmentPairs(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "pairs must meet through the shingle equi-join only")
    graft.core.Caches.release(spark)
  }

  test("cross-source matrix: tallies equi-join on cluster_id, no doc-pair " +
       "enumeration operator") {
    val p = plan(graft.ops.Dedup.crossSourceMatrix(spark, sf))
    assert(!p.contains("CartesianProduct"))
    graft.core.Caches.release(spark)
  }

  test("bloom probe: map-side might_contain prefilter, confirm join broadcast") {
    val p = plan(graft.ops.IncrementalDedup.bloomQuery(spark, sf))
    // the prefilter is IN the plan (a projection-level filter, pre-join)
    assert(p.contains("might_contain"), "bloom prefilter must be planned")
    // candidates broadcast into the CONFIRM join (on exact_fp) -- the
    // index never enters a shuffle join there; the final doc_id left
    // join against the batch is batch-grain and may legitimately SMJ
    assert(p.contains("BroadcastHashJoin [exact_fp"),
      "confirm join must broadcast the candidates")
    assert(!p.contains("SortMergeJoin [exact_fp"),
      "index side must not sort-merge-shuffle on the fingerprint")
  }

  test("acf: one day-grain rollup, lag align is a broadcast join") {
    val df = graft.ops.TimeSeries.acf(spark, sf)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"), "calendar-bounded side must broadcast")
    graft.core.Caches.release(spark)
  }

  test("lengthMatch: dimension joins broadcast, no row-grain join shuffle") {
    val p = plan(graft.ops.Sampling.lengthMatch(spark, sf))
    // source/bucket dimensions and the quota table broadcast onto the
    // doc-grain scans; the only tolerated SMJ is the cell-grain
    // quota<->kept reconciliation (source x 10 rows), never a join
    // keyed on doc_id
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 3,
      "dimension/quota joins must broadcast")
    assert(!p.contains("SortMergeJoin [doc_id"),
      "no doc-grain sort-merge join")
  }

  test("quantile normalization: both rank passes are range partitionings") {
    val df = graft.ops.TextAnalysis.qualityQuantileNorm(spark, sf)
    val p = plan(df)
    assert("rangepartitioning".r.findAllIn(p).length >= 2,
      "both globalRank passes must range-partition (no global window sort)")
    graft.core.Caches.release(spark)
  }

  test("NO query in the full registry plans ANY single-partition window") {
    // the scale-killer class: row_number()/sum() OVER (ORDER BY ...) with
    // no PARTITION BY pulls every row through one task (and WARNs on
    // every run). Zero tolerance — unbounded frames use the distributed
    // two-pass (Rnk.globalRank/globalCumsum), LIMIT-bounded top-k frames
    // use the window-free Rnk.boundedRank.
    import org.apache.spark.sql.catalyst.plans.logical
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
      val optimized = fn(spark, sf).queryExecution.optimizedPlan
      optimized.foreach {
        case w: logical.Window if w.partitionSpec.isEmpty => offenders += name
        case _ => ()
      }
      graft.core.Caches.release(spark)
    }
    spark.catalog.clearCache()
    assert(offenders.isEmpty,
      s"single-partition window in: ${offenders.distinct.mkString(", ")}")
  }

  test("graph family: large-N config joins node tables partitioned, not broadcast") {
    // fixture graphs keep the broadcast; at web-graph grain the rank /
    // degree / contribution tables exceed broadcast memory, so the
    // largeGraph configuration must plan ZERO BroadcastHashJoins (the
    // only broadcast left anywhere is the 1-row nd total in host rank)
    for ((name, df) <- Seq(
      "part_pagerank" -> graft.ops.Graph.partPageRank(spark, sf, Some(true)),
      "part_triangles" -> graft.ops.Graph.triangles(spark, sf, Some(true)),
      "host_rank" -> graft.ops.TextAnalysis.hostRankQuery(spark, sf, Some(true)))) {
      val p = plan(df)
      assert(p.contains("ShuffledHashJoin"), s"$name must shuffle-hash node joins")
      assert(!p.contains("BroadcastHashJoin"),
        s"$name large-N plan still broadcasts a node table")
      graft.core.Caches.release(spark)
    }
    // the small configuration keeps the broadcast shape
    for ((name, df) <- Seq(
      "part_pagerank" -> graft.ops.Graph.partPageRank(spark, sf, Some(false)),
      "host_rank" -> graft.ops.TextAnalysis.hostRankQuery(spark, sf, Some(false)))) {
      val p = plan(df)
      assert(p.contains("BroadcastHashJoin"), s"$name small-N plan must broadcast")
      graft.core.Caches.release(spark)
    }
    spark.catalog.clearCache()
  }

  test("graph family: large and small configurations return identical results") {
    val a = graft.ops.Graph.partPageRank(spark, sf, Some(false))
      .orderBy("part_key").collect().toSeq
    graft.core.Caches.release(spark)
    val b = graft.ops.Graph.partPageRank(spark, sf, Some(true))
      .orderBy("part_key").collect().toSeq
    graft.core.Caches.release(spark)
    assert(a == b, "join strategy must not change PageRank values")
    val h1 = graft.ops.TextAnalysis.hostRankQuery(spark, sf, Some(false))
      .orderBy("domain").collect().toSeq
    graft.core.Caches.release(spark)
    val h2 = graft.ops.TextAnalysis.hostRankQuery(spark, sf, Some(true))
      .orderBy("domain").collect().toSeq
    graft.core.Caches.release(spark)
    assert(h1 == h2, "join strategy must not change host rank values")
    spark.catalog.clearCache()
  }

  test("fk discovery: one scan per side per edge, no cartesian") {
    val p = plan(graft.validate.Validator.fkDiscovery(spark, sf))
    // 6 edges x (child + parent) = 12 scans; the round-13 rewrite
    // removed the double child scan and the one-row crossJoin
    assert("Scan parquet".r.findAllIn(p).length <= 12,
      "fk discovery must not rescan the child per probe")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "counts ride the outer join, not a cross of one-row aggs")
  }

  test("woff2 glyf reconstruction: scan-shaped, no aggregation shuffle") {
    val p = plan(graft.ops.Archives.woff2GlyfQuery(spark, sf))
    // the only exchange allowed is Tables.docIds' deliberate id-spread
    // repartition (the split-bound serialization fix)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 1 && (exchanges == 0 ||
      p.contains("REPARTITION_BY_NUM")),
      "per-doc reconstruction must stay map-only past the id spread")
  }
}
