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
}
