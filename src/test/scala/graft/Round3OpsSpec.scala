package graft

import org.apache.spark.sql.functions._
import graft.ops.{Embeddings, Reshape, Stats}
import graft.pipelines.Olap

/** Specs for the round-3 operators: multi-level rollup, robust MAD
  * statistics, int8 quantization, classic OLAP shapes, HLL profile. */
class Round3OpsSpec extends SparkSpec {

  test("eventRollupLevels: levels are consistent and gid-tagged") {
    val r = Reshape.eventRollupLevels(spark, sf).collect()
    val leaf = r.filter(_.getLong(2) == 0)   // (event_type, day)
    val byType = r.filter(_.getLong(2) == 1) // day rolled up
    val grand = r.filter(_.getLong(2) == 3)  // all rolled up
    assert(grand.length == 1)
    assert(grand.head.getLong(3) == leaf.map(_.getLong(3)).sum)
    assert(byType.map(_.getLong(3)).sum == grand.head.getLong(3))
    // each per-type row equals the sum of its leaves
    val leafByType = leaf.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(3)).sum)
    byType.foreach(r0 =>
      assert(leafByType(r0.getString(0)) == r0.getLong(3)))
    // rolled-up keys are null exactly per gid
    assert(byType.forall(_.isNullAt(1)) && grand.forall(g => g.isNullAt(0) && g.isNullAt(1)))
  }

  test("mad is outlier-resistant where stddev is not") {
    import spark.implicits._
    val base = (1 to 99).map(i => ("g", 100.0 + (i % 11))) :+ (("g", 1e9))
    val df = base.toDF("l_returnflag", "x")
    // reuse the operator's internal shape on a tiny frame via SQL
    df.createOrReplaceTempView("mad_in")
    val med = spark.sql("SELECT percentile(x, 0.5) FROM mad_in").collect()(0).getDouble(0)
    val mad = spark.sql(
      s"SELECT percentile(round(abs(x - $med), 6), 0.5) FROM mad_in").collect()(0).getDouble(0)
    val sd = spark.sql("SELECT stddev_pop(x) FROM mad_in").collect()(0).getDouble(0)
    assert(mad < 10.0, s"MAD should ignore the 1e9 outlier, got $mad")
    assert(sd > 1e6, "stddev is dominated by the outlier (that's the point)")
  }

  test("mad query returns one row per returnflag with positive spread") {
    val r = Stats.mad(spark, sf).collect()
    assert(r.length == 3)
    r.foreach { row =>
      assert(row.getDouble(2) > 0)                       // median
      assert(row.getDouble(3) > 0)                       // mad
      assert(math.abs(row.getDouble(4) - row.getDouble(3) * 1.4826) < 1e-3)
    }
  }

  test("quantizeInt8 bounds, scale, and reconstruction") {
    val r = Embeddings.quantizeInt8(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      // q is serialized "i,i,..." (oracle portability: no array columns)
      val q = row.getString(2).split(',').map(_.toInt).toSeq
      assert(q.length == 64)
      assert(q.forall(v => v >= -127 && v <= 127))
      assert(q.exists(v => math.abs(v) == 127), "max-magnitude dim maps to ±127")
      // mse bounded by (scale/2)^2: each dim's rounding error <= scale/2
      val scale = row.getDouble(1)
      assert(row.getDouble(3) <= scale * scale / 4 + 1e-9)
    }
  }

  test("pricing summary matches a direct computation of one cell") {
    val li = graft.core.Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      .filter(col("l_returnflag") === "R" && col("l_linestatus") === "F")
    val expectN = li.count()
    val got = Olap.pricingSummary(spark, sf)
      .filter(col("l_returnflag") === "R" && col("l_linestatus") === "F")
      .collect()(0)
    assert(got.getLong(9) == expectN)
    assert(got.getDouble(2) > 0 && got.getDouble(4) <= got.getDouble(3))
  }

  test("local supplier volume: co-national constraint holds") {
    val r = Olap.localSupplierVolume(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach(row => assert(row.getDouble(1) > 0 && row.getLong(2) > 0))
    // only ASIA nations appear
    val asia = graft.core.Tables.nation(spark, sf)
      .join(graft.core.Tables.region(spark, sf)
              .filter(col("r_name") === "ASIA"),
            col("n_regionkey") === col("r_regionkey"))
      .select("n_name").collect().map(_.getString(0)).toSet
    r.foreach(row => assert(asia.contains(row.getString(0))))
  }

  test("cdc compaction equals the window formulation and partial-aggregates") {
    import graft.ops.Cdc
    val viaAgg = Cdc.latestOrderQuery(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val viaWindow = graft.core.Tables.orders(spark, sf)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .collect().map(r => r.getAs[Long]("o_custkey") -> r.getAs[Long]("o_orderkey")).toMap
    assert(viaAgg == viaWindow)
    // the plan is a hash aggregate (partial+final), not a window sort
    val plan = Cdc.latestOrderQuery(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "compaction must not plan a window")
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"))
  }

  test("cdc upsert applies updates, deletes, and inserts exactly once") {
    import graft.ops.Cdc
    val snap = graft.core.Tables.supplier(spark, sf)
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
    val before = snap.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val after = Cdc.upsertQuery(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    before.keys.foreach { k =>
      if (k % 31 == 0) assert(!after.contains(k), s"$k should be deleted")
      else if (k % 7 == 0) assert(after(k) == before(k) + 100.0)
      else assert(after(k) == before(k))
    }
    val maxKey = before.keys.max
    assert(after(maxKey + 1) == 0.0 && after(maxKey + 2) == 10.5)
    assert(after.size == before.count(kv => kv._1 % 31 != 0) + 2)
  }

  test("cdc upsert rejects a malformed batch") {
    import spark.implicits._
    val snap = Seq((1L, "a", 1.0)).toDF("k", "name", "bal")
    val badBatch = Seq((1L, "a", "upsert")).toDF("k", "name", "op") // missing bal
    val e = intercept[IllegalArgumentException] {
      graft.ops.Cdc.upsert(snap, badBatch, Seq("k"))
    }
    assert(e.getMessage.contains("batch columns"))
  }

  test("HLL sketch user cardinality is within 5% of the exact profile") {
    val exact = Olap.cardinalityProfile(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    Olap.cardinalitySketch(spark, sf).collect().foreach { row =>
      val e = exact(row.getString(0)).toDouble
      val a = row.getLong(2).toDouble
      assert(math.abs(a - e) / e < 0.05, s"${row.getString(0)}: approx $a vs exact $e")
    }
  }
}
