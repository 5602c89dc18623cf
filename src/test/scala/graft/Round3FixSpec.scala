package graft

import org.apache.spark.sql.functions._

/** Specs pinning the round-3 review fixes: the cache-release contract,
  * Scd2 column-drift fail-fast, sign-correct floor division in the
  * Z-order minute bucket, and graft_dot's SQL-facing null semantics. */
class Round3FixSpec extends SparkSpec {

  test("Caches.release unpersists every operator-tracked frame") {
    // clean slate — other suites sharing this session may have left
    // caches of their own, so assert only on graft-tracked state
    spark.catalog.clearCache()
    graft.core.Caches.release(spark)
    val before = spark.sparkContext.getPersistentRDDs.size
    val pairs = graft.ops.Dedup.jaccardPairs(spark, sf)
    pairs.write.format("noop").mode("overwrite").save()
    assert(graft.core.Caches.liveCount(spark) > 0,
      "jaccardPairs should register its inverted index")
    assert(spark.sparkContext.getPersistentRDDs.size > before)
    graft.core.Caches.release(spark)
    assert(graft.core.Caches.liveCount(spark) == 0)
    assert(spark.sparkContext.getPersistentRDDs.size <= before)
  }

  test("Scd2.merge fails fast when history carries an untracked column") {
    import spark.implicits._
    val hist = Seq((1L, "a", 5.0, java.sql.Date.valueOf("2024-06-01")))
      .toDF("k", "name", "extra_attr", "effective_from")
      .withColumn("effective_to", lit(null).cast("date"))
    val snap = Seq((1L, "a")).toDF("k", "name")
    val e = intercept[IllegalArgumentException] {
      graft.ops.Scd2.merge(hist, snap, Seq("k"), Seq("name"),
        java.sql.Date.valueOf("2024-06-02"))
    }
    assert(e.getMessage.contains("extra_attr"))
  }

  test("Scd2.merge fails fast when snapshot misses a tracked column") {
    import spark.implicits._
    val hist = Seq((1L, "a", java.sql.Date.valueOf("2024-06-01")))
      .toDF("k", "name", "effective_from")
      .withColumn("effective_to", lit(null).cast("date"))
    val snap = Seq(Tuple1(1L)).toDF("k")
    val e = intercept[IllegalArgumentException] {
      graft.ops.Scd2.merge(hist, snap, Seq("k"), Seq("name"),
        java.sql.Date.valueOf("2024-06-02"))
    }
    assert(e.getMessage.contains("missing"))
  }

  test("zorder minute bucket floors (not truncates) pre-epoch timestamps") {
    // -1 microsecond before the epoch is minute -1 under floor division;
    // truncation (Spark's `div`) would put it in minute 0 with the first
    // post-epoch minute — DuckDB's `//` floors, so the engines would split
    val base = 1704067200000000L // Layout.MinuteEpochUs
    import spark.implicits._
    val df = Seq(
      ("pre", base - 1L), ("pre2", base - 60000000L),
      ("at", base), ("post", base + 59999999L))
      .toDF("event_id", "us")
      .select(col("event_id"),
        expr("""(us - 1704067200000000) div 60000000
               | - (case when (us - 1704067200000000) % 60000000 < 0
               |         then 1 else 0 end)""".stripMargin).as("minute"))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("pre") == -1L && m("pre2") == -1L && m("at") == 0L && m("post") == 0L)
  }

  test("SQL-facing graft_dot has exact zip_with null semantics") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    val df = Seq(
      ("ragged", Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)),
      ("nullelem", Seq(1.0, 2.0), Seq(1.0, Double.NaN)), // placeholder row
      ("ok", Seq(1.0, 2.0), Seq(3.0, 4.0)))
      .toDF("k", "a", "b")
    val got = df.selectExpr("k", "graft_dot(a, b) AS d",
        "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x) AS hof")
      .collect().map(r => r.getString(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    // ragged → null on BOTH; ok → equal values
    assert(got("ragged")._1 == got("ragged")._2 && got("ragged")._1.isEmpty)
    assert(got("ok")._1 == got("ok")._2 && got("ok")._1.nonEmpty)
    // a null ELEMENT propagates null through the SQL-facing function
    val withNull = spark.sql(
      "SELECT graft_dot(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D)) AS d")
      .collect()(0)
    assert(withNull.isNullAt(0))
  }
}
