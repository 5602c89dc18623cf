package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout

/** Physical-layout specs: Z-order clustering must tighten per-file
  * min/max ranges on BOTH key dimensions, and compaction must reduce
  * file counts without changing data. */
class LayoutSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_layout").toString

  private def perFileSpread(dir: String, column: String): Double = {
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    val spreads = files.map { f =>
      val mm = spark.read.parquet(f)
        .agg(min(col(column)).cast("double"), max(col(column)).cast("double"))
        .collect()(0)
      mm.getDouble(1) - mm.getDouble(0)
    }
    spreads.sum / spreads.length
  }

  test("z-order clustering tightens per-file ranges on both dimensions") {
    // z-order only balances dimensions of comparable bit-width — bucket
    // time to days (~30 values) to match the test corpus's ~15 users;
    // interleaving a 4-bit dim with a 16-bit dim just sorts by the wide one
    val e = graft.core.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"),
              expr("unix_micros(ts) div 86400000000").as("day"))
    val unclustered = tmp(); val clustered = tmp()
    e.repartition(8).write.mode("overwrite").parquet(unclustered)
    Layout.clusteredWrite(
      e.withColumn("zkey", Layout.zorderKey(col("user_id"), col("day"))),
      col("zkey"), clustered, 8)
    // both dimensions must get tighter when clustered by the interleaved key
    assert(perFileSpread(clustered, "user_id") < perFileSpread(unclustered, "user_id"),
      "user_id ranges must shrink under z-order")
    assert(perFileSpread(clustered, "day") < perFileSpread(unclustered, "day"),
      "day ranges must shrink under z-order")
    // data unchanged
    assert(spark.read.parquet(clustered).count() == e.count())
  }

  test("day_dt filter on warehouse history prunes partitions at the scan") {
    val wh = new graft.connect.ParquetWarehouse(tmp())
    val base = graft.core.Tables.supplier(spark, sf)
      .select(col("s_suppkey"), col("s_name"))
    for (d <- Seq("2024-06-01", "2024-06-02", "2024-06-03"))
      wh.appendHistory(base.withColumn("day_dt", lit(java.sql.Date.valueOf(d))),
                       "supplier")
    val filtered = wh.readHistory(spark, "supplier")
      .filter(col("day_dt") === "2024-06-02")
    val plan = filtered.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters"))
    assert(pf.isDefined && pf.get.contains("day_dt"),
      "day_dt predicate must become a PartitionFilter, not a row filter:\n" + plan)
    assert(filtered.count() == base.count()) // exactly one day read
  }

  test("compaction reduces file count and preserves rows") {
    val src = tmp(); val dest = tmp()
    graft.core.Tables.events(spark, sf).repartition(16)
      .write.mode("overwrite").parquet(src)
    val before = new java.io.File(src).listFiles()
      .count(_.getName.endsWith(".parquet"))
    Layout.compact(spark, src, dest, targetBytes = 512L * 1024 * 1024)
    val after = new java.io.File(dest).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(before == 16 && after == 1)
    assert(spark.read.parquet(dest).count() ==
      spark.read.parquet(src).count())
  }
}
