package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Laws for the two-long-limb exact 128-bit sum
  * ([[graft.functions.Int128Sum]]): it must agree with decimal
  * aggregation everywhere inside its domain, under any partitioning
  * (the merge path carries limbs, not values). */
class Int128SumSpec extends SparkSpec {

  private def sumOf(vals: Seq[java.lang.Long], parts: Int): (BigDecimal, BigDecimal) = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(vals.map(Row(_)), parts),
      StructType(Seq(StructField("x", LongType, nullable = true))))
    val r = df.agg(
      call_function(graft.functions.GraftFunctions.Int128SumName, col("x")).as("s"),
      coalesce(sum(col("x").cast("decimal(38,0)")), lit(0).cast("decimal(38,0)")).as("ref"))
      .collect()(0)
    (BigDecimal(r.getDecimal(0)), BigDecimal(r.getDecimal(1)))
  }

  test("matches decimal sum across the 2^64 limb boundary, both signs") {
    val cases = Seq(
      Seq[java.lang.Long](Long.MaxValue, Long.MaxValue, Long.MaxValue, 17L),
      Seq[java.lang.Long](Long.MinValue, Long.MinValue, Long.MinValue, -17L),
      Seq[java.lang.Long](Long.MaxValue, Long.MinValue, 1L, -1L, 0L),
      Seq[java.lang.Long](-1L, -1L, -1L, -1L),
      (1 to 200).map(i => java.lang.Long.valueOf(if (i % 2 == 0) Long.MaxValue / 3 else Long.MinValue / 2)))
    for (vs <- cases; parts <- Seq(1, 3, 7)) {
      val (got, want) = sumOf(vs, parts)
      assert(got == want, s"parts=$parts vals=${vs.take(5)}…")
    }
  }

  test("nulls contribute zero; the empty frame sums to zero, not null") {
    assert(sumOf(Seq(null, null, 42L, null), 2) == ((BigDecimal(42), BigDecimal(42))))
    val (got, _) = sumOf(Seq.empty, 1)
    assert(got == BigDecimal(0))
  }

  test("randomized: agrees with decimal sum over products crossing 2^64") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val df = spark.range(0, 500000, 1, 8)
      .selectExpr("CAST(hash(id) AS BIGINT) * CAST(hash(id + 7) AS BIGINT) AS x")
    val r = df.agg(
      call_function(graft.functions.GraftFunctions.Int128SumName, col("x")).as("s"),
      sum(col("x").cast("decimal(38,0)")).as("ref")).collect()(0)
    assert(r.getDecimal(0) == r.getDecimal(1))
  }

  test("stays inside whole-stage codegen (no fallback, no object alloc path)") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val df = spark.range(0, 1000, 1, 2).toDF("x")
      .agg(call_function(graft.functions.GraftFunctions.Int128SumName, col("x")).as("s"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` prefix is the whole-stage-codegen marker; both the
    // partial and final HashAggregate must carry it (an interpreted or
    // ObjectHashAggregate fallback would drop it)
    assert(plan.contains("*(1) HashAggregate") || plan.contains("*(2) HashAggregate"), plan)
    assert(!plan.contains("ObjectHashAggregate"), plan)
  }
}
