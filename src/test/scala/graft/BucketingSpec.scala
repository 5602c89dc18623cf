package graft

import org.apache.spark.sql.functions._
import graft.connect.Bucketing

class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans with no shuffle exchange") {
    val li = graft.core.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val ord = graft.core.Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderstatus")
      .withColumnRenamed("o_orderkey", "l_orderkey")

    Bucketing.writeBucketed(li, "b_lineitem", Seq("l_orderkey"), 8)
    Bucketing.writeBucketed(ord, "b_orders", Seq("l_orderkey"), 8)
    try {
      val bl = Bucketing.readTable(spark, "b_lineitem")
      val bo = Bucketing.readTable(spark, "b_orders")
      val joined = bl.join(bo, Seq("l_orderkey"))
        .filter(col("o_orderstatus") =!= "F")
        .groupBy(col("l_orderkey")).agg(sum("l_quantity"))

      // the unbucketed formulation shuffles; the bucketed one must not
      assert(!Bucketing.hasShuffle(joined),
        "bucketed join+agg should be shuffle-free:\n" +
          joined.queryExecution.executedPlan)

      // and it computes the same result as the unbucketed plan
      val expected = li.join(ord, Seq("l_orderkey"))
        .filter(col("o_orderstatus") =!= "F")
        .groupBy(col("l_orderkey")).agg(sum("l_quantity"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val actual = joined.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(actual == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
