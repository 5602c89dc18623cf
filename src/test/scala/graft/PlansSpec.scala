package graft

import org.apache.spark.sql.functions._
import graft.plans.NormalizeTrimJoins

class PlansSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[T](f: => T): T = {
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ NormalizeTrimJoins
    try f finally spark.experimental.extraOptimizations = before
  }

  test("NormalizeTrimJoins moves trim out of the join condition") {
    withRule {
      val l = Seq((" a1 ", 1), ("b2", 2)).toDF("k", "lv")
      val r = Seq(("a1", 10), (" b2", 20)).toDF("rk", "rv")
      val joined = l.join(r, trim(l("k")) === trim(r("rk")))

      val optimized = joined.queryExecution.optimizedPlan
      val joinNodes = optimized.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }
      assert(joinNodes.size == 1)
      // condition is now attribute = attribute, no trim inside the join
      val cond = joinNodes.head.condition.get
      assert(!cond.exists(_.isInstanceOf[
        org.apache.spark.sql.catalyst.expressions.StringTrim]))

      // semantics unchanged
      val rows = joined.select("lv", "rv").collect()
        .map(x => (x.getInt(0), x.getInt(1))).toSet
      assert(rows == Set((1, 10), (2, 20)))
    }
  }

  test("rule leaves plain equi-joins untouched") {
    withRule {
      val l = Seq(("a", 1)).toDF("k", "lv")
      val r = Seq(("a", 2)).toDF("k", "rv")
      val joined = l.join(r, Seq("k"))
      assert(joined.collect().length == 1)
    }
  }

  private def withFuse[T](f: => T): T = {
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ graft.plans.FuseDotProduct
    try f finally spark.experimental.extraOptimizations = before
  }

  private val hofDot =
    "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"

  // Seq.toDF builds a LocalRelation, which ConvertToLocalRelation folds
  // away before user rules run — parallelize() keeps a real plan
  private def rddDF(rows: Seq[(Seq[java.lang.Double], Seq[java.lang.Double])]) = {
    val rdd = spark.sparkContext.parallelize(rows, 1)
    spark.createDataFrame(rdd).toDF("a", "b")
  }

  test("FuseDotProduct rewrites the HOF idiom into the native kernel") {
    withFuse {
      val df = rddDF(Seq((Seq[java.lang.Double](1.0, 2.0, 3.0),
                          Seq[java.lang.Double](4.0, 5.0, 6.0))))
        .selectExpr(s"$hofDot AS dot")
      val optimized = df.queryExecution.optimizedPlan
      assert(optimized.expressions.exists(_.exists(
        _.isInstanceOf[graft.functions.DotProduct])), "kernel not fused")
      assert(df.collect()(0).getDouble(0) == 32.0)
    }
  }

  test("FuseDotProduct is value-identical on nulls and ragged arrays") {
    val rows = Seq(
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)),   // 11.0
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0)),        // ragged -> null
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0)),  // elem null -> null
      (null, Seq[java.lang.Double](3.0, 4.0)))                              // array null -> null
    val df = rddDF(rows)
    val plain = df.selectExpr(s"$hofDot AS dot").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    val fused = withFuse {
      val d = df.selectExpr(s"$hofDot AS dot")
      assert(d.queryExecution.optimizedPlan.expressions.exists(_.exists(
        _.isInstanceOf[graft.functions.DotProduct])))
      d.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    }
    assert(plain.toSeq == fused.toSeq)
    assert(plain.toSeq == Seq(Some(11.0), None, None, None))
  }

  test("FuseDotProduct leaves non-matching folds alone") {
    withFuse {
      // sum-of-sums, not a product fold — must NOT fuse
      val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
        .selectExpr("aggregate(zip_with(a, b, (x, y) -> x + y), 0D, (acc, x) -> acc + x) AS s")
      assert(!df.queryExecution.optimizedPlan.expressions.exists(_.exists(
        _.isInstanceOf[graft.functions.DotProduct])))
      assert(df.collect()(0).getDouble(0) == 10.0)
    }
  }
}
