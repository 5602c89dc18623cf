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
}
