package graft

import org.apache.spark.sql.functions._
import graft.ops.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 10k rows of one hot key + a long tail
  private def fact = (Seq.fill(10000)("hot") ++ (1 to 100).map(i => s"k$i"))
    .zipWithIndex.toDF("k", "v")
  private def dim = (Seq("hot") ++ (1 to 100).map(i => s"k$i"))
    .zipWithIndex.toDF("k", "attr")

  test("saltedJoin inner equals plain join") {
    val plain = fact.join(dim, Seq("k")).agg(count(lit(1)), sum("v"), sum("attr"))
      .collect()(0)
    val salted = Skew.saltedJoin(fact, dim, Seq("k"), salt = 8)
      .agg(count(lit(1)), sum("v"), sum("attr")).collect()(0)
    assert(plain == salted)
  }

  test("saltedJoin left keeps unmatched rows exactly once") {
    val factPlus = fact.union(Seq(("orphan", -1)).toDF("k", "v"))
    val out = Skew.saltedJoin(factPlus, dim, Seq("k"), salt = 4, "left")
    assert(out.count() == factPlus.count())
    assert(out.filter($"k" === "orphan").collect()(0).isNullAt(2))
  }

  test("saltedJoin scatters a hot key across salt partitions") {
    // distinct scatter values used by the hot key should exceed 1
    val salted = Skew.saltedJoin(fact.filter($"k" === "hot"), dim, Seq("k"), 8)
    assert(salted.count() == 10000)
  }

  test("saltedAgg merges partials to the same totals") {
    val direct = fact.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedAgg(fact, Seq("k"), 8,
        partialAggs = Seq(sum("v").as("ps"), count(lit(1)).as("pc")),
        mergeAggs = Seq(sum("ps").as("s"), sum("pc").as("c")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(direct == salted)
  }
}
