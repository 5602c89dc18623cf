package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Jnr}

/** Round-5 additions: skew-salted equi-join and cross-split leakage. */
class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain inner join on skewed data, for any salt count") {
    // pathological skew: one key carries half the left side
    val left = ((1 to 500).map(i => (42L, i.toLong)) ++
                (1 to 500).map(i => (i.toLong % 37, i.toLong + 1000)))
      .toDF("k", "lv")
    val right = (0L to 60L).map(k => (k, s"r$k")).toDF("k", "rv")
    val want = left.join(right, Seq("k"))
      .select("k", "lv", "rv").as[(Long, Long, String)].collect().sorted.toSeq
    for (salts <- Seq(1, 3, 8)) {
      val got = Jnr.saltedJoin(left, right, Seq("k"), salts)
        .select("k", "lv", "rv").as[(Long, Long, String)].collect().sorted.toSeq
      assert(got == want, s"salts=$salts")
    }
  }

  test("saltedJoin: hot-key rows actually spread across salt buckets") {
    val left = (1 to 400).map(i => (7L, i.toLong)).toDF("k", "lv")
    val salted = left.withColumn("__salt",
      pmod(hash(left.columns.map(col): _*), lit(8)))
    val buckets = salted.groupBy("__salt").count().collect()
    assert(buckets.length >= 6, // 8 buckets, allow rare hash clumping
      s"hot key must fan out across salts, got ${buckets.length} buckets")
    assert(buckets.map(_.getLong(1)).max < 400,
      "no single salt bucket may hold the whole hot key")
  }

  test("saltedJoinQuery plans a sort-merge join on (key, salt), not broadcast") {
    val p = Jnr.saltedJoinQuery(spark, sf).queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), "the hint must force SMJ so the salt matters")
    assert(p.contains("__salt"), "the salt must be part of the join key")
  }

  test("splitLeakage: every reported pair is a true cross-split near-dup") {
    val assign = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        graft.ops.Sampling.split(col("doc_id"), 0.8, 0.2).as("split"))
      .as[(Long, String)].collect().toMap
    val rows = Dedup.splitLeakage(spark, sf)
      .as[(Long, Long, Double)].collect()
    // sf0.001 corpus has near-dups; at 80/20 odds some must straddle
    assert(rows.nonEmpty, "fixture corpus should produce cross-split leaks")
    rows.foreach { case (validDoc, trainDoc, j) =>
      assert(assign(validDoc) == "valid" && assign(trainDoc) == "train",
        s"($validDoc, $trainDoc) must straddle the split")
      assert(j >= 0.8)
    }
    graft.core.Caches.release(spark)
  }
}
