package graft

import org.apache.spark.sql.functions._

/** The scale-up generator must produce fixtures whose measurements mean
  * something: each replica a closed star (no dangling FKs), text salted
  * so dedup pair counts scale linearly, events striding user space. */
class ScaleGenSpec extends SparkSpec {

  private lazy val dst = {
    val d = java.nio.file.Files.createTempDirectory("graft_scale_spec").toString
    graft.tools.ScaleGen.generate(spark, sf, d, 3)
    d
  }
  private def t(name: String) = spark.read.parquet(s"$dst/$name.parquet")
  private def base(name: String) = spark.read.parquet(s"$sf/$name.parquet")

  test("row counts scale by the replica factor; dims stay fixed") {
    for (n <- Seq("customer", "supplier", "part", "orders", "lineitem",
                  "documents", "embeddings", "events"))
      assert(t(n).count() == 3 * base(n).count(), n)
    for (n <- Seq("region", "nation"))
      assert(t(n).count() == base(n).count(), n)
  }

  test("every FK resolves: replicas are closed stars") {
    assert(t("orders").join(t("customer"),
      col("o_custkey") === col("c_custkey"), "left_anti").isEmpty)
    val li = t("lineitem")
    assert(li.join(t("orders"),
      col("l_orderkey") === col("o_orderkey"), "left_anti").isEmpty)
    assert(li.join(t("part"),
      col("l_partkey") === col("p_partkey"), "left_anti").isEmpty)
    assert(li.join(t("supplier"),
      col("l_suppkey") === col("s_suppkey"), "left_anti").isEmpty)
  }

  test("keys never collide across replicas") {
    for ((n, k) <- Seq("customer" -> "c_custkey", "orders" -> "o_orderkey",
                       "documents" -> "doc_id", "embeddings" -> "vec_id",
                       "events" -> "event_id"))
      assert(t(n).select(k).distinct().count() == t(n).count(), s"$n.$k")
  }

  test("text salting: distinct texts scale exactly with replicas") {
    // within-replica dup structure preserved, zero cross-replica overlap
    val baseDistinct = base("documents").select("text").distinct().count()
    assert(t("documents").select("text").distinct().count() == 3 * baseDistinct)
  }

  test("events: user spaces are disjoint strides, timestamps unchanged") {
    val uStride = base("events").agg(max("user_id")).head().getLong(0) + 1
    val users = t("events").select("user_id").distinct().count()
    assert(users == 3 * base("events").select("user_id").distinct().count())
    // replica 2's users sit in the third stride window
    assert(t("events").agg(max("user_id")).head().getLong(0) <
      3 * uStride)
    assert(t("events").select("ts").distinct().count() ==
      base("events").select("ts").distinct().count())
  }
}
