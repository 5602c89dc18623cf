package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity
import graft.pipelines.Olap

/** Hard-negative mining and the CUBE summary. */
class MiningOlapSpec extends SparkSpec {
  import spark.implicits._

  test("hardNegatives: nearest same-label vector is excluded, nearest other-label wins") {
    // two tight same-label clusters on distinct axes plus one cross
    // vector: for vector 1 (label 0), its nearest neighbor 2 shares the
    // label and must NOT appear; the top negative must be 3 (label 1,
    // closest among other-label vectors).
    val dim = 64
    def vec(axis: Int, w: Double): Array[Float] = {
      val a = Array.fill(dim)(0.0f); a(axis) = w.toFloat; a
    }
    val rows = Seq(
      (1L, vec(0, 1.0), 0),
      (2L, vec(0, 0.9), 0),                       // same label, most similar
      (3L, { val a = vec(0, 0.8); a(1) = 0.6f; a }, 1), // other label, close
      (4L, vec(2, 1.0), 1))                       // other label, orthogonal
    val dir = java.nio.file.Files.createTempDirectory("graft_hn").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.hardNegatives(spark, dir)
      .as[(Long, Int, Long, Int, Double, Int)].collect()
    val forV1 = got.filter(_._1 == 1L).sortBy(_._6)
    assert(forV1.forall(r => r._4 != 0), "all neighbors carry another label")
    assert(!forV1.exists(_._3 == 2L), "same-label nearest neighbor excluded")
    assert(forV1.head._3 == 3L, "top hard negative is the closest other-label vector")
    spark.catalog.clearCache()
  }

  test("ivmJoin: maintained view has the full join's cardinality; both deltas fire") {
    // multiset equality with the from-scratch join is the oracle's job
    // (hash-compared at sf0.01); here: exact cardinality — any overlap
    // between the three delta terms would inflate it — and evidence
    // that both delta populations are nonempty (the splits exercise the
    // ΔA⋈B and A'⋈ΔB terms, not just the materialized base)
    val full = spark.read.parquet(s"$sf/orders.parquet")
      .join(spark.read.parquet(s"$sf/customer.parquet"),
        col("o_custkey") === col("c_custkey")).count()
    assert(graft.ops.Rollup.ivmJoinQuery(spark, sf).count() == full)
    import graft.ops.Sampling
    val dOrders = spark.read.parquet(s"$sf/orders.parquet")
      .filter(!(Sampling.bucket(col("o_orderkey"), "ivm_o") < lit(9000L))).count()
    val dCust = spark.read.parquet(s"$sf/customer.parquet")
      .filter(!(Sampling.bucket(col("c_custkey"), "ivm_c") < lit(9500L))).count()
    assert(dOrders > 0 && dCust > 0, s"deltas nonempty: $dOrders orders, $dCust customers")
  }

  test("equiDepthHistogram: buckets are near-balanced on real prices") {
    val got = graft.ops.Stats.equiDepthHistogram(spark, sf)
      .as[(Int, Option[Long], Long)].collect()
    val n = got.map(_._3).sum
    assert(got.length == 10 && got.map(_._1).sorted.sameElements(0 to 9))
    got.foreach { case (b, lo, cnt) =>
      assert(math.abs(cnt - n / 10.0) <= n * 0.02 + 1,
        s"bucket $b has $cnt of $n — not equi-depth")
      assert((b == 0) == lo.isEmpty, s"bucket $b lower edge presence")
    }
    // edges strictly increase where present
    val edges = got.sortBy(_._1).flatMap(_._2)
    assert(edges.sameElements(edges.sorted) && edges.distinct.length == edges.length)
    spark.catalog.clearCache()
  }

  test("cubeSummary: four levels, grand total matches the table count") {
    val got = Olap.cubeSummary(spark, sf).collect()
    val byLevel = got.groupBy(_.getInt(2))
    assert(byLevel.keySet == Set(0, 1, 2, 3), "detail, two rollups, grand total")
    val total = byLevel(3)
    assert(total.length == 1 &&
      total.head.isNullAt(0) && total.head.isNullAt(1))
    val nRows = spark.read.parquet(s"$sf/lineitem.parquet").count()
    assert(total.head.getLong(3) == nRows, "grand total counts every line item")
    // detail level re-sums to the grand total
    assert(byLevel(0).map(_.getLong(3)).sum == nRows)
  }
}
