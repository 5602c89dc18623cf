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
