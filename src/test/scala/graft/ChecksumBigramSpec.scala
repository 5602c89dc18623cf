package graft

import org.apache.spark.sql.functions._
import graft.validate.Validator
import graft.ops.TextAnalysis

/** Table checksums (anti-entropy fingerprint) and the bigram NLL score. */
class ChecksumBigramSpec extends SparkSpec {
  import spark.implicits._

  test("tableChecksums: XOR fold is invariant under partitioning and row order") {
    val base = Validator.tableChecksums(spark, sf)
      .as[(String, Long, Long)].collect().toSet
    // same data written back in a scrambled layout: random-ish order,
    // different partition count — the fingerprint must not move
    val dir = java.nio.file.Files.createTempDirectory("graft_ck").toString
    val names = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    names.foreach { n =>
      spark.read.parquet(s"$sf/$n.parquet")
        .repartition(7) // round-robin: different layout AND row order
        .write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    val scrambled = Validator.tableChecksums(spark, dir)
      .as[(String, Long, Long)].collect().toSet
    assert(scrambled == base)
  }

  test("tableChecksums: a single changed row moves exactly its table's checksum") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ck2").toString
    val names = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    names.foreach { n =>
      val t = spark.read.parquet(s"$sf/$n.parquet")
      val out =
        if (n == "nation") t.withColumn("n_name",
          when(col("n_nationkey") === 0, lit("TAMPERED")).otherwise(col("n_name")))
        else t
      out.write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    val base = Validator.tableChecksums(spark, sf)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val tam = Validator.tableChecksums(spark, dir)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(tam("nation")._1 == base("nation")._1, "row count unchanged")
    assert(tam("nation")._2 != base("nation")._2, "nation checksum moved")
    (names.toSet - "nation").foreach { n =>
      assert(tam(n) == base(n), s"$n untouched")
    }
  }

  test("bigramNll: repeated-phrase boilerplate scores below novel word salad") {
    // two docs, same length: one repeats a two-word phrase (high bigram
    // probability after smoothing), one never repeats a transition. The
    // bigram score must separate them in the right direction.
    val dir = java.nio.file.Files.createTempDirectory("graft_bg").toString
    val boiler = Seq.fill(20)("click here").mkString(" ")
    val salad = (0 until 40).map(i => s"w$i").mkString(" ")
    Seq((1L, boiler), (2L, salad)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.bigramNll(spark, dir)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(got(1L) < got(2L),
      s"boilerplate ${got(1L)} must score below salad ${got(2L)}")
    spark.catalog.clearCache()
  }
}
