package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.ops.Dedup

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens: lower-cases, trims, splits on runs of whitespace") {
    val out = Seq("  Hello   World  ").toDF("text")
      .select(tokens(col("text"))).collect()(0).getSeq[String](0)
    assert(out == Seq("hello", "world"))
  }

  test("shingles: distinct n-grams; short docs give empty array") {
    val df = Seq("a b c d", "a b").toDF("text")
      .select(shingles(tokens(col("text")), 3).as("s"))
    val rows = df.collect().map(_.getSeq[String](0))
    assert(rows(0) == Seq("a b c", "b c d"))
    assert(rows(1).isEmpty)
  }

  test("hash60 equals driver-side md5 prefix and is non-negative") {
    val h = Seq("token").toDF("t").select(hash60(col("t"))).collect()(0).getLong(0)
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("token".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(h == java.lang.Long.parseLong(hex.take(15), 16))
    assert(h >= 0)
  }

  test("vocabRatio counts token occurrences, not distinct hits") {
    val r = Seq("the cat the dog").toDF("text")
      .select(vocabRatio(tokens(col("text")), Seq("the"))).collect()(0).getDouble(0)
    assert(r == 0.5)
  }

  test("bpeTokenCount splits letter runs, digit runs, punctuation") {
    val n = Seq("ab12 cd!").toDF("text")
      .select(bpeTokenCount(col("text"))).collect()(0).getInt(0)
    assert(n == 4) // ab | 12 | cd | !
  }
}

class DedupSpec extends SparkSpec {

  test("exact dedup groups identical normalized texts on the corpus") {
    val out = Dedup.exact(spark, sf)
    // every doc appears exactly once and canonical <= doc_id
    val rows = out.collect()
    assert(rows.length == out.select("doc_id").distinct().count())
    assert(rows.forall(r => r.getLong(r.fieldIndex("canonical_id")) <=
      r.getLong(r.fieldIndex("doc_id"))))
  }

  test("minhash LSH finds the same high-similarity pairs as exact jaccard") {
    val exact = Dedup.jaccardPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // LSH is a candidate filter + exact verify: never a false positive
    // (subset), and recall at J>=0.8 with 4x4 bands is
    // 1-(1-J^4)^4 ~ 0.87+ per pair — assert a conservative floor
    assert(lsh.subsetOf(exact))
    assert(lsh.size.toDouble >= exact.size * 0.8)
  }

  test("lsh recall sweep: recall is monotone in band count, default holds its floor") {
    val r = Dedup.lshRecall(spark, sf).collect()
      .map(row => row.getString(0) ->
        (row.getLong(1), row.getLong(2), row.getDouble(3))).toMap
    assert(r.keySet == Set("minhash_8x2", "minhash_lsh", "minhash_2x8",
      "minhash_w32_8x4", "minhash_w64_16x4"))
    r.values.foreach { case (t, m, rec) =>
      assert(t > 0 && m >= 0 && m <= t && rec >= 0.0 && rec <= 1.0)
    }
    // collision prob 1-(1-J^rows)^bands is increasing in bands at fixed
    // signature width: 2x8 <= 4x4 (default) <= 8x2
    assert(r("minhash_2x8")._3 <= r("minhash_lsh")._3 + 1e-9)
    assert(r("minhash_lsh")._3 <= r("minhash_8x2")._3 + 1e-9)
    assert(r("minhash_lsh")._3 >= 0.8,
      s"default 4x4 recall ${r("minhash_lsh")._3} below floor")
    // the signature-WIDTH lever: more components at the same 4-row
    // bands only adds bands, so recall is monotone in width too, and
    // the 64-component config holds the >=0.99 borderline-pair floor
    // (measured 1.0 at sf0.1 after the mod-prime decorrelation fix)
    assert(r("minhash_lsh")._3 <= r("minhash_w32_8x4")._3 + 1e-9)
    assert(r("minhash_w32_8x4")._3 <= r("minhash_w64_16x4")._3 + 1e-9)
    assert(r("minhash_w64_16x4")._3 >= 0.99,
      s"w64 recall ${r("minhash_w64_16x4")._3} below floor")
    graft.core.Caches.release(spark)
  }

  test("components: transitive chains collapse to one cluster with min label") {
    import spark.implicits._
    // chain 1~2~3, pair 10~11, chain 20~21~22~23 (longer than one hop)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (22L, 23L), (21L, 22L),
                    (20L, 21L)).toDF("doc_a", "doc_b")
    val out = Dedup.components(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
                      10L -> 10L, 11L -> 10L,
                      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L))
  }

  test("simhash of identical docs is identical; near-dup pairs are symmetric-free") {
    val pairs = Dedup.simhashPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.forall { case (a, b) => a < b })
    assert(pairs.distinct.length == pairs.length)
  }

  test("jaccard df-cap: dropped mass is counted, capped pairs stay a subset") {
    import spark.implicits._
    // every doc opens with the SAME 3 tokens (one ubiquitous shingle,
    // df = 12); docs 1 and 2 are fully identical 20-token texts, all
    // other docs have unique tails
    val common = "alpha beta gamma"
    val dupTail = (1 to 17).map(j => s"w$j").mkString(" ")
    val docs = Seq(
      (1L, s"$common $dupTail"), (2L, s"$common $dupTail")) ++
      (3L to 12L).map(i => (i, s"$common " + (1 to 17).map(j => s"u${i}x$j").mkString(" ")))
    val df = docs.toDF("doc_id", "text")
    try {
      // uncapped (maxDf = MaxValue) is the exact result: only (1,2) at 1.0
      val exact = Dedup.jaccardPairsCapped(spark, df, Int.MaxValue)
      assert(exact.pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSeq == Seq((1L, 2L, 1.0)))
      val exactMass = exact.droppedMass.head()
      assert(exactMass.getLong(0) == 0L && exactMass.getLong(1) == 0L)

      // cap at df <= 5: the ubiquitous shingle is dropped and REPORTED
      val capped = Dedup.jaccardPairsCapped(spark, df, maxDf = 5)
      val mass = capped.droppedMass.head()
      assert(mass.getLong(0) == 1L, "one stop-shingle dropped")
      assert(mass.getLong(1) == 12L, "its 12 postings counted as dropped mass")
      assert(mass.getLong(2) == exactMass.getLong(2), "total postings unchanged")
      // capped jaccard underestimates: (1,2) loses the dropped shingle
      // (17/19 ~ 0.8947, still over threshold) and no new pair appears
      val got = capped.pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(got.toSeq == Seq((1L, 2L, 0.894737)))
    } finally graft.core.Caches.release(spark)
  }

  private def messageChain(e: Throwable): String =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")

  test("globalCumsum rejects null and fractional values loudly") {
    import spark.implicits._
    val withNull = Seq(Some(1L), None, Some(3L)).toDF("v")
      .withColumn("k", col("v"))
    val e1 = intercept[Exception] {
      graft.ops.Rnk.globalCumsum(withNull, Seq(col("k")), col("v")).collect()
    }
    assert(messageChain(e1).contains("globalCumsum"), messageChain(e1))
    val fractional = Seq(1.0, 2.5).toDF("v").withColumn("k", col("v"))
    val e2 = intercept[Exception] {
      graft.ops.Rnk.globalCumsum(fractional, Seq(col("k")), col("v")).collect()
    }
    assert(messageChain(e2).contains("globalCumsum"), messageChain(e2))
    graft.core.Caches.release(spark)
  }
}
