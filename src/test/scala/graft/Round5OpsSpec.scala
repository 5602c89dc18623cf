package graft

import org.apache.spark.sql.functions._
import graft.ops.{Graph, TextPrep}

/** Round-5 additions: degree-ordered triangle counting, BPE merge
  * induction, and cross-document repeated-span detection. Each operator
  * is checked against an independent Scala recomputation (different
  * algorithm where possible), never against itself. */
class Round5OpsSpec extends SparkSpec {
  import spark.implicits._

  // ----------------------------------------------------------- triangles
  /** Reference triangle counts by brute-force enumeration over the same
    * co-purchase edge definition (distinct parts per order, all canonical
    * u<v pairs, any order). */
  private def naiveTriangles(): Map[Long, Long] = {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey").as[(Long, Long)].collect()
    val edges: Set[(Long, Long)] = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.toSeq
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.toSet
    val adj = edges.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val counts = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for ((u, v) <- edges; w <- adj(u) if w > v && adj(v).contains(w)) {
      counts(u) += 1; counts(v) += 1; counts(w) += 1
    }
    counts.toMap
  }

  test("triangles: degree-ordered counts equal brute-force enumeration") {
    val want = naiveTriangles()
    val got = Graph.triangles(spark, sf)
      .as[(Long, Long)].collect().toMap
    assert(got == want)
    assert(got.nonEmpty)
    spark.catalog.clearCache()
  }

  test("triangles: hub-heavy star+clique graph — orientation bounds the hub") {
    // a 4-clique with a hub attached to everything: the naive u<v wedge
    // join enumerates all hub wedges; the degree orientation must still
    // produce exact counts (hub participates only via its 2-paths that
    // close). K4 has C(4,3)=4 triangles; hub+each clique edge adds 6.
    val clique = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    val star = (1L to 4L).map(p => (100L, p))
    // encode as orders: one two-part order per edge
    val li = (clique ++ star).zipWithIndex.flatMap { case ((a, b), i) =>
      Seq((i.toLong, a), (i.toLong, b))
    }.toDF("l_orderkey", "l_partkey")
      .withColumn("l_quantity", lit(1.0))
    val dir = java.nio.file.Files.createTempDirectory("graft_tri").toString
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Graph.triangles(spark, dir).as[(Long, Long)].collect().toMap
    // per node: each clique vertex is in 3 clique triangles + 3 hub
    // triangles (with its 3 clique neighbors); hub closes every clique
    // edge → 6
    val want = (1L to 4L).map(_ -> 6L).toMap + (100L -> 6L)
    assert(got == want)
    spark.catalog.clearCache()
  }

  // ---------------------------------------------------------- bpeMerges
  test("bpeMerges: top pairs equal an independent word-frequency recount") {
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").as[String].collect()
    val wordFreq = texts.flatMap(_.trim.toLowerCase.split("\\s+"))
      .filter(_.length >= 2)
      .groupBy(identity).map { case (w, g) => w -> g.length.toLong }
    val pairCount = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for ((w, f) <- wordFreq; i <- 0 until w.length - 1)
      pairCount(w.substring(i, i + 2)) += f
    val want = pairCount.toSeq.sortBy { case (p, c) => (-c, p) }.take(40)

    val got = TextPrep.bpeMerges(spark, sf)
      .as[(String, Long)].collect().toSeq
    assert(got == want)
    assert(got.size == 40)
  }

  // ------------------------------------------------------ repeatedSpans
  /** hash60 as the engine defines it: top 60 bits of md5 = first 15 hex
    * digits parsed base-16. */
  private def hash60(s: String): Long =
    java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s).take(15), 16)

  test("repeatedSpans: planted shared passage is found; unique docs are not") {
    val shared = (1 to 8).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $shared gamma"),
      (2L, s"$shared delta epsilon zeta"),
      (3L, "unique words only here never repeated across documents at all"),
      // within-doc repeat must NOT count as cross-doc
      (4L, s"$shared filler one two three four five six seven $shared")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_spans").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextPrep.repeatedSpans(spark, dir)
      .select("span_hash", "n_docs", "first_doc")
      .as[(Long, Long, Long)].collect()
    // the 8-token shared span appears in docs 1, 2, 4 → n_docs = 3
    val hit = got.find(_._1 == hash60(shared))
    assert(hit.exists(r => r._2 == 3L && r._3 == 1L))
    // no span from the unique doc appears
    assert(got.forall(_._3 != 3L))
  }

  test("repeatedSpans: n_docs is distinct-document frequency on the corpus") {
    val r = TextPrep.repeatedSpans(spark, sf).collect()
    assert(r.forall(_.getAs[Long]("n_docs") >= 2L))
    // cross-check one span family: recompute doc frequencies in Scala
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    val df = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val firsts = collection.mutable.Map.empty[String, Long]
    for ((id, t) <- docs.sortBy(_._1)) {
      val tk = t.trim.toLowerCase.split("\\s+")
      val spans = tk.sliding(8).filter(_.length == 8).map(_.mkString(" ")).toSeq.distinct
      for (s <- spans) {
        df(s) += 1
        if (!firsts.contains(s)) firsts(s) = id
      }
    }
    val want = df.filter(_._2 >= 2).map { case (s, n) =>
      (hash60(s), n, firsts(s))
    }.toSet
    val gotSet = r.map(x => (x.getAs[Long]("span_hash"),
      x.getAs[Long]("n_docs"), x.getAs[Long]("first_doc"))).toSet
    assert(gotSet == want)
  }
}
