package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, IncrementalDedup}

class IncrementalDedupSpec extends SparkSpec {

  test("streaming classification equals batch classification micro-batch by micro-batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all = graft.core.Tables.documents(spark, sf).select("doc_id", "text")
    val corpus = all.filter(col("doc_id") < 400)
    val batchDocs = all.filter(col("doc_id") >= 400)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val index = IncrementalDedup.buildIndex(spark, corpus)

    val wh = new graft.connect.ParquetWarehouse(
      java.nio.file.Files.createTempDirectory("graft_stream_dedup").toString)
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = IncrementalDedup.classifyStream(
      input.toDS().toDF("doc_id", "text"), index, wh, "dedup",
      "/tmp/graft_ckpt_inc_" + System.nanoTime(),
      graft.core.RunDate("2024-06-01")).start()
    try {
      val (b1, b2) = batchDocs.splitAt(batchDocs.length / 2)
      input.addData(b1.toIndexedSeq); q.processAllAvailable()
      input.addData(b2.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()

    val streamed = wh.readHistory(spark, "dedup")
      .select("doc_id", "status", "dup_of").collect()
      .map(r => (r.getLong(0), r.getString(1),
                 if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    val batch = IncrementalDedup.classify(spark,
        all.filter(col("doc_id") >= 400), index)
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
                 if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(streamed == batch)
  }

  test("segment scrub: indexed boilerplate drops, unique text survives, stream == batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // index corpus: one 30-token boilerplate segment (w0..w29)
    val boiler = (0 until 30).map(i => s"w$i").mkString(" ")
    val fresh = (0 until 30).map(i => s"u$i").mkString(" ")
    val corpus = Seq((1L, boiler)).toDF("doc_id", "text")
    val idx = IncrementalDedup.buildSegmentIndex(spark, corpus)

    // batch semantics: doc 10 = boilerplate + fresh -> fresh survives;
    // doc 11 = boilerplate only -> scrubbed empty
    val batch = Seq((10L, s"$boiler $fresh"), (11L, boiler))
      .toDF("doc_id", "text")
    val out = IncrementalDedup.scrubSegments(spark, batch, idx)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(out(10L) == ((2L, 1L, 30L, fresh)))
    assert(out(11L) == ((1L, 0L, 0L, "")))

    // streaming twin over corpus docs: two micro-batches through the
    // epoch-keyed warehouse sink equal the one-shot batch scrub
    val all = graft.core.Tables.documents(spark, sf).select("doc_id", "text")
    val corpusIdx = IncrementalDedup.buildSegmentIndex(spark,
      all.filter(col("doc_id") < 400)).persist()
    val newDocs = all.filter(col("doc_id") >= 400)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val wh = new graft.connect.ParquetWarehouse(
      java.nio.file.Files.createTempDirectory("graft_scrub_wh").toString)
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = IncrementalDedup.scrubStream(
      input.toDS().toDF("doc_id", "text"), corpusIdx, wh, "scrubbed",
      "/tmp/graft_ckpt_scrub_" + System.nanoTime(),
      graft.core.RunDate("2024-06-01")).start()
    try {
      val (b1, b2) = newDocs.splitAt(newDocs.length / 2)
      input.addData(b1.toIndexedSeq); q.processAllAvailable()
      input.addData(b2.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    def keyed(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "n_segments", "n_kept", "kept_tokens", "kept_text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getString(4))).toSet
    val streamed = keyed(wh.readHistory(spark, "scrubbed"))
    val oneShot = keyed(IncrementalDedup.scrubSegments(spark,
      all.filter(col("doc_id") >= 400), corpusIdx))
    corpusIdx.unpersist()
    assert(streamed == oneShot && oneShot.nonEmpty)
  }

  test("new batch classifies as exact_dup / near_dup / new against the index") {
    val all = graft.core.Tables.documents(spark, sf).select("doc_id", "text")
    val corpus = all.filter(col("doc_id") < 400)
    val batch = all.filter(col("doc_id") >= 400)

    val index = IncrementalDedup.buildIndex(spark, corpus)
    val out = IncrementalDedup.classify(spark, batch, index)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap

    // every batch doc got classified
    assert(out.size == batch.count())

    // cross-boundary near-dup pairs from the full-corpus exact jaccard:
    // (old < 400, new >= 400) — the new side must be flagged near_dup of
    // the old side (LSH recall caveat: require most, not all)
    val crossPairs = Dedup.jaccardPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => a < 400 && b >= 400 }
    assert(crossPairs.nonEmpty, "corpus should have cross-boundary near-dups")
    val byNewDoc = crossPairs.groupBy(_._2).view.mapValues(_.map(_._1).min)
    val flagged = byNewDoc.count { case (b, minA) =>
      out(b)._1 == "near_dup" && out(b)._2 == minA
    }
    assert(flagged.toDouble / byNewDoc.size >= 0.7)

    // a re-presented corpus doc is an exact_dup of itself
    val represented = IncrementalDedup.classify(spark,
      all.filter(col("doc_id") === 7), index).collect()(0)
    assert(represented.getString(1) == "exact_dup" && represented.getLong(2) == 7L)

    // docs with no high-similarity partner below 400 classify as new
    val newOnes = out.filter(_._2._1 == "new")
    assert(newOnes.nonEmpty)
  }
}
