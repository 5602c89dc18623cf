package graft.ops

import graft.core.Caches.TrackedDataset
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental deduplication: classify a NEW batch of documents against
  * an existing corpus index — the shape a production ingest runs daily,
  * where re-deduplicating 100 TB of history per batch is not an option.
  *
  * The index is two compact tables (both keyed by doc, both natural
  * warehouse artifacts, e.g. via [[graft.connect.ParquetWarehouse]]):
  *   - fingerprints: (doc_id, exact_fp)
  *   - signatures:   (doc_id, sgl, mh_0..mh_15)
  *
  * Classification is join-only against the index: new-batch exact
  * fingerprints probe the fingerprint table; new-batch LSH band keys
  * probe the banded signature table and candidates verify with exact
  * Jaccard against the stored shingle sets. Shuffle volume is
  * O(new batch), never O(corpus).
  */
object IncrementalDedup {

  final case class Index(fingerprints: DataFrame, signatures: DataFrame)

  /** Build the dedup index for a corpus of (doc_id, text). */
  def buildIndex(spark: SparkSession, corpus: DataFrame): Index =
    Index(
      fingerprints = Dedup.fingerprints(corpus),
      signatures = Dedup.signatures(spark, corpus))

  /** Classify each new document: `exact_dup` (same normalized content as
    * an indexed doc), `near_dup` (3-gram Jaccard ≥ 0.8 with an indexed
    * doc via LSH candidates), or `new`. `dup_of` is the lowest matching
    * indexed doc_id, null for `new`. */
  def classify(spark: SparkSession, newDocs: DataFrame, index: Index): DataFrame = {
    val newFps = Dedup.fingerprints(newDocs)
    val exact = newFps.join(
        index.fingerprints
          .withColumnRenamed("doc_id", "idx_doc_id"), Seq("exact_fp"))
      .groupBy(col("doc_id"))
      .agg(min(col("idx_doc_id")).as("exact_dup_of"))

    val newSig = Dedup.signatures(spark, newDocs)
      .trackPersist()
    val idxSig = index.signatures
      .trackPersist()
    val cand = Dedup.bandKeysOf(newSig).as("n")
      .join(Dedup.bandKeysOf(idxSig).as("i"), Seq("band", "key"))
      .select(col("n.doc_id").as("doc_id"), col("i.doc_id").as("idx_doc_id"))
      .distinct()
    val near = cand
      .join(newSig.select(col("doc_id"), col("sgl").as("sgl_n")), Seq("doc_id"))
      .join(idxSig.select(col("doc_id").as("idx_doc_id"), col("sgl").as("sgl_i")),
            Seq("idx_doc_id"))
      .withColumn("inter", size(array_intersect(col("sgl_n"), col("sgl_i"))))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (size(col("sgl_n")) + size(col("sgl_i")) - col("inter")))
      .filter(col("jaccard") >= 0.8)
      .groupBy(col("doc_id"))
      .agg(min(col("idx_doc_id")).as("near_dup_of"))

    newDocs.select(col("doc_id"))
      .join(exact, Seq("doc_id"), "left")
      .join(near, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("exact_dup_of").isNotNull, "exact_dup")
          .when(col("near_dup_of").isNotNull, "near_dup")
          .otherwise("new").as("status"),
        coalesce(col("exact_dup_of"), col("near_dup_of")).as("dup_of"))
  }

  /** Streaming classification: every micro-batch of documents is
    * classified against the static index and appended to the warehouse.
    * foreachBatch turns each micro-batch into a plain DataFrame, so the
    * exact batch [[classify]] logic runs unchanged — stream-vs-batch
    * parity by construction, no separate streaming code path. The index
    * stays fixed for the stream's lifetime; rebuilding it (e.g. nightly,
    * folding in the day's accepted docs) is a batch concern.
    *
    * The append goes through the EPOCH-KEYED idempotent sink
    * ([[graft.connect.Warehouse.appendHistoryBatch]]): foreachBatch is
    * at-least-once, and the plain daily append would duplicate a replayed
    * micro-batch after a crash (it would also clobber earlier same-day
    * batches under the day-scoped idempotent daily write). */
  def classifyStream(stream: DataFrame, index: Index,
                     warehouse: graft.connect.Warehouse, entity: String,
                     checkpoint: String, runDate: graft.core.RunDate)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) {
          val classified = graft.ops.Exp.stampDayDt(
            classify(batch.sparkSession, batch, index), runDate)
          warehouse.appendHistoryBatch(classified, entity, epochId)
        }
      }

  // -------------------------------------------------- segment-grain scrub

  /** Segment index for the incremental scrub: the distinct segment
    * hashes of the reference corpus — a natural warehouse artifact
    * (hash-only, ~16 bytes/segment; the text stays in the corpus). */
  def buildSegmentIndex(spark: SparkSession, corpus: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    Dedup.segmentsOf(corpus).select(col("seg_md5")).distinct()
  }

  /** Scrub an incoming batch against a segment index: every
    * [[Dedup.segmentsOf]]-grain segment whose text already exists in the
    * index is DROPPED and the document reassembled from the rest — the
    * incremental (O(batch) probe) twin of [[Dedup.segmentDedup]]'s
    * corpus-wide pass, emitting the actual cleaned text (sink-bound,
    * not oracle-bound). A doc whose every segment is indexed boilerplate
    * comes out with empty text and `n_kept = 0` — the caller's drop
    * signal. Join shape: one left_anti-style probe of batch segments
    * against the hash index, then a per-doc sorted fold; nothing is
    * proportional to the corpus. */
  def scrubSegments(spark: SparkSession, batch: DataFrame,
                    segmentIndex: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val seg = Dedup.segmentsOf(batch)
    val kept = seg.join(segmentIndex, Seq("seg_md5"), "left_anti")
    seg.groupBy(col("doc_id")).agg(count(lit(1)).as("n_segments"))
      .join(
        kept.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_kept"),
               sum(col("n_tok")).as("kept_tokens"),
               concat_ws(" ", transform(
                 array_sort(collect_list(struct(col("seg_id"), col("seg_text")))),
                 s => s.getField("seg_text"))).as("kept_text")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_segments"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        coalesce(col("kept_text"), lit("")).as("kept_text"))
  }

  /** Streaming scrub: each micro-batch of documents is scrubbed against
    * the static segment index and appended to the warehouse through the
    * epoch-keyed idempotent sink (same at-least-once reasoning as
    * [[classifyStream]]). */
  def scrubStream(stream: DataFrame, segmentIndex: DataFrame,
                  warehouse: graft.connect.Warehouse, entity: String,
                  checkpoint: String, runDate: graft.core.RunDate)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) {
          val scrubbed = graft.ops.Exp.stampDayDt(
            scrubSegments(batch.sparkSession, batch, segmentIndex), runDate)
          warehouse.appendHistoryBatch(scrubbed, entity, epochId)
        }
      }

  /** Oracle-checked query: index the docs with doc_id < [[SplitAt]],
    * classify the rest as an incoming batch. */
  val SplitAt = 400L

  def query(spark: SparkSession, dir: String): DataFrame = {
    val all = graft.core.Tables.documents(spark, dir).select("doc_id", "text")
    val corpus = all.filter(col("doc_id") < SplitAt)
    val batch = all.filter(col("doc_id") >= SplitAt)
    classify(spark, batch, buildIndex(spark, corpus))
  }

  val oracle: String = {
    import Dedup.{Bands, HashA, HashB, M30, MinHashP, NumHashes, RowsPerBand}
    def shingleCte(src: String, name: String): String =
      s"""$name AS (
         |  SELECT doc_id,
         |         list_distinct(list_transform(
         |           CASE WHEN len(tk) >= 3 THEN list_distinct(
         |             list_transform(generate_series(1, len(tk) - 2),
         |                            i -> array_to_string(list_slice(tk, i, i + 2), ' ')))
         |                ELSE [] END,
         |           s -> CAST(CAST(('0x' || substr(md5(s), 1, 15)) AS UBIGINT) AS BIGINT))) AS sgl
         |  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
         |        FROM $src))""".stripMargin
    def sigCte(sh: String, name: String): String = {
      val mh = (0 until NumHashes).map(i =>
        s"list_min(list_transform(sgl, h -> ((h & $M30) * ${HashA(i)} + ${HashB(i)}) % $MinHashP)) AS mh_$i")
        .mkString(", ")
      s"$name AS (SELECT doc_id, sgl, $mh FROM $sh WHERE len(sgl) > 0)"
    }
    def bandCte(sig: String, name: String): String = {
      val sel = (0 until Bands).map { b =>
        val parts = (0 until RowsPerBand).map(r => s"mh_${b * RowsPerBand + r}")
        s"SELECT doc_id, $b AS band, md5(${parts.mkString(" || '|' || ")}) AS key FROM $sig"
      }.mkString(" UNION ALL ")
      s"$name AS ($sel)"
    }
    s"""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < $SplitAt),
       |batch AS (SELECT doc_id, text FROM documents WHERE doc_id >= $SplitAt),
       |fp_c AS (SELECT doc_id, md5(array_to_string(string_split_regex(trim(lower(text)), '\\s+'), ' ')) AS exact_fp FROM corpus),
       |fp_b AS (SELECT doc_id, md5(array_to_string(string_split_regex(trim(lower(text)), '\\s+'), ' ')) AS exact_fp FROM batch),
       |exact AS (
       |  SELECT b.doc_id, min(c.doc_id) AS exact_dup_of
       |  FROM fp_b b JOIN fp_c c ON b.exact_fp = c.exact_fp GROUP BY 1),
       |${shingleCte("corpus", "sh_c")},
       |${shingleCte("batch", "sh_b")},
       |${sigCte("sh_c", "sig_c")},
       |${sigCte("sh_b", "sig_b")},
       |${bandCte("sig_c", "band_c")},
       |${bandCte("sig_b", "band_b")},
       |cand AS (
       |  SELECT b.doc_id, c.doc_id AS idx_doc_id
       |  FROM band_b b JOIN band_c c ON b.band = c.band AND b.key = c.key
       |  GROUP BY 1, 2),
       |near AS (
       |  SELECT cand.doc_id, min(cand.idx_doc_id) AS near_dup_of
       |  FROM cand
       |  JOIN sig_b ON cand.doc_id = sig_b.doc_id
       |  JOIN sig_c ON cand.idx_doc_id = sig_c.doc_id
       |  WHERE len(list_intersect(sig_b.sgl, sig_c.sgl)) * 1.0 /
       |        (len(sig_b.sgl) + len(sig_c.sgl) - len(list_intersect(sig_b.sgl, sig_c.sgl))) >= 0.8
       |  GROUP BY 1)
       |SELECT b.doc_id,
       |       CASE WHEN e.exact_dup_of IS NOT NULL THEN 'exact_dup'
       |            WHEN n.near_dup_of IS NOT NULL THEN 'near_dup'
       |            ELSE 'new' END AS status,
       |       coalesce(e.exact_dup_of, n.near_dup_of) AS dup_of
       |FROM batch b
       |LEFT JOIN exact e ON b.doc_id = e.doc_id
       |LEFT JOIN near n ON b.doc_id = n.doc_id
       |""".stripMargin
  }
  // -------------------------------------------------- bloom-prefiltered probe

  /** Exact-duplicate probe of a new batch against a fingerprint index
    * with a BLOOM-FILTER PREFILTER — the shape that keeps the daily
    * ingest probe map-side at 100 TB. [[classify]]'s exact arm joins the
    * WHOLE batch's fingerprints against the index; here the index first
    * collapses into one Bloom blob (Spark's native `BloomFilterAggregate`
    * via `graft_bloom_agg`, a distributed fold), the batch is filtered
    * map-side with `might_contain` — no shuffle for the overwhelming
    * non-duplicate majority — and only the surviving CANDIDATES meet the
    * index in an exact confirm join that removes Bloom false positives.
    * False negatives are impossible, so the result is IDENTICAL to the
    * plain exact probe (which is exactly what the oracle checks): the
    * Bloom filter changes the plan, never the answer.
    *
    * Join shape after the prefilter: the candidate set (≈ dup-rate ×
    * batch + fpp × batch) is broadcast against the index scan, so the
    * index never shuffles; the per-doc `min` then aggregates only actual
    * matches. The index IS scanned twice (Bloom build + confirm probe) —
    * two columnar scans of a hash-only warehouse table, no
    * recomputation. Size `expectedItems` to the index cardinality; the
    * blob is `max(8 × items, 1 MiB)` bits (~1 GiB per 10⁹ indexed docs —
    * broadcastable; past that, shard the index by hash prefix and run
    * one probe per shard). */
  def bloomClassify(spark: SparkSession, newDocs: DataFrame,
                    fingerprints: DataFrame,
                    expectedItems: Long = 1000000L): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    import graft.functions.GraftFunctions.{BloomAggName, BloomContainsName}
    val idx = fingerprints.withColumnRenamed("doc_id", "idx_doc_id")
    val bf: Array[Byte] = idx
      .agg(call_function(BloomAggName, xxhash64(col("exact_fp")),
        lit(expectedItems), lit((expectedItems * 8).max(1048576L))).as("bf"))
      .collect()(0).getAs[Array[Byte]]("bf")
    val candidates = Dedup.fingerprints(newDocs)
      .filter(call_function(BloomContainsName, lit(bf),
        xxhash64(col("exact_fp"))))
    val confirmed = idx.join(broadcast(candidates), Seq("exact_fp"))
      .groupBy(col("doc_id"))
      .agg(min(col("idx_doc_id")).as("dup_of"))
    newDocs.select(col("doc_id"))
      .join(confirmed, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("dup_of").isNotNull, "exact_dup").otherwise("new")
          .as("status"),
        col("dup_of"))
  }

  /** Oracle-checked query for the Bloom-prefiltered probe: same
    * [[SplitAt]] split as [[query]]. The oracle is the PLAIN exact
    * probe — Bloom is a plan optimization with an unchanged answer, and
    * hash-matching the unfiltered SQL is precisely the proof. */
  def bloomQuery(spark: SparkSession, dir: String): DataFrame = {
    val all = graft.core.Tables.documents(spark, dir).select("doc_id", "text")
    val corpus = all.filter(col("doc_id") < SplitAt)
    val batch = all.filter(col("doc_id") >= SplitAt)
    bloomClassify(spark, batch, Dedup.fingerprints(corpus))
  }

  val bloomOracle: String =
    s"""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < $SplitAt),
       |batch AS (SELECT doc_id, text FROM documents WHERE doc_id >= $SplitAt),
       |fp_c AS (SELECT doc_id, md5(array_to_string(string_split_regex(trim(lower(text)), '\\s+'), ' ')) AS exact_fp FROM corpus),
       |fp_b AS (SELECT doc_id, md5(array_to_string(string_split_regex(trim(lower(text)), '\\s+'), ' ')) AS exact_fp FROM batch),
       |conf AS (
       |  SELECT b.doc_id, min(c.doc_id) AS dup_of
       |  FROM fp_b b JOIN fp_c c ON b.exact_fp = c.exact_fp GROUP BY 1)
       |SELECT b.doc_id,
       |       CASE WHEN conf.dup_of IS NOT NULL THEN 'exact_dup' ELSE 'new' END AS status,
       |       conf.dup_of
       |FROM batch b LEFT JOIN conf ON b.doc_id = conf.doc_id
       |""".stripMargin
}
