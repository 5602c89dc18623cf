package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.CdcChunker

/** Binary-level dedup via content-defined chunking — the layer BELOW
  * text dedup: raw crawl payloads (documents re-fetched behind new
  * headers, mirrored archives, re-wrapped containers) share megabytes
  * of bytes at DIFFERENT offsets, and neither whole-payload hashing
  * nor fixed-block hashing sees any of it. Gear-CDC boundaries
  * ([[graft.functions.CdcChunker]]) re-synchronize after an insertion,
  * so the shared region chunks identically in both payloads and one
  * equi-join on chunk digests surfaces every pair.
  *
  * Scale shape: chunking is a pure per-payload pass (map-only,
  * embarrassingly parallel); only (doc_id, 16-byte digest) rows enter
  * the shuffle — never payload bytes; the digest groupBy is
  * map-side-combined and the pair join touches only digests that
  * actually repeat (the unique-chunk long tail drops at the first
  * aggregate). At 100 TB this is exactly the dedup pass object stores
  * run, one corpus-linear shuffle of 16-byte keys.
  *
  * Fixture (formula-predictable, same device as the media twins): per
  * document a 6 KiB pseudorandom content payload and a shifted twin —
  * the SAME content behind a 37–137 byte header whose length is never
  * ≡ 0 (mod any block size) — so fixed-block hashing finds zero shared
  * blocks while CDC must recover every (id, id+twin) pair. The shared
  * region is ≫ 2·MaxChunk + GearWindow, so the re-synchronization
  * guarantee applies and detection is deterministic at every scale.
  */
object ChunkDedup {

  private val TwinSpace = 1000000000L
  private[graft] val ContentLen = 6144

  /** SplitMix64 byte stream from a seed — the payload filler. */
  private[graft] def prngBytes(seed: Long, n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var x = seed
    var i = 0
    while (i < n) {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      var k = 0
      while (k < 8 && i < n) { out(i) = (z >>> (8 * k)).toByte; i += 1; k += 1 }
    }
    out
  }

  private[graft] def headerLen(id: Long): Int = 37 + (id % 101).toInt

  /** Header bytes for a twin. The seed's HIGH BIT pins headers into
    * their own seed space: content seeds (`id·1009+7`) are small, so
    * without the separation the affine collision `1009a+7 = 2017b+13`
    * (solvable at a ≈ 2b, one hit per ~2017 ids) makes doc b's header
    * byte-identical to a PREFIX of doc a's content — whenever a chunk
    * boundary lands inside that prefix the two payloads legitimately
    * share a chunk and the "exactly the twin pairs" oracle breaks
    * (measured: 5 such pairs at 100k payloads in the sf1 sweep, 0 at
    * 10k — a fixture defect only visible at scale). */
  private[graft] def headerBytes(id: Long): Array[Byte] =
    prngBytes((id * 2017 + 13) | Long.MinValue, headerLen(id))

  /** Per document: the raw payload and its shifted twin. */
  def payloads(spark: SparkSession, dir: String): Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val content = prngBytes(id * 1009 + 7, ContentLen)
          Seq((id, content), (id + TwinSpace, headerBytes(id) ++ content))
        }
      }
  }

  /** (doc_id, chunk_md5) rows — distinct per doc — for an arbitrary
    * payload set; the reusable grain of the dedup join.
    *
    * Only FULL-SIZED chunks (length ≥ [[CdcChunker.MinChunk]]) enter
    * the index, with one exception: a chunk that IS the whole payload
    * (so exact duplicates of sub-MinChunk payloads still pair). The
    * chunker's final fragment can be arbitrarily short — 1..63 bytes of
    * residue after the last content boundary — and a fragment that
    * small has too little entropy to be a dedup signal: any two
    * payloads ending in the same byte would "share a chunk", which is
    * a Θ(N²/256^len) spurious-pair explosion at corpus scale (measured:
    * 237 spurious pairs at 100k payloads — the sf1 oracle sweep caught
    * it — trending quadratic; legitimate duplicate regions longer than
    * 2·MaxChunk + GearWindow always share a full-sized chunk, so
    * detection loses nothing). */
  def chunkIndexOf(payloads: Dataset[(Long, Array[Byte])]): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads
      .mapPartitions { rows =>
        rows.flatMap { case (id, b) =>
          CdcChunker.chunks(b).iterator.collect {
            case (off, len, h)
                if len >= CdcChunker.MinChunk ||
                  (off == 0 && len == b.length) => (id, h)
          }
        }
      }
      .toDF("doc_id", "chunk_md5")
      .distinct()
  }

  /** Detected payload pairs sharing at least one content-defined
    * chunk: (doc_a, doc_b), a < b. On the fixture this is exactly the
    * twin pair set — the oracle predicts it by formula. */
  def chunkDedupQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.Caches.TrackedDataset
    // persist the digest index: it feeds both the repeat-digest
    // aggregate and the pair join, and re-deriving it would re-chunk
    // every payload (the expensive byte pass) once per consumer
    val idx = chunkIndexOf(payloads(spark, dir)).trackPersist()
    // digests that appear in ≥2 docs — drops the unique long tail
    // before any join (map-side-combined aggregate)
    val shared = idx.groupBy(col("chunk_md5"))
      .agg(count(lit(1)).as("nd")).filter(col("nd") >= 2)
      .select(col("chunk_md5"))
    val hits = idx.join(shared, "chunk_md5")
    hits.as("x").join(hits.as("y"),
        col("x.chunk_md5") === col("y.chunk_md5") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
  }

  val chunkDedupOracle: String =
    s"""SELECT doc_id AS doc_a, doc_id + $TwinSpace AS doc_b
       |FROM documents
       |""".stripMargin

  /** Index the chunks of base payloads below this id; probe every
    * shifted twin as the incoming batch. */
  val ChunkIndexSplit = 250L

  /** Incremental binary dedup — the daily-ingest shape of
    * [[chunkDedupQuery]], mirroring the perceptual-image probe: the
    * warehouse keeps the (doc_id, chunk_md5) index (16 bytes per
    * chunk, no payloads), a new batch chunks ONLY its own payloads
    * and equi-joins the index, so probe cost is O(batch), never
    * O(corpus). A twin whose base is indexed classifies `dup` of
    * exactly that base (chunk content is unique per id); the rest are
    * `new`. */
  /** Classify a batch's chunk index against the persisted digest
    * index — the shared kernel of the batch query and the streaming
    * twin. */
  def classifyChunks(batchIdx: DataFrame, index: DataFrame): DataFrame = {
    val idx = index.select(col("doc_id").as("idx_doc_id"), col("chunk_md5"))
    val matched = batchIdx.join(idx, "chunk_md5" :: Nil)
      .groupBy(col("doc_id"))
      .agg(min(col("idx_doc_id")).as("dup_of"))
    batchIdx.select(col("doc_id")).distinct()
      .join(matched, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("dup_of").isNotNull, "dup").otherwise("new").as("status"),
        col("dup_of"))
  }

  def chunkDedupIncrementalQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.Caches.TrackedDataset
    val all = payloads(spark, dir).trackPersist()
    val index = chunkIndexOf(all.filter(_._1 < ChunkIndexSplit))
    classifyChunks(chunkIndexOf(all.filter(_._1 >= TwinSpace)), index)
  }

  /** STREAMING twin of the incremental probe: payload micro-batches
    * are chunked and classified against the same static digest index
    * inside foreachBatch, appended idempotently per epoch — the
    * arrival shape a crawl ingest actually has. Shares
    * [[classifyChunks]] verbatim with the batch path, so the spec's
    * stream==batch law pins the semantics rather than re-deriving
    * them. */
  def classifyChunkStream(stream: DataFrame, index: DataFrame,
                          warehouse: graft.connect.Warehouse, entity: String,
                          checkpoint: String, runDate: graft.core.RunDate)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          import spark.implicits._
          val ds = batch
            .select(col("doc_id").cast("long"), col("payload"))
            .as[(Long, Array[Byte])]
          val classified = graft.ops.Exp.stampDayDt(
            classifyChunks(chunkIndexOf(ds), index), runDate)
          warehouse.appendHistoryBatch(classified, entity, epochId)
        }
      }

  val chunkDedupIncrementalOracle: String =
    s"""SELECT doc_id + $TwinSpace AS doc_id,
       |       CASE WHEN doc_id < $ChunkIndexSplit THEN 'dup' ELSE 'new' END
       |         AS status,
       |       CASE WHEN doc_id < $ChunkIndexSplit THEN doc_id END AS dup_of
       |FROM documents
       |""".stripMargin
}
