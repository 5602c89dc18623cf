package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Typed media row: opaque binary payload + typed metadata, the schema a
  * multimodal (image/audio/video) corpus uses at scale. */
final case class Media(doc_id: Long, media_type: String, payload: Array[Byte],
                       width: Int, height: Int, sample_rate: Int)

/** Extracted per-media features. */
final case class MediaFeatures(doc_id: Long, media_type: String,
                               byte_len: Long, payload_md5: String,
                               head_hex: String)

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-wise batches.
  *
  * The actual media decode (JPEG/PNG/FLAC/H.264) is STUBBED — this
  * container has no codec libraries — behind the [[Decoder]] trait with a
  * deterministic fake. Everything Spark-side is real and tested: the
  * schema, the binary column handling, the partition-batched execution
  * shape (the Scala analog of `mapInPandas`: one [[Decoder]] instance per
  * partition, rows processed in bounded batches), and the
  * expression-based fast path for features that don't need a codec.
  *
  * Scale notes: payloads dominate row size, so feature extraction
  * projects payload-derived columns and DROPS the payload as early as
  * possible; repartitioning happens BEFORE decode so the expensive stage
  * is balanced; the expression path (md5/length/hex) runs inside
  * whole-stage codegen with no JVM object churn.
  */
object Multimodal {

  /** Pluggable media decoder. A production binding would wrap a native
    * codec (libjpeg/ffmpeg) initialized once per partition. */
  trait Decoder extends Serializable {
    def features(m: Media): MediaFeatures
  }

  /** Deterministic stand-in for a real codec: hashes the payload and
    * reports sizes. Same math as the expression path, so the two paths
    * cross-check each other in tests. */
  object StubDecoder extends Decoder {
    def features(m: Media): MediaFeatures = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hash = md.digest(m.payload).map("%02x".format(_)).mkString
      val head = m.payload.take(8).map("%02X".format(_)).mkString
      MediaFeatures(m.doc_id, m.media_type, m.payload.length.toLong, hash, head)
    }
  }

  /** Synthesize a media table from the documents corpus: the UTF-8 text
    * bytes play the payload, metadata is derived deterministically.
    * (Stand-in for `spark.read.format("binaryFile")` over a media lake.) */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
                 (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"),
      (col("doc_id") % 640 + 16).cast("int").as("width"),
      (col("doc_id") % 480 + 16).cast("int").as("height"),
      lit(16000).cast("int").as("sample_rate"))

  /** Expression-path features: codegen'd, no decoder needed. */
  def features(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir).select(
      col("doc_id"), col("media_type"),
      length(col("payload")).cast("long").as("byte_len"),
      md5(col("payload")).as("payload_md5"),
      hex(substring(col("payload"), 1, 8)).as("head_hex"))

  /** Decoder-path features: partition-wise batches through a [[Decoder]]
    * — the shape a real codec integration uses. One decoder per
    * partition, bounded batches (here 64) so peak memory is
    * batch × payload, not partition × payload. */
  def decodeFeatures(media: Dataset[Media], decoder: Decoder,
                     batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(batch => batch.map(decoder.features))
    }
  }

  /** Pluggable payload→embedding model. A production binding wraps an ONNX
    * or JNI-loaded vision/audio encoder initialized once per partition;
    * the Spark-side shape (schema, batching, partition lifecycle) is what
    * this seam pins down. */
  trait Embedder extends Serializable {
    def dim: Int
    def embed(m: Media): Array[Float]
    /** Batch entry point — the one [[embedFeatures]] calls, so a real
      * model can amortize inference over the whole batch (the reason the
      * batching exists); the default delegates per element. */
    def embedBatch(ms: Seq[Media]): Seq[Array[Float]] = ms.map(embed)
  }

  /** Deterministic stand-in encoder: md5-expanded payload bytes mapped to
    * [-1, 1] floats. Stable across runs/partitionings, so downstream ANN
    * results are assertable. */
  final class StubEmbedder(val dim: Int = 16) extends Embedder {
    def embed(m: Media): Array[Float] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      Iterator.iterate(md.digest(m.payload))(md.digest)
        .flatten.take(dim).map(b => b.toFloat / 128.0f).toArray
    }
  }

  /** Embedding extraction: partition-wise batches through an [[Embedder]]
    * → (doc_id, embedding) rows that feed straight into
    * [[Similarity.bruteForceTopKOf]] / the LSH & IVF indexes. One encoder
    * per partition, bounded batches — the mapInPandas-equivalent shape. */
  def embedFeatures(media: Dataset[Media], embedder: Embedder,
                    batchSize: Int = 64): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.zip(embedder.embedBatch(batch).iterator)
          .map { case (m, v) => (m.doc_id, v.toSeq) }
      }
    }.toDF("doc_id", "embedding")
  }

  /** Frame sampling for video-typed payloads: every `stride`-th
    * `frameBytes`-sized block of the payload becomes one "frame" row
    * (posexplode → (doc_id, frame_idx, frame)). A real codec would emit
    * decoded frames at timestamps; the slicing, row explosion, schema,
    * and ordering are exactly what that integration produces. */
  def frameSample(media: DataFrame, frameBytes: Int = 32,
                  stride: Int = 4): DataFrame =
    media.filter(col("media_type") === "video")
      .select(col("doc_id"),
        posexplode(expr(
          s"""transform(
             |  sequence(0, greatest(int(floor(length(payload) / $frameBytes)) - 1, 0), $stride),
             |  i -> substring(payload, i * $frameBytes + 1, $frameBytes))""".stripMargin))
          .as(Seq("frame_idx", "frame")))

  /** Metadata-only resize: rescale width/height to fit a bounding box,
    * preserving aspect ratio (nearest integer). The payload is untouched —
    * a real implementation would re-encode; the metadata contract and
    * the arithmetic are the real thing. */
  def resizeMeta(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(lit(maxW) / col("width"), lit(maxH) / col("height"),
                      lit(1.0))
    media
      .withColumn("out_width", round(col("width") * scale).cast("int"))
      .withColumn("out_height", round(col("height") * scale).cast("int"))
  }

  /** Typed view of [[mediaTable]] for the decoder path. */
  def mediaDataset(spark: SparkSession, dir: String): Dataset[Media] = {
    import spark.implicits._
    mediaTable(spark, dir).as[Media]
  }

  /** Oracle works on the text side: payloads are exactly the UTF-8 text
    * bytes, and DuckDB's md5/hex of a VARCHAR hash its UTF-8 bytes — same
    * values the Spark side computes on binary. */
  val featuresOracle: String =
    """SELECT doc_id,
      |       ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS media_type,
      |       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      |       md5(text) AS payload_md5,
      |       upper(hex(substr(text, 1, 8))) AS head_hex
      |FROM documents
      |""".stripMargin
}
