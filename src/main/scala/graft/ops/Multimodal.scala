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
  * The decode seam runs at two depths, and BOTH are real. The HEADER
  * layer: [[imageDecodeQuery]] synthesizes genuine PNG/BMP payloads per
  * row and [[graft.functions.ImageCodec]] parses width/height/channels
  * back out of the container bytes (oracle-gated). The PIXEL/SAMPLE
  * layer: pure-JVM decoders in `graft.functions` cover baseline +
  * progressive JPEG, PNG (incl. Adam7), GIF LZW, BMP, WebP VP8L and
  * lossy VP8 keyframes, TIFF strips, WAV, and FLAC — the perceptual
  * neardup queries below run over actually-decoded pixels/samples. The
  * [[Decoder]] trait remains as the seam a production binding would use
  * to swap in a native codec (libjpeg-turbo/ffmpeg) initialized once per
  * partition; everything Spark-side is shared between the two: the
  * schema, the binary column handling, the partition-batched execution
  * shape (the Scala analog of `mapInPandas`), and the expression-based
  * fast path for features that don't need a codec.
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

  // ------------------------------------------------ real byte decode

  /** One decoded image row per document. */
  final case class ImageRow(doc_id: Long, format: String, width: Int,
                            height: Int, channels: Int)

  /** Synthesize GENUINE image payloads, one per document: even doc_ids
    * get a real PNG (CRC'd chunks, zlib IDAT), odd ones a real 24-bit
    * BMP; dimensions derive from doc_id so the oracle can state them in
    * SQL. Payload bytes are built per-partition — no driver loop, no
    * shuffle; at 100 TB this is the same shape as reading
    * `binaryFile`-format media then decoding. */
  def imagePayloads(spark: SparkSession, dir: String): Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.map { id =>
          val w = (id % 64 + 16).toInt
          val h = (id % 48 + 16).toInt
          val (r, g, b) = ((id * 7 % 256).toByte, (id * 13 % 256).toByte,
                           (id * 31 % 256).toByte)
          val bytes =
            if (id % 2 == 0) graft.functions.ImageCodec.writePng(w, h, r, g, b)
            else graft.functions.ImageCodec.writeBmp(w, h, r, g, b)
          (id, bytes)
        }
      }
  }

  /** Partition-batched byte-level decode through [[graft.functions.ImageCodec]]:
    * the REAL header parse (magic detection, chunk/segment walk) over
    * actual binary payloads. Undecodable payloads are dropped here;
    * production routes them to a rejects sink instead. */
  def decodeImageMeta(payloads: Dataset[(Long, Array[Byte])],
                      batchSize: Int = 64): Dataset[ImageRow] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.flatMap { case (id, bytes) =>
        graft.functions.ImageCodec.decode(bytes).map(m =>
          ImageRow(id, m.format, m.width, m.height, m.channels))
      })
    }
  }

  /** Oracle-gated end-to-end proof of the decode seam: synthesize real
    * container bytes, parse them back at the byte level, emit the
    * decoded metadata. The oracle recomputes the expected values from
    * the doc_id formulas — a wrong parser (endianness, offset, channel
    * mapping) fails the hash compare. */
  def imageDecodeQuery(spark: SparkSession, dir: String): DataFrame =
    decodeImageMeta(imagePayloads(spark, dir)).toDF()

  val imageDecodeOracle: String =
    """SELECT doc_id,
      |       CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'bmp' END AS format,
      |       CAST(doc_id % 64 + 16 AS INT) AS width,
      |       CAST(doc_id % 48 + 16 AS INT) AS height,
      |       3 AS channels
      |FROM documents
      |""".stripMargin

  /** One decoded audio row per document. */
  final case class AudioRow(doc_id: Long, format: String, sample_rate: Int,
                            channels: Int, bits: Int, n_samples: Long,
                            duration_ms: Long)

  /** Synthesize GENUINE PCM WAV payloads, one per document — canonical
    * RIFF container, real 16-bit samples derived from doc_id — with
    * stream parameters stated by formula so the oracle can verify the
    * decoded values in SQL. Same per-partition build shape as
    * [[imagePayloads]]. */
  def audioPayloads(spark: SparkSession, dir: String): Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.map { id =>
          val rate = (8000 + (id % 8) * 1000).toInt
          val ch = (id % 2 + 1).toInt
          val n = (id % 50 + 10).toInt
          val bytes = graft.functions.AudioCodec.writeWav(rate, ch, n,
            (s, c) => (((id * 31 + s * 7 + c * 13) % 32768)).toShort)
          (id, bytes)
        }
      }
  }

  /** Partition-batched byte-level WAV decode through
    * [[graft.functions.AudioCodec]] — the audio twin of
    * [[decodeImageMeta]]. */
  def decodeAudioMeta(payloads: Dataset[(Long, Array[Byte])],
                      batchSize: Int = 64): Dataset[AudioRow] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.flatMap { case (id, bytes) =>
        graft.functions.AudioCodec.decode(bytes).map(m =>
          AudioRow(id, m.format, m.sampleRate, m.channels, m.bitsPerSample,
                   m.nSamples, m.durationMs))
      })
    }
  }

  /** Oracle-gated end-to-end proof of the AUDIO decode seam: write a
    * real RIFF/WAV container per row, walk its chunk list back at the
    * byte level, emit the stream parameters. */
  def audioDecodeQuery(spark: SparkSession, dir: String): DataFrame =
    decodeAudioMeta(audioPayloads(spark, dir)).toDF()

  val audioDecodeOracle: String =
    """SELECT doc_id, 'wav' AS format,
      |       CAST(8000 + (doc_id % 8) * 1000 AS INT) AS sample_rate,
      |       CAST(doc_id % 2 + 1 AS INT) AS channels,
      |       16 AS bits,
      |       CAST(doc_id % 50 + 10 AS BIGINT) AS n_samples,
      |       CAST((doc_id % 50 + 10) * 1000 // (8000 + (doc_id % 8) * 1000) AS BIGINT) AS duration_ms
      |FROM documents
      |""".stripMargin

  /** One decoded video-frame row per (document, frame). */
  final case class VideoFrameRow(doc_id: Long, frame_idx: Int, width: Int,
                                 height: Int, n_frames: Int,
                                 f_format: String, f_width: Int, f_height: Int)

  /** Synthesize GENUINE AVI containers, one per document: real RIFF
    * hdrl/avih + movi structure whose frame payloads are themselves real
    * PNGs ([[graft.functions.ImageCodec.writePng]]) with dimensions
    * matching the container header. */
  def videoPayloads(spark: SparkSession, dir: String): Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.map { id =>
          val w = (id % 32 + 8).toInt
          val h = (id % 24 + 8).toInt
          val nf = (id % 5 + 2).toInt
          val frames = (0 until nf).map { i =>
            graft.functions.ImageCodec.writePng(w, h,
              ((id * 7 + i) % 256).toByte, ((id * 13 + i) % 256).toByte,
              ((id * 31 + i) % 256).toByte)
          }
          (id, graft.functions.VideoCodec.writeAvi(w, h, 33333, frames))
        }
      }
  }

  /** TWO-LEVEL byte decode: walk each AVI's movi list for the real frame
    * payloads ([[graft.functions.VideoCodec.frames]]), then parse each
    * frame's PNG header ([[graft.functions.ImageCodec.decode]]). One row
    * per frame, carrying container metadata alongside the per-frame
    * parse — a mismatch at either level breaks the oracle hash. */
  def decodeVideoFrames(payloads: Dataset[(Long, Array[Byte])],
                        batchSize: Int = 16): Dataset[VideoFrameRow] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.flatMap { case (id, bytes) =>
        graft.functions.VideoCodec.decodeMeta(bytes).toSeq.flatMap { m =>
          graft.functions.VideoCodec.frames(bytes).zipWithIndex.flatMap {
            case (f, i) =>
              graft.functions.ImageCodec.decode(f).map(fm =>
                VideoFrameRow(id, i, m.width, m.height, m.nFrames,
                              fm.format, fm.width, fm.height))
          }
        }
      })
    }
  }

  def videoDecodeQuery(spark: SparkSession, dir: String): DataFrame =
    decodeVideoFrames(videoPayloads(spark, dir)).toDF()

  val videoDecodeOracle: String =
    """SELECT doc_id, CAST(i AS INT) AS frame_idx,
      |       CAST(doc_id % 32 + 8 AS INT) AS width,
      |       CAST(doc_id % 24 + 8 AS INT) AS height,
      |       CAST(doc_id % 5 + 2 AS INT) AS n_frames,
      |       'png' AS f_format,
      |       CAST(doc_id % 32 + 8 AS INT) AS f_width,
      |       CAST(doc_id % 24 + 8 AS INT) AS f_height
      |FROM documents,
      |     unnest(generate_series(0, CAST(doc_id % 5 + 1 AS INT))) t(i)
      |""".stripMargin

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

  // --------------------------------------------- perceptual image dedup

  /** Twin-image ids live above this offset. */
  private val TwinSpace = 1000000000L

  /** Per-cell grayscale of the 3×3 id-pattern: cell k carries the k-th
    * nibble of the id, scaled into [8, 248] — INJECTIVE on ids < 2³⁶, so
    * two different ids can never produce the same sampled grid (the
    * guarantee the oracle's "twins and nothing else" prediction rests
    * on). Gray in all three channels makes the ITU grayscale exact. */
  private def cellGray(id: Long, k: Int): Int =
    ((id >> (4 * k)) & 15L).toInt * 16 + 8

  private def patternPx(id: Long, w: Int, h: Int)(x: Int, y: Int): Int = {
    val g = cellGray(id, (y / (h / 3)) * 3 + (x / (w / 3)))
    (g << 16) | (g << 8) | g
  }

  /** Synthesize, per document, a REAL rendered pattern image and its
    * RE-ENCODED twin: same logical content, 2× the resolution, the
    * OTHER container (PNG↔BMP) — the duplicate class byte-level hashing
    * can never catch (different bytes, different length, different
    * format). Render sizes are multiples of 3 so the 3×3 content cells
    * align to pixel boundaries at every scale. */
  def imageVariantPayloads(spark: SparkSession, dir: String)
      : Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    import graft.functions.ImageCodec.{writeBmpPixels, writePngPixels}
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val w0 = 9 + 3 * (id % 4).toInt
          val h0 = 9 + 3 * (id % 3).toInt
          val base =
            if (id % 2 == 0) writePngPixels(w0, h0, patternPx(id, w0, h0))
            else writeBmpPixels(w0, h0, patternPx(id, w0, h0))
          val twin =
            if (id % 2 == 0)
              writeBmpPixels(2 * w0, 2 * h0, patternPx(id, 2 * w0, 2 * h0))
            else writePngPixels(2 * w0, 2 * h0, patternPx(id, 2 * w0, 2 * h0))
          Seq((id, base), (id + TwinSpace, twin))
        }
      }
  }

  /** PERCEPTUAL image dedup over real container bytes: full pixel
    * decode ([[graft.functions.ImageCodec.decodePixels]] — zlib
    * inflate + PNG row unfilter, BMP bottom-up rows), the
    * resolution-invariant 9×8 point-sampled grayscale grid, and the
    * 64-bit dHash. Candidates collide on the dHash equi-join key and
    * VERIFY on the full grid (the LSH nominate-then-verify discipline —
    * dHash alone loses information, the grid compare restores
    * exactness), so the output is precisely the set of
    * perceptually-identical pairs: each image and its re-encoded
    * rescaled twin, which the oracle predicts by formula. Near-dup (small
    * Hamming distance) generalizes by banding the 64 bits with the
    * [[graft.ops.Dedup]] SimHash machinery; the scan-side cost is one
    * decode per image, hash-grain shuffle only. */
  /** (doc_id, format, w, grid, dhash) perceptual signatures of a
    * payload set — the per-image decode + grid + dHash pass shared by
    * the corpus-wide near-dup join and the incremental probe. */
  def imageSignatures(payloads: Dataset[(Long, Array[Byte])]): DataFrame = {
    import payloads.sparkSession.implicits._
    import graft.functions.ImageCodec
    payloads
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          ImageCodec.decodePixels(bytes).map { p =>
            val grid = ImageCodec.sampleGrid9x8(p)
            (id, p.format, p.width, grid.toSeq, ImageCodec.dHash64(grid))
          }
        }
      }
      .toDF("doc_id", "format", "w", "grid", "dhash")
  }

  def imageNearDupQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.Caches.TrackedDataset
    val rasters = imageSignatures(imageVariantPayloads(spark, dir))
      .trackPersist() // both sides of the candidate self-join
    rasters.as("a").join(rasters.as("b"),
        col("a.dhash") === col("b.dhash") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("a.grid") === col("b.grid"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.format").as("format_a"), col("b.format").as("format_b"),
        col("a.w").as("w_a"), col("b.w").as("w_b"))
  }

  /** GIF twins: per document, the lossless PNG/BMP base (identical to
    * [[imageVariantPayloads]]) and a GIF89a re-encode at 2× resolution —
    * the palette-format duplicate class. The pattern is pure gray and
    * [[graft.functions.GifCodec.writeGifPixels]] uses the 256-gray
    * palette, so the GIF round-trip is EXACT and the near-dup gate keeps
    * the exact-grid semantics of the PNG↔BMP family (no level-band
    * tolerance needed). */
  def imageGifVariantPayloads(spark: SparkSession, dir: String)
      : Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    import graft.functions.ImageCodec.{writeBmpPixels, writePngPixels}
    import graft.functions.GifCodec.writeGifPixels
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val w0 = 9 + 3 * (id % 4).toInt
          val h0 = 9 + 3 * (id % 3).toInt
          val base =
            if (id % 2 == 0) writePngPixels(w0, h0, patternPx(id, w0, h0))
            else writeBmpPixels(w0, h0, patternPx(id, w0, h0))
          val twin = writeGifPixels(2 * w0, 2 * h0, patternPx(id, 2 * w0, 2 * h0))
          Seq((id, base), (id + TwinSpace, twin))
        }
      }
  }

  /** Perceptual near-dup across the PALETTE format boundary: real GIF
    * bytes (LZW decode) against their PNG/BMP bases on exact 9×8 grid
    * equality — same nominate-on-dHash / verify-on-grid discipline as
    * [[imageNearDupQuery]], with [[imageSignatures]] shared verbatim. */
  def imageGifNearDupQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.Caches.TrackedDataset
    val rasters = imageSignatures(imageGifVariantPayloads(spark, dir))
      .trackPersist()
    rasters.as("a").join(rasters.as("b"),
        col("a.dhash") === col("b.dhash") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("a.grid") === col("b.grid"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.format").as("format_a"), col("b.format").as("format_b"),
        col("a.w").as("w_a"), col("b.w").as("w_b"))
  }

  val imageGifNearDupOracle: String =
    s"""SELECT doc_id AS doc_a,
       |       doc_id + $TwinSpace AS doc_b,
       |       CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'bmp' END AS format_a,
       |       'gif' AS format_b,
       |       CAST(9 + 3 * (doc_id % 4) AS INT) AS w_a,
       |       CAST(2 * (9 + 3 * (doc_id % 4)) AS INT) AS w_b
       |FROM documents
       |""".stripMargin

  /** WebP VP8L twins: the lossless PNG/BMP base against a real lossless
    * .webp (RIFF + VP8L, [[graft.functions.Vp8lCodec]]) at 2×
    * resolution. The encoder options VARY by doc_id so the corpus-wide
    * decode exercises every VP8L path (transform combos, palette, color
    * cache, LZ77 distance mapping, meta prefix groups) — VP8L is
    * lossless, so every variant keeps the exact-grid near-dup
    * semantics. */
  def imageWebpVariantPayloads(spark: SparkSession, dir: String)
      : Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    import graft.functions.ImageCodec.{writeBmpPixels, writePngPixels}
    import graft.functions.Vp8lCodec
    import graft.functions.Vp8lCodec.Vp8lOptions
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val w0 = 9 + 3 * (id % 4).toInt
          val h0 = 9 + 3 * (id % 3).toInt
          val base =
            if (id % 2 == 0) writePngPixels(w0, h0, patternPx(id, w0, h0))
            else writeBmpPixels(w0, h0, patternPx(id, w0, h0))
          val opts = (id % 5).toInt match {
            case 0 => Vp8lOptions()
            case 1 => Vp8lOptions(subtractGreen = true, predictor = true)
            case 2 => Vp8lOptions(palette = true) // gray pattern: ≤256 colors
            case 3 => Vp8lOptions(cacheBits = 6, mapDistances = true)
            case _ => Vp8lOptions(colorTransform = true, metaBits = 2)
          }
          val twin = Vp8lCodec.writeWebpPixels(2 * w0, 2 * h0,
            patternPx(id, 2 * w0, 2 * h0), opts)
          Seq((id, base), (id + TwinSpace, twin))
        }
      }
  }

  /** Perceptual near-dup across the WEBP boundary: real RIFF+VP8L bytes
    * (canonical-prefix + transform-stack decode) against their PNG/BMP
    * bases on exact 9×8 grid equality — [[imageSignatures]] shared
    * verbatim with the PNG/BMP/GIF/JPEG families. */
  def imageWebpNearDupQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.Caches.TrackedDataset
    val rasters = imageSignatures(imageWebpVariantPayloads(spark, dir))
      .trackPersist()
    rasters.as("a").join(rasters.as("b"),
        col("a.dhash") === col("b.dhash") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("a.grid") === col("b.grid"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.format").as("format_a"), col("b.format").as("format_b"),
        col("a.w").as("w_a"), col("b.w").as("w_b"))
  }

  val imageWebpNearDupOracle: String =
    s"""SELECT doc_id AS doc_a,
       |       doc_id + $TwinSpace AS doc_b,
       |       CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'bmp' END AS format_a,
       |       'webp' AS format_b,
       |       CAST(9 + 3 * (doc_id % 4) AS INT) AS w_a,
       |       CAST(2 * (9 + 3 * (doc_id % 4)) AS INT) AS w_b
       |FROM documents
       |""".stripMargin

  /** Lossy-WebP twins: the PNG/BMP base against a VP8 LOSSY keyframe
    * re-encode at 2× — the majority encoding of real-world WebP, now
    * decodable end to end ([[graft.functions.Vp8Codec]], validated
    * pixel-exact against libwebp). The gray pattern rides in the luma
    * plane (BT.601 limited-range mapping, inverted exactly by
    * [[graft.functions.Vp8Codec.toRgb]]), chroma neutral; quantizer
    * index 8 keeps reconstruction error well inside the 16-level
    * bands the lossy near-dup gate quantizes to (pattern grays sit at
    * band CENTERS — x*16+8 — by construction). */
  def imageWebpLossyVariantPayloads(spark: SparkSession, dir: String)
      : Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    import graft.functions.ImageCodec.{writeBmpPixels, writePngPixels}
    import graft.functions.Vp8Codec
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val w0 = 9 + 3 * (id % 4).toInt
          val h0 = 9 + 3 * (id % 3).toInt
          val base =
            if (id % 2 == 0) writePngPixels(w0, h0, patternPx(id, w0, h0))
            else writeBmpPixels(w0, h0, patternPx(id, w0, h0))
          val w2 = 2 * w0; val h2 = 2 * h0
          val cw = (w2 + 1) / 2; val ch = (h2 + 1) / 2
          val y = Array.tabulate(w2 * h2) { i =>
            val g = patternPx(id, w2, h2)(i % w2, i / w2) & 0xff
            (16 + (g * 219 + 128) / 255).toByte
          }
          val yuv = Vp8Codec.Yuv(w2, h2, y,
            Array.fill(cw * ch)(128.toByte), Array.fill(cw * ch)(128.toByte))
          Seq((id, base), (id + TwinSpace, Vp8Codec.encodeWebp(yuv, qi = 8)))
        }
      }
  }

  /** Perceptual near-dup across the LOSSY boundary, same shape as the
    * JPEG family: 16-level-banded 9×8 grid + dhash equality — lossy
    * quantization noise stays inside a band, content changes do not. */
  def imageWebpLossyNearDupQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.core.Caches.TrackedDataset
    import graft.functions.ImageCodec
    val rasters = imageWebpLossyVariantPayloads(spark, dir)
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          ImageCodec.decodePixels(bytes).map { p =>
            val lvl = ImageCodec.sampleGrid9x8(p).map(_ / 16)
            (id, p.format, p.width, lvl.toSeq, ImageCodec.dHash64(lvl))
          }
        }
      }
      .toDF("doc_id", "format", "w", "lvl", "dhash")
      .trackPersist()
    rasters.as("a").join(rasters.as("b"),
        col("a.dhash") === col("b.dhash") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("a.lvl") === col("b.lvl"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.format").as("format_a"), col("b.format").as("format_b"),
        col("a.w").as("w_a"), col("b.w").as("w_b"))
  }

  val imageWebpLossyNearDupOracle: String =
    s"""SELECT doc_id AS doc_a,
       |       doc_id + $TwinSpace AS doc_b,
       |       CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'bmp' END AS format_a,
       |       'webp-vp8' AS format_b,
       |       CAST(9 + 3 * (doc_id % 4) AS INT) AS w_a,
       |       CAST(2 * (9 + 3 * (doc_id % 4)) AS INT) AS w_b
       |FROM documents
       |""".stripMargin

  /** TIFF twins: the PNG/BMP base against a real TIFF re-encode at 2×
    * — the scanned-document container. Per-doc
    * [[graft.functions.TiffCodec.TiffOpts]] rotate over both byte
    * orders, all three baseline compressions (none / LZW / PackBits),
    * the horizontal predictor, gray vs RGB color space (the pattern is
    * pure gray, so the gray path is exact too), BOTH grayscale
    * polarities, and single- vs multi-strip blocking — the corpus
    * decode crosses the whole baseline-TIFF surface. */
  def imageTiffVariantPayloads(spark: SparkSession, dir: String)
      : Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    import graft.functions.ImageCodec.{writeBmpPixels, writePngPixels}
    import graft.functions.TiffCodec
    import graft.functions.TiffCodec.TiffOpts
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val w0 = 9 + 3 * (id % 4).toInt
          val h0 = 9 + 3 * (id % 3).toInt
          val base =
            if (id % 2 == 0) writePngPixels(w0, h0, patternPx(id, w0, h0))
            else writeBmpPixels(w0, h0, patternPx(id, w0, h0))
          val opts = TiffOpts(
            bigEndian = id % 2 == 0,
            compression = Seq(1, 5, 32773)((id % 3).toInt),
            predictor = id % 4 == 0,
            gray = id % 5 < 2,
            rowsPerStrip = Seq(4, 1000, 7, 1)((id % 4).toInt),
            whiteIsZero = id % 10 == 1)
          val twin = TiffCodec.writeTiffPixels(2 * w0, 2 * h0,
            patternPx(id, 2 * w0, 2 * h0), opts)
          Seq((id, base), (id + TwinSpace, twin))
        }
      }
  }

  /** Perceptual near-dup across the TIFF boundary: real strip-based
    * TIFF decode (LZW/PackBits + predictor) against the PNG/BMP bases
    * on exact 9×8 grid equality — [[imageSignatures]] shared verbatim
    * with every other image family. */
  def imageTiffNearDupQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.Caches.TrackedDataset
    val rasters = imageSignatures(imageTiffVariantPayloads(spark, dir))
      .trackPersist()
    rasters.as("a").join(rasters.as("b"),
        col("a.dhash") === col("b.dhash") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("a.grid") === col("b.grid"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.format").as("format_a"), col("b.format").as("format_b"),
        col("a.w").as("w_a"), col("b.w").as("w_b"))
  }

  val imageTiffNearDupOracle: String =
    s"""SELECT doc_id AS doc_a,
       |       doc_id + $TwinSpace AS doc_b,
       |       CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'bmp' END AS format_a,
       |       'tiff' AS format_b,
       |       CAST(9 + 3 * (doc_id % 4) AS INT) AS w_a,
       |       CAST(2 * (9 + 3 * (doc_id % 4)) AS INT) AS w_b
       |FROM documents
       |""".stripMargin

  /** PNG color-type twins: the truecolor base against a PALETTE-PNG
    * (even ids) or RGBA-PNG (odd ids, formula alpha the decoder drops)
    * re-encode at 2× — the two crawl-common PNG shapes beyond
    * truecolor-8. Both decode through the same generalized PNG path
    * ([[graft.functions.ImageCodec.decodePixels]]), losslessly, so the
    * exact-grid near-dup semantics hold. */
  def imagePngxVariantPayloads(spark: SparkSession, dir: String)
      : Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    import graft.functions.ImageCodec.{writeBmpPixels, writePngPalettePixels,
      writePngPixels, writePngRgbaPixels}
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val w0 = 9 + 3 * (id % 4).toInt
          val h0 = 9 + 3 * (id % 3).toInt
          val base =
            if (id % 2 == 0) writePngPixels(w0, h0, patternPx(id, w0, h0))
            else writeBmpPixels(w0, h0, patternPx(id, w0, h0))
          val twin =
            if (id % 2 == 0)
              writePngPalettePixels(2 * w0, 2 * h0, patternPx(id, 2 * w0, 2 * h0))
            else
              writePngRgbaPixels(2 * w0, 2 * h0, patternPx(id, 2 * w0, 2 * h0),
                (x, y) => (x * 3 + y * 5 + id.toInt) % 256)
          Seq((id, base), (id + TwinSpace, twin))
        }
      }
  }

  /** Perceptual near-dup across PNG COLOR TYPES: palette and RGBA
    * re-encodes against their truecolor bases on exact 9×8 grid
    * equality — [[imageSignatures]] shared verbatim. */
  def imagePngxNearDupQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.Caches.TrackedDataset
    val rasters = imageSignatures(imagePngxVariantPayloads(spark, dir))
      .trackPersist()
    rasters.as("a").join(rasters.as("b"),
        col("a.dhash") === col("b.dhash") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("a.grid") === col("b.grid"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.format").as("format_a"), col("b.format").as("format_b"),
        col("a.w").as("w_a"), col("b.w").as("w_b"))
  }

  val imagePngxNearDupOracle: String =
    s"""SELECT doc_id AS doc_a,
       |       doc_id + $TwinSpace AS doc_b,
       |       CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'bmp' END AS format_a,
       |       'png' AS format_b,
       |       CAST(9 + 3 * (doc_id % 4) AS INT) AS w_a,
       |       CAST(2 * (9 + 3 * (doc_id % 4)) AS INT) AS w_b
       |FROM documents
       |""".stripMargin

  /** Adam7 twins: the sequential truecolor base against its
    * INTERLACED re-encode at 2× — progressive-rendering PNGs are
    * common in crawled pages, and until the interlaced decode path
    * existed they silently routed to the rejects channel (the same
    * failure class progressive JPEG had). Both decode through
    * [[graft.functions.ImageCodec.decodePixels]] losslessly, so exact
    * 9×8 grid equality holds. */
  def imageAdam7VariantPayloads(spark: SparkSession, dir: String)
      : Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    import graft.functions.ImageCodec.{writePngInterlacedPixels, writePngPixels}
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val w0 = 9 + 3 * (id % 4).toInt
          val h0 = 9 + 3 * (id % 3).toInt
          val base = writePngPixels(w0, h0, patternPx(id, w0, h0))
          val twin = writePngInterlacedPixels(2 * w0, 2 * h0,
            patternPx(id, 2 * w0, 2 * h0))
          Seq((id, base), (id + TwinSpace, twin))
        }
      }
  }

  /** Perceptual near-dup across the INTERLACE axis: Adam7 re-encodes
    * against sequential bases — [[imageSignatures]] shared verbatim. */
  def imageAdam7NearDupQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.Caches.TrackedDataset
    val rasters = imageSignatures(imageAdam7VariantPayloads(spark, dir))
      .trackPersist()
    rasters.as("a").join(rasters.as("b"),
        col("a.dhash") === col("b.dhash") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("a.grid") === col("b.grid"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.w").as("w_a"), col("b.w").as("w_b"))
  }

  val imageAdam7NearDupOracle: String =
    s"""SELECT doc_id AS doc_a,
       |       doc_id + $TwinSpace AS doc_b,
       |       CAST(9 + 3 * (doc_id % 4) AS INT) AS w_a,
       |       CAST(2 * (9 + 3 * (doc_id % 4)) AS INT) AS w_b
       |FROM documents
       |""".stripMargin

  /** Image quality stats over the DECODED raster — the blank-frame
    * filter image corpora run before pairing: mean luma and the
    * extreme-pixel fraction (near-black + near-white, ppm) flag
    * solid/blank assets that carry no visual signal. The fixture
    * plants near-black (id%5==0) and near-white (id%5==1) payloads
    * among two-tone normals, so both blank polarities and the keep
    * path are gated; every value decodes from real PNG bytes and is
    * oracle-predicted exactly (integer mean by construction). */
  def imageQualityQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.ImageCodec
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.map { id =>
          val g = (id % 5) match {
            case 0 => 4
            case 1 => 252
            case _ => 40 + (id % 170).toInt
          }
          // two-tone: even columns g, odd columns g+2 → exact mean g+1
          val png = ImageCodec.writePngPixels(10, 8, (x, _) => {
            val v = if (x % 2 == 0) g else g + 2
            (v << 16) | (v << 8) | v
          })
          (id, png)
        }
      }
      .mapPartitions { rows =>
        rows.flatMap { case (id, png) =>
          graft.functions.ImageCodec.decodePixels(png).map { px =>
            var sum = 0L
            var extreme = 0L
            val n = px.rgb.length / 3
            var i = 0
            while (i < n) {
              val l = ((px.rgb(3 * i) & 0xff) + (px.rgb(3 * i + 1) & 0xff) +
                (px.rgb(3 * i + 2) & 0xff)) / 3
              sum += l
              if (l < 8 || l > 247) extreme += 1
              i += 1
            }
            (id, px.width, px.height, (sum / n).toInt,
              extreme * 1000000L / n)
          }
        }
      }
      .toDF("doc_id", "w", "h", "luma_mean", "extreme_ppm")
      .select(col("doc_id"), col("w").cast("int").as("w"),
        col("h").cast("int").as("h"),
        col("luma_mean").cast("int").as("luma_mean"),
        col("extreme_ppm").cast("long").as("extreme_ppm"),
        (col("extreme_ppm") === 1000000L).as("is_blank"))
  }

  val imageQualityOracle: String =
    """SELECT doc_id, CAST(10 AS INT) AS w, CAST(8 AS INT) AS h,
      |       CAST(CASE doc_id % 5 WHEN 0 THEN 5 WHEN 1 THEN 253
      |            ELSE 41 + doc_id % 170 END AS INT) AS luma_mean,
      |       CAST(CASE WHEN doc_id % 5 <= 1 THEN 1000000 ELSE 0 END
      |            AS BIGINT) AS extreme_ppm,
      |       doc_id % 5 <= 1 AS is_blank
      |FROM documents
      |""".stripMargin

  // --------------------------------------------------- MP4 box census

  /** Formula-built MP4 containers, one per document: brand, mvhd
    * version (v0 u32 / v1 u64 fields alternate by id), timescale,
    * duration, and trak count all derive from doc_id, so the oracle
    * predicts every census cell in SQL. */
  def mp4Payloads(spark: SparkSession, dir: String): Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.map { id =>
          val v1 = id % 2 == 1
          val ts = if (v1) 1000L else 600L
          val dur = (id % 10 + 1) * 123L
          val brand = if (id % 2 == 0) "isom" else "mp42"
          (id, graft.functions.IsoBmff.writeMp4(brand, ts, dur,
            (id % 3 + 1).toInt, v1))
        }
      }
  }

  /** MP4 CENSUS over real ISO-BMFF bytes — the video-container twin of
    * [[imageFormatCensus]]: brand, duration (ms), and track count from
    * the `ftyp`/`moov`/`mvhd`/`trak` box walk, no sample decode. The
    * dominant real crawl video container is covered at the census layer
    * even before a sample decoder exists. */
  def mp4Census(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mp4Payloads(spark, dir)
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          graft.functions.IsoBmff.census(bytes).map { m =>
            (id, m.brand, m.durationMs, m.nTracks)
          }
        }
      }
      .toDF("doc_id", "brand", "duration_ms", "n_tracks")
      .select(col("doc_id"), col("brand"),
        col("duration_ms").cast("long").as("duration_ms"),
        col("n_tracks").cast("int").as("n_tracks"))
  }

  val mp4CensusOracle: String =
    """SELECT doc_id,
      |       CASE WHEN doc_id % 2 = 0 THEN 'isom' ELSE 'mp42' END AS brand,
      |       CAST((doc_id % 10 + 1) * 123 * 1000 //
      |            (CASE WHEN doc_id % 2 = 0 THEN 600 ELSE 1000 END) AS BIGINT)
      |         AS duration_ms,
      |       CAST(doc_id % 3 + 1 AS INT) AS n_tracks
      |FROM documents
      |""".stripMargin

  /** MP4 per-TRACK walk — one level deeper than [[mp4Census]]: trak →
    * mdia → (mdhd, hdlr, minf → stbl → stsz) yields the numbers a
    * video-corpus pass budgets by (which tracks exist, how many
    * samples, how many bytes of media), still without touching mdat.
    * Fixture: 1–3 tracks per doc with handler vide/soun/text and a
    * per-sample size table derived from (doc_id, track, sample) — the
    * oracle replays the sum/max by formula. Map-only index walk;
    * scan-shaped at 100 TB. */
  def mp4TracksQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.IsoBmff
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.map { id =>
          val specs = (0 to (id % 3).toInt).map { k =>
            val n = 5 + ((id + k) % 7).toInt
            val handler = k match {
              case 0 => "vide"; case 1 => "soun"; case _ => "text"
            }
            IsoBmff.TrackSpec(handler, 1000L, n * 400L,
              (0 until n).map(j => 100L + (id + 31L * k + 7L * j) % 50))
          }
          (id, IsoBmff.writeMp4Tracks("isom", 600L, 7200L, specs))
        }
      }
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          graft.functions.IsoBmff.tracks(bytes).toSeq.flatMap { ts =>
            ts.zipWithIndex.map { case (t, k) =>
              (id, k, t.handler, t.nSamples, t.totalBytes, t.maxSample,
                t.durationMs)
            }
          }
        }
      }
      .toDF("doc_id", "track_idx", "handler", "n_samples", "total_bytes",
        "max_sample", "duration_ms")
      .select(col("doc_id"), col("track_idx").cast("int").as("track_idx"),
        col("handler"), col("n_samples").cast("int").as("n_samples"),
        col("total_bytes").cast("long").as("total_bytes"),
        col("max_sample").cast("long").as("max_sample"),
        col("duration_ms").cast("long").as("duration_ms"))
  }

  val mp4TracksOracle: String =
    """WITH tr AS (
      |  SELECT doc_id, k, 5 + (doc_id + k) % 7 AS n
      |  FROM documents, unnest(generate_series(0, doc_id % 3)) u(k))
      |SELECT doc_id, CAST(k AS INT) AS track_idx,
      |       CASE k WHEN 0 THEN 'vide' WHEN 1 THEN 'soun' ELSE 'text' END
      |         AS handler,
      |       CAST(n AS INT) AS n_samples,
      |       CAST(list_sum(list_transform(generate_series(0, n - 1),
      |         j -> 100 + (doc_id + 31 * k + 7 * j) % 50)) AS BIGINT)
      |         AS total_bytes,
      |       CAST(list_max(list_transform(generate_series(0, n - 1),
      |         j -> 100 + (doc_id + 31 * k + 7 * j) % 50)) AS BIGINT)
      |         AS max_sample,
      |       CAST(n * 400 AS BIGINT) AS duration_ms
      |FROM tr
      |""".stripMargin

  /** Subtitle coverage against the video track — the alignment audit a
    * video-text pair pipeline runs before trusting (clip, transcript)
    * pairs: total subtitled milliseconds vs the vide-track duration
    * from the MP4 index walk, as integer ppm, plus an overrun flag
    * (cues extending past the media — the classic sign of a transcript
    * paired with the wrong cut). Composes
    * [[graft.ops.TextAnalysis.subtitleQuery]] with [[mp4TracksQuery]]
    * on doc_id: two corpus-linear passes and one equi-join, no state
    * beyond the per-doc aggregates. */
  def subtitleCoverageQuery(spark: SparkSession, dir: String): DataFrame = {
    val cues = graft.ops.TextAnalysis.subtitleQuery(spark, dir)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_cues"),
        sum(col("end_ms") - col("start_ms")).as("sub_ms"),
        max(col("end_ms")).as("last_end_ms"))
    val video = mp4TracksQuery(spark, dir)
      .filter(col("handler") === "vide")
      .select(col("doc_id"), col("duration_ms").as("video_ms"))
    cues.join(video, "doc_id")
      .select(col("doc_id"), col("n_cues"),
        col("sub_ms").cast("long").as("sub_ms"),
        col("video_ms"),
        expr("sub_ms * 1000000 div video_ms").as("coverage_ppm"),
        (col("last_end_ms") > col("video_ms")).as("overrun"))
  }

  val subtitleCoverageOracle: String =
    """WITH c AS (
      |  SELECT doc_id,
      |         CAST(2 + doc_id % 4 AS INT) AS n_cues,
      |         CAST(list_sum(list_transform(
      |           generate_series(0, 1 + doc_id % 4),
      |           i -> 1200 + 100 * ((doc_id + i) % 5))) AS BIGINT) AS sub_ms,
      |         (doc_id % 10) * 100 + (1 + doc_id % 4) * 2500 + 1200
      |           + 100 * ((doc_id + 1 + doc_id % 4) % 5) AS last_end,
      |         CAST((5 + doc_id % 7) * 400 AS BIGINT) AS video_ms
      |  FROM documents)
      |SELECT doc_id, n_cues, sub_ms, video_ms,
      |       sub_ms * 1000000 // video_ms AS coverage_ppm,
      |       last_end > video_ms AS overrun
      |FROM c
      |""".stripMargin

  /** ICO (favicon) census — ICONDIR walk over real assembled icons:
    * entry count, largest raster (0-encodes-256 rule exercised), and
    * how many entries carry whole-PNG payloads vs BMP fragments
    * (sniffed by magic, not trusted from the directory). Favicons are
    * the highest-frequency image fetch in a crawl; the census keeps
    * them out of the full-decode path. Map-only directory peek. */
  def icoCensusQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.{IcoCodec, ImageCodec}
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.map { id =>
          val n = 1 + (id % 4).toInt
          val entries = (0 until n).map { e =>
            val s = Array(16, 32, 48, 256)(((id + e) % 4).toInt)
            val payload =
              if ((id + e) % 3 == 0)
                ImageCodec.writePng(4, 4, (id % 7).toByte, e.toByte, 3)
              else new Array[Byte](40 + e * 8)
            (s, s, payload)
          }
          (id, IcoCodec.writeIco(entries))
        }
      }
      .mapPartitions { rows =>
        rows.flatMap { case (id, ico) =>
          graft.functions.IcoCodec.census(ico).map { m =>
            (id, m.nEntries, m.maxW, m.maxH, m.nPng)
          }
        }
      }
      .toDF("doc_id", "n_entries", "max_w", "max_h", "n_png")
  }

  val icoCensusOracle: String =
    """WITH e AS (
      |  SELECT doc_id,
      |         list_transform(generate_series(0, doc_id % 4),
      |           e -> CASE (doc_id + e) % 4 WHEN 0 THEN 16 WHEN 1 THEN 32
      |                WHEN 2 THEN 48 ELSE 256 END) AS sizes,
      |         len(list_filter(generate_series(0, doc_id % 4),
      |           e -> (doc_id + e) % 3 = 0)) AS n_png
      |  FROM documents)
      |SELECT doc_id,
      |       CAST(doc_id % 4 + 1 AS INT) AS n_entries,
      |       CAST(list_max(sizes) AS INT) AS max_w,
      |       CAST(list_max(sizes) AS INT) AS max_h,
      |       CAST(n_png AS INT) AS n_png
      |FROM e
      |""".stripMargin

  /** MJPEG scene-change detection — REAL two-level video decode: the
    * AVI container walk yields per-frame payloads that are genuine
    * baseline JPEGs, each frame's raster is fully Huffman+IDCT
    * decoded ([[graft.functions.JpegCodec.decodePixels]]), and a
    * scene boundary fires where the decoded gray level steps. The
    * fixture keeps frame levels on the 16-wide mid-band grid
    * (16·l + 8 at quality 97 → decode drift ≤ ±5, so `avg >> 4`
    * recovers l exactly — the JPEG-twin device from the perceptual
    * suite), levels step every `period` frames, and the oracle
    * predicts every decoded level and keyframe flag by formula.
    * Scene detection is per-payload local (sequential frame compare
    * inside the decode pass) — map-only, no shuffle at all before the
    * output rows. */
  def mjpegScenesQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.{JpegCodec, VideoCodec}
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.map { id =>
          val nf = 4 + (id % 5).toInt
          val period = 2 + (id % 3).toInt
          val frames = (0 until nf).map { f =>
            val l = ((id + f / period) % 16).toInt
            val g = 16 * l + 8
            JpegCodec.writeJpegPixels(16, 16, 97,
              (_, _) => (g << 16) | (g << 8) | g)
          }
          (id, VideoCodec.writeAvi(16, 16, 40000, frames))
        }
      }
      .mapPartitions { rows =>
        rows.flatMap { case (id, avi) =>
          val levels = VideoCodec.frames(avi).flatMap { jpeg =>
            JpegCodec.decodePixels(jpeg).map { px =>
              var sum = 0L
              var i = 0
              while (i < px.rgb.length) { sum += px.rgb(i) & 0xff; i += 3 }
              ((sum / (px.rgb.length / 3)).toInt) >> 4
            }
          }
          levels.zipWithIndex.map { case (l, f) =>
            (id, f, l, f == 0 || l != levels(f - 1))
          }
        }
      }
      .toDF("doc_id", "frame_idx", "level", "is_key")
      .select(col("doc_id"), col("frame_idx").cast("int").as("frame_idx"),
        col("level").cast("int").as("level"), col("is_key"))
  }

  val mjpegScenesOracle: String =
    """SELECT doc_id, CAST(f AS INT) AS frame_idx,
      |       CAST((doc_id + f // (2 + doc_id % 3)) % 16 AS INT) AS level,
      |       f % (2 + doc_id % 3) = 0 AS is_key
      |FROM documents, unnest(generate_series(0, 3 + doc_id % 5)) u(f)
      |""".stripMargin

  /** Animated-WebP scene detection — the [[mjpegScenesQuery]] shape
    * over the new full ANMF walk: every frame is REAL-decoded (VP8L)
    * and composited onto the canvas honoring offsets, alpha blending,
    * and dispose-to-background, then a scene boundary fires where the
    * composited gray level steps. Each doc alternates full-canvas
    * level frames with small OFFSET inset frames that alpha-blend a
    * half-transparent patch of the SAME level (blending same-color
    * pixels is integer-exact, so the canvas mean stays on the 16-grid)
    * and then dispose their rect to background — the compositing paths
    * all run while the oracle stays a pure id formula. VP8L is
    * lossless, so `mean >> 4` recovers the level exactly. Map-only. */
  def webpScenesQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.{Vp8lCodec, WebpCodec}
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.map { id =>
          val nPairs = 2 + (id % 3).toInt
          val period = 1 + (id % 2).toInt
          val frames = (0 until 2 * nPairs).map { f =>
            val k = f / 2
            val l = ((id + k / period) % 16).toInt
            val g = 16 * l + 8
            if (f % 2 == 0) {
              val img = Vp8lCodec.writeWebpPixels(8, 8,
                (_, _) => (g << 16) | (g << 8) | g).drop(12)
              WebpCodec.AnmfSpec(0, 0, 8, 8, 40, noBlend = true,
                disposeBg = false, img)
            } else {
              // 2×2 half-alpha inset at an id-dependent EVEN offset,
              // same gray → blend leaves the canvas unchanged; its
              // dispose fills the rect with background, which the next
              // full frame overwrites
              val argb = Array.fill(4)(0x80000000 | (g << 16) | (g << 8) | g)
              val payload = Vp8lCodec.encode(2, 2, argb)
              val img = "VP8L".getBytes("US-ASCII") ++
                Array((payload.length & 0xff).toByte,
                  ((payload.length >> 8) & 0xff).toByte,
                  ((payload.length >> 16) & 0xff).toByte,
                  ((payload.length >> 24) & 0xff).toByte) ++
                (if (payload.length % 2 == 1) payload :+ 0.toByte else payload)
              WebpCodec.AnmfSpec(2 * (id % 4).toInt, 2 * (f % 4), 2, 2,
                40, noBlend = false, disposeBg = true, img)
            }
          }
          (id, WebpCodec.writeAnimatedFrames(8, 8, (id % 3).toInt,
            0xff202020L, frames))
        }
      }
      .mapPartitions { rows =>
        rows.flatMap { case (id, webp) =>
          WebpCodec.compositeFrames(webp).toSeq.flatMap { snaps =>
            val levels = snaps.map { case (_, canvas) =>
              var sum = 0L
              var i = 0
              while (i < canvas.length) { sum += (canvas(i) >> 8) & 0xff; i += 1 }
              (sum / canvas.length).toInt >> 4
            }
            levels.zipWithIndex.map { case (l, f) =>
              (id, f, l, f == 0 || l != levels(f - 1))
            }
          }
        }
      }
      .toDF("doc_id", "frame_idx", "level", "is_key")
      .select(col("doc_id"), col("frame_idx").cast("int").as("frame_idx"),
        col("level").cast("int").as("level"), col("is_key"))
  }

  val webpScenesOracle: String =
    """SELECT doc_id, CAST(f AS INT) AS frame_idx,
      |       CAST((doc_id + (f // 2) // (1 + doc_id % 2)) % 16 AS INT)
      |         AS level,
      |       f = 0 OR
      |       (doc_id + (f // 2) // (1 + doc_id % 2)) % 16 <>
      |       (doc_id + ((f - 1) // 2) // (1 + doc_id % 2)) % 16 AS is_key
      |FROM documents,
      |     unnest(generate_series(0, 2 * (2 + doc_id % 3) - 1)) u(f)
      |""".stripMargin

  /** AVIF/HEIF census — brand, ispe dimensions, pixi bit depth, iinf
    * item count over formula-built containers ([[graft.functions
    * .IsoBmff.writeAvif]]): the fastest-growing image container joins
    * the format-census family. Header-only, map-only.
    *
    * SCOPE (stated here because this row is what a consumer reads):
    * AV1 PAYLOAD decode is out of scope — an intra-frame AV1 decoder
    * is a VP8-scale project; AVIF routes to census + metadata dedup
    * (dimensions, depth, item inventory), and pixel-level neardup for
    * AVIF returns None honestly rather than decoding garbage. */
  def avifCensusQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.IsoBmff
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val brands = Array("avif", "avis", "heic", "mif1")
          val brand = brands((id % 4).toInt)
          val w = 16 + (id % 100)
          val h = 16 + (id % 64)
          val depths = Array(8, 10, 12)
          val depth = depths((id % 3).toInt)
          val n = 1 + (id % 4).toInt
          val bytes = IsoBmff.writeAvif(brand, w, h, depth, n)
          IsoBmff.avifCensus(bytes).map(m =>
            (id, m.brand, m.width, m.height, m.depth, m.nItems))
        }
      }
      .toDF("doc_id", "brand", "width", "height", "depth", "n_items")
      .select(col("doc_id"), col("brand"), col("width"), col("height"),
        col("depth").cast("int").as("depth"),
        col("n_items").cast("int").as("n_items"))
  }

  val avifCensusOracle: String =
    """SELECT doc_id,
      |       CASE doc_id % 4 WHEN 0 THEN 'avif' WHEN 1 THEN 'avis'
      |            WHEN 2 THEN 'heic' ELSE 'mif1' END AS brand,
      |       CAST(16 + doc_id % 100 AS BIGINT) AS width,
      |       CAST(16 + doc_id % 64 AS BIGINT) AS height,
      |       CAST(CASE doc_id % 3 WHEN 0 THEN 8 WHEN 1 THEN 10
      |            ELSE 12 END AS INT) AS depth,
      |       CAST(1 + doc_id % 4 AS INT) AS n_items
      |FROM documents
      |""".stripMargin

  // ---------------------------------------------- GIF animation census

  /** Formula-built animated GIFs: (id%4)+2 frames, (id%7+1)·5 cs per
    * frame, NETSCAPE loop count id%3 (0 = forever); frame rasters carry
    * the id pattern shifted per frame. */
  def gifAnimPayloads(spark: SparkSession, dir: String): Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.map { id =>
          val w0 = 9 + 3 * (id % 4).toInt
          val h0 = 9 + 3 * (id % 3).toInt
          (id, graft.functions.GifCodec.writeGifAnimated(
            w0, h0,
            frames = (id % 4).toInt + 2,
            delayCs = ((id % 7).toInt + 1) * 5,
            loopCount = (id % 3).toInt,
            (f, x, y) => patternPx(id + f, w0, h0)(x, y)))
        }
      }
  }

  /** ANIMATED-GIF CENSUS: frame count, total duration, loop count from
    * the block walk — the governance readout that budgets frame
    * sampling and flags short-loop spam before any raster decode. */
  def gifAnimCensus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    gifAnimPayloads(spark, dir)
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          graft.functions.GifCodec.animMeta(bytes).map(m =>
            (id, m.nFrames, m.totalDelayCs, m.loopCount))
        }
      }
      .toDF("doc_id", "n_frames", "total_delay_cs", "loop_count")
      .select(col("doc_id"), col("n_frames").cast("int").as("n_frames"),
        col("total_delay_cs").cast("long").as("total_delay_cs"),
        col("loop_count").cast("int").as("loop_count"))
  }

  val gifAnimCensusOracle: String =
    """SELECT doc_id,
      |       CAST(doc_id % 4 + 2 AS INT) AS n_frames,
      |       CAST((doc_id % 4 + 2) * ((doc_id % 7 + 1) * 5) AS BIGINT)
      |         AS total_delay_cs,
      |       CAST(doc_id % 3 AS INT) AS loop_count
      |FROM documents
      |""".stripMargin

  /** ANIMATED-GIF FRAME SAMPLING: decode every frame
    * ([[graft.functions.GifCodec.decodeFrames]] — the AVI
    * frame-extraction twin for the animation format) and emit per-frame
    * perceptual content: the sum of the frame's nine 3×3-cell grays
    * (each cell is constant by construction, sampled at the cell
    * origin). Frame f of doc d carries pattern id d+f, so every row is
    * formula-predictable; the gate proves the MULTI-frame LZW walk, not
    * just frame 0. */
  def gifFrameFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    gifAnimPayloads(spark, dir)
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          graft.functions.GifCodec.decodeFrames(bytes).toSeq.flatMap { frames =>
            frames.zipWithIndex.map { case (p, f) =>
              val cw = p.width / 3; val ch = p.height / 3
              var s = 0L
              var c = 0
              while (c < 9) {
                val x = (c % 3) * cw; val y = (c / 3) * ch
                s += (p.rgb((y * p.width + x) * 3) & 0xff).toLong
                c += 1
              }
              (id, f, p.width, p.height, s)
            }
          }
        }
      }
      .toDF("doc_id", "frame_id", "w", "h", "gray_sum9")
      .select(col("doc_id"), col("frame_id").cast("int").as("frame_id"),
        col("w").cast("int").as("w"), col("h").cast("int").as("h"),
        col("gray_sum9").cast("long").as("gray_sum9"))
  }

  val gifFrameFeaturesOracle: String = {
    // gray_sum9(id) = sum over k=0..8 of ((id >> 4k) & 15)*16 + 8
    val sum9 = (0 until 9)
      .map(k => s"(((doc_id + f) >> ${4 * k}) & 15) * 16 + 8")
      .mkString(" + ")
    s"""SELECT doc_id,
       |       CAST(f AS INT) AS frame_id,
       |       CAST(9 + 3 * (doc_id % 4) AS INT) AS w,
       |       CAST(9 + 3 * (doc_id % 3) AS INT) AS h,
       |       CAST($sum9 AS BIGINT) AS gray_sum9
       |FROM documents, unnest(generate_series(0, CAST(doc_id % 4 + 1 AS INT))) u(f)
       |""".stripMargin
  }

  // --------------------------------------------------- WebP census

  /** Formula-built WebP headers cycling the three frame kinds by id —
    * lossy VP8, lossless VP8L, extended VP8X — with id-derived
    * dimensions, so the census is fully oracle-predictable. */
  def webpPayloads(spark: SparkSession, dir: String): Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    import graft.functions.WebpCodec
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.map { id =>
          val w = 16 + (id % 50).toInt * 7
          val h = 16 + (id % 30).toInt * 11
          val bytes = (id % 3) match {
            case 0 => WebpCodec.writeLossyHeader(w, h)
            case 1 => WebpCodec.writeLosslessHeader(w, h)
            case _ => WebpCodec.writeExtendedHeader(w, h)
          }
          (id, bytes)
        }
      }
  }

  /** WEBP CENSUS: variant (lossy/lossless/extended) and dimensions from
    * the RIFF header walk — no sample decode, the corpus-governance
    * readout for the second-most-common crawled image format after
    * JPEG. */
  def webpCensus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    webpPayloads(spark, dir)
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          graft.functions.WebpCodec.meta(bytes).map(m =>
            (id, m.variant, m.width, m.height))
        }
      }
      .toDF("doc_id", "variant", "w", "h")
      .select(col("doc_id"), col("variant"),
        col("w").cast("int").as("w"), col("h").cast("int").as("h"))
  }

  val webpCensusOracle: String =
    """SELECT doc_id,
      |       CASE CAST(doc_id % 3 AS INT)
      |         WHEN 0 THEN 'lossy' WHEN 1 THEN 'lossless'
      |         ELSE 'extended' END AS variant,
      |       CAST(16 + (doc_id % 50) * 7 AS INT) AS w,
      |       CAST(16 + (doc_id % 30) * 11 AS INT) AS h
      |FROM documents
      |""".stripMargin

  /** ANIMATED-WEBP CENSUS + FIRST-FRAME DECODE: per document a real
    * animated container (VP8X/ANIM/ANMF, frames embedding real VP8L
    * chunks from the lossless encoder), censused from headers alone —
    * frame count, total duration, loop count, frame dims — plus the
    * first frame rebuilt as a standalone image and PIXEL-DECODED
    * through the existing VP8L path (r0/g0/b0 prove actual decode,
    * not header echo). The WebP twin of the GIF animation census. */
  def webpAnimCensus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.{Vp8lCodec, WebpCodec}
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val nFrames = (id % 4).toInt + 2
          val delay = 40 + (id % 25).toInt * 10
          val loop = (id % 5).toInt
          val fw = 8 + (id % 9).toInt
          val fh = 8 + (id % 7).toInt
          val rgb = (((id % 200) + 10).toInt << 16) |
            (((id % 150) + 20).toInt << 8) | ((id % 100) + 30).toInt
          val imgChunk =
            Vp8lCodec.writeWebpPixels(fw, fh, (_, _) => rgb).drop(12)
          val anim = WebpCodec.writeAnimated(fw, fh, loop,
            Seq.fill(nFrames)((fw, fh, delay, imgChunk)))
          for {
            m <- WebpCodec.animMeta(anim)
            frame <- WebpCodec.firstFrameWebp(anim)
            px <- Vp8lCodec.decodePixels(frame)
          } yield (id, m.nFrames, m.totalDurationMs, m.loopCount,
            px.width, px.height, px.rgb(0) & 0xff, px.rgb(1) & 0xff,
            px.rgb(2) & 0xff)
        }
      }
      .toDF("doc_id", "n_frames", "total_ms", "loop_count", "fw", "fh",
        "r0", "g0", "b0")
      .select(col("doc_id"), col("n_frames").cast("int").as("n_frames"),
        col("total_ms"), col("loop_count").cast("int").as("loop_count"),
        col("fw").cast("int").as("fw"), col("fh").cast("int").as("fh"),
        col("r0").cast("int").as("r0"), col("g0").cast("int").as("g0"),
        col("b0").cast("int").as("b0"))
  }

  val webpAnimCensusOracle: String =
    """SELECT doc_id,
      |       CAST(doc_id % 4 + 2 AS INT) AS n_frames,
      |       CAST((doc_id % 4 + 2) * (40 + (doc_id % 25) * 10) AS BIGINT)
      |         AS total_ms,
      |       CAST(doc_id % 5 AS INT) AS loop_count,
      |       CAST(8 + doc_id % 9 AS INT) AS fw,
      |       CAST(8 + doc_id % 7 AS INT) AS fh,
      |       CAST(doc_id % 200 + 10 AS INT) AS r0,
      |       CAST(doc_id % 150 + 20 AS INT) AS g0,
      |       CAST(doc_id % 100 + 30 AS INT) AS b0
      |FROM documents
      |""".stripMargin

  // ----------------------------------------------------- MP3 census

  /** Formula-built MP3 headers: bitrate index id%14+1, sample-rate
    * index id%3, ID3v2 tag on every even id sized (id%50)*7. */
  def mp3Payloads(spark: SparkSession, dir: String): Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.map { id =>
          (id, graft.functions.Mp3Codec.writeMp3Header(
            (id % 14).toInt + 1, (id % 3).toInt,
            if (id % 2 == 0) (id % 50).toInt * 7 else 0))
        }
      }
  }

  /** MP3 CENSUS: MPEG version/layer, bitrate, sample rate, and ID3 tag
    * size — the compressed-audio governance readout (bitrate mix for
    * transcode budgeting, tag share of the byte volume). */
  def mp3Census(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mp3Payloads(spark, dir)
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          graft.functions.Mp3Codec.meta(bytes).map(m =>
            (id, m.version, m.layer, m.bitrateKbps, m.sampleRate, m.id3Size))
        }
      }
      .toDF("doc_id", "version", "layer", "bitrate_kbps", "sample_rate", "id3_size")
      .select(col("doc_id"), col("version"),
        col("layer").cast("int").as("layer"),
        col("bitrate_kbps").cast("int").as("bitrate_kbps"),
        col("sample_rate").cast("int").as("sample_rate"),
        col("id3_size").cast("int").as("id3_size"))
  }

  /** MP3 FRAME WALK: exact frame-count/duration for headerless-VBR
    * streams (no Xing anywhere — the case the census estimate cannot
    * serve), stepping every frame by its own bitrate's size. The
    * n_bitrates column proves the walk read each header rather than
    * extrapolating from the first. */
  def mp3FrameWalkQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.Mp3Codec
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val n = (id % 60).toInt + 3
          val bytes = Mp3Codec.writeMp3Vbr((id % 3).toInt, mono = false, n,
            f => ((id + f) % 14).toInt + 1)
          Mp3Codec.frameWalk(bytes).map(w =>
            (id, w.frames, w.durationMs, w.nBitrates))
        }
      }
      .toDF("doc_id", "n_frames", "duration_ms", "n_bitrates")
      .select(col("doc_id"), col("n_frames"), col("duration_ms"),
        col("n_bitrates").cast("int").as("n_bitrates"))
  }

  val mp3FrameWalkOracle: String =
    """SELECT doc_id,
      |       CAST(doc_id % 60 + 3 AS BIGINT) AS n_frames,
      |       CAST((doc_id % 60 + 3) * 1152 * 1000 // (CASE CAST(doc_id % 3 AS INT)
      |         WHEN 0 THEN 44100 WHEN 1 THEN 48000 ELSE 32000 END) AS BIGINT)
      |         AS duration_ms,
      |       CAST(least(doc_id % 60 + 3, 14) AS INT) AS n_bitrates
      |FROM documents
      |""".stripMargin

  val mp3CensusOracle: String =
    """SELECT doc_id,
      |       '1' AS version, 3 AS layer,
      |       CAST(CASE CAST(doc_id % 14 + 1 AS INT)
      |         WHEN 1 THEN 32 WHEN 2 THEN 40 WHEN 3 THEN 48 WHEN 4 THEN 56
      |         WHEN 5 THEN 64 WHEN 6 THEN 80 WHEN 7 THEN 96 WHEN 8 THEN 112
      |         WHEN 9 THEN 128 WHEN 10 THEN 160 WHEN 11 THEN 192
      |         WHEN 12 THEN 224 WHEN 13 THEN 256 ELSE 320 END AS INT)
      |         AS bitrate_kbps,
      |       CAST(CASE CAST(doc_id % 3 AS INT)
      |         WHEN 0 THEN 44100 WHEN 1 THEN 48000 ELSE 32000 END AS INT)
      |         AS sample_rate,
      |       -- a zero-size tag is not written at all (no 10-byte header)
      |       CAST(CASE WHEN doc_id % 2 = 0 AND doc_id % 50 > 0
      |         THEN 10 + (doc_id % 50) * 7 ELSE 0 END AS INT) AS id3_size
      |FROM documents
      |""".stripMargin

  /** VorbisComment / OpusTags census — the streamed-audio twin of the
    * EXIF and ID3 privacy censuses: artist identity in ARTIST, contact
    * email in COMMENT (planted on every third doc), parsed from the
    * second Ogg packet for BOTH codecs. One row per tag field, with an
    * email flag the scrub pipeline routes by. */
  def oggTagsQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.OggCodec
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val codec = if (id % 2 == 0) "vorbis" else "opus"
          val tags = Seq(
            "ARTIST" -> s"artist ${id % 13}",
            "TITLE" -> s"track ${id % 31}") ++
            (if (id % 3 == 0)
              Seq("COMMENT" -> s"contact c${id % 7}@ex.org") else Nil)
          val ogg = OggCodec.writeOgg(codec, 1 + (id % 2).toInt,
            if (codec == "opus") 48000 else 44100,
            (id % 3).toInt + 1, (id % 100) + 5, tags = tags)
          OggCodec.comments(ogg).toSeq.flatMap { case (_, fields) =>
            fields.map { case (k, v) =>
              (id, codec, k, v, v.contains("@"))
            }
          }
        }
      }
      .toDF("doc_id", "codec", "tag_key", "tag_value", "has_email")
  }

  val oggTagsOracle: String =
    """WITH f AS (
      |  SELECT doc_id, 'ARTIST' AS tag_key,
      |         'artist ' || CAST(doc_id % 13 AS VARCHAR) AS tag_value
      |  FROM documents
      |  UNION ALL
      |  SELECT doc_id, 'TITLE',
      |         'track ' || CAST(doc_id % 31 AS VARCHAR)
      |  FROM documents
      |  UNION ALL
      |  SELECT doc_id, 'COMMENT',
      |         'contact c' || CAST(doc_id % 7 AS VARCHAR) || '@ex.org'
      |  FROM documents WHERE doc_id % 3 = 0)
      |SELECT doc_id,
      |       CASE WHEN doc_id % 2 = 0 THEN 'vorbis' ELSE 'opus' END AS codec,
      |       tag_key, tag_value,
      |       tag_key = 'COMMENT' AS has_email
      |FROM f
      |""".stripMargin

  // -------------------------------------------- audio format census

  /** Mixed audio fixture, one payload per document, format by id%5:
    * PCM WAV, MP3 (Xing-tagged VBR on even id/5, whole CBR frames
    * otherwise), FLAC header, Ogg Vorbis, Ogg Opus — the five
    * containers a crawled audio corpus is actually made of. Each
    * parameter is a doc_id formula so the census is
    * oracle-predictable.
    *
    * SCOPE (stated here because this row is what a consumer reads):
    * Opus coverage is container-level — census, OpusTags, duration
    * from the granule clock. SILK/CELT SAMPLE synthesis is out of
    * scope (a codec-scale project with no in-container reference to
    * gate it); Opus payloads route to census + dedup-by-tags/duration,
    * never to silent garbage — the same honest-refusal pattern as the
    * AVIF census's AV1 stance. */
  def audioFormatPayloads(spark: SparkSession, dir: String)
      : Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    import graft.functions.{AudioCodec, FlacCodec, Mp3Codec, OggCodec}
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.map { id =>
          val ch = (id % 2).toInt + 1
          val bytes = (id % 5) match {
            case 0 => AudioCodec.writeWav(
              Array(8000, 16000, 44100)((id % 3).toInt), ch,
              (id % 50).toInt + 10, (s, c) => (s * 7 + c).toShort)
            case 1 =>
              if ((id / 5) % 2 == 0)
                Mp3Codec.writeMp3Xing((id % 3).toInt, mono = ch == 1,
                  (id % 400).toInt + 5)
              else
                Mp3Codec.writeMp3Cbr((id % 14).toInt + 1, (id % 3).toInt,
                  mono = ch == 1, (id % 40).toInt + 2)
            case 2 => FlacCodec.writeFlacHeader(
              Array(44100, 48000, 96000, 22050)((id % 4).toInt), ch,
              if (id % 2 == 0) 16 else 24, (id % 1000) + 1,
              tags = id % 2 == 0)
            case 3 => OggCodec.writeOgg("vorbis",
              ch, Array(44100, 48000)((id % 2).toInt),
              (id % 4).toInt + 1, (id % 500) + 10)
            case _ => OggCodec.writeOgg("opus",
              ch, 48000, (id % 3).toInt + 1, (id % 500) + 10,
              preSkip = (id % 8).toInt * 40)
          }
          (id, bytes)
        }
      }
  }

  /** AUDIO FORMAT CENSUS: container/codec, sample rate, channels, and
    * total samples DETECTED from the bytes across the five-format mix
    * — the first readout an audio-curation pass produces (format mix
    * for transcode routing, rate/volume for budget). The MP3 arm
    * reports duration the way real tools do without decoding: the
    * Xing frame count when the first frame carries one, else the CBR
    * `bytes / frameSize` estimate ([[graft.functions.Mp3Codec.meta]]).
    * Header-only walks everywhere: no sample decode. */
  def audioFormatCensus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.{AudioCodec, FlacCodec, Mp3Codec, OggCodec}
    audioFormatPayloads(spark, dir)
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          // duration in ms from header state only — Vorbis granules are
          // stream-rate PCM samples, Opus granules 48 kHz ticks net of
          // pre-skip, WAV/FLAC carry sample counts, MP3 frames carry
          // 1152 samples each (count from Xing or the CBR estimate)
          val cell: Option[(String, Int, Int, Long, Long)] =
            if (bytes.length >= 4 && bytes(0) == 'R' && bytes(1) == 'I')
              AudioCodec.decode(bytes).map(m =>
                ("wav", m.sampleRate, m.channels, m.nSamples.toLong,
                  m.nSamples.toLong * 1000L / m.sampleRate))
            else if (bytes.length >= 4 && bytes(0) == 'f' && bytes(1) == 'L')
              FlacCodec.meta(bytes).map(m =>
                ("flac", m.sampleRate, m.channels, m.totalSamples,
                  if (m.totalSamples > 0 && m.sampleRate > 0)
                    m.totalSamples * 1000L / m.sampleRate
                  else -1L))
            else if (bytes.length >= 4 && bytes(0) == 'O' && bytes(1) == 'g')
              OggCodec.meta(bytes).map(m =>
                (s"ogg-${m.codec}", m.sampleRate, m.channels, m.lastGranule,
                  m.durationMs))
            else
              Mp3Codec.meta(bytes).map { m =>
                val ns = if (m.frames >= 0)
                  m.frames * Mp3Codec.SamplesPerFrameV1L3 else -1L
                ("mp3", m.sampleRate, m.channels, ns, m.durationMs)
              }
          cell.map { case (f, sr, c, n, d) => (id, f, sr, c, n, d) }
        }
      }
      .toDF("doc_id", "format", "sample_rate", "channels", "n_samples",
        "duration_ms")
      .select(col("doc_id"), col("format"),
        col("sample_rate").cast("int").as("sample_rate"),
        col("channels").cast("int").as("channels"), col("n_samples"),
        col("duration_ms").cast("long").as("duration_ms"))
  }

  val audioFormatCensusOracle: String =
    """SELECT doc_id,
      |       CASE CAST(doc_id % 5 AS INT)
      |         WHEN 0 THEN 'wav' WHEN 1 THEN 'mp3' WHEN 2 THEN 'flac'
      |         WHEN 3 THEN 'ogg-vorbis' ELSE 'ogg-opus' END AS format,
      |       CAST(CASE CAST(doc_id % 5 AS INT)
      |         WHEN 0 THEN CASE CAST(doc_id % 3 AS INT)
      |           WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END
      |         WHEN 1 THEN CASE CAST(doc_id % 3 AS INT)
      |           WHEN 0 THEN 44100 WHEN 1 THEN 48000 ELSE 32000 END
      |         WHEN 2 THEN CASE CAST(doc_id % 4 AS INT)
      |           WHEN 0 THEN 44100 WHEN 1 THEN 48000 WHEN 2 THEN 96000
      |           ELSE 22050 END
      |         WHEN 3 THEN CASE WHEN doc_id % 2 = 0 THEN 44100 ELSE 48000 END
      |         ELSE 48000 END AS INT) AS sample_rate,
      |       CAST(doc_id % 2 + 1 AS INT) AS channels,
      |       CAST(CASE CAST(doc_id % 5 AS INT)
      |         WHEN 0 THEN doc_id % 50 + 10
      |         WHEN 1 THEN (CASE WHEN (doc_id // 5) % 2 = 0
      |           THEN doc_id % 400 + 5 ELSE doc_id % 40 + 2 END) * 1152
      |         WHEN 2 THEN doc_id % 1000 + 1
      |         ELSE doc_id % 500 + 10 END AS BIGINT) AS n_samples,
      |       CAST(CASE CAST(doc_id % 5 AS INT)
      |         WHEN 0 THEN (doc_id % 50 + 10) * 1000 // (CASE CAST(doc_id % 3 AS INT)
      |           WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END)
      |         WHEN 1 THEN (CASE WHEN (doc_id // 5) % 2 = 0
      |           THEN doc_id % 400 + 5 ELSE doc_id % 40 + 2 END) * 1152 * 1000
      |           // (CASE CAST(doc_id % 3 AS INT)
      |           WHEN 0 THEN 44100 WHEN 1 THEN 48000 ELSE 32000 END)
      |         WHEN 2 THEN (doc_id % 1000 + 1) * 1000 // (CASE CAST(doc_id % 4 AS INT)
      |           WHEN 0 THEN 44100 WHEN 1 THEN 48000 WHEN 2 THEN 96000
      |           ELSE 22050 END)
      |         WHEN 3 THEN (doc_id % 500 + 10) * 1000
      |           // (CASE WHEN doc_id % 2 = 0 THEN 44100 ELSE 48000 END)
      |         ELSE greatest(doc_id % 500 + 10 - (doc_id % 8) * 40, 0)
      |           * 1000 // 48000 END AS BIGINT) AS duration_ms
      |FROM documents
      |""".stripMargin

  // ----------------------------------------------------- PDF census

  /** Formula-built PDFs: version 1.(id%5+2), id%9+1 pages, every 4th
    * document encrypted (standard-security-handler stub + trailer
    * /Encrypt). */
  def pdfPayloads(spark: SparkSession, dir: String): Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.map { id =>
          (id, graft.functions.PdfCodec.writePdf(
            s"1.${(id % 5) + 2}", (id % 9).toInt + 1, id % 4 == 0))
        }
      }
  }

  /** PDF CENSUS: version / page count / encrypted flag from the
    * document structure — the governance readout (version mix,
    * page-volume extraction budgeting, encrypted share → rejects) that
    * precedes any text-extraction pass over the dominant crawled
    * document format. */
  def pdfCensus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    pdfPayloads(spark, dir)
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          graft.functions.PdfCodec.meta(bytes).map(m =>
            (id, m.version, m.nPages, m.encrypted))
        }
      }
      .toDF("doc_id", "version", "n_pages", "encrypted")
      .select(col("doc_id"), col("version"),
        col("n_pages").cast("int").as("n_pages"), col("encrypted"))
  }

  val pdfCensusOracle: String =
    """SELECT doc_id,
      |       '1.' || CAST(doc_id % 5 + 2 AS VARCHAR) AS version,
      |       CAST(doc_id % 9 + 1 AS INT) AS n_pages,
      |       doc_id % 4 = 0 AS encrypted
      |FROM documents
      |""".stripMargin

  /** Text-bearing PDFs: id%4+1 pages, each showing a formula string
    * that includes parentheses and a backslash so the literal-string
    * escaping path is exercised, not just happy-path ASCII. Every 3rd
    * document's content streams are FlateDecode-compressed (zlib), so
    * the extractor's inflate path is exercised against the mix a real
    * crawl presents — uncompressed streams are the minority there. */
  def pdfTextPayloads(spark: SparkSession, dir: String): Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.map { id =>
          val texts = (0 until (id % 4).toInt + 1).map(p =>
            s"page $p of document $id (formula) q\\end")
          (id, graft.functions.PdfCodec.writePdfWithText(
            s"1.${(id % 5) + 2}", texts, flate = id % 3 == 0))
        }
      }
  }

  /** PDF TEXT EXTRACTION: per-page text out of content streams,
    * inflating `/Filter /FlateDecode` ones (zlib) — the actual
    * extraction step a document pipeline runs after the census. The
    * `flate` column is DETECTED from each stream's object dictionary,
    * not echoed from the fixture formula, so the oracle match proves
    * the filter walk saw what the writer emitted. */
  def pdfExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    pdfTextPayloads(spark, dir)
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          graft.functions.PdfCodec.extractPages(bytes).toSeq.flatMap { pages =>
            pages.zipWithIndex.map { case ((t, wasFlate), p) =>
              val md = java.security.MessageDigest.getInstance("MD5")
              (id, p, t.length.toLong,
                md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString,
                wasFlate)
            }
          }
        }
      }
      .toDF("doc_id", "page_id", "n_chars", "text_md5", "flate")
      .select(col("doc_id"), col("page_id").cast("int").as("page_id"),
        col("n_chars"), col("text_md5"), col("flate"))
  }

  val pdfExtractOracle: String =
    """WITH t AS (
      |  SELECT doc_id, p,
      |         'page ' || CAST(p AS VARCHAR) || ' of document ' ||
      |         CAST(doc_id AS VARCHAR) || ' (formula) q\end' AS txt
      |  FROM documents, unnest(generate_series(0, CAST(doc_id % 4 AS INT))) u(p))
      |SELECT doc_id, CAST(p AS INT) AS page_id,
      |       CAST(length(txt) AS BIGINT) AS n_chars,
      |       md5(txt) AS text_md5,
      |       doc_id % 3 = 0 AS flate
      |FROM t
      |""".stripMargin

  /** PDF TJ-ARRAY extraction: pages emitted as `[ (lit) -250 <hex>
    * -20 (\157ctal…) ] TJ` arrays under a WinAnsiEncoding font — the
    * spellings real PDFs overwhelmingly use (literal Tj alone has
    * near-zero recall there). Inter-word kerning re-emits as spaces,
    * the intra-word -20 kern must not, hex/octal spellings and the
    * WinAnsi 0x80-region remaps (€ ™) must all land; every other doc's
    * streams are additionally FlateDecode-wrapped. The oracle rebuilds
    * each page's text by formula and matches per-page md5. */
  def pdfExtractTj(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val texts = (0 until (id % 3).toInt + 1).map(p =>
            s"doc $id page $p cost €${id % 100} brand ™ fin")
          val pdf = graft.functions.PdfCodec.writePdfTjText(
            s"1.${(id % 4) + 4}", texts, flate = id % 2 == 0)
          graft.functions.PdfCodec.extractText(pdf).toSeq.flatMap { pages =>
            val md = java.security.MessageDigest.getInstance("MD5")
            pages.zipWithIndex.map { case (t, p) =>
              (id, p, t.length.toLong,
                md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString)
            }
          }
        }
      }
      .toDF("doc_id", "page_id", "n_chars", "text_md5")
      .select(col("doc_id"), col("page_id").cast("int").as("page_id"),
        col("n_chars"), col("text_md5"))
  }

  val pdfExtractTjOracle: String =
    """WITH t AS (
      |  SELECT doc_id, p,
      |         'doc ' || CAST(doc_id AS VARCHAR) || ' page ' ||
      |         CAST(p AS VARCHAR) || ' cost €' ||
      |         CAST(doc_id % 100 AS VARCHAR) || ' brand ™ fin' AS txt
      |  FROM documents, unnest(generate_series(0, CAST(doc_id % 3 AS INT))) u(p))
      |SELECT doc_id, CAST(p AS INT) AS page_id,
      |       CAST(length(txt) AS BIGINT) AS n_chars,
      |       md5(txt) AS text_md5
      |FROM t
      |""".stripMargin

  /** PDF ToUnicode-CMAP extraction: pages show hex strings whose codes
    * resolve through a per-document bfchar CMap, with every "fi"
    * collapsed to one ligature code mapping to two codepoints — subset
    * fonts in the wild need exactly this resolution or extraction
    * produces garbage codes. Oracle replays the text by formula. */
  def pdfExtractCmap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val texts = (0 until (id % 2).toInt + 1).map(p =>
            s"fi doc $id λΩ page $p final fiction")
          val pdf = graft.functions.PdfCodec.writePdfCmapText("1.6", texts)
          graft.functions.PdfCodec.extractText(pdf).toSeq.flatMap { pages =>
            val md = java.security.MessageDigest.getInstance("MD5")
            pages.zipWithIndex.map { case (t, p) =>
              (id, p, t.length.toLong,
                md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString)
            }
          }
        }
      }
      .toDF("doc_id", "page_id", "n_chars", "text_md5")
      .select(col("doc_id"), col("page_id").cast("int").as("page_id"),
        col("n_chars"), col("text_md5"))
  }

  val pdfExtractCmapOracle: String =
    """WITH t AS (
      |  SELECT doc_id, p,
      |         'fi doc ' || CAST(doc_id AS VARCHAR) || ' λΩ page ' ||
      |         CAST(p AS VARCHAR) || ' final fiction' AS txt
      |  FROM documents, unnest(generate_series(0, CAST(doc_id % 2 AS INT))) u(p))
      |SELECT doc_id, CAST(p AS INT) AS page_id,
      |       CAST(length(txt) AS BIGINT) AS n_chars,
      |       md5(txt) AS text_md5
      |FROM t
      |""".stripMargin

  /** PDF 1.5+ extraction: fonts and page dicts live ONLY inside a
    * flate-compressed object stream, indexed by an xref STREAM — the
    * layout most post-2005 PDFs use, and the round-10 recall cap on
    * the TJ/CMap depth. Text rows prove the ObjStm expansion resolved
    * the CMap font; `objstm_objs` proves the xref-stream parser read
    * the type-2 rows (count = pages + catalog + pages root + font). */
  def pdfExtractObjStm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // per-doc deflate/inflate dominates; spread ids before the work
    // (see audioVorbisVariantPayloads — one parquet split otherwise
    // serializes the whole decode at fixture scales)
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val texts = (0 until (id % 3).toInt + 1).map(p =>
            s"fi objstm doc $id page $p official")
          val pdf = graft.functions.PdfCodec.writePdfObjStm("1.6", texts)
          val objstmObjs = graft.functions.PdfCodec.xrefStreamEntries(pdf)
            .map(_.values.count(_.entryType == 2)).getOrElse(-1)
          graft.functions.PdfCodec.extractText(pdf).toSeq.flatMap { pages =>
            val md = java.security.MessageDigest.getInstance("MD5")
            pages.zipWithIndex.map { case (t, p) =>
              (id, p, t.length.toLong,
                md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString,
                objstmObjs)
            }
          }
        }
      }
      .toDF("doc_id", "page_id", "n_chars", "text_md5", "objstm_objs")
      .select(col("doc_id"), col("page_id").cast("int").as("page_id"),
        col("n_chars"), col("text_md5"),
        col("objstm_objs").cast("int").as("objstm_objs"))
  }

  val pdfExtractObjStmOracle: String =
    """WITH t AS (
      |  SELECT doc_id, p,
      |         'fi objstm doc ' || CAST(doc_id AS VARCHAR) || ' page ' ||
      |         CAST(p AS VARCHAR) || ' official' AS txt
      |  FROM documents, unnest(generate_series(0, CAST(doc_id % 3 AS INT))) u(p))
      |SELECT doc_id, CAST(p AS INT) AS page_id,
      |       CAST(length(txt) AS BIGINT) AS n_chars,
      |       md5(txt) AS text_md5,
      |       CAST(doc_id % 3 + 4 AS INT) AS objstm_objs
      |FROM t
      |""".stripMargin

  /** ENCRYPTED-PDF extraction across all four standard-security-handler
    * generations, rotating by doc id: RC4 R2 (40-bit), RC4 R3
    * (128-bit), AESV2 (V4/R4, AES-128-CBC per-object keys), AESV3
    * (V5/R6, AES-256 + the SHA-2 hardened hash). Text is reachable
    * ONLY after authentication and in-place stream decryption (AES
    * space-fills the freed IV/padding tail), then the normal
    * extraction stack runs. Round 14: docs with id%5==2 carry a
    * NON-EMPTY user password (opened via a supplied password list,
    * Algorithms 6 / 2.A-user) and id%5==4 docs are opened via the
    * OWNER password alone (Algorithms 7 / 2.A-owner) — both arms
    * rotate across all four handler generations. The census arm (`r`,
    * `len_bits`, `open` = empty password suffices) rides along per
    * page. Map-only. */
  def pdfEncryptedQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val texts = (0 until (id % 3).toInt + 1).map(p =>
            s"rc4 locked doc $id page $p official")
          val flate = id % 3 == 0
          val userPwd = (id % 5) match {
            case 2 => s"user-$id"
            case 4 => s"hidden-$id" // never supplied: owner-branch arm
            case _ => ""
          }
          val (pdf, r, len) = (id % 4) match {
            case 0 => (graft.functions.PdfCodec.writePdfEncryptedText(
              "1.4", texts, s"owner-$id", 2, 40, flate, userPwd), 2, 40)
            case 1 => (graft.functions.PdfCodec.writePdfEncryptedText(
              "1.4", texts, s"owner-$id", 3, 128, flate, userPwd), 3, 128)
            case 2 => (graft.functions.PdfCodec.writePdfEncryptedAes(
              "1.6", texts, s"owner-$id", v5 = false, flate, userPwd),
              4, 128)
            case _ => (graft.functions.PdfCodec.writePdfEncryptedAes(
              "1.7", texts, s"owner-$id", v5 = true, flate, userPwd),
              6, 256)
          }
          val pwds = (id % 5) match {
            case 2 => Seq("wrong-pwd", s"user-$id")
            case 4 => Seq(s"owner-$id")
            case _ => Nil
          }
          val meta = graft.functions.PdfCodec.encryptMeta(pdf)
          graft.functions.PdfCodec.extractTextEncrypted(pdf, pwds).toSeq
            .flatMap { pages =>
              val md = java.security.MessageDigest.getInstance("MD5")
              pages.zipWithIndex.map { case (t, p) =>
                (id, p, t.length.toLong,
                  md.digest(t.getBytes("UTF-8"))
                    .map("%02x".format(_)).mkString,
                  r, len, meta.exists(_.emptyUserPwd))
              }
            }
        }
      }
      .toDF("doc_id", "page_id", "n_chars", "text_md5", "r", "len_bits",
        "open")
      .select(col("doc_id"), col("page_id").cast("int").as("page_id"),
        col("n_chars"), col("text_md5"), col("r").cast("int").as("r"),
        col("len_bits").cast("int").as("len_bits"), col("open"))
  }

  val pdfEncryptedOracle: String =
    """WITH t AS (
      |  SELECT doc_id, p,
      |         'rc4 locked doc ' || CAST(doc_id AS VARCHAR) || ' page ' ||
      |         CAST(p AS VARCHAR) || ' official' AS txt
      |  FROM documents, unnest(generate_series(0, CAST(doc_id % 3 AS INT))) u(p))
      |SELECT doc_id, CAST(p AS INT) AS page_id,
      |       CAST(length(txt) AS BIGINT) AS n_chars,
      |       md5(txt) AS text_md5,
      |       CAST(CASE doc_id % 4 WHEN 0 THEN 2 WHEN 1 THEN 3
      |                 WHEN 2 THEN 4 ELSE 6 END AS INT) AS r,
      |       CAST(CASE doc_id % 4 WHEN 0 THEN 40 WHEN 3 THEN 256
      |                 ELSE 128 END AS INT) AS len_bits,
      |       doc_id % 5 NOT IN (2, 4) AS open
      |FROM t
      |""".stripMargin

  /** INCREMENTALLY-UPDATED PDF extraction: each doc is a 1.5+ base
    * (fonts/pages in an object stream) plus an appended save-in-place
    * update that REPLACES page 0's content under its original object
    * number and APPENDS a page (re-emitting the pages root). Only
    * newest-wins resolution through the xref /Prev chain reads the
    * edited document — the linear stream walk would return the stale
    * revision AND a duplicate (asserted in Round11OpsSpec). */
  def pdfExtractIncremental(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val nPages = (id % 2).toInt + 1
          val baseTexts = (0 until nPages).map(p => s"fi base doc $id page $p")
          val base = graft.functions.PdfCodec.writePdfObjStm("1.6", baseTexts)
          val pdf = graft.functions.PdfCodec.writePdfIncrementalUpdate(
            base, nPages, s"revised doc $id", s"appendix doc $id")
          graft.functions.PdfCodec.extractTextIncremental(pdf)
            .toSeq.flatMap { pages =>
              val md = java.security.MessageDigest.getInstance("MD5")
              pages.zipWithIndex.map { case (t, p) =>
                (id, p, t.length.toLong,
                  md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString)
              }
            }
        }
      }
      .toDF("doc_id", "page_id", "n_chars", "text_md5")
      .select(col("doc_id"), col("page_id").cast("int").as("page_id"),
        col("n_chars"), col("text_md5"))
  }

  val pdfExtractIncrementalOracle: String =
    """WITH t AS (
      |  SELECT doc_id, p,
      |         CASE WHEN p = 0 THEN 'revised doc ' || CAST(doc_id AS VARCHAR)
      |              WHEN p = doc_id % 2 + 1
      |                THEN 'appendix doc ' || CAST(doc_id AS VARCHAR)
      |              ELSE 'fi base doc ' || CAST(doc_id AS VARCHAR)
      |                   || ' page ' || CAST(p AS VARCHAR) END AS txt
      |  FROM documents,
      |       unnest(generate_series(0, CAST(doc_id % 2 + 1 AS INT))) u(p))
      |SELECT doc_id, CAST(p AS INT) AS page_id,
      |       CAST(length(txt) AS BIGINT) AS n_chars,
      |       md5(txt) AS text_md5
      |FROM t
      |""".stripMargin

  // ------------------------------------------- image-text pair curation

  /** One image per document for the PAIR-CURATION fixture: the pattern
    * is keyed by `doc_id / 7` (integer division), so every 7-id run
    * shares one perceptual image while captions (the document texts)
    * keep their own near-clone families — the two duplicate axes are
    * DELIBERATELY different partitions, which is exactly what makes
    * joint survivorship a real operator and not a relabeled dedup. */
  def pairImagePayloads(spark: SparkSession, dir: String)
      : Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    import graft.functions.ImageCodec.writePngPixels
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.map { id =>
          val g = id / 7
          val w0 = 9 + 3 * (g % 4).toInt
          val h0 = 9 + 3 * (g % 3).toInt
          (id, writePngPixels(w0, h0, patternPx(g, w0, h0)))
        }
      }
  }

  /** IMAGE-TEXT PAIR CURATION — the LAION-style joint survivorship
    * pass: a (image, caption) pair survives iff its image is the
    * canonical (min doc_id) representative of its PERCEPTUAL image
    * group (real byte decode → 9×8 grid signature, [[imageSignatures]])
    * AND its caption is the canonical representative of its near-dup
    * text cluster ([[graft.ops.Dedup.clusters]] — MinHash-LSH connected
    * components). Dropping on EITHER axis is what keeps a caption
    * farm's thousand re-used captions (or a stock image re-captioned a
    * thousand ways) from flooding the training set.
    *
    * Scale shape: both axes are existing corpus-linear passes; the join
    * is doc-keyed; the image-group canonical is one grid-keyed
    * aggregate (signature-grain, 8-byte hash + 72-int grid). */
  def pairCuration(spark: SparkSession, dir: String): DataFrame = {
    val sigs = imageSignatures(pairImagePayloads(spark, dir))
    val imgCanon = sigs.groupBy(col("dhash"), col("grid"))
      .agg(min(col("doc_id")).as("img_canonical"))
    val img = sigs.join(imgCanon, Seq("dhash", "grid"))
      .select(col("doc_id"), col("img_canonical"))
    Tables.documents(spark, dir).select(col("doc_id"))
      .join(img, Seq("doc_id"))
      .join(graft.ops.Dedup.clusters(spark, dir), Seq("doc_id"), "left")
      .select(col("doc_id"), col("img_canonical"),
        coalesce(col("cluster_id"), col("doc_id")).as("cap_canonical"))
      .withColumn("keep_image", col("doc_id") === col("img_canonical"))
      .withColumn("keep_caption", col("doc_id") === col("cap_canonical"))
      .withColumn("survives", col("keep_image") && col("keep_caption"))
  }

  lazy val pairCurationOracle: String =
    s"""WITH cl AS (${graft.ops.Dedup.clustersOracle}),
       |img AS (
       |  SELECT doc_id, doc_id // 7 AS g FROM documents),
       |ic AS (
       |  SELECT g, min(doc_id) AS img_canonical FROM img GROUP BY 1)
       |SELECT d.doc_id,
       |       ic.img_canonical,
       |       coalesce(cl.cluster_id, d.doc_id) AS cap_canonical,
       |       d.doc_id = ic.img_canonical AS keep_image,
       |       d.doc_id = coalesce(cl.cluster_id, d.doc_id) AS keep_caption,
       |       d.doc_id = ic.img_canonical AND
       |         d.doc_id = coalesce(cl.cluster_id, d.doc_id) AS survives
       |FROM documents d
       |JOIN img ON d.doc_id = img.doc_id
       |JOIN ic ON img.g = ic.g
       |LEFT JOIN cl ON d.doc_id = cl.doc_id
       |""".stripMargin

  // ---------------------------------------- cross-format (lossy) twins

  /** Synthesize, per document, a LOSSLESS base (PNG/BMP alternating by
    * id, as [[imageVariantPayloads]]) and TWO lossy twins: the same 3×3
    * id-pattern re-encoded at 2× the resolution as a baseline JPEG
    * (quality 97) and as a PROGRESSIVE (SOF2) JPEG — the dominant
    * duplicate classes a crawl corpus actually contains (progressive is
    * the majority encoding for large web JPEGs). Lossy twins make EXACT
    * grid equality the wrong verify, so [[imageJpegNearDupQuery]]
    * verifies on the quantized LEVEL grid instead: cell grays sit
    * mid-band at 16n+8, so any decode error within ±7 recovers the
    * exact nibble level n — and the measured q97 drift on this pattern
    * family is ≤5 (spec-gated), leaving 2 levels of margin (the
    * progressive twin decodes bit-identical to a 4:4:4 baseline of the
    * same raster — Round9OpsSpec — so it inherits the same bound). The
    * level grid stays injective on ids, so the oracle still predicts
    * exactly the twin pairs by formula. */
  def imageJpegVariantPayloads(spark: SparkSession, dir: String)
      : Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    import graft.functions.ImageCodec.{writeBmpPixels, writePngPixels}
    import graft.functions.JpegCodec.{writeJpegPixels, writeJpegProgressivePixels}
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val w0 = 9 + 3 * (id % 4).toInt
          val h0 = 9 + 3 * (id % 3).toInt
          val base =
            if (id % 2 == 0) writePngPixels(w0, h0, patternPx(id, w0, h0))
            else writeBmpPixels(w0, h0, patternPx(id, w0, h0))
          // odd ids: 4:2:0 chroma subsampling (the camera default) —
          // the oracle-gated path then exercises the decoder's
          // multi-block-MCU + chroma-upsample machinery too
          val twin = writeJpegPixels(2 * w0, 2 * h0, 97,
            patternPx(id, 2 * w0, 2 * h0), subsample420 = id % 2 == 1)
          val prog = writeJpegProgressivePixels(2 * w0, 2 * h0, 97,
            patternPx(id, 2 * w0, 2 * h0))
          Seq((id, base), (id + TwinSpace, twin), (id + 2 * TwinSpace, prog))
        }
      }
  }

  /** Perceptual near-dup across a LOSSY format boundary: decode real
    * PNG/BMP/JPEG bytes ([[graft.functions.JpegCodec]] — baseline
    * huffman + IDCT + YCbCr), sample the resolution-invariant 9×8 grid,
    * quantize grays to their 16-wide level band, and nominate on the
    * level-grid dHash / verify on the full level grid. Decode is
    * scan-shaped (one pass per payload, embarrassingly parallel); the
    * join shuffles 8-byte hashes plus the 72-int grid only. */
  def imageJpegNearDupQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.core.Caches.TrackedDataset
    import graft.functions.ImageCodec
    val rasters = imageJpegVariantPayloads(spark, dir)
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          ImageCodec.decodePixels(bytes).map { p =>
            val lvl = ImageCodec.sampleGrid9x8(p).map(_ / 16)
            (id, p.format, p.width, lvl.toSeq, ImageCodec.dHash64(lvl))
          }
        }
      }
      .toDF("doc_id", "format", "w", "lvl", "dhash")
      .trackPersist() // both sides of the candidate self-join
    rasters.as("a").join(rasters.as("b"),
        col("a.dhash") === col("b.dhash") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("a.lvl") === col("b.lvl"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.format").as("format_a"), col("b.format").as("format_b"),
        col("a.w").as("w_a"), col("b.w").as("w_b"))
  }

  /** CORPUS FORMAT CENSUS over the mixed payload set (the first
    * readout any media-curation pass produces): container, chroma
    * subsampling, counts, and the width range — all from container
    * HEADERS (no pixel decode), so the scan is metadata-cheap. Runs
    * over [[imageJpegVariantPayloads]] (PNG/BMP bases + 4:4:4/4:2:0
    * baseline and 4:4:4 progressive JPEG twins), which makes every
    * census cell formula-predictable. */
  def imageFormatCensus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.{ImageCodec, JpegCodec}
    imageJpegVariantPayloads(spark, dir)
      .mapPartitions { rows =>
        rows.flatMap { case (_, bytes) =>
          ImageCodec.decode(bytes).map { m =>
            val sampling =
              if (m.format == "jpeg")
                JpegCodec.samplingOf(bytes).getOrElse("other")
              else "none"
            (m.format, sampling, m.width)
          }
        }
      }
      .toDF("format", "sampling", "w")
      .groupBy(col("format"), col("sampling"))
      .agg(count(lit(1)).as("n"),
        min(col("w")).cast("int").as("min_w"),
        max(col("w")).cast("int").as("max_w"))
  }

  val imageFormatCensusOracle: String =
    """WITH d AS (
      |  SELECT doc_id,
      |         CAST(9 + 3 * (doc_id % 4) AS INT) AS w0,
      |         doc_id % 2 = 0 AS even
      |  FROM documents),
      |cells AS (
      |  SELECT CASE WHEN even THEN 'png' ELSE 'bmp' END AS format,
      |         'none' AS sampling, w0 AS w FROM d
      |  UNION ALL
      |  SELECT 'jpeg',
      |         CASE WHEN even THEN '4:4:4' ELSE '4:2:0' END,
      |         2 * w0 FROM d
      |  UNION ALL
      |  -- the progressive twin is always 4:4:4
      |  SELECT 'jpeg', '4:4:4', 2 * w0 FROM d)
      |SELECT format, sampling, CAST(count(*) AS BIGINT) AS n,
      |       CAST(min(w) AS INT) AS min_w, CAST(max(w) AS INT) AS max_w
      |FROM cells GROUP BY 1, 2
      |""".stripMargin

  val imageJpegNearDupOracle: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |         CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'bmp' END AS base_fmt,
       |         CAST(9 + 3 * (doc_id % 4) AS INT) AS w0
       |  FROM documents)
       |SELECT doc_id AS doc_a, doc_id + $TwinSpace AS doc_b,
       |       base_fmt AS format_a, 'jpeg' AS format_b,
       |       w0 AS w_a, 2 * w0 AS w_b
       |FROM d
       |UNION ALL
       |SELECT doc_id, doc_id + ${2 * TwinSpace},
       |       base_fmt, 'jpeg', w0, 2 * w0
       |FROM d
       |UNION ALL
       |SELECT doc_id + $TwinSpace, doc_id + ${2 * TwinSpace},
       |       'jpeg', 'jpeg', 2 * w0, 2 * w0
       |FROM d
       |""".stripMargin

  /** Multi-page TIFF page extraction — the scanned-document member of
    * the per-frame family (GIF frames, AVI frames, PDF pages): each
    * doc is a real chained-IFD TIFF whose page count and per-page
    * pattern are formula-known; every page is strip-decoded (per-doc
    * opts rotate over byte order, compression, predictor and strip
    * blocking) and reduced to its 3×3 cell-gray sum, which the oracle
    * reproduces arithmetically from the page id's nibbles. Scan-shaped:
    * container walk + page decodes all inside one task. */
  def tiffPagesQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.TiffCodec
    import graft.functions.TiffCodec.TiffOpts
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val w0 = 9 + 3 * (id % 4).toInt
          val h0 = 9 + 3 * (id % 3).toInt
          val k = (id % 3).toInt + 1
          val opts = TiffOpts(
            bigEndian = id % 2 == 0,
            compression = Seq(1, 5, 32773)((id % 3).toInt),
            predictor = id % 4 == 0,
            rowsPerStrip = Seq(4, 1000, 7)((id % 3).toInt))
          val bytes = TiffCodec.writeTiffPages(
            (0 until k).map(t => (w0, h0, patternPx(id * 4 + t, w0, h0) _)),
            opts)
          val nPages = TiffCodec.meta(bytes).map(_.nPages).getOrElse(0)
          (0 until nPages).flatMap { t =>
            TiffCodec.decodePage(bytes, t).map { p =>
              // 3x3 cell centers carry the page id's nibbles exactly
              var sum = 0L
              for (cy <- 0 until 3; cx <- 0 until 3) {
                val x = p.width / 6 + cx * (p.width / 3)
                val y = p.height / 6 + cy * (p.height / 3)
                sum += p.rgb(3 * (y * p.width + x)) & 0xff
              }
              (id, t, p.width, p.height, sum)
            }
          }
        }
      }
      .toDF("doc_id", "page", "w", "h", "cells_sum")
  }

  val tiffPagesOracle: String = {
    def cells(fid: String): String =
      (0 until 9).map(k => s"((($fid) >> ${4 * k}) & 15) * 16 + 8")
        .mkString(" + ")
    (0 until 3).map { t =>
      s"""SELECT doc_id, CAST($t AS INT) AS page,
         |       CAST(9 + 3 * (doc_id % 4) AS INT) AS w,
         |       CAST(9 + 3 * (doc_id % 3) AS INT) AS h,
         |       CAST(${cells(s"doc_id * 4 + $t")} AS BIGINT) AS cells_sum
         |FROM documents WHERE doc_id % 3 + 1 > $t
         |""".stripMargin
    }.mkString("UNION ALL\n")
  }

  /** PDF embedded-image extraction — the multimodal mining step for
    * document corpora: real PDFs carry Image XObjects (even docs a
    * verbatim-embedded JPEG under `/DCTDecode`, odd docs two zlib'd
    * raw-RGB images under `/FlateDecode`), and the op walks the
    * stream objects, unwraps each image, and PROVES decodability —
    * DCT payloads must decode through [[graft.functions.JpegCodec]]
    * (failed decodes drop the row and break the oracle's row count),
    * lossless flate payloads are reduced to the 3×3 cell-gray sum the
    * oracle recomputes from the image id's nibbles. Scan-shaped. */
  def pdfImagesQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.{JpegCodec, PdfCodec}
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val w0 = 9 + 3 * (id % 4).toInt
          val h0 = 9 + 3 * (id % 3).toInt
          val k = (id % 2).toInt + 1
          val images = (0 until k).map { t =>
            val fid = id * 4 + t
            val img: Either[Array[Byte], Array[Byte]] =
              if (id % 2 == 0)
                Right(JpegCodec.writeJpegPixels(w0, h0, 85,
                  patternPx(fid, w0, h0)))
              else {
                val rgb = new Array[Byte](3 * w0 * h0)
                for (y <- 0 until h0; x <- 0 until w0) {
                  val g = (patternPx(fid, w0, h0)(x, y) >>> 16).toByte
                  val o = 3 * (y * w0 + x)
                  rgb(o) = g; rgb(o + 1) = g; rgb(o + 2) = g
                }
                Left(rgb)
              }
            (w0, h0, img)
          }
          val pdf = PdfCodec.writePdfWithImages("1.7", images)
          PdfCodec.extractImages(pdf).toSeq.flatten.zipWithIndex.flatMap {
            case (im, t) =>
              if (im.filter == "dct") {
                // decodability is the gate: a failed JPEG decode drops
                // the row and the oracle's row count catches it
                JpegCodec.decodePixels(im.payload).map { _ =>
                  (id, t, im.width, im.height, "dct", None: Option[Long])
                }
              } else {
                var sum = 0L
                for (cy <- 0 until 3; cx <- 0 until 3) {
                  val x = im.width / 6 + cx * (im.width / 3)
                  val y = im.height / 6 + cy * (im.height / 3)
                  sum += im.payload(3 * (y * im.width + x)) & 0xff
                }
                Some((id, t, im.width, im.height, "flate", Some(sum)))
              }
          }
        }
      }
      .toDF("doc_id", "img_index", "w", "h", "img_filter", "cells_sum")
  }

  val pdfImagesOracle: String = {
    def cells(fid: String): String =
      (0 until 9).map(k => s"((($fid) >> ${4 * k}) & 15) * 16 + 8")
        .mkString(" + ")
    (0 until 2).map { t =>
      s"""SELECT doc_id, CAST($t AS INT) AS img_index,
         |       CAST(9 + 3 * (doc_id % 4) AS INT) AS w,
         |       CAST(9 + 3 * (doc_id % 3) AS INT) AS h,
         |       CASE WHEN doc_id % 2 = 0 THEN 'dct' ELSE 'flate' END
         |         AS img_filter,
         |       CASE WHEN doc_id % 2 = 0 THEN NULL
         |            ELSE CAST(${cells(s"doc_id * 4 + $t")} AS BIGINT) END
         |         AS cells_sum
         |FROM documents WHERE doc_id % 2 + 1 > $t
         |""".stripMargin
    }.mkString("UNION ALL\n")
  }

  /** EXIF census over real JPEG bytes — the privacy-inventory pass a
    * corpus needs BEFORE deciding what to scrub: camera make/model
    * (hardware fingerprint), orientation, and whether a GPS sub-IFD is
    * present (exact coordinates, the highest-severity field). Each doc
    * carries a real JPEG with a real APP1 TIFF-structured EXIF block
    * ([[graft.functions.ExifCodec.withExif]]); the census is a
    * scan-shaped per-payload parse, map-only at any corpus size. */
  def exifCensusQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.{ExifCodec, JpegCodec}
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.map { id =>
          val w0 = 9 + 3 * (id % 4).toInt
          val h0 = 9 + 3 * (id % 3).toInt
          val plain = JpegCodec.writeJpegPixels(w0, h0, 85,
            patternPx(id, w0, h0))
          val gps = if (id % 4 == 0)
            Some(((id % 90).toInt, (id % 180).toInt)) else None
          val jpeg = ExifCodec.withExif(plain, s"Cam${id % 5}",
            s"M${id % 3}", (id % 8).toInt + 1, gps)
          (id, jpeg)
        }
      }
      .mapPartitions { rows =>
        rows.flatMap { case (id, jpeg) =>
          graft.functions.ExifCodec.fromJpeg(jpeg).map { ex =>
            (id, ex.make.getOrElse(""), ex.model.getOrElse(""),
              ex.orientation.getOrElse(0), ex.hasGps)
          }
        }
      }
      .toDF("doc_id", "make", "model", "orientation", "has_gps")
  }

  val exifCensusOracle: String =
    """SELECT doc_id,
      |       'Cam' || CAST(doc_id % 5 AS VARCHAR) AS make,
      |       'M' || CAST(doc_id % 3 AS VARCHAR) AS model,
      |       CAST(doc_id % 8 + 1 AS INT) AS orientation,
      |       doc_id % 4 = 0 AS has_gps
      |FROM documents
      |""".stripMargin

  // ------------------------------------------------- ID3v2 privacy census

  /** ID3v2 tag census over MP3 payloads — the audio twin of
    * [[exifCensusQuery]]: walk the real v2.3 frame stream
    * ([[graft.functions.Mp3Codec.readId3]]) and inventory where the
    * personal data sits — title/artist/album identity, free-text
    * comments (with an email-address count, the thing a privacy scrub
    * has to find), and PRIV frames (application-private payloads,
    * opaque and therefore always flagged). Map-only per-payload walk;
    * at 100 TB this is a scan-shaped pass like every census here. */
  def id3CensusQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.Mp3Codec
    import graft.functions.Mp3Codec.Id3Frame
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.map { id =>
          val frames = Seq(
            Id3Frame("TIT2", s"Track${id % 97}"),
            Id3Frame("TPE1", s"Artist${id % 13}"),
            Id3Frame("TALB", s"Album${id % 7}")) ++
            (if (id % 3 == 0)
              Seq(Id3Frame("COMM",
                if (id % 6 == 0) s"session note user$id@mail.example"
                else "session note"))
            else Nil) ++
            (if (id % 5 == 0)
              Seq(Id3Frame("PRIV", s"com.example.listener/$id")) else Nil)
          (id, Mp3Codec.writeMp3WithId3(frames))
        }
      }
      .mapPartitions { rows =>
        rows.flatMap { case (id, mp3) =>
          graft.functions.Mp3Codec.readId3(mp3).map { fs =>
            def first(fid: String): String =
              fs.find(_.id == fid).map(_.text).getOrElse("")
            (id, first("TIT2"), first("TPE1"), first("TALB"), fs.size,
              fs.exists(_.id == "COMM"),
              fs.find(_.id == "COMM").map(_.text).getOrElse(""),
              fs.exists(_.id == "PRIV"))
          }
        }
      }
      .toDF("doc_id", "title", "artist", "album", "n_frames",
        "has_comment", "comment", "has_priv")
      .select(col("doc_id"), col("title"), col("artist"), col("album"),
        col("n_frames"),
        col("has_comment"),
        regexp_count(col("comment"),
          lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+")).cast("int").as("n_emails"),
        col("has_priv"))
  }

  val id3CensusOracle: String =
    """SELECT doc_id,
      |       'Track' || CAST(doc_id % 97 AS VARCHAR) AS title,
      |       'Artist' || CAST(doc_id % 13 AS VARCHAR) AS artist,
      |       'Album' || CAST(doc_id % 7 AS VARCHAR) AS album,
      |       CAST(3 + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
      |              + CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS INT) AS n_frames,
      |       doc_id % 3 = 0 AS has_comment,
      |       CAST(CASE WHEN doc_id % 6 = 0 THEN 1 ELSE 0 END AS INT) AS n_emails,
      |       doc_id % 5 = 0 AS has_priv
      |FROM documents
      |""".stripMargin

  // ---------------------------------------------- MIME mismatch census

  private val MimeFamilies = Array(
    "image/png", "image/jpeg", "image/gif", "image/bmp", "image/webp",
    "image/tiff", "audio/wav", "audio/flac", "audio/ogg", "audio/mpeg",
    "video/mp4", "application/pdf", "application/gzip", "application/zip",
    "text/html", "text/plain")

  /** One REAL payload of family `id % 16`, exercising every container
    * writer in the codec layer. */
  private def mimePayload(id: Long): Array[Byte] = {
    import graft.functions._
    val c = ((id % 7) * 36).toInt
    val px = (x: Int, y: Int) => (c << 16) | ((x * 16 & 0xff) << 8) | (y * 16 & 0xff)
    (id % 16).toInt match {
      case 0 => ImageCodec.writePng(8, 8, c.toByte, 2, 3)
      case 1 => JpegCodec.writeJpegPixels(8, 8, 85, px)
      case 2 => GifCodec.writeGifPixels(4, 4, px)
      case 3 => ImageCodec.writeBmp(5, 5, c.toByte, 2, 3)
      case 4 => WebpCodec.writeLosslessHeader(7, 9)
      case 5 => TiffCodec.writeTiffPixels(6, 4, px)
      case 6 => AudioCodec.writeWav(8000, 1, 16, (s, _) => (s * 100).toShort)
      case 7 => FlacCodec.writeFlacHeader(8000, 1, 16, 100L, tags = false)
      case 8 => OggCodec.writeOgg("vorbis", 1, 8000, 1, 100L)
      case 9 => Mp3Codec.writeMp3Header(9, 0, 32)
      case 10 => IsoBmff.writeMp4("isom", 1000L, 5000L, 1, mvhdV1 = false)
      case 11 => PdfCodec.writePdf("1.4", 1, encrypted = false)
      case 12 =>
        val bos = new java.io.ByteArrayOutputStream()
        val g = new java.util.zip.GZIPOutputStream(bos)
        g.write(s"doc $id".getBytes("UTF-8")); g.close()
        bos.toByteArray
      case 13 =>
        val bos = new java.io.ByteArrayOutputStream()
        val z = new java.util.zip.ZipOutputStream(bos)
        z.putNextEntry(new java.util.zip.ZipEntry("doc.txt"))
        z.write(s"doc $id".getBytes("UTF-8"))
        z.closeEntry(); z.close()
        bos.toByteArray
      case 14 => s"<html><body>doc $id</body></html>".getBytes("UTF-8")
      case _ => s"plain text doc $id".getBytes("UTF-8")
    }
  }

  /** Declared-vs-sniffed Content-Type census — the "servers lie"
    * hygiene pass: every payload is REAL bytes from one of the 16
    * container writers, the declared header is wrong for the
    * `id % 7 == 0` slice (it claims the NEXT family), and
    * [[graft.functions.MimeSniff.sniff]] must recover the truth from
    * magic bytes alone. Downstream routing (which decoder, which
    * rejects channel) keys off `sniffed`, never `declared`; the
    * mismatch flag is the governance metric. Map-only prefix peek —
    * scan-shaped at 100 TB. */
  def mimeMismatchQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.map { id =>
          val fam = (id % 16).toInt
          val declared =
            if (id % 7 == 0) MimeFamilies((fam + 1) % 16) else MimeFamilies(fam)
          (id, declared, graft.functions.MimeSniff.sniff(mimePayload(id)))
        }
      }
      .toDF("doc_id", "declared", "sniffed")
      .select(col("doc_id"), col("declared"), col("sniffed"),
        (col("declared") =!= col("sniffed")).as("mismatch"))
  }

  val mimeMismatchOracle: String = {
    val fams = MimeFamilies.zipWithIndex
      .map { case (m, i) => s"WHEN $i THEN '$m'" }.mkString(" ")
    s"""SELECT doc_id,
       |       CASE (CASE WHEN doc_id % 7 = 0 THEN (doc_id % 16 + 1) % 16
       |                  ELSE doc_id % 16 END) $fams END AS declared,
       |       CASE doc_id % 16 $fams END AS sniffed,
       |       doc_id % 7 = 0 AS mismatch
       |FROM documents
       |""".stripMargin
  }

  // --------------------------------------------- perceptual audio dedup

  /** Window amplitude of the id-pattern stream: window 0 is a constant
    * PILOT (the profile's fixed maximum, which pins the normalization
    * denominator), windows 1–7 carry id nibbles scaled ×4 — even, so the
    * half-gain twin divides exactly — making the normalized profile
    * injective on ids < 2²⁸. */
  private def audioNibbleAmp(id: Long, w: Int): Int =
    if (w == 0) 64 else (((id >> (4 * (w - 1))) & 15L).toInt + 1) * 4

  /** Per document, a REAL mono PCM WAV with the 8-window id pattern and
    * its re-mastered twin: STEREO layout at HALF the gain — different
    * bytes, different byte length, different channel count; identical
    * perceptual content. */
  def audioVariantPayloads(spark: SparkSession, dir: String)
      : Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val frames = 8 * ((id % 6).toInt + 2)
          def amp(s: Int): Int =
            audioNibbleAmp(id, (s.toLong * 8 / frames).toInt)
          def signed(s: Int, a: Int): Short =
            (if (s % 2 == 0) a else -a).toShort
          val base = graft.functions.AudioCodec.writeWav(8000, 1, frames,
            (s, _) => signed(s, amp(s)))
          val twin = graft.functions.AudioCodec.writeWav(8000, 2, frames,
            (s, _) => signed(s, amp(s) / 2))
          Seq((id, base), (id + TwinSpace, twin))
        }
      }
  }

  /** PERCEPTUAL audio dedup over real WAV bytes: full PCM sample decode
    * ([[graft.functions.AudioCodec.decodeSamples]]), the unit-time
    * 8-window energy profile, and the scale-invariant integer
    * normalization — gain changes and mono↔stereo re-layouts both
    * scale the raw profile uniformly and cancel in the normalization,
    * so a re-mastered copy collides with its original while byte-level
    * hashing sees two unrelated blobs. Candidates equi-join on a
    * deterministic fold of the normalized profile and VERIFY on the
    * full profile (nominate-then-verify); the oracle predicts exactly
    * the twin pairs by formula. */
  def audioNearDupQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.core.Caches.TrackedDataset
    import graft.functions.AudioCodec
    val profiles = audioVariantPayloads(spark, dir)
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          AudioCodec.decodeSamples(bytes).map { s =>
            val p = AudioCodec.normalizeProfile(AudioCodec.energyProfile8(s))
            val fp = p.foldLeft(1125899906842597L)((h, x) => h * 31 + x)
            (id, s.channels, p.toSeq, fp)
          }
        }
      }
      .toDF("doc_id", "channels", "profile", "fp")
      .trackPersist() // both sides of the candidate self-join
    profiles.as("a").join(profiles.as("b"),
        col("a.fp") === col("b.fp") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("a.profile") === col("b.profile"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.channels").as("channels_a"), col("b.channels").as("channels_b"))
  }

  val audioNearDupOracle: String =
    s"""SELECT doc_id AS doc_a, doc_id + $TwinSpace AS doc_b,
       |       1 AS channels_a, 2 AS channels_b
       |FROM documents
       |""".stripMargin

  /** Per document, the mono WAV base and a FLAC re-encode twin: STEREO
    * at HALF the gain (twin amplitudes are even, so the halving is
    * exact and the wasted-bits path is reachable), compressed with
    * per-doc [[graft.functions.FlacCodec.FlacOpts]] that rotate over
    * every decoder path — all four stereo decorrelation modes, all nine
    * subframe forms, both Rice parameter widths, escape partitions,
    * wasted bits, multi-frame blocking, and both end-of-header
    * blocksize/rate forms — so the corpus decode crosses the whole
    * FLAC surface, not one happy path. */
  def audioFlacVariantPayloads(spark: SparkSession, dir: String)
      : Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    import graft.functions.FlacCodec
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val frames = 8 * ((id % 6).toInt + 2)
          def amp(s: Int): Int =
            audioNibbleAmp(id, (s.toLong * 8 / frames).toInt)
          def signed(s: Int, a: Int): Short =
            (if (s % 2 == 0) a else -a).toShort
          val base = graft.functions.AudioCodec.writeWav(8000, 1, frames,
            (s, _) => signed(s, amp(s)))
          val opts = FlacCodec.FlacOpts(
            blockSize = Seq(8, 16, 12, frames)((id % 4).toInt),
            stereoMode = (id % 4).toInt,
            subframe = (id % 9).toInt,
            partOrder = (id % 3).toInt,
            rice5 = id % 2 == 0,
            escape = id % 5 == 0,
            wasted = id % 3 == 0,
            rateInHeader = id % 7 == 0,
            blockSizeCode16 = id % 11 == 0)
          val twin = FlacCodec.writeFlacPcm(8000, 2, frames,
            (s, _) => signed(s, amp(s) / 2), opts)
          Seq((id, base), (id + TwinSpace, twin))
        }
      }
  }

  /** PERCEPTUAL audio dedup across CONTAINERS: the WAV original and its
    * FLAC re-master (stereo, half gain, losslessly compressed) collide
    * on the normalized unit-time energy profile after REAL sample
    * decode of both containers — byte-level hashing sees two unrelated
    * blobs in two different formats. Same nominate-then-verify shape as
    * [[audioNearDupQuery]]; the oracle predicts the twin pairs by
    * formula. */
  def audioFlacNearDupQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.core.Caches.TrackedDataset
    import graft.functions.{AudioCodec, FlacCodec}
    val profiles = audioFlacVariantPayloads(spark, dir)
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          val decoded =
            AudioCodec.decodeSamples(bytes).map(s => ("wav", s)).orElse(
              FlacCodec.decodePcm(bytes).map { f =>
                ("flac", AudioCodec.AudioSamples(f.sampleRate, f.channels,
                  f.samples.map(_.toShort)))
              })
          decoded.map { case (container, s) =>
            val p = AudioCodec.normalizeProfile(AudioCodec.energyProfile8(s))
            val fp = p.foldLeft(1125899906842597L)((h, x) => h * 31 + x)
            (id, container, p.toSeq, fp)
          }
        }
      }
      .toDF("doc_id", "container", "profile", "fp")
      .trackPersist() // both sides of the candidate self-join
    profiles.as("a").join(profiles.as("b"),
        col("a.fp") === col("b.fp") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("a.profile") === col("b.profile"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.container").as("container_a"),
        col("b.container").as("container_b"))
  }

  val audioFlacNearDupOracle: String =
    s"""SELECT doc_id AS doc_a, doc_id + $TwinSpace AS doc_b,
       |       'wav' AS container_a, 'flac' AS container_b
       |FROM documents
       |""".stripMargin

  /** Per document, a mono WAV base on a 32-step amplitude grid and its
    * LOSSY Ogg Vorbis re-encode twin: stereo, REAL Vorbis I streams
    * from [[graft.functions.VorbisCodec]] with per-doc options that
    * rotate the decoder across block-switching cadences, residue types
    * 1 and 2, and square-polar coupling — so the corpus decode crosses
    * the codec surface, not one happy path. Amplitudes stay on the
    * 32 grid because Vorbis is lossy: the measured decode drift is
    * ≤0.4 (worst-case bound 4) of the ±16 snap band, so amplitude
    * quantization recovers exact samples and the twin pairs stay
    * formula-predictable — the same device as the JPEG mid-band
    * fixtures. */
  def audioVorbisVariantPayloads(spark: SparkSession, dir: String)
      : Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    import graft.functions.VorbisCodec
    // the doc-id scan is one small parquet split at fixture scales, but
    // the per-doc MDCT work is the cost — spread the ids across the
    // cluster BEFORE synthesis/decode (the shuffle moves bare longs)
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val frames = 256 * ((id % 3).toInt + 1)
          def amp(s: Int): Int =
            audioNibbleAmp(id, (s.toLong * 8 / frames).toInt) * 8
          def signed(s: Int): Int = if (s % 2 == 0) amp(s) else -amp(s)
          val base = graft.functions.AudioCodec.writeWav(8000, 1, frames,
            (s, _) => signed(s).toShort)
          val opts = VorbisCodec.VorbisOpts(
            shortEvery = Array(0, 3, 1, 4)((id % 4).toInt),
            residueType = if (id % 2 == 0) 2 else 1,
            coupling = id % 3 == 0)
          val twin = VorbisCodec.writeVorbisPcm(8000, 2, frames,
            (s, _) => signed(s), opts)
          Seq((id, base), (id + TwinSpace, twin))
        }
      }
  }

  /** PERCEPTUAL audio dedup across a LOSSY container boundary: the WAV
    * original and its Ogg Vorbis re-encode collide on the normalized
    * unit-time energy profile after REAL sample decode of both — the
    * Vorbis side goes through codebook/floor1/residue/IMDCT synthesis,
    * then amplitude quantization to the fixture grid erases the
    * sub-integer codec drift (the step every perceptual audio hash
    * has). Same nominate-then-verify shape as [[audioNearDupQuery]];
    * the oracle predicts the twin pairs by formula. */
  def audioVorbisNearDupQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.core.Caches.TrackedDataset
    import graft.functions.{AudioCodec, VorbisCodec}
    val profiles = audioVorbisVariantPayloads(spark, dir)
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          val decoded =
            AudioCodec.decodeSamples(bytes).map(s =>
              ("wav", s.sampleRate, s.channels,
                s.samples.map(_.toInt))).orElse(
              VorbisCodec.decodePcm(bytes).map(v =>
                ("ogg", v.sampleRate, v.channels, v.samples)))
          decoded.map { case (container, sr, ch, raw) =>
            // amplitude quantization to the 32 grid (identity on the
            // PCM side, drift-erasing on the lossy side)
            val snapped = raw.map(s => (math.round(s / 32.0) * 32).toShort)
            val p = AudioCodec.normalizeProfile(AudioCodec.energyProfile8(
              AudioCodec.AudioSamples(sr, ch, snapped)))
            val fp = p.foldLeft(1125899906842597L)((h, x) => h * 31 + x)
            (id, container, p.toSeq, fp)
          }
        }
      }
      .toDF("doc_id", "container", "profile", "fp")
      .trackPersist() // both sides of the candidate self-join
    profiles.as("a").join(profiles.as("b"),
        col("a.fp") === col("b.fp") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("a.profile") === col("b.profile"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.container").as("container_a"),
        col("b.container").as("container_b"))
  }

  val audioVorbisNearDupOracle: String =
    s"""SELECT doc_id AS doc_a, doc_id + $TwinSpace AS doc_b,
       |       'wav' AS container_a, 'ogg' AS container_b
       |FROM documents
       |""".stripMargin

  // --------------------------------------------- MP3 perceptual dedup

  /** Per document, a WAV original and its MPEG-1 Layer III twin from
    * [[graft.functions.Mp3Layer3]]'s own encoder (conformance scope on
    * that object): the fixture PCM is synthesized from deterministic
    * on-grid spectra, the encoder's round trip is bit-exact on that
    * grid, so the WAV's int16 samples equal `rint` of the MP3 decode
    * EXACTLY — no snap band needed, unlike the lossy-drift Vorbis
    * twins. Encoder options rotate per doc (block cadence, MS stereo,
    * scalefac_scale, bit reservoir, CRC frames, scfsi sharing) so the
    * corpus decode crosses the whole bitstream surface. */
  def audioMp3VariantPayloads(spark: SparkSession, dir: String)
      : Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    import graft.functions.Mp3Layer3
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val (pcm, mp3, _, channels, sr) = mp3FixtureFor(id)
          val wav = graft.functions.AudioCodec.writeWav(sr, channels,
            pcm(0).length,
            (s, c) => clip16(math.rint(pcm(c)(s))).toShort)
          Seq((id, wav), (id + TwinSpace, mp3))
        }
      }
  }

  private def clip16(v: Double): Int =
    math.max(-32767, math.min(32767, v.toInt))

  /** Deterministic per-doc MP3 fixture: (pcm, mp3, nGranules, channels,
    * sampleRate). One device shared by the neardup and census queries
    * (and their oracles' formulas). Three families by doc id (round
    * 13): id%11==3 → BIG-VALUE streams through the vendored Table B.7
    * Huffman tables (table trio rotates per doc); id%11==7 → MPEG-2
    * LSF streams (1-granule frames, LSF scalefactors, count1 table A);
    * else the original count1-grid MPEG-1 encoder. All three decode
    * through the same [[graft.functions.Mp3Layer3.decodePcmF]]. */
  private def mp3FixtureFor(id: Long)
      : (Array[Array[Double]], Array[Byte], Int, Int, Int) = {
    import graft.functions.Mp3Layer3
    val channels = 1 + (id % 2).toInt
    if (id % 11 == 3) {
      val tabs = Array(1, 2, 3, 5, 6, 7, 8, 9, 10, 12)
      val sr = Array(44100, 48000, 32000)((id % 3).toInt)
      val tids = (tabs((id % 10).toInt), tabs(((id / 3) % 10).toInt),
        tabs(((id / 7) % 10).toInt))
      val (pcm, mp3) = Mp3Layer3.writeMp3BigFixture(sr, channels, 8, id,
        tids, crc = id % 3 == 1, reservoir = id % 2 == 0)
      (pcm, mp3, 8, channels, sr)
    } else if (id % 11 == 7) {
      val nG = 8 + (id % 3).toInt * 2
      // round 14: rotate across every vendored LSF rate — MPEG-2 at
      // 22.05/16/24 kHz plus MPEG-2.5 at 8 kHz — so the census gates
      // all four band tables at three scales
      val sr = Array(22050, 16000, 8000, 24000, 22050)((id % 5).toInt)
      val (pcm, mp3) = Mp3Layer3.writeMp3LsfFixture(channels, nG, id, sr)
      (pcm, mp3, nG, channels, sr)
    } else {
      val nG = 8 + (id % 3).toInt * 2
      val sr = Array(44100, 48000, 32000)((id % 3).toInt)
      val opts = Mp3Layer3.Mp3Opts(
        shortEvery = Array(0, 3, 4)((id % 5).toInt % 3),
        msStereo = channels == 2 && id % 4 == 1,
        shareScf = id % 7 == 0,
        scalefacScale = if (id % 5 == 0) 1 else 0,
        crc = id % 3 == 1,
        reservoir = id % 2 == 0)
      val (pcm, mp3) = Mp3Layer3.writeMp3Fixture(sr, channels, nG, id, opts)
      (pcm, mp3, nG, channels, sr)
    }
  }

  /** Perceptual audio dedup across the WAV / MP3 container boundary:
    * both sides go through REAL sample decode (the MP3 side through
    * side info, the bit reservoir, count1 Huffman, requantize, stereo
    * modes, alias butterflies, IMDCT and the polyphase bank), then
    * collide on the normalized unit-time energy profile. Map-only
    * decode, candidates meet on the profile hash — broadcast-scale
    * shuffle at any corpus size. */
  def audioMp3NearDupQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.core.Caches.TrackedDataset
    import graft.functions.{AudioCodec, Mp3Layer3}
    val profiles = audioMp3VariantPayloads(spark, dir)
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          val decoded =
            AudioCodec.decodeSamples(bytes).map(s =>
              ("wav", s.sampleRate, s.channels, s.samples.map(_.toInt)))
              .orElse(Mp3Layer3.decodePcmF(bytes).map { case (sr, ch, fl) =>
                ("mp3", sr, ch, fl.map(v => clip16(math.rint(v))))
              })
          decoded.map { case (container, sr, ch, raw) =>
            // the MP3 side decodes MORE samples than the WAV (its
            // trailing lookahead granules) — profile the WAV's span,
            // which both sides share exactly
            val nG = 8 + (id % TwinSpace % 3).toInt * 2
            val span = raw.take(nG * 576 * ch).map(_.toShort)
            val p = AudioCodec.normalizeProfile(AudioCodec.energyProfile8(
              AudioCodec.AudioSamples(sr, ch, span)))
            val fp = p.foldLeft(1125899906842597L)((h, x) => h * 31 + x)
            (id, container, p.toSeq, fp)
          }
        }
      }
      .toDF("doc_id", "container", "profile", "fp")
      .trackPersist()
    profiles.as("a").join(profiles.as("b"),
        col("a.fp") === col("b.fp") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("a.profile") === col("b.profile"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.container").as("container_a"),
        col("b.container").as("container_b"))
  }

  val audioMp3NearDupOracle: String =
    s"""SELECT doc_id AS doc_a, doc_id + $TwinSpace AS doc_b,
       |       'wav' AS container_a, 'mp3' AS container_b
       |FROM documents
       |""".stripMargin

  /** MP3 sample-decode census: decoded stream geometry per document —
    * sample rate, channels, per-channel sample count (the frames·1152
    * − 576 structural contract), frame count from the independent
    * header walk, and whether the stream used the bit reservoir. Every
    * value is formula-predictable from the doc id, which is what makes
    * this the oracle gate for the whole decode path at three scales. */
  def mp3DecodeCensusQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.Mp3Layer3
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val (_, mp3, nG, _, _) = mp3FixtureFor(id)
          Mp3Layer3.decodePcmF(mp3).map { case (sr, ch, fl) =>
            val walk = graft.functions.Mp3Codec.frameWalk(mp3)
            (id, sr, ch, fl.length.toLong / ch,
              walk.map(_.frames).getOrElse(-1L))
          }
        }
      }
      .toDF("doc_id", "sr", "ch", "n_samples", "n_frames")
      .select(col("doc_id"), col("sr").cast("int").as("sr"),
        col("ch").cast("int").as("ch"), col("n_samples"), col("n_frames"))
  }

  val mp3DecodeCensusOracle: String =
    """SELECT doc_id,
      |       CAST(CASE WHEN doc_id % 11 = 7 THEN
      |                   CASE WHEN doc_id % 5 = 1 THEN 16000
      |                        WHEN doc_id % 5 = 2 THEN 8000
      |                        WHEN doc_id % 5 = 3 THEN 24000
      |                        ELSE 22050 END
      |                 WHEN doc_id % 3 = 0 THEN 44100
      |                 WHEN doc_id % 3 = 1 THEN 48000
      |                 ELSE 32000 END AS INT) AS sr,
      |       CAST(1 + doc_id % 2 AS INT) AS ch,
      |       CAST(CASE WHEN doc_id % 11 = 3 THEN 8 * 576 - 576
      |                 WHEN doc_id % 11 = 7
      |                   THEN (8 + doc_id % 3 * 2) * 576 - 576
      |                 ELSE (6 + doc_id % 3) * 1152 - 576
      |            END AS BIGINT) AS n_samples,
      |       CAST(CASE WHEN doc_id % 11 = 3 THEN 4
      |                 WHEN doc_id % 11 = 7 THEN 8 + doc_id % 3 * 2
      |                 ELSE 6 + doc_id % 3
      |            END AS BIGINT) AS n_frames
      |FROM documents
      |""".stripMargin

  /** Audio quality stats over REAL decoded samples — the audio-corpus
    * analog of `q_text_quality`: clipping count (rail-pinned samples,
    * the transcode-damage signal), digital-silence count, and peak
    * amplitude, per document. Even docs arrive as PCM WAV, odd docs as
    * compressed FLAC (the stats must see through the container), so
    * this query also exercises [[graft.functions.FlacCodec.decodePcm]]
    * on a second corpus shape. Scan-shaped decode + per-payload
    * aggregation: map-only at any corpus size. */
  def audioQualityQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.{AudioCodec, FlacCodec}
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.map { id =>
          val frames = 64
          val c = (id % 16).toInt; val z = (id % 8).toInt
          def sample(s: Int, ch: Int): Short =
            if (s < c) (if (s % 2 == 0) 32767 else -32767).toShort
            else if (s < c + z) 0.toShort
            else {
              val a = 1000 + (id % 50).toInt
              (if (s % 2 == 0) a else -a).toShort
            }
          val bytes =
            if (id % 2 == 0) AudioCodec.writeWav(8000, 1, frames, sample)
            else FlacCodec.writeFlacPcm(8000, 1, frames, sample,
              FlacCodec.FlacOpts(blockSize = 16,
                subframe = (id % 9).toInt, rice5 = id % 3 == 0))
          (id, bytes)
        }
      }
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          val decoded = AudioCodec.decodeSamples(bytes).map(_.samples)
            .orElse(FlacCodec.decodePcm(bytes).map(_.samples.map(_.toShort)))
          decoded.map { s =>
            val clipped = s.count(v => v == 32767 || v == -32767).toLong
            val silent = s.count(_ == 0).toLong
            val peak = s.foldLeft(0)((m, v) => math.max(m, math.abs(v.toInt)))
            (id, s.length.toLong, clipped, silent, peak)
          }
        }
      }
      .toDF("doc_id", "n_samples", "n_clipped", "n_silent", "peak")
  }

  val audioQualityOracle: String =
    """SELECT doc_id,
      |       CAST(64 AS BIGINT) AS n_samples,
      |       CAST(doc_id % 16 AS BIGINT) AS n_clipped,
      |       CAST(doc_id % 8 AS BIGINT) AS n_silent,
      |       CAST(CASE WHEN doc_id % 16 > 0 THEN 32767
      |                 ELSE 1000 + doc_id % 50 END AS INT) AS peak
      |FROM documents
      |""".stripMargin

  // --------------------------------------------- perceptual video dedup

  /** Per document, a REAL AVI whose frames are real rendered images
    * (PNG or BMP pattern frames — frame t's pattern id is `id·4 + t`,
    * injective jointly in (id, t) below 2³⁶ so frame-grid SEQUENCES are
    * unique per video), plus its re-encoded twin: same frames at 2× the
    * resolution in the OTHER image container. */
  def videoVariantPayloads(spark: SparkSession, dir: String)
      : Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    import graft.functions.ImageCodec.{writeBmpPixels, writePngPixels}
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val k = (id % 3).toInt + 2
          val w0 = 9 + 3 * (id % 4).toInt
          val h0 = 9 + 3 * (id % 3).toInt
          def framesAt(scale: Int, png: Boolean): Seq[Array[Byte]] =
            (0 until k).map { t =>
              val fid = id * 4 + t
              val (w, h) = (w0 * scale, h0 * scale)
              if (png) writePngPixels(w, h, patternPx(fid, w, h))
              else writeBmpPixels(w, h, patternPx(fid, w, h))
            }
          val base = graft.functions.VideoCodec.writeAvi(w0, h0, 40000,
            framesAt(1, png = id % 2 == 0))
          val twin = graft.functions.VideoCodec.writeAvi(2 * w0, 2 * h0, 40000,
            framesAt(2, png = id % 2 != 0))
          Seq((id, base), (id + TwinSpace, twin))
        }
      }
  }

  /** PERCEPTUAL video dedup: real AVI chunk walk → per-frame REAL pixel
    * decode → per-frame resolution-invariant 9×8 grids, concatenated in
    * frame order into the video's perceptual signature. A re-encoded
    * copy (different resolution AND different frame container) collides
    * with its original; byte hashing sees nothing. Same
    * nominate-then-verify shape as the image/audio twins: equi-join on
    * a deterministic fold, verify on the full grid sequence. */
  def videoNearDupQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.core.Caches.TrackedDataset
    import graft.functions.{ImageCodec, VideoCodec}
    val sigs = videoVariantPayloads(spark, dir)
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          VideoCodec.decodeMeta(bytes).flatMap { meta =>
            val grids = VideoCodec.frames(bytes)
              .flatMap(f => ImageCodec.decodePixels(f))
              .map(ImageCodec.sampleGrid9x8)
            if (grids.isEmpty) None
            else {
              val sig = grids.flatten.toSeq
              val fp = sig.foldLeft(1125899906842597L)((h, x) => h * 31 + x)
              Some((id, grids.length, meta.width, sig, fp))
            }
          }
        }
      }
      .toDF("doc_id", "n_frames", "w", "sig", "fp")
      .trackPersist() // both sides of the candidate self-join
    sigs.as("a").join(sigs.as("b"),
        col("a.fp") === col("b.fp") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("a.sig") === col("b.sig"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n_frames").as("n_frames"),
        col("a.w").as("w_a"), col("b.w").as("w_b"))
  }

  val videoNearDupOracle: String =
    s"""SELECT doc_id AS doc_a, doc_id + $TwinSpace AS doc_b,
       |       CAST(doc_id % 3 + 2 AS INT) AS n_frames,
       |       CAST(9 + 3 * (doc_id % 4) AS INT) AS w_a,
       |       CAST(2 * (9 + 3 * (doc_id % 4)) AS INT) AS w_b
       |FROM documents
       |""".stripMargin

  // ------------------------------------- incremental perceptual probe

  /** Classify a BATCH of image signatures against a perceptual-index
    * table — the daily-ingest shape of [[imageNearDupQuery]], mirroring
    * [[graft.ops.IncrementalDedup.classify]]: probe cost is O(batch),
    * never O(corpus). Candidates equi-join on dhash, verify on the full
    * grid; `dup_of` is the lowest matching indexed id. The index is the
    * natural warehouse artifact ((doc_id, grid, dhash) — a few hundred
    * bytes per image, no payloads). */
  def classifyImages(batch: DataFrame, index: DataFrame): DataFrame = {
    val idx = index.select(col("doc_id").as("idx_doc_id"),
      col("grid").as("idx_grid"), col("dhash"))
    val matched = batch.join(idx,
        batch("dhash") === idx("dhash") &&
          batch("grid") === idx("idx_grid"))
      .groupBy(batch("doc_id").as("doc_id"))
      .agg(min(col("idx_doc_id")).as("dup_of"))
    batch.select(col("doc_id"))
      .join(matched, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("dup_of").isNotNull, "dup").otherwise("new").as("status"),
        col("dup_of"))
  }

  /** Index the BASE images of documents below [[ImageIndexSplit]];
    * probe EVERY twin as the incoming batch. A twin whose base is
    * indexed classifies `dup` (of exactly that base — grid uniqueness);
    * the rest are `new`. */
  val ImageIndexSplit = 250L

  def imageDedupIncrementalQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.core.Caches.TrackedDataset
    val all = imageVariantPayloads(spark, dir).trackPersist()
    val index = imageSignatures(
      all.filter(_._1 < ImageIndexSplit))
    val batch = imageSignatures(all.filter(_._1 >= TwinSpace))
    classifyImages(batch, index)
  }

  val imageDedupIncrementalOracle: String =
    s"""SELECT doc_id + $TwinSpace AS doc_id,
       |       CASE WHEN doc_id < $ImageIndexSplit THEN 'dup' ELSE 'new' END AS status,
       |       CASE WHEN doc_id < $ImageIndexSplit THEN doc_id END AS dup_of
       |FROM documents
       |""".stripMargin

  // ----------------------------------------------- image metadata scrub

  /** IMAGE METADATA SCRUB, end to end at the byte level: every document
    * gets a real PNG with a real `tEXt` chunk carrying simulated PII
    * (`user<id>@example.com` under the `auth` key — the shape
    * author/GPS/toolchain tags take in the wild), and the scrub
    * re-emits the container keeping only pixel-bearing chunks. The
    * oracle predicts the chunk counts and the exact byte shrinkage by
    * formula; `pixels_intact` re-decodes both payloads and compares the
    * full rasters — the scrub must never touch the image itself. */
  def imageScrubQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.ImageCodec
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.map { id =>
          val w0 = 9 + 3 * (id % 4).toInt
          val h0 = 9 + 3 * (id % 3).toInt
          val base = ImageCodec.writePngPixels(w0, h0, patternPx(id, w0, h0))
          val tagged = ImageCodec.withTextChunk(base, "auth",
            s"user$id@example.com")
          val scrubbed = ImageCodec.stripAncillary(tagged).get
          val intact = java.util.Arrays.equals(
            ImageCodec.decodePixels(tagged).get.rgb,
            ImageCodec.decodePixels(scrubbed).get.rgb)
          (id, ImageCodec.pngChunkTypes(tagged).length,
            ImageCodec.pngChunkTypes(scrubbed).length,
            (tagged.length - scrubbed.length).toLong, intact)
        }
      }
      .toDF("doc_id", "chunks_before", "chunks_after", "removed_bytes",
        "pixels_intact")
  }

  /** JPEG twin of the scrub: real baseline JPEGs tagged with a COM
    * segment carrying simulated PII, scrubbed by the marker-walk
    * re-emit ([[graft.functions.JpegCodec.stripMetadata]] — drops COM
    * and APPn n≥1, keeps the pixel-bearing segments and the entropy
    * stream verbatim); raster equality proven by re-decoding BOTH
    * payloads inside the task. Segment counts and the exact byte
    * shrinkage are formula-predicted by the oracle. */
  def jpegScrubQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.{ImageCodec, JpegCodec}
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.map { id =>
          val w0 = 9 + 3 * (id % 4).toInt
          val h0 = 9 + 3 * (id % 3).toInt
          val base = JpegCodec.writeJpegPixels(w0, h0, 97, patternPx(id, w0, h0))
          val tagged = JpegCodec.withComment(base, s"user$id@example.com")
          val scrubbed = JpegCodec.stripMetadata(tagged).get
          val intact = java.util.Arrays.equals(
            ImageCodec.decodePixels(tagged).get.rgb,
            ImageCodec.decodePixels(scrubbed).get.rgb)
          (id, JpegCodec.segmentTypes(tagged).length,
            JpegCodec.segmentTypes(scrubbed).length,
            (tagged.length - scrubbed.length).toLong, intact)
        }
      }
      .toDF("doc_id", "segments_before", "segments_after", "removed_bytes",
        "pixels_intact")
  }

  /** Our 4:4:4 encoder emits SOI, APP0, 2×DQT, SOF0, 4×DHT, SOS = 10
    * segments; + COM = 11. COM framing = 4 bytes + the 16+digits(id)
    * comment. */
  val jpegScrubOracle: String =
    """SELECT doc_id,
      |       11 AS segments_before, 10 AS segments_after,
      |       CAST(20 + length(CAST(doc_id AS VARCHAR)) AS BIGINT) AS removed_bytes,
      |       TRUE AS pixels_intact
      |FROM documents
      |""".stripMargin

  /** tEXt chunk = 12 bytes of framing + "auth" + NUL +
    * "user<id>@example.com" ⇒ 33 + digits(id) bytes removed. */
  val imageScrubOracle: String =
    """SELECT doc_id,
      |       4 AS chunks_before, 3 AS chunks_after,
      |       CAST(33 + length(CAST(doc_id AS VARCHAR)) AS BIGINT) AS removed_bytes,
      |       TRUE AS pixels_intact
      |FROM documents
      |""".stripMargin

  val imageNearDupOracle: String =
    s"""SELECT doc_id AS doc_a,
       |       doc_id + $TwinSpace AS doc_b,
       |       CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'bmp' END AS format_a,
       |       CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'png' END AS format_b,
       |       CAST(9 + 3 * (doc_id % 4) AS INT) AS w_a,
       |       CAST(2 * (9 + 3 * (doc_id % 4)) AS INT) AS w_b
       |FROM documents
       |""".stripMargin
}
