package graft

import org.apache.spark.sql.functions._
import graft.ops.{Multimodal, Similarity}

class SimilaritySpec extends SparkSpec {

  test("IVF index save/load: probes from the saved index equal a fresh build") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivf_index").toString + "/ivf"
    Similarity.saveIndex(spark, sf, path)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    val fresh = key(Similarity.ivfTopK(spark, sf))
    val served = key(Similarity.ivfTopKFromSaved(spark, path))
    assert(served == fresh && fresh.nonEmpty)
    // the artifact is centroid-partitioned: a probe's list filter prunes
    // at the directory level
    val dirs = new java.io.File(path).listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("centroid_id=")))
    graft.core.Caches.release(spark)
  }

  test("brute-force top-k: k rows per vector, self excluded, cosine in [-1,1]") {
    val out = Similarity.bruteForceTopK(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(0) != r.getLong(1)))
    assert(out.forall(r => math.abs(r.getDouble(2)) <= 1.0 + 1e-9))
    val perVec = out.groupBy(_.getLong(0)).values.map(_.length)
    assert(perVec.forall(_ <= 5))
    // ranks are 1..k without gaps
    val ranks = out.groupBy(_.getLong(0)).values
      .map(_.map(_.getInt(3)).sorted.toSeq)
    assert(ranks.forall(rs => rs == (1 to rs.length)))
  }

  test("LSH ANN never beats the exact top-1 and overlaps it where buckets allow") {
    val bfTop1 = Similarity.bruteForceTopK(spark, sf).collect()
      .filter(_.getInt(3) == 1).map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val ann = Similarity.lshTopK(spark, sf).collect()
    val annTop1 = ann.filter(_.getInt(3) == 1)
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // ANN is exact *within* a bucket: its best cosine can never exceed the
    // global best (embeddings here are near-random, so recall of the true
    // top-1 is bucket-luck — we assert soundness, not recall)
    assert(annTop1.forall { case (v, _, c) => c <= bfTop1(v) + 1e-9 })
    val bf = Similarity.bruteForceTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(annTop1.count(t => bf.contains((t._1, t._2))) > 0)
  }

  test("plane weights are deterministic ±1") {
    val w1 = Similarity.planeWeights(3)
    val w2 = Similarity.planeWeights(3)
    assert(w1.toSeq == w2.toSeq)
    assert(w1.forall(x => x == 1.0 || x == -1.0))
  }
}

class MultimodalSpec extends SparkSpec {

  test("decoder path (mapPartitions batches) equals expression path") {
    val expr = Multimodal.features(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getLong(2), r.getString(3), r.getString(4))))
      .toMap
    val dec = Multimodal.decodeFeatures(
        Multimodal.mediaDataset(spark, sf), Multimodal.StubDecoder, batchSize = 7)
      .collect()
      .map(f => (f.doc_id, (f.media_type, f.byte_len, f.payload_md5, f.head_hex)))
      .toMap
    assert(dec == expr)
  }

  test("frameSample slices video payloads into strided fixed-size frames") {
    val media = Multimodal.mediaTable(spark, sf)
    val frames = Multimodal.frameSample(media, frameBytes = 16, stride = 2)
    val byDoc = frames.collect().groupBy(_.getLong(0))
    assert(byDoc.nonEmpty)
    byDoc.values.foreach { rows =>
      // frame positions are 0, 2, 4... and frames are <=16 bytes
      val idxs = rows.map(_.getInt(1)).sorted.toSeq
      assert(idxs == idxs.indices)
      assert(rows.forall(_.getAs[Array[Byte]](2).length <= 16))
    }
    // only video rows produce frames
    val videoIds = media.filter(org.apache.spark.sql.functions.col("media_type") === "video")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(byDoc.keySet.subsetOf(videoIds))
  }

  test("resizeMeta preserves aspect ratio within the bounding box") {
    val out = Multimodal.resizeMeta(Multimodal.mediaTable(spark, sf), 64, 64)
      .select("width", "height", "out_width", "out_height").collect()
    out.foreach { r =>
      val (w, h, ow, oh) = (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
      assert(ow <= 64 && oh <= 64 && ow <= w && oh <= h)
      if (w > 64 || h > 64) assert(ow == 64 || oh == 64) // touches the box
    }
  }

  test("media table: payload is binary, metadata typed") {
    val sch = Multimodal.mediaTable(spark, sf).schema
    assert(sch("payload").dataType.typeName == "binary")
    assert(sch("width").dataType.typeName == "integer")
    val types = Multimodal.mediaTable(spark, sf).select("media_type").distinct()
      .collect().map(_.getString(0)).toSet
    assert(types == Set("image", "audio", "video"))
  }

  // ------------------------------------------- real byte-level decode
  import graft.functions.ImageCodec

  private def imageIoBytes(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, 0x336699)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"no ImageIO writer for $fmt")
    out.toByteArray
  }

  test("ImageCodec decodes REAL payloads written by an independent encoder (ImageIO)") {
    val png = ImageCodec.decode(imageIoBytes("png", 20, 10))
    assert(png.contains(ImageCodec.ImageMeta("png", 20, 10, 3)))
    val jpg = ImageCodec.decode(imageIoBytes("jpg", 33, 17))
    assert(jpg.contains(ImageCodec.ImageMeta("jpeg", 33, 17, 3)))
    val gif = ImageCodec.decode(imageIoBytes("gif", 5, 9))
    assert(gif.contains(ImageCodec.ImageMeta("gif", 5, 9, 3)))
    val bmp = ImageCodec.decode(imageIoBytes("bmp", 12, 8))
    assert(bmp.contains(ImageCodec.ImageMeta("bmp", 12, 8, 3)))
  }

  test("ImageCodec.writePng round-trips through an independent decoder (ImageIO)") {
    val bytes = ImageCodec.writePng(21, 13, 10.toByte, 200.toByte, 77.toByte)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO could not decode our PNG bytes")
    assert(img.getWidth == 21 && img.getHeight == 13)
    // pixel content survives: solid fill (10, 200, 77)
    assert((img.getRGB(5, 5) & 0xffffff) == ((10 << 16) | (200 << 8) | 77))
    // and our own header parse agrees
    assert(ImageCodec.decode(bytes).contains(ImageCodec.ImageMeta("png", 21, 13, 3)))
  }

  test("ImageCodec.writeBmp round-trips through ImageIO and our parser") {
    val bytes = ImageCodec.writeBmp(9, 6, 1.toByte, 2.toByte, 3.toByte)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null && img.getWidth == 9 && img.getHeight == 6)
    assert((img.getRGB(4, 3) & 0xffffff) == ((1 << 16) | (2 << 8) | 3))
    assert(ImageCodec.decode(bytes).contains(ImageCodec.ImageMeta("bmp", 9, 6, 3)))
  }

  test("ImageCodec rejects corrupt or foreign payloads instead of throwing") {
    assert(ImageCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(ImageCodec.decode("not an image at all".getBytes("UTF-8")).isEmpty)
    val truncated = ImageCodec.writePng(8, 8, 0, 0, 0).take(20)
    assert(ImageCodec.decode(truncated).isEmpty)
    // JPEG SOI with EOI immediately after: no frame header
    assert(ImageCodec.decode(Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)).isEmpty)
  }

  test("AudioCodec.writeWav round-trips through an independent decoder (javax.sound)") {
    import graft.functions.AudioCodec
    val bytes = AudioCodec.writeWav(16000, 2, 25, (s, c) => (s * 100 + c).toShort)
    val fmt = javax.sound.sampled.AudioSystem.getAudioFileFormat(
      new java.io.ByteArrayInputStream(bytes))
    assert(fmt.getType == javax.sound.sampled.AudioFileFormat.Type.WAVE)
    assert(fmt.getFormat.getSampleRate == 16000f)
    assert(fmt.getFormat.getChannels == 2)
    assert(fmt.getFormat.getSampleSizeInBits == 16)
    assert(fmt.getFrameLength == 25)
    // and our own parser agrees
    assert(AudioCodec.decode(bytes).contains(
      AudioCodec.AudioMeta("wav", 16000, 2, 16, 25L, 25L * 1000 / 16000)))
  }

  test("AudioCodec decodes a WAV written by an independent encoder (javax.sound)") {
    import graft.functions.AudioCodec
    val pcm = new Array[Byte](30 * 2) // 30 mono 16-bit samples
    val af = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), af, 30)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    assert(AudioCodec.decode(out.toByteArray).contains(
      AudioCodec.AudioMeta("wav", 8000, 1, 16, 30L, 30L * 1000 / 8000)))
  }

  test("AudioCodec rejects corrupt or foreign payloads instead of throwing") {
    import graft.functions.AudioCodec
    assert(AudioCodec.decode("RIFFnot really a wav".getBytes("UTF-8")).isEmpty)
    assert(AudioCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(AudioCodec.decode(ImageCodec.writePng(4, 4, 0, 0, 0)).isEmpty)
    val truncated = AudioCodec.writeWav(8000, 1, 10, (_, _) => 0).take(20)
    assert(AudioCodec.decode(truncated).isEmpty)
  }

  test("audioDecodeQuery: decoded stream parameters match the generator formulas") {
    val rows = Multimodal.audioDecodeQuery(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) == "wav")
      assert(r.getInt(2) == (8000 + (id % 8) * 1000).toInt)
      assert(r.getInt(3) == (id % 2 + 1).toInt)
      assert(r.getInt(4) == 16)
      assert(r.getLong(5) == id % 50 + 10)
    }
  }

  test("VideoCodec: writeAvi round-trips meta and yields the exact frame payloads") {
    import graft.functions.VideoCodec
    val f0 = Array[Byte](1, 2, 3)
    val f1 = Array[Byte](9, 8, 7, 6) // even/odd sizes exercise word padding
    val bytes = VideoCodec.writeAvi(320, 240, 40000, Seq(f0, f1))
    assert(VideoCodec.decodeMeta(bytes).contains(
      VideoCodec.VideoMeta("avi", 320, 240, 40000, 2)))
    val fs = VideoCodec.frames(bytes)
    assert(fs.length == 2)
    assert(fs(0).sameElements(f0) && fs(1).sameElements(f1))
  }

  test("VideoCodec rejects corrupt or foreign payloads instead of throwing") {
    import graft.functions.{AudioCodec, VideoCodec}
    assert(VideoCodec.decodeMeta("RIFFxxxxWAVE".getBytes("UTF-8")).isEmpty)
    assert(VideoCodec.decodeMeta(Array[Byte](1, 2)).isEmpty)
    // a WAV is RIFF but not AVI; an AVI is RIFF but not WAV
    val wav = AudioCodec.writeWav(8000, 1, 4, (_, _) => 0)
    assert(VideoCodec.decodeMeta(wav).isEmpty)
    val avi = VideoCodec.writeAvi(8, 8, 1000, Seq(Array[Byte](1)))
    assert(AudioCodec.decode(avi).isEmpty)
    assert(VideoCodec.frames(wav).isEmpty)
  }

  test("RIFF walkers terminate on hostile chunk sizes (no hang, no throw)") {
    import graft.functions.{AudioCodec, VideoCodec}
    def le32(v: Int) = Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte,
                             (v >>> 24).toByte)
    def riff(kind: String, chunks: Array[Byte]) =
      "RIFF".getBytes("US-ASCII") ++ le32(4 + chunks.length) ++
        kind.getBytes("US-ASCII") ++ chunks
    // 0xFFFFFFF8 as a signed-int size would advance the cursor by ZERO —
    // the pre-fix walkers spun forever here; padding keeps length >= 44
    val hostile = "JUNK".getBytes("US-ASCII") ++ le32(0xFFFFFFF8) ++
      new Array[Byte](40)
    assert(AudioCodec.decode(riff("WAVE", hostile)).isEmpty)
    assert(VideoCodec.decodeMeta(riff("AVI ", hostile)).isEmpty)
    assert(VideoCodec.frames(riff("AVI ", hostile)).isEmpty)
    // negative-but-small size would have stepped BACKWARDS pre-fix
    val backwards = "JUNK".getBytes("US-ASCII") ++ le32(-16) ++
      new Array[Byte](40)
    assert(AudioCodec.decode(riff("WAVE", backwards)).isEmpty)
    assert(VideoCodec.decodeMeta(riff("AVI ", backwards)).isEmpty)
    // truncated hdrl LIST: bounds must be checked BEFORE the tag read
    val truncated = riff("AVI ",
      "LIST".getBytes("US-ASCII") ++ le32(4) ++ "hdrl".getBytes("US-ASCII"))
    assert(VideoCodec.decodeMeta(truncated).isEmpty)
    // structurally valid WAV whose fmt declares 4-bit samples: block
    // size rounds to zero — must be a None, not a divide-by-zero
    val wav = AudioCodec.writeWav(8000, 1, 4, (_, _) => 0)
    wav(34) = 4 // bitsPerSample LE16 low byte
    assert(AudioCodec.decode(wav).isEmpty)
  }

  test("videoDecodeQuery: two-level decode matches the generator formulas") {
    val rows = Multimodal.videoDecodeQuery(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (id, frames) =>
      assert(frames.length == (id % 5 + 2).toInt, "one row per container frame")
      frames.foreach { r =>
        assert(r.getInt(2) == (id % 32 + 8).toInt) // container width
        assert(r.getInt(6) == (id % 32 + 8).toInt) // frame-level PNG width agrees
        assert(r.getInt(3) == (id % 24 + 8).toInt)
        assert(r.getInt(7) == (id % 24 + 8).toInt)
        assert(r.getString(5) == "png")
      }
    }
  }

  test("imageDecodeQuery: decoded metadata matches the generator formulas") {
    val rows = Multimodal.imageDecodeQuery(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) == (if (id % 2 == 0) "png" else "bmp"))
      assert(r.getInt(2) == (id % 64 + 16).toInt)
      assert(r.getInt(3) == (id % 48 + 16).toInt)
      assert(r.getInt(4) == 3)
    }
  }
}
