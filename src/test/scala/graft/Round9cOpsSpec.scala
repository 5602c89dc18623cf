package graft

import org.apache.spark.sql.functions._
import graft.functions.CdcChunker
import graft.ops.ChunkDedup

/** Round-9c specs: content-defined-chunking dedup and the rest of the
  * crawl-hygiene batch. */
class Round9cOpsSpec extends SparkSpec {

  // ------------------------------------------------- CDC chunker laws

  test("CDC boundaries partition the payload with bounded chunk sizes") {
    val rnd = new scala.util.Random(7)
    for (n <- Seq(0, 1, 63, 64, 65, 1023, 1024, 1025, 4096, 20000)) {
      val b = Array.fill(n)(rnd.nextInt(256).toByte)
      val ends = CdcChunker.boundaries(b)
      if (n == 0) assert(ends.isEmpty)
      else {
        assert(ends.last == n)
        assert(ends.toSeq == ends.toSeq.sorted && ends.distinct.length == ends.length)
        val lens = (0 +: ends.toSeq).sliding(2).map(p => p(1) - p(0)).toSeq
        // every chunk except possibly the last respects [Min, Max]
        lens.dropRight(1).foreach { l =>
          assert(l >= CdcChunker.MinChunk && l <= CdcChunker.MaxChunk, s"len $l")
        }
        assert(lens.last <= CdcChunker.MaxChunk)
      }
    }
  }

  test("CDC chunk digests reassemble the payload and are deterministic") {
    val b = ChunkDedup.prngBytes(42, 5000)
    val c1 = CdcChunker.chunks(b)
    val c2 = CdcChunker.chunks(b.clone())
    assert(c1 == c2)
    assert(c1.map(_._2).sum == b.length)
    assert(c1.head._1 == 0)
    // offsets are contiguous
    c1.sliding(2).foreach {
      case Seq((o1, l1, _), (o2, _, _)) => assert(o1 + l1 == o2)
      case _ =>
    }
  }

  test("CDC re-synchronizes after an arbitrary-length insertion") {
    val content = ChunkDedup.prngBytes(99, 6144)
    val base = CdcChunker.chunks(content).map(_._3).toSet
    for (hl <- Seq(1, 37, 63, 64, 128, 255, 300, 999)) {
      val shifted = CdcChunker.chunks(
        ChunkDedup.prngBytes(hl * 31 + 5, hl) ++ content).map(_._3).toSet
      val shared = base.intersect(shifted)
      assert(shared.size >= 3, s"header $hl: only ${shared.size} shared chunks")
    }
  }

  test("fixed-block hashing finds NO shared blocks on the shifted twins") {
    // the comparison that motivates CDC: 256-byte aligned blocks on the
    // fixture twins share nothing because the header shift is never a
    // block multiple
    def blocks(b: Array[Byte]): Set[String] =
      b.grouped(256).map { g =>
        java.security.MessageDigest.getInstance("MD5").digest(g)
          .map(x => f"$x%02x").mkString
      }.toSet
    for (id <- 0L to 20L) {
      val content = ChunkDedup.prngBytes(id * 1009 + 7, ChunkDedup.ContentLen)
      val twin = ChunkDedup.headerBytes(id) ++ content
      assert(blocks(content).intersect(blocks(twin)).isEmpty)
      assert(CdcChunker.chunks(content).map(_._3).toSet
        .intersect(CdcChunker.chunks(twin).map(_._3).toSet).size >= 3)
    }
  }

  test("undersized tail fragments never pair; sub-MinChunk exact dups still do") {
    import spark.implicits._
    // two UNRELATED payloads, each cut at one of its own natural
    // boundaries with the same single byte appended: the chunker emits
    // that byte as a 1-byte tail fragment in both, which before the
    // round-14 fix made them "share a chunk" (the sf1 oracle sweep
    // measured 237 such spurious pairs at 100k payloads)
    def withTinyTail(seed: Long): Array[Byte] = {
      val content = ChunkDedup.prngBytes(seed, 4096)
      val cut = CdcChunker.boundaries(content)
        .filter(_ < content.length).last
      content.slice(0, cut) :+ 0x07.toByte
    }
    val p1 = withTinyTail(11); val p2 = withTinyTail(222)
    // a payload smaller than MinChunk is ONE whole-payload chunk — an
    // exact duplicate of it must still enter the index and pair
    val tiny = ChunkDedup.prngBytes(9, 40)
    val idx = ChunkDedup.chunkIndexOf(spark.createDataset(Seq(
        (1L, p1), (2L, p2), (3L, tiny), (4L, tiny.clone()))))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def hashes(id: Long) = idx.collect { case (`id`, h) => h }.toSet
    assert(hashes(1L).nonEmpty && hashes(2L).nonEmpty)
    assert(hashes(1L).intersect(hashes(2L)).isEmpty,
      "1-byte tail fragments must not be dedup signals")
    assert(hashes(3L) == hashes(4L) && hashes(3L).size == 1,
      "sub-MinChunk exact duplicates must still share their whole-payload chunk")
  }

  test("chunk dedup detects exactly the twin pairs at sf0.001") {
    val rows = ChunkDedup.chunkDedupQuery(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.size == n)
    assert(rows.forall { case (a, b) => b == a + 1000000000L })
  }

  test("streaming chunk classification equals batch, micro-batch by micro-batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val all = ChunkDedup.payloads(spark, sf)
    val index = ChunkDedup.chunkIndexOf(
      all.filter(_._1 < ChunkDedup.ChunkIndexSplit))
    val arrivals = all.filter(_._1 >= 1000000000L).collect()
    val wh = new graft.connect.ParquetWarehouse(
      java.nio.file.Files.createTempDirectory("graft_stream_cdc").toString)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Byte])]
    val q = ChunkDedup.classifyChunkStream(
      input.toDS().toDF("doc_id", "payload"), index, wh, "cdc",
      "/tmp/graft_ckpt_cdc_" + System.nanoTime(),
      graft.core.RunDate("2024-06-01")).start()
    try {
      val (b1, b2) = arrivals.splitAt(arrivals.length / 2)
      input.addData(b1.toIndexedSeq); q.processAllAvailable()
      input.addData(b2.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))
    val streamed = wh.readHistory(spark, "cdc")
      .select("doc_id", "status", "dup_of").collect().map(key).toSet
    val batch = ChunkDedup.chunkDedupIncrementalQuery(spark, sf)
      .collect().map(key).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty &&
      batch.forall { case (id, st, d) =>
        (st == "dup") == (id - 1000000000L < ChunkDedup.ChunkIndexSplit) &&
          (st != "dup" || d == id - 1000000000L)
      })
  }

  // --------------------------------------------------- ID3v2 frames

  test("ID3v2.3 frames round-trip through write/read") {
    import graft.functions.Mp3Codec
    import graft.functions.Mp3Codec.Id3Frame
    val frames = Seq(
      Id3Frame("TIT2", "A Song"), Id3Frame("TPE1", "Somebody"),
      Id3Frame("COMM", "note with user7@mail.example inside"),
      Id3Frame("PRIV", "com.example/owner"))
    val mp3 = Mp3Codec.writeMp3WithId3(frames)
    assert(Mp3Codec.readId3(mp3).contains(frames))
    // header census still agrees on the tag size
    val m = Mp3Codec.meta(mp3).get
    assert(m.version == "1" && m.layer == 3)
    assert(m.id3Size == Mp3Codec.writeId3(frames).length)
    // padding after the last frame ends the walk cleanly
    val padded = Mp3Codec.writeId3(frames, padding = 64)
    assert(Mp3Codec.readId3(padded).contains(frames))
  }

  test("ID3v2.4 syncsafe frame sizes are read") {
    import graft.functions.Mp3Codec
    // hand-built v2.4 tag: one TIT2 frame of body length 200 (>127 so
    // syncsafe vs plain-BE actually differ: 200 = 0x00C8 plain,
    // 0x0148 syncsafe)
    val text = "x" * 199
    val body = Array[Byte](0) ++ text.getBytes("ISO-8859-1")
    val n = body.length
    assert(n == 200)
    val frame = "TIT2".getBytes("US-ASCII") ++
      Array[Byte](((n >> 21) & 0x7f).toByte, ((n >> 14) & 0x7f).toByte,
        ((n >> 7) & 0x7f).toByte, (n & 0x7f).toByte, 0, 0) ++ body
    val size = frame.length
    val tag = "ID3".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, ((size >> 21) & 0x7f).toByte,
        ((size >> 14) & 0x7f).toByte, ((size >> 7) & 0x7f).toByte,
        (size & 0x7f).toByte) ++ frame
    val fs = Mp3Codec.readId3(tag).get
    assert(fs == Seq(Mp3Codec.Id3Frame("TIT2", text)))
  }

  test("ID3 reader never throws on hostile input") {
    import graft.functions.Mp3Codec
    val rnd = new scala.util.Random(11)
    val valid = Mp3Codec.writeMp3WithId3(
      Seq(Mp3Codec.Id3Frame("TIT2", "t"), Mp3Codec.Id3Frame("COMM", "c")))
    for (_ <- 1 to 300) {
      val junk = Array.fill(rnd.nextInt(400))(rnd.nextInt(256).toByte)
      Mp3Codec.readId3(junk)
      val flipped = valid.clone()
      val i = rnd.nextInt(flipped.length)
      flipped(i) = (flipped(i) ^ (1 << rnd.nextInt(8))).toByte
      Mp3Codec.readId3(flipped) // may be None or Some, must not throw
    }
    // frame size pointing past the tag end → None, not a crash
    val truncated = valid.take(14)
    assert(Mp3Codec.readId3(truncated).isEmpty || truncated.length >= 20)
  }

  // --------------------------------------------- HTML table extraction

  test("HTML table rows flatten with inner markup stripped") {
    val rows = graft.ops.TextAnalysis.htmlTablesQuery(spark, sf)
      .filter(col("doc_id") === 5L).orderBy(col("table_idx"), col("row_idx"))
      .collect()
    // doc 5: 5 % 3 = 2 tables; table 0 has 2+(5+0)%3=4 rows of 2+(5+0)%2=3
    // cells, table 1 has 2+(6)%3=2 rows of 2+6%2=2 cells
    assert(rows.length == 4 + 2)
    val first = rows.head
    assert(first.getInt(3) == 3)
    // cell j=1 is <b>-wrapped in the fixture; stripped on extraction
    assert(first.getString(4) == "c5_0_0_0|c5_0_0_1|c5_0_0_2")
    val t1 = rows.filter(_.getInt(1) == 1)
    assert(t1.map(_.getString(4)).toSeq ==
      Seq("c5_1_0_0|c5_1_0_1", "c5_1_1_0|c5_1_1_1"))
    // doc with id % 3 == 0 has no tables at all
    assert(graft.ops.TextAnalysis.htmlTablesQuery(spark, sf)
      .filter(col("doc_id") === 3L).count() == 0)
  }

  // ---------------------------------------------------- zstd frames

  test("zstd raw/RLE frames round-trip and census correctly") {
    import graft.functions.ZstdCodec
    import graft.functions.ZstdCodec.{RawPart, RlePart}
    val content = "hello " + "A" * 300 + " world"
    val frame = ZstdCodec.writeFrame(Seq(
      RawPart("hello ".getBytes), RlePart('A', 300), RawPart(" world".getBytes)))
    assert(new String(ZstdCodec.extract(frame).get) == content)
    val m = ZstdCodec.census(frame).get
    assert(m.singleSegment && m.contentSize == content.length &&
      m.nBlocks == 3 && m.nRle == 1 && m.nCompressed == 0)
    // FCS size-class boundaries: <256, 256..65791, >=65792
    for (n <- Seq(1, 255, 256, 65791, 65792, 70000)) {
      val f = ZstdCodec.writeFrame(Seq(RlePart('x', n)))
      assert(ZstdCodec.census(f).get.contentSize == n, s"n=$n")
      assert(ZstdCodec.extract(f).get.length == n, s"n=$n")
    }
    // hostile input: junk + flips never throw
    val rnd = new scala.util.Random(41)
    for (_ <- 1 to 300) {
      ZstdCodec.census(Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte))
      val f = frame.clone(); val i = rnd.nextInt(f.length)
      f(i) = (f(i) ^ (1 << rnd.nextInt(8))).toByte
      ZstdCodec.census(f); ZstdCodec.extract(f)
    }
  }

  test("zstd frames interop with the reference zstd tool when present") {
    import graft.functions.ZstdCodec
    import graft.functions.ZstdCodec.{RawPart, RlePart}
    val zstdBin = new java.io.File("/root/miniconda/bin/zstd")
    assume(zstdBin.canExecute, "reference zstd not installed")
    import scala.sys.process._
    val dir = java.nio.file.Files.createTempDirectory("graft_zstd")
    // ours -> reference decoder
    val content = "graft zstd interop " + "B" * 123 + " tail"
    val frame = ZstdCodec.writeFrame(Seq(
      RawPart("graft zstd interop ".getBytes), RlePart('B', 123),
      RawPart(" tail".getBytes)))
    val fz = dir.resolve("ours.zst")
    java.nio.file.Files.write(fz, frame)
    val outPlain = dir.resolve("ours.out")
    assert(Seq(zstdBin.getPath, "-d", "-f", fz.toString, "-o",
      outPlain.toString).! == 0, "reference decoder rejected our frame")
    val decoded = new String(java.nio.file.Files.readAllBytes(outPlain))
    assert(decoded == content, "reference decoder disagrees")
    // reference encoder -> our census (and extract when entropy-free)
    val plain = dir.resolve("in.txt")
    val payload = ("repetitive " * 40).getBytes
    java.nio.file.Files.write(plain, payload)
    val rz = dir.resolve("real.zst")
    assert(Seq(zstdBin.getPath, "-q", "-f", plain.toString, "-o",
      rz.toString).! == 0)
    val real = java.nio.file.Files.readAllBytes(rz)
    val m = ZstdCodec.census(real).get
    assert(m.nBlocks >= 1)
    ZstdCodec.extract(real).foreach { c =>
      assert(java.util.Arrays.equals(c, payload))
    }
  }

  // ------------------------------------------------- Adam7 interlace

  test("Adam7 PNG decodes to the exact sequential raster") {
    import graft.functions.ImageCodec
    def px(seed: Int)(x: Int, y: Int): Int =
      (((x * 31 + y * 17 + seed) % 256) << 16) |
        (((x * 7 + y * 13 + seed) % 256) << 8) | ((x + y + seed) % 256)
    // dims crossing every pass-emptiness case: 1x1 (only pass 1),
    // tiny odds, pass-multiple sizes
    for ((w, h) <- Seq((1, 1), (1, 5), (5, 1), (2, 3), (7, 7), (8, 8),
      (9, 12), (16, 16), (33, 21))) {
      val seq = ImageCodec.writePngPixels(w, h, px(w * 100 + h))
      val lace = ImageCodec.writePngInterlacedPixels(w, h, px(w * 100 + h))
      val a = ImageCodec.decodePixels(seq).get
      val b = ImageCodec.decodePixels(lace).get
      assert(b.width == w && b.height == h, s"${w}x$h")
      assert(java.util.Arrays.equals(a.rgb, b.rgb), s"${w}x$h rasters differ")
    }
  }

  test("Adam7 decode agrees with ImageIO") {
    import graft.functions.ImageCodec
    val w = 19; val h = 14
    def px(x: Int, y: Int): Int =
      ((x * 53 + y * 11) % 256 << 16) | ((x * 3 + y * 29) % 256 << 8) |
        ((x * 17 + y) % 256)
    val lace = ImageCodec.writePngInterlacedPixels(w, h, px)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(lace))
    assert(img.getWidth == w && img.getHeight == h)
    val ours = ImageCodec.decodePixels(lace).get
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y) & 0xffffff
      val o = (y * w + x) * 3
      val mine = ((ours.rgb(o) & 0xff) << 16) | ((ours.rgb(o + 1) & 0xff) << 8) |
        (ours.rgb(o + 2) & 0xff)
      assert(rgb == mine, s"($x,$y)")
    }
  }

  test("Adam7 decode never throws on hostile input") {
    import graft.functions.ImageCodec
    val lace = ImageCodec.writePngInterlacedPixels(17, 9, (x, y) => x * y)
    val rnd = new scala.util.Random(31)
    for (_ <- 1 to 200) {
      ImageCodec.decodePixels(lace.take(rnd.nextInt(lace.length)))
      val f = lace.clone(); val i = rnd.nextInt(f.length)
      f(i) = (f(i) ^ (1 << rnd.nextInt(8))).toByte
      ImageCodec.decodePixels(f)
    }
  }

  // ------------------------------------------------------ ICO census

  test("ICO walk reads the directory, 256-encoding, and payload magic") {
    import graft.functions.{IcoCodec, ImageCodec}
    val png = ImageCodec.writePng(4, 4, 1, 2, 3)
    val ico = IcoCodec.writeIco(Seq(
      (16, 16, new Array[Byte](48)), (256, 256, png)))
    assert(IcoCodec.census(ico).contains(IcoCodec.IcoMeta(2, 256, 256, 1)))
    // junk and truncation never throw; non-icon type rejected
    val rnd = new scala.util.Random(23)
    for (_ <- 1 to 200) {
      IcoCodec.census(Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte))
      IcoCodec.census(ico.take(rnd.nextInt(ico.length)))
    }
    val cur = ico.clone(); cur(2) = 2 // type=2 (cursor)
    assert(IcoCodec.census(cur).isEmpty)
    // entry pointing past the end rejected
    val bad = ico.clone(); bad(6 + 12) = 0x7f
    assert(IcoCodec.census(bad).isEmpty)
  }

  // --------------------------------------------- confusable skeleton

  test("confusable skeleton folds homoglyphs, fullwidth, and zero-width") {
    import spark.implicits._
    import graft.functions.ConfusableSkeleton.skeleton
    val rows = Seq(
      "pаypаl alert",            // Cyrillic а
      "ｐａｙｐａｌ alert", // fullwidth paypal
      "paypal​ al‌ert",          // zero-width salt
      "PAYPAL ALERT",                 // case + NBSP
      "paypal alert",                      // clean
      "paypal different")                  // must NOT collide
      .toDF("t").select(skeleton(col("t")).as("s")).as[String].collect()
    assert(rows.take(5).toSet == Set("paypal alert"))
    assert(rows(5) == "paypal different")
    // Greek omicron and nu
    val g = Seq("cοnνοy").toDF("t")
      .select(skeleton(col("t")).as("s")).as[String].collect()
    assert(g.head == "convoy")
  }

  test("skeleton MinHash finds evasion near-twins that raw MinHash misses") {
    import graft.ops.Dedup
    val T = 1000000000L
    val skPairs = Dedup.skeletonMinhashQuery(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    val twinPairs = skPairs.filter { case (a, b) => b == a + T }
    // banding at J≈0.9 is ~98.6% per pair; require the overwhelming bulk
    assert(twinPairs.size >= (n / 4 * 9) / 10,
      s"only ${twinPairs.size} of ~${n / 4} evasion twins found")
    // raw-text MinHash on the same corpus finds NO twin pair: every
    // shingle containing a swapped letter differs, so raw Jaccard is
    // far below the verify threshold
    val rawPairs = Dedup.minhashLsh(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!rawPairs.exists { case (a, b) => b == a + T })
  }

  // ------------------------------------------------- subtitle parsing

  test("SRT and VTT cues parse with markup stripped") {
    val df = graft.ops.TextAnalysis.subtitleQuery(spark, sf)
    val d0 = df.filter(col("doc_id") === 0L).orderBy(col("cue_idx")).collect()
    // doc 0: VTT, 2 cues, starts at 0 and 2500
    assert(d0.map(_.getString(1)).toSet == Set("vtt"))
    assert(d0.map(_.getLong(3)).toSeq == Seq(0L, 2500L))
    assert(d0.map(_.getString(5)).toSeq == Seq("line0_0", "line0_1"))
    // cue 1 of a VTT doc is <i>-wrapped in the wire format; text is clean
    assert(!d0(1).getString(5).contains("<"))
    val d1 = df.filter(col("doc_id") === 1L).orderBy(col("cue_idx")).collect()
    assert(d1.map(_.getString(1)).toSet == Set("srt"))
    assert(d1.length == 3) // 2 + 1 % 4
    assert(d1(0).getLong(3) == 100L && d1(0).getLong(4) == 100L + 1200L + 100L)
  }

  // ------------------------------------------------- MP4 track walk

  test("MP4 per-track walk reads stsz/mdhd/hdlr and survives stubs") {
    import graft.functions.IsoBmff
    val mp4 = IsoBmff.writeMp4Tracks("isom", 600L, 7200L, Seq(
      IsoBmff.TrackSpec("vide", 1000L, 4000L, Seq(100L, 150L, 120L)),
      IsoBmff.TrackSpec("soun", 48000L, 96000L, Seq(64L, 64L))))
    val ts = IsoBmff.tracks(mp4).get
    assert(ts.length == 2)
    assert(ts(0) == IsoBmff.TrackMeta("vide", 1000L, 4000L, 3L, 370L, 150L))
    assert(ts(1).handler == "soun" && ts(1).durationMs == 2000L &&
      ts(1).totalBytes == 128L)
    // the old census still agrees on the track count
    assert(IsoBmff.census(mp4).get.nTracks == 2)
    // stub traks (no mdia) from the v0 writer → zero-rows, not None
    val stub = IsoBmff.writeMp4("isom", 600L, 1230L, 2, mvhdV1 = false)
    assert(IsoBmff.tracks(stub).get ==
      Seq.fill(2)(IsoBmff.TrackMeta("", 0L, 0L, 0L, 0L, 0L)))
    // hostile input: truncation and bit flips never throw
    val rnd = new scala.util.Random(17)
    for (_ <- 1 to 200) {
      IsoBmff.tracks(mp4.take(rnd.nextInt(mp4.length)))
      val f = mp4.clone(); val i = rnd.nextInt(f.length)
      f(i) = (f(i) ^ (1 << rnd.nextInt(8))).toByte
      IsoBmff.tracks(f)
    }
  }

  // ------------------------------------------------- MIME sniffing

  test("MIME sniff recovers every fixture family and is total") {
    import graft.functions.MimeSniff
    val rows = graft.ops.Multimodal.mimeMismatchQuery(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getBoolean(3)))
    assert(rows.length == 500)
    // sniffed is a pure function of id % 16 and covers all 16 families
    assert(rows.map(_._3).distinct.length == 16)
    rows.foreach { case (id, declared, sniffed, mismatch) =>
      assert(mismatch == (id % 7 == 0), s"id $id")
      assert((declared != sniffed) == mismatch, s"id $id")
      assert(!sniffed.contains("octet-stream"), s"id $id sniffed $sniffed")
    }
    // total on junk
    val rnd = new scala.util.Random(5)
    for (_ <- 1 to 300)
      MimeSniff.sniff(Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte))
    assert(MimeSniff.sniff(Array.emptyByteArray) == "application/octet-stream")
    assert(MimeSniff.sniff("   <p>hi".getBytes) == "text/html")
    assert(MimeSniff.sniff("hello".getBytes) == "text/plain")
    assert(MimeSniff.sniff(Array[Byte](0, 1, 2)) == "application/octet-stream")
  }

  test("CDC chunker never throws on junk") {
    val rnd = new scala.util.Random(3)
    for (_ <- 1 to 200) {
      val b = Array.fill(rnd.nextInt(3000))(rnd.nextInt(256).toByte)
      CdcChunker.chunks(b)
    }
  }
}
