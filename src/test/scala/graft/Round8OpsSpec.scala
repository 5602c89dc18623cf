package graft

import org.apache.spark.sql.functions._
import graft.functions.ImageCodec

/** Round-8 specs. Starts with regression tests for the round-7 advice
  * findings: hostile image payloads must return None (never spin or
  * throw in an executor task), and empty-table layout audits must
  * return empty frames, not IllegalArgumentException. */
class Round8OpsSpec extends SparkSpec {

  // --- corrupt-payload hardening (advice: ImageCodec chunk walks) ---

  /** A structurally-valid truecolor PNG whose second chunk's length
    * field is overwritten with `len` (big-endian). */
  private def withBadChunkLen(len: Int): Array[Byte] = {
    val png = ImageCodec.writePng(4, 4, 10, 20, 30)
    val at = 8 + 12 + 13 // after IHDR: start of IDAT chunk
    val bad = png.clone()
    bad(at) = (len >>> 24).toByte; bad(at + 1) = (len >>> 16).toByte
    bad(at + 2) = (len >>> 8).toByte; bad(at + 3) = len.toByte
    bad
  }

  test("negative chunk length returns None instead of looping") {
    // len = -12 makes `p += 12 + len` a no-op: the old walk spun forever
    val bad = withBadChunkLen(-12)
    assert(ImageCodec.decodePixels(bad).isEmpty)
    assert(ImageCodec.stripAncillary(bad).isEmpty)
    // pngChunkTypes stops the walk (IHDR was already consumed)
    assert(ImageCodec.pngChunkTypes(bad) == Seq("IHDR"))
  }

  test("overlong chunk length returns None instead of overrunning") {
    val bad = withBadChunkLen(Int.MaxValue - 4)
    assert(ImageCodec.decodePixels(bad).isEmpty)
    assert(ImageCodec.stripAncillary(bad).isEmpty)
    assert(ImageCodec.pngChunkTypes(bad) == Seq("IHDR"))
  }

  test("huge-dimension headers return None instead of overflowing allocation") {
    // PNG IHDR with w = h = 2^30: h*(1+3w) overflows Int
    val png = ImageCodec.writePng(4, 4, 1, 2, 3)
    val bad = png.clone()
    def putBe32(i: Int, v: Int): Unit = {
      bad(i) = (v >>> 24).toByte; bad(i + 1) = (v >>> 16).toByte
      bad(i + 2) = (v >>> 8).toByte; bad(i + 3) = v.toByte
    }
    putBe32(16, 1 << 30); putBe32(20, 1 << 30)
    assert(ImageCodec.decodePixels(bad).isEmpty)

    // BMP with dims whose product overflows past the bounds check
    val bmp = ImageCodec.writeBmp(4, 4, 1, 2, 3)
    val badBmp = bmp.clone()
    def putLe32(i: Int, v: Int): Unit = {
      badBmp(i) = v.toByte; badBmp(i + 1) = (v >>> 8).toByte
      badBmp(i + 2) = (v >>> 16).toByte; badBmp(i + 3) = (v >>> 24).toByte
    }
    putLe32(18, 1 << 20); putLe32(22, 1 << 20)
    assert(ImageCodec.decodePixels(badBmp).isEmpty)
  }

  test("valid payloads still decode after the hardening") {
    val png = ImageCodec.writePngPixels(8, 6, (x, y) => (x * 40) << 16 | (y * 40))
    val p = ImageCodec.decodePixels(png).get
    assert(p.width == 8 && p.height == 6)
    assert(ImageCodec.stripAncillary(
      ImageCodec.withTextChunk(png, "Author", "x")).isDefined)
  }

  // --- baseline JPEG codec (round-7 verdict item 1) ---

  private def rasterOf(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val c = px(x, y); val o = (y * w + x) * 3
      rgb(o) = (c >>> 16).toByte; rgb(o + 1) = (c >>> 8).toByte
      rgb(o + 2) = c.toByte
    }
    rgb
  }

  private def maxDiff(a: Array[Byte], b: Array[Byte]): Int =
    a.zip(b).map { case (x, y) => math.abs((x & 0xff) - (y & 0xff)) }.max

  private def imageIoDecodeRgb(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val w = img.getWidth; val h = img.getHeight
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val c = img.getRGB(x, y); val o = (y * w + x) * 3
      rgb(o) = ((c >> 16) & 0xff).toByte; rgb(o + 1) = ((c >> 8) & 0xff).toByte
      rgb(o + 2) = (c & 0xff).toByte
    }
    (w, h, rgb)
  }

  private def imageIoEncodeJpeg(w: Int, h: Int, rgb: Array[Byte],
                                quality: Float): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      img.setRGB(x, y, ((rgb(o) & 0xff) << 16) | ((rgb(o + 1) & 0xff) << 8) |
        (rgb(o + 2) & 0xff))
    }
    val out = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    writer.setOutput(javax.imageio.ImageIO.createImageOutputStream(out))
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    writer.dispose()
    out.toByteArray
  }

  // a soft-gradient pattern: cell structure + smooth variation, both
  // well inside baseline JPEG's representable range at quality 90
  private def softPx(seed: Int)(x: Int, y: Int): Int = {
    val r = 32 + ((x / 4 + seed) % 6) * 32
    val g = 32 + ((y / 4 + seed) % 6) * 32
    val b = 32 + (((x + y) / 8) % 6) * 32
    (r << 16) | (g << 8) | b
  }

  private def maxLumaDiff(a: Array[Byte], b: Array[Byte]): Double = {
    def lum(r: Array[Byte], i: Int): Double =
      0.299 * (r(i * 3) & 0xff) + 0.587 * (r(i * 3 + 1) & 0xff) +
        0.114 * (r(i * 3 + 2) & 0xff)
    (0 until a.length / 3).map(i => math.abs(lum(a, i) - lum(b, i))).max
  }

  test("jpeg round-trip: own encoder -> own decoder stays close") {
    val w = 40; val h = 32
    val src = rasterOf(w, h, softPx(3))
    val jpg = graft.functions.JpegCodec.writeJpeg(w, h, src, 90)
    val dec = graft.functions.ImageCodec.decodePixels(jpg).get
    assert(dec.format == "jpeg" && dec.width == w && dec.height == h)
    // q90 on 4px color cells: chroma quantization rings at cell edges
    // (measured 20); luma — what the perceptual grid reads — stays tight
    assert(maxDiff(src, dec.rgb) <= 24,
      s"own roundtrip rgb drift ${maxDiff(src, dec.rgb)}")
    assert(maxLumaDiff(src, dec.rgb) <= 10.0,
      s"own roundtrip luma drift ${maxLumaDiff(src, dec.rgb)}")
  }

  test("jpeg header decode still reports dims for own encoder output") {
    val jpg = graft.functions.JpegCodec.writeJpegPixels(24, 15, 85, softPx(1))
    val m = graft.functions.ImageCodec.decode(jpg).get
    assert(m.format == "jpeg" && m.width == 24 && m.height == 15 &&
      m.channels == 3)
  }

  test("imageio reads our jpeg and sees our content") {
    val w = 33; val h = 26 // non-multiple-of-8 dims: edge blocks matter
    val src = rasterOf(w, h, softPx(5))
    val jpg = graft.functions.JpegCodec.writeJpeg(w, h, src, 92)
    val (dw, dh, drgb) = imageIoDecodeRgb(jpg)
    assert(dw == w && dh == h)
    assert(maxDiff(src, drgb) <= 32, s"imageio rgb drift ${maxDiff(src, drgb)}")
    assert(maxLumaDiff(src, drgb) <= 10.0,
      s"imageio luma drift ${maxLumaDiff(src, drgb)}")
  }

  test("our decoder matches imageio's decode of imageio-encoded jpeg (4:2:0)") {
    val w = 48; val h = 37
    val src = rasterOf(w, h, softPx(2))
    val jpg = imageIoEncodeJpeg(w, h, src, 0.92f)
    val ours = graft.functions.ImageCodec.decodePixels(jpg).get
    val (dw, dh, theirs) = imageIoDecodeRgb(jpg)
    assert(ours.width == dw && ours.height == dh)
    // LUMA is the exactness law: both decoders run the same standard on
    // the full-resolution Y plane, so they must agree within IDCT
    // rounding (measured 1.6). RGB legitimately diverges more — chroma
    // upsampling METHOD is unspecified by the standard (ours: nearest;
    // ImageIO: triangular), so only a loose bound holds there.
    val dl = maxLumaDiff(ours.rgb, theirs)
    assert(dl <= 4.0, s"luma decoder divergence $dl")
    assert(maxDiff(ours.rgb, theirs) <= 96,
      s"rgb decoder divergence ${maxDiff(ours.rgb, theirs)}")
  }

  test("own 4:2:0 stream: imageio and our decoder both read it, luma intact") {
    val w = 34; val h = 27 // non-multiple-of-16: partial MCUs
    val src = rasterOf(w, h, softPx(4))
    val jpg = graft.functions.JpegCodec.writeJpeg(w, h, src, 92,
      subsample420 = true)
    val mine = graft.functions.ImageCodec.decodePixels(jpg).get
    assert(mine.width == w && mine.height == h)
    val (dw, dh, theirs) = imageIoDecodeRgb(jpg)
    assert(dw == w && dh == h)
    // luma is full-resolution in 4:2:0: tight agreement all three ways
    assert(maxLumaDiff(src, mine.rgb) <= 10.0,
      s"own-decode luma drift ${maxLumaDiff(src, mine.rgb)}")
    assert(maxLumaDiff(src, theirs) <= 10.0,
      s"imageio luma drift ${maxLumaDiff(src, theirs)}")
    assert(maxLumaDiff(mine.rgb, theirs) <= 4.0,
      s"decoder luma divergence ${maxLumaDiff(mine.rgb, theirs)}")
  }

  test("jpeg grayscale stream decodes") {
    val w = 24; val h = 16
    val src = rasterOf(w, h, (x, y) => { val g = (x * 8 + y) & 0xff; (g << 16) | (g << 8) | g })
    val jpg = graft.functions.JpegCodec.writeJpeg(w, h, src, 90, gray = true)
    val dec = graft.functions.ImageCodec.decodePixels(jpg).get
    assert(dec.width == w && dec.height == h)
    // luma-only: compare against the ITU luma of the source
    var worst = 0
    for (i <- 0 until w * h) {
      val o = i * 3
      val lum = (0.299 * (src(o) & 0xff) + 0.587 * (src(o + 1) & 0xff) +
        0.114 * (src(o + 2) & 0xff)).round.toInt
      worst = math.max(worst, math.abs((dec.rgb(o) & 0xff) - lum))
    }
    assert(worst <= 12, s"gray drift $worst")
  }

  test("corrupt jpeg returns None") {
    val jpg = graft.functions.JpegCodec.writeJpegPixels(16, 16, 90, softPx(0))
    assert(graft.functions.ImageCodec.decodePixels(jpg.take(40)).isEmpty)
    val bad = jpg.clone(); bad(6) = 0x7f // corrupt APP0 length region
    // any outcome but a hang/throw is fine; just assert no exception
    graft.functions.ImageCodec.decodePixels(bad)
  }

  // --- IVF-PQ recall gate (round-7 verdict item 2) ---

  test("ivfpq recall within 0.05 of ivf-flat at equal probe budget") {
    val recall = graft.ops.Similarity.annRecall(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(recall.contains("ivfpq") && recall.contains("ivf"))
    val gap = recall("ivf") - recall("ivfpq")
    assert(gap <= 0.05, s"ivfpq recall gap $gap (ivf=${recall("ivf")}, " +
      s"ivfpq=${recall("ivfpq")})")
  }

  // --- two-phase connected components (round-7 verdict item 3) ---

  test("two-phase components equal min-label components on the pair graph") {
    import graft.ops.Dedup
    val a = Dedup.clusters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Dedup.clustersTwoPhase(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b, s"label sets differ: ${a.diff(b).take(3)} vs ${b.diff(a).take(3)}")
    graft.core.Caches.release(spark)
  }

  test("two-phase components solve a long chain min-label cannot") {
    import spark.implicits._
    // a 120-node path: diameter 119 >> components' default maxIters=10,
    // but O(log n) two-phase rounds collapse it completely
    val chain = (0L until 119L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = graft.ops.Dedup.componentsTwoPhase(chain).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(labels.length == 120 && labels.forall(_._2 == 0L),
      s"chain not fully collapsed: ${labels.filter(_._2 != 0L).take(5).toSeq}")
  }

  test("two-phase components plan size is bounded (lineage truncated)") {
    import spark.implicits._
    val chain = (0L until 200L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = graft.ops.Dedup.componentsTwoPhase(chain)
    // per-round localCheckpoint: the returned plan hangs off one
    // LogicalRDD regardless of how many rounds ran
    val lines = labels.queryExecution.logical.numberedTreeString
      .linesIterator.size
    assert(lines < 40, s"plan grew to $lines lines — lineage not truncated")
    assert(labels.queryExecution.logical.collectLeaves()
      .forall(_.getClass.getSimpleName.contains("LogicalRDD")))
  }

  // --- incremental entity resolution (round-7 verdict item 4) ---

  test("incremental ER merges entities bridged by a new record") {
    import spark.implicits._
    import graft.ops.EntityResolution
    // registry: two entities in the SAME block ("da"+"rp") that do not
    // link directly — lev("datapipe corp","datapipexxxx corp") = 4
    val reg2 = Seq((10L, "datapipe corp"), (20L, "datapipexxxx corp"))
      .toDF("record_id", "name")
    val full0 = EntityResolution.resolve(reg2).select("record_id", "entity_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(full0(10L) != full0(20L), "fixture must start unmerged")
    // the bridge sits lev 2 from BOTH: merges the two registry entities
    val bridge = Seq((30L, "datapipexx corp")).toDF("record_id", "name")
    val inc = EntityResolution.resolveIncremental(reg2, bridge)
      .select("record_id", "entity_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val full = EntityResolution.resolve(reg2.unionByName(bridge))
      .select("record_id", "entity_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(inc == full, s"incremental $inc != full $full")
    assert(inc(10L) == inc(20L) && inc(30L) == inc(10L),
      "bridge record must merge both entities")
    graft.core.Caches.release(spark)
  }

  test("streaming ER twin: final micro-batch equals batch re-resolution") {
    import spark.implicits._
    import graft.ops.EntityResolution
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all = EntityResolution.records(spark, sf)
    val registry = all.filter(col("record_id") < 1000000000000L)
    val feed = all.filter(col("record_id") >= 1000000000000L)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val (b1, b2) = feed.splitAt(feed.length / 2)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    @volatile var last: Array[(Long, Long, String, Long)] = Array.empty
    val q = EntityResolution.resolveStream(
      input.toDS().toDF("record_id", "name"), registry,
      "/tmp/graft_ckpt_er_" + System.nanoTime()) { (resolved, _) =>
        last = resolved.select("record_id", "entity_id", "canonical_name",
          "n_members").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      }.start()
    try {
      input.addData(b1.toIndexedSeq); q.processAllAvailable()
      input.addData(b2.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    val batch = EntityResolution.resolve(all)
      .select("record_id", "entity_id", "canonical_name", "n_members")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(last.toSet == batch.toSet,
      s"stream twin diverged: ${last.toSet.diff(batch.toSet).take(3)}")
    graft.core.Caches.release(spark)
  }

  // --- WARC ingestion (round-7 verdict item 5) ---

  test("warc member walk parses both records; corrupt bytes do not throw") {
    import spark.implicits._
    val payloads = graft.ops.Archives.warcPayloads(spark, sf).take(3)
    payloads.foreach { case (id, bytes) =>
      val recs = graft.ops.Archives.warcRecordsOf(bytes)
      assert(recs.length == 2)
      assert(recs(0)._1("warc-type") == "warcinfo")
      assert(recs(1)._1("warc-type") == "response")
      assert(recs(1)._1("warc-target-uri") == s"http://example.com/doc/$id")
      // corrupt: truncated mid-member and garbage both end the walk calmly
      assert(graft.ops.Archives.warcRecordsOf(bytes.take(20)).isEmpty)
      graft.ops.Archives.warcRecordsOf(Array.fill[Byte](64)(0x55))
    }
  }

  // --- exactly-once foreachBatch law (round-7 verdict item 6) ---

  test("foreachBatch crash BETWEEN sink-commit and checkpoint-commit replays idempotently") {
    // the at-least-once window the file-sink restart spec cannot reach:
    // the warehouse write of epoch N commits, then the process dies
    // before the checkpoint commits N - on restart Spark re-delivers the
    // SAME epoch id, and appendHistoryBatch's (day_dt, batch_id) dynamic
    // overwrite must replace the orphan slice, not append a second copy
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val wh = new graft.connect.ParquetWarehouse(
      java.nio.file.Files.createTempDirectory("graft_eo_wh").toString)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val ck = "/tmp/graft_ckpt_eo_" + System.nanoTime()
    @volatile var crashArmed = true
    @volatile var deliveredEpochs = List.empty[Long]
    def startQ() = input.toDS().toDF("doc_id", "text").writeStream
      .outputMode("append").option("checkpointLocation", ck)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, epochId: Long) =>
        if (!batch.isEmpty) {
          deliveredEpochs = deliveredEpochs :+ epochId
          wh.appendHistoryBatch(graft.ops.Exp.stampDayDt(batch,
            graft.core.RunDate("2024-06-01")), "eo", epochId)
          if (crashArmed) { // die AFTER the sink commit, BEFORE the
            crashArmed = false // checkpoint commit
            throw new RuntimeException("injected crash post-sink-commit")
          }
        }
      }.start()
    val q1 = startQ()
    input.addData((1L, "alpha"), (2L, "beta"))
    try q1.processAllAvailable() catch { case _: Exception => () }
    try q1.awaitTermination() catch { case _: Exception => () }
    // sink holds the orphan slice; checkpoint does not know about it
    val q2 = startQ()
    try {
      q2.processAllAvailable() // re-delivers the same epoch
      input.addData((3L, "gamma"))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(deliveredEpochs.count(_ == deliveredEpochs.head) >= 2,
      s"epoch was not re-delivered: $deliveredEpochs")
    val hist = wh.readHistory(spark, "eo")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(hist == Seq(1L, 2L, 3L),
      s"history must hold each record exactly once, got $hist")
  }

  // --- full BPE merge loop (round-7 verdict item 7) ---

  /** Independent textbook replay: full pair RECOUNT every round (the
    * trainer re-pairs incrementally — agreeing outputs check exactly
    * that machinery). */
  private def bpeGolden(words: Seq[(String, Long)], numMerges: Int)
      : Seq[(Int, String, String, String, Long)] = {
    def merge1(s: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]; var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += s(i); i += 1 }
      }
      out.result()
    }
    var ws = words.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, String, Long)]()
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      val counts = scala.collection.mutable.HashMap[(String, String), Long]()
      ws.foreach { case (s, f) =>
        s.iterator.zip(s.iterator.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) = counts.minBy { case ((x, y), n) => (-n, x, y) }
        out += ((rank, a, b, a + b, c))
        ws = ws.map { case (s, f) => (merge1(s, a, b), f) }
        rank += 1
      }
    }
    out.toSeq
  }

  test("bpe trainer to a 200-symbol vocab equals the independent golden replay") {
    import spark.implicits._
    val words = graft.core.Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy(col("w")).agg(count(lit(1)).cast("long").as("freq"))
    val wordSeq = words.as[(String, Long)].collect().toSeq
    val alphabet = wordSeq.flatMap(_._1.toSeq).distinct.size
    val target = 200
    val numMerges = target - alphabet
    assert(numMerges > 50, s"fixture alphabet $alphabet leaves too few merges")
    val got = graft.ops.TextPrep.bpeTrain(words, numMerges).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4))).toSeq.sortBy(_._1)
    val want = bpeGolden(wordSeq, numMerges)
    assert(got.length == want.length, s"${got.length} vs ${want.length} merges")
    got.zip(want).foreach { case (g, w) => assert(g == w, s"diverged: $g vs $w") }
  }

  test("streaming warc ingest equals the batch extraction") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val payloads = graft.ops.Archives.warcPayloads(spark, sf).collect()
    val (b1, b2) = payloads.splitAt(payloads.length / 2)
    val wh = new graft.connect.ParquetWarehouse(
      java.nio.file.Files.createTempDirectory("graft_warc_wh").toString)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Byte])]
    val q = graft.ops.Archives.warcStream(
      input.toDS().toDF("doc_id", "payload"), wh, "warc",
      "/tmp/graft_ckpt_warc_" + System.nanoTime(),
      graft.core.RunDate("2024-06-01")).start()
    try {
      input.addData(b1.toIndexedSeq); q.processAllAvailable()
      input.addData(b2.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_id"), r.getAs[String]("url"),
        r.getAs[Int]("status"), r.getAs[Long]("n_bytes"),
        r.getAs[String]("text_md5"))
    val streamed = wh.readHistory(spark, "warc").collect().map(key).toSet
    val batch = graft.ops.Archives.warcExtractQuery(spark, sf)
      .collect().map(key).toSet
    assert(streamed == batch,
      s"warc stream twin diverged: ${streamed.diff(batch).take(2)}")
  }

  // --- JPEG metadata scrub ---

  test("jpeg scrub drops COM and APP1 but never touches pixels") {
    import graft.functions.{ImageCodec, JpegCodec}
    val base = JpegCodec.writeJpegPixels(18, 12, 95, softPx(7))
    // splice an EXIF-style APP1 after APP0 by hand, then a COM
    val exif = "Exif\u0000\u0000GPS=51.5,-0.1".getBytes("ISO-8859-1")
    val app1 = Array(0xff.toByte, 0xe1.toByte,
      (((exif.length + 2) >> 8) & 0xff).toByte,
      ((exif.length + 2) & 0xff).toByte) ++ exif
    val app0End = 2 + 2 + ((base(4) & 0xff) << 8 | (base(5) & 0xff))
    val withExif = base.take(app0End) ++ app1 ++ base.drop(app0End)
    val tagged = JpegCodec.withComment(withExif, "shot by cam SN-998877")
    assert(JpegCodec.segmentTypes(tagged).contains("e1"))
    assert(JpegCodec.segmentTypes(tagged).contains("fe"))
    val scrubbed = JpegCodec.stripMetadata(tagged).get
    val types = JpegCodec.segmentTypes(scrubbed)
    assert(!types.contains("e1") && !types.contains("fe"))
    assert(types.contains("e0") && types.contains("da"))
    assert(java.util.Arrays.equals(
      ImageCodec.decodePixels(tagged).get.rgb,
      ImageCodec.decodePixels(scrubbed).get.rgb))
    // scrub is idempotent; corrupt input returns None
    assert(JpegCodec.stripMetadata(scrubbed).get.sameElements(scrubbed))
    assert(JpegCodec.stripMetadata(Array.fill[Byte](32)(0x11)).isEmpty)
  }

  // --- empty-table layout audit (advice: Layout.rowGroups) ---

  test("rowGroups on an empty table returns an empty frame") {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    import spark.implicits._
    spark.createDataset(Seq.empty[(Long, String)]).toDF("id", "v")
      .where(lit(false)).coalesce(1).write.mode("overwrite").parquet(dir)
    // whatever file count an empty write produces (0 or a footer-only
    // file), the audit must not throw and must report zero data rows
    val rg = graft.ops.Layout.rowGroups(spark, dir)
    assert(rg.agg(coalesce(sum(col("num_rows")), lit(0L))).collect()(0).getLong(0) == 0L)
  }
}
