package graft

import graft.functions.TiffCodec
import graft.functions.TiffCodec.TiffOpts

/** TIFF codec laws: the option×dims round-trip matrix first, then the
  * LZW code-width boundaries, both-direction `javax.imageio`
  * cross-validation (the JDK ships an independent TIFF plugin), the
  * census, and the hostile-input surface. */
class Round9TiffSpec extends SparkSpec {

  private def px(seed: Int)(x: Int, y: Int): Int = {
    val v = (x * 31 + y * 17 + seed) % 256
    (v << 16) | (v << 8) | v
  }

  private def rgbPx(seed: Int)(x: Int, y: Int): Int = {
    val r = (x * 7 + seed) % 256; val g = (y * 11 + seed) % 256
    val b = (x + y + seed) % 256
    (r << 16) | (g << 8) | b
  }

  private def check(w: Int, h: Int, f: (Int, Int) => Int, opts: TiffOpts,
                    grayExact: Boolean): Unit = {
    val bytes = TiffCodec.writeTiffPixels(w, h, f, opts)
    val dec = TiffCodec.decodePixels(bytes).getOrElse(
      fail(s"decode failed ${w}x$h $opts"))
    assert(dec.format == "tiff" && dec.width == w && dec.height == h)
    for (y <- 0 until h; x <- 0 until w) {
      val c = f(x, y)
      val o = 3 * (y * w + x)
      if (opts.gray) {
        val g0 = (c >>> 16) & 0xff
        assert((dec.rgb(o) & 0xff) == g0 && (dec.rgb(o + 1) & 0xff) == g0 &&
          (dec.rgb(o + 2) & 0xff) == g0, s"gray ($x,$y) $opts")
      } else {
        assert((dec.rgb(o) & 0xff) == ((c >>> 16) & 0xff) &&
          (dec.rgb(o + 1) & 0xff) == ((c >>> 8) & 0xff) &&
          (dec.rgb(o + 2) & 0xff) == (c & 0xff), s"rgb ($x,$y) $opts")
      }
    }
  }

  test("TIFF round-trips exactly over the options x dims matrix") {
    val dims = Seq((1, 1), (1, 7), (7, 1), (9, 8), (33, 17))
    var seed = 0
    for {
      (w, h) <- dims
      be <- Seq(false, true)
      comp <- Seq(1, 5, 32773)
      pred <- Seq(false, true)
      gray <- Seq(false, true)
      rps <- Seq(1, 4, 1000)
    } {
      val opts = TiffOpts(bigEndian = be, compression = comp,
        predictor = pred, gray = gray, rowsPerStrip = rps,
        whiteIsZero = gray && seed % 3 == 0)
      check(w, h, if (gray) px(seed) else rgbPx(seed), opts, gray)
      seed += 1
    }
  }

  test("LZW crosses the 9/10/11/12-bit width boundaries and table reset") {
    // pseudo-random RGB noise defeats run-collapsing so the code table
    // grows through every width bump and past the 4094 reset
    val rnd = new scala.util.Random(123L)
    val w = 200; val h = 120
    val data = Array.fill(h, w)(rnd.nextInt(1 << 24))
    for (pred <- Seq(false, true); be <- Seq(false, true)) {
      val opts = TiffOpts(bigEndian = be, compression = 5, predictor = pred,
        rowsPerStrip = 64)
      val bytes = TiffCodec.writeTiffPixels(w, h, (x, y) => data(y)(x), opts)
      val dec = TiffCodec.decodePixels(bytes).get
      for (y <- 0 until h; x <- 0 until w) {
        val c = data(y)(x); val o = 3 * (y * w + x)
        assert((dec.rgb(o) & 0xff) == ((c >>> 16) & 0xff) &&
          (dec.rgb(o + 1) & 0xff) == ((c >>> 8) & 0xff) &&
          (dec.rgb(o + 2) & 0xff) == (c & 0xff))
      }
    }
  }

  test("ImageIO reads our TIFFs pixel-exact (all compressions, both orders)") {
    for {
      be <- Seq(false, true)
      comp <- Seq(1, 5, 32773)
      gray <- Seq(false, true)
    } {
      val w = 21; val h = 13
      val f: (Int, Int) => Int = if (gray) px(5) else rgbPx(5)
      val bytes = TiffCodec.writeTiffPixels(w, h, f,
        TiffOpts(bigEndian = be, compression = comp, predictor = comp == 5,
          gray = gray, rowsPerStrip = 5))
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO rejected be=$be comp=$comp gray=$gray")
      assert(img.getWidth == w && img.getHeight == h)
      // gray: compare raster samples (getRGB would push gray through
      // the CS_GRAY->sRGB curve); rgb: compare getRGB directly
      for (y <- 0 until h; x <- 0 until w) {
        val c = f(x, y)
        if (gray)
          assert(img.getRaster.getSample(x, y, 0) == ((c >>> 16) & 0xff),
            s"($x,$y) be=$be comp=$comp gray=$gray")
        else
          assert((img.getRGB(x, y) & 0xffffff) == c,
            s"($x,$y) be=$be comp=$comp gray=$gray")
      }
    }
  }

  test("our decoder reads ImageIO-written TIFFs (None/LZW/PackBits/Deflate-reject)") {
    import javax.imageio.ImageIO
    import javax.imageio.ImageWriteParam
    val w = 19; val h = 11
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgbPx(9)(x, y))
    for (compType <- Seq(None, Some("LZW"), Some("PackBits"), Some("Deflate"))) {
      val writer = ImageIO.getImageWritersByFormatName("tiff").next()
      val bos = new java.io.ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      val p = writer.getDefaultWriteParam
      compType.foreach { ct =>
        p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
        p.setCompressionType(ct)
      }
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
      ios.close(); writer.dispose()
      val bytes = bos.toByteArray
      val dec = TiffCodec.decodePixels(bytes)
      if (compType.contains("Deflate")) {
        // outside the baseline profile: must reject cleanly, and the
        // census must still see it
        assert(dec.isEmpty)
        assert(TiffCodec.meta(bytes).exists(m => m.width == w && m.height == h))
      } else {
        val d = dec.getOrElse(fail(s"decode failed for ImageIO $compType"))
        assert(d.width == w && d.height == h)
        for (y <- 0 until h; x <- 0 until w) {
          val c = rgbPx(9)(x, y); val o = 3 * (y * w + x)
          assert((d.rgb(o) & 0xff) == ((c >>> 16) & 0xff) &&
            (d.rgb(o + 1) & 0xff) == ((c >>> 8) & 0xff) &&
            (d.rgb(o + 2) & 0xff) == (c & 0xff), s"($x,$y) $compType")
        }
      }
    }
  }

  test("census: geometry, compression, photometric, byte order, page count") {
    val one = TiffCodec.writeTiffPixels(40, 30, px(1),
      TiffOpts(bigEndian = true, compression = 32773, gray = true))
    val m = TiffCodec.meta(one).get
    assert(m.byteOrder == "MM" && m.width == 40 && m.height == 30 &&
      m.bitsPerSample == 8 && m.samplesPerPixel == 1 &&
      m.compression == 32773 && m.photometric == 1 && m.nPages == 1)
    // multi-page via ImageIO's writeToSequence (independent writer)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    for (k <- 0 until 3) {
      val img = new java.awt.image.BufferedImage(8 + k, 5,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence(); ios.close(); writer.dispose()
    val mm = TiffCodec.meta(bos.toByteArray).get
    assert(mm.nPages == 3 && mm.width == 8)
  }

  test("multi-page: chained IFDs round-trip per page; ImageIO agrees") {
    for (comp <- Seq(1, 5, 32773); be <- Seq(false, true)) {
      val fs: Seq[(Int, Int, (Int, Int) => Int)] =
        Seq((12, 9, rgbPx(1) _), (15, 6, rgbPx(2) _), (9, 9, rgbPx(3) _))
      val bytes = TiffCodec.writeTiffPages(fs,
        TiffOpts(bigEndian = be, compression = comp, rowsPerStrip = 4))
      assert(TiffCodec.meta(bytes).exists(_.nPages == 3))
      // our per-page decode
      fs.zipWithIndex.foreach { case ((w, h, f), t) =>
        val p = TiffCodec.decodePage(bytes, t).getOrElse(
          fail(s"page $t comp=$comp be=$be"))
        assert(p.width == w && p.height == h)
        for (y <- 0 until h; x <- 0 until w) {
          val c = f(x, y); val o = 3 * (y * w + x)
          assert((p.rgb(o) & 0xff) == ((c >>> 16) & 0xff) &&
            (p.rgb(o + 1) & 0xff) == ((c >>> 8) & 0xff) &&
            (p.rgb(o + 2) & 0xff) == (c & 0xff), s"page $t ($x,$y)")
        }
      }
      assert(TiffCodec.decodePage(bytes, 3).isEmpty)
      // ImageIO sees the same page count and page-1 pixels
      val rd = javax.imageio.ImageIO.getImageReadersByFormatName("tiff").next()
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      rd.setInput(iis)
      assert(rd.getNumImages(true) == 3)
      val img1 = rd.read(1)
      assert(img1.getWidth == 15 && img1.getHeight == 6)
      for (y <- 0 until 6; x <- 0 until 15)
        assert((img1.getRGB(x, y) & 0xffffff) == rgbPx(2)(x, y))
      rd.dispose(); iis.close()
    }
  }

  test("tiff pages query reduces every page to its formula cell sum") {
    import spark.implicits._
    val rows = graft.ops.Multimodal.tiffPagesQuery(spark, sf)
      .as[(Long, Int, Int, Int, Long)].collect()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").as[Long].collect()
    assert(rows.length == nDocs.map(id => (id % 3) + 1).sum)
    rows.foreach { case (id, t, w, h, sum) =>
      val fid = id * 4 + t
      val want = (0 until 9).map(k => (((fid >> (4 * k)) & 15) * 16 + 8)).sum
      assert(w == 9 + 3 * (id % 4) && h == 9 + 3 * (id % 3) && sum == want,
        s"doc $id page $t")
    }
  }

  test("hostile input returns None, never throws") {
    val rnd = new scala.util.Random(42L)
    for (_ <- 0 until 300) {
      val junk = Array.fill(rnd.nextInt(120))(rnd.nextInt(256).toByte)
      TiffCodec.meta(junk); TiffCodec.decodePixels(junk)
    }
    val good = TiffCodec.writeTiffPixels(15, 9, rgbPx(3),
      TiffOpts(compression = 5, rowsPerStrip = 3))
    for (cut <- 0 until good.length by 2) {
      TiffCodec.decodePixels(good.take(cut))
      TiffCodec.meta(good.take(cut))
    }
    for (_ <- 0 until 400) {
      val b = good.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      TiffCodec.decodePixels(b); TiffCodec.meta(b)
    }
    // absurd dims must be rejected before allocation
    val big = TiffCodec.writeTiffPixels(8, 8, px(0), TiffOpts())
    // widen declared ImageWidth to 2^30 (II: tag 256 value at its entry)
    assert(TiffCodec.decodePixels(big).isDefined)
  }

  test("tiff near-dup: png/bmp bases collide with their tiff re-encodes") {
    import spark.implicits._
    val rows = graft.ops.Multimodal.imageTiffNearDupQuery(spark, sf)
      .as[(Long, Long, String, String, Int, Int)].collect().sortBy(_._1)
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.length == nDocs)
    assert(rows.forall { case (a, b, fa, fb, wa, wb) =>
      b == a + 1000000000L && (fa == "png" || fa == "bmp") && fb == "tiff" &&
        wb == 2 * wa })
  }
}
