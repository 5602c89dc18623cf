package graft

import graft.functions.{ExifCodec, JpegCodec}

/** EXIF laws: write→parse round-trip across the field matrix, the
  * scrub guarantee (stripMetadata leaves NO parseable EXIF while
  * pixels survive), interop with ImageIO (the EXIF'd JPEG is still a
  * valid JPEG), and hostile-input safety. */
class ExifSpec extends SparkSpec {

  private def plainJpeg(): Array[Byte] = {
    val rgb = Array.tabulate(12 * 9 * 3)(i => ((i * 7) % 256).toByte)
    JpegCodec.writeJpeg(12, 9, rgb, 85)
  }

  test("withExif -> fromJpeg round-trips the field matrix") {
    for {
      make <- Seq("A", "Cam4", "LongCameraMakerName")
      model <- Seq("M0", "XYZ-100")
      orientation <- 1 to 8
      gps <- Seq(None, Some((47, 122)), Some((0, 0)))
    } {
      val j = ExifCodec.withExif(plainJpeg(), make, model, orientation, gps)
      val ex = ExifCodec.fromJpeg(j).getOrElse(
        fail(s"no exif for $make/$model/$orientation/$gps"))
      assert(ex.make.contains(make) && ex.model.contains(model) &&
        ex.orientation.contains(orientation) && ex.hasGps == gps.isDefined,
        s"$make/$model/$orientation/$gps -> $ex")
    }
  }

  test("stripMetadata scrubs EXIF: no APP1 parses, pixels still decode") {
    val j = ExifCodec.withExif(plainJpeg(), "Cam1", "M2", 6, Some((10, 20)))
    assert(ExifCodec.fromJpeg(j).exists(_.hasGps))
    val scrubbed = JpegCodec.stripMetadata(j).get
    assert(ExifCodec.fromJpeg(scrubbed).isEmpty)
    val px = JpegCodec.decodePixels(scrubbed)
    assert(px.exists(p => p.width == 12 && p.height == 9))
    // and the scrubbed pixels are bit-identical to the EXIF'd ones
    val before = JpegCodec.decodePixels(j).get.rgb
    assert(java.util.Arrays.equals(before, px.get.rgb))
  }

  test("an EXIF'd JPEG is still a JPEG to ImageIO and to our decoder") {
    val j = ExifCodec.withExif(plainJpeg(), "Cam0", "M1", 1, Some((1, 2)))
    assert(JpegCodec.decodePixels(j).isDefined)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(j))
    assert(img != null && img.getWidth == 12 && img.getHeight == 9)
  }

  test("plain JPEGs and hostile bytes report no EXIF, never throw") {
    assert(ExifCodec.fromJpeg(plainJpeg()).isEmpty)
    val rnd = new scala.util.Random(7L)
    for (_ <- 0 until 300) {
      val junk = Array.fill(rnd.nextInt(150))(rnd.nextInt(256).toByte)
      ExifCodec.fromJpeg(junk)
    }
    val good = ExifCodec.withExif(plainJpeg(), "C", "M", 3, Some((5, 6)))
    for (_ <- 0 until 300) {
      val b = good.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      ExifCodec.fromJpeg(b)
    }
    for (cut <- 0 until good.length by 3) ExifCodec.fromJpeg(good.take(cut))
  }

  test("PDF image extraction: DCT payloads verbatim, flate pixels exact") {
    import graft.functions.PdfCodec
    val jpeg = plainJpeg()
    val rgb = Array.tabulate(3 * 10 * 6)(i => ((i * 13) % 256).toByte)
    val pdf = PdfCodec.writePdfWithImages("1.7", Seq(
      (12, 9, Right(jpeg)), (10, 6, Left(rgb))))
    assert(PdfCodec.meta(pdf).exists(_.nPages == 2))
    val imgs = PdfCodec.extractImages(pdf).get
    assert(imgs.length == 2)
    assert(imgs(0).filter == "dct" && imgs(0).width == 12 &&
      java.util.Arrays.equals(imgs(0).payload, jpeg))
    assert(JpegCodec.decodePixels(imgs(0).payload).isDefined)
    assert(imgs(1).filter == "flate" && imgs(1).width == 10 &&
      java.util.Arrays.equals(imgs(1).payload, rgb))
    // text-bearing PDFs report no images; image PDFs report no text
    val textPdf = PdfCodec.writePdfWithText("1.5", Seq("hello"), flate = true)
    assert(PdfCodec.extractImages(textPdf).get.isEmpty)
    // hostile: truncations and bit flips never throw
    val rnd = new scala.util.Random(11L)
    for (cut <- 0 until pdf.length by 7) PdfCodec.extractImages(pdf.take(cut))
    for (_ <- 0 until 200) {
      val b = pdf.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      PdfCodec.extractImages(b)
    }
  }

  test("exif census matches the formula per doc") {
    import spark.implicits._
    val rows = graft.ops.Multimodal.exifCensusQuery(spark, sf)
      .as[(Long, String, String, Int, Boolean)].collect()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.length == nDocs)
    rows.foreach { case (id, make, model, o, gps) =>
      assert(make == s"Cam${id % 5}" && model == s"M${id % 3}" &&
        o == (id % 8).toInt + 1 && gps == (id % 4 == 0), s"doc $id")
    }
  }
}
