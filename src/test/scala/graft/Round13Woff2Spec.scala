package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Round-13 WOFF2 gates: transformed glyf/loca RECONSTRUCTION (spec
  * §5.1 — woff2_compress's default output shape), the triplet decoder
  * against an exact-inverse encoder across every coding class, all
  * four 255UInt16 arms, bbox bitmap vs computed boxes, composite
  * passthrough with instruction splice, the overlap bitmap, both loca
  * formats, and the STORED-mode brotli wrapper the fixtures ride in. */
class Round13Woff2Spec extends AnyFunSuite {

  // ---- minimal TrueType glyf parser (test-side ground-truth reader)

  private final case class SimpleGlyph(bbox: (Int, Int, Int, Int),
                                       contours: Seq[Seq[(Int, Int, Boolean)]],
                                       instructions: Seq[Byte],
                                       firstFlag: Int)

  private def parseSimple(b: Array[Byte], at0: Int): SimpleGlyph = {
    var at = at0
    def u16() = { val v = ((b(at) & 0xff) << 8) | (b(at + 1) & 0xff); at += 2; v }
    def i16() = u16().toShort.toInt
    val nc = i16()
    require(nc > 0, "simple glyph expected")
    val bbox = (i16(), i16(), i16(), i16())
    val ends = Seq.fill(nc)(u16())
    val nPts = ends.last + 1
    val nInstr = u16()
    val instrs = b.slice(at, at + nInstr).toSeq
    at += nInstr
    val flags = new Array[Int](nPts)
    var i = 0
    while (i < nPts) {
      flags(i) = b(at) & 0xff; at += 1
      require((flags(i) & 0x08) == 0, "reconstructor never emits REPEAT")
      i += 1
    }
    val xs = new Array[Int](nPts)
    var x = 0
    i = 0
    while (i < nPts) {
      val f = flags(i)
      if ((f & 0x02) != 0) {
        val d = b(at) & 0xff; at += 1
        x += (if ((f & 0x10) != 0) d else -d)
      } else if ((f & 0x10) == 0) { x += i16() }
      xs(i) = x; i += 1
    }
    val ys = new Array[Int](nPts)
    var y = 0
    i = 0
    while (i < nPts) {
      val f = flags(i)
      if ((f & 0x04) != 0) {
        val d = b(at) & 0xff; at += 1
        y += (if ((f & 0x20) != 0) d else -d)
      } else if ((f & 0x20) == 0) { y += i16() }
      ys(i) = y; i += 1
    }
    var from = 0
    val contours = ends.map { e =>
      val c = (from to e).map(j => (xs(j), ys(j), (flags(j) & 0x01) != 0))
      from = e + 1
      c
    }
    SimpleGlyph(bbox, contours, instrs, flags(0))
  }

  private def locaOffsets(loca: Array[Byte], shortLoca: Boolean): Seq[Int] =
    if (shortLoca) loca.grouped(2).map(p =>
      (((p(0) & 0xff) << 8) | (p(1) & 0xff)) * 2).toSeq
    else loca.grouped(4).map(p => ((p(0) & 0xff) << 24) |
      ((p(1) & 0xff) << 16) | ((p(2) & 0xff) << 8) | (p(3) & 0xff)).toSeq

  // --------------------------------------------------------- gates

  test("stored-mode brotli: identity round trip incl. multi-chunk") {
    val rnd = new scala.util.Random(7)
    for (n <- Seq(0, 1, 100, 65536, 65537, 200000)) {
      val data = Array.fill(n)(rnd.nextInt(256).toByte)
      val enc = BrotliCodec.encodeStored(data)
      val dec = BrotliCodec.decode(enc).getOrElse(fail(s"n=$n refused"))
      assert(java.util.Arrays.equals(dec, data), s"n=$n mismatch")
    }
  }

  test("transformed glyf/loca reconstruct; points match the model exactly") {
    for ((seed, shortLoca) <- Seq((0L, true), (1L, false), (2L, true))) {
      val woff = Woff2Fixtures.writeTransformedWoff2(seed, shortLoca)
      val meta = Woff2Codec.census(woff).getOrElse(fail("census refused"))
      assert(meta.blobOk)
      assert(meta.tables.exists(t => t.tag == "glyf" && t.transform == 0))
      val glyf = Woff2Codec.extractTable(woff, "glyf")
        .getOrElse(fail(s"glyf reconstruction refused seed=$seed"))
      val loca = Woff2Codec.extractTable(woff, "loca")
        .getOrElse(fail("loca reconstruction refused"))
      val models = Woff2Fixtures.glyphModels(seed)
      val offs = locaOffsets(loca, shortLoca)
      assert(offs.length == models.length + 1)
      assert(offs.zip(offs.tail).forall { case (a, b) => a <= b })
      assert(offs.last == glyf.length)
      models.zipWithIndex.foreach { case (gm, g) =>
        val at = offs(g)
        if (gm.composite.isDefined) {
          // composite: numberOfContours = -1, explicit bbox, verbatim
          // component records, instructions spliced
          val nc = (((glyf(at) & 0xff) << 8) | (glyf(at + 1) & 0xff)).toShort
          assert(nc == -1)
          val (x0, y0, x1, y1) = gm.explicitBbox.get
          def u16(i: Int) = ((glyf(i) & 0xff) << 8) | (glyf(i + 1) & 0xff)
          assert(u16(at + 2).toShort == x0 && u16(at + 4).toShort == y0 &&
            u16(at + 6).toShort == x1 && u16(at + 8).toShort == y1)
          // first component record flags
          assert(u16(at + 10) == gm.composite.get._1.head._1)
          // instructions arrive after the last component, prefixed by
          // their u16 length (padding may follow)
          val instrs = gm.composite.get._2
          val lenPrefixed = Array[Byte](
            ((instrs.length >> 8) & 0xff).toByte,
            (instrs.length & 0xff).toByte) ++ instrs
          assert(glyf.slice(at, offs(g + 1)).containsSlice(lenPrefixed))
        } else if (gm.contours.isEmpty) {
          assert(offs(g + 1) == at, s"empty glyph $g must be zero bytes")
        } else {
          val sg = parseSimple(glyf, at)
          assert(sg.contours == gm.contours, s"seed=$seed glyph $g points")
          assert(sg.instructions == gm.instructions.toSeq)
          gm.explicitBbox match {
            case Some(bb) => assert(sg.bbox == bb,
              s"explicit bbox must override computed (glyph $g)")
            case None =>
              val pts = gm.contours.flatten
              assert(sg.bbox == (pts.map(_._1).min, pts.map(_._2).min,
                pts.map(_._1).max, pts.map(_._2).max))
          }
        }
      }
      // features census agrees with the model
      val f = Woff2Codec.glyfFeatures(glyf, loca, shortLoca).get
      assert(f.nGlyphs == models.length)
      assert(f.nComposites == models.count(_.composite.isDefined))
      assert(f.nContours == models.filter(_.composite.isEmpty)
        .map(_.contours.length).sum)
      assert(f.nPoints == models.filter(_.composite.isEmpty)
        .flatMap(_.contours).map(_.size).sum)
    }
  }

  test("overlap bitmap sets bit 6 on each first point") {
    val woff = Woff2Fixtures.writeTransformedWoff2(0L, shortLoca = true,
      overlapBitmap = true)
    val glyf = Woff2Codec.extractTable(woff, "glyf").getOrElse(fail())
    val loca = Woff2Codec.extractTable(woff, "loca").getOrElse(fail())
    val offs = locaOffsets(loca, shortLoca = true)
    val models = Woff2Fixtures.glyphModels(0L)
    models.zipWithIndex.foreach { case (gm, g) =>
      if (gm.composite.isEmpty && gm.contours.nonEmpty) {
        val sg = parseSimple(glyf, offs(g))
        assert((sg.firstFlag & 0x40) != 0, s"glyph $g overlap flag")
      }
    }
    // and without the option flag, the bit stays clear
    val plain = Woff2Fixtures.writeTransformedWoff2(0L, shortLoca = true)
    val glyf2 = Woff2Codec.extractTable(plain, "glyf").get
    val loca2 = Woff2Codec.extractTable(plain, "loca").get
    val offs2 = locaOffsets(loca2, shortLoca = true)
    models.zipWithIndex.foreach { case (gm, g) =>
      if (gm.composite.isEmpty && gm.contours.nonEmpty)
        assert((parseSimple(glyf2, offs2(g)).firstFlag & 0x40) == 0)
    }
  }

  test("255UInt16: all four codings decode to the same value") {
    def decode(bytes: Array[Byte]): Int = (bytes(0) & 0xff) match {
      case 253 => ((bytes(1) & 0xff) << 8) | (bytes(2) & 0xff)
      case 255 => (bytes(1) & 0xff) + 253
      case 254 => (bytes(1) & 0xff) + 506
      case v => v
    }
    def enc(v: Int, arm: Int): Array[Byte] = {
      val w = new Woff2Fixtures.W
      Woff2Fixtures.write255(w, v, arm)
      w.result
    }
    assert(decode(enc(200, 0)) == 200)
    assert(decode(enc(300, 1)) == 300)
    assert(decode(enc(300, 2)) == 300)
    assert(decode(enc(600, 3)) == 600)
    assert(decode(enc(600, 1)) == 600)
  }

  test("transformed hmtx reconstructs: derived lsbs = glyf xMins, " +
    "retained tail read from the stream") {
    for (seed <- Seq(0L, 1L, 2L)) { // even = flags 3, odd = flags 1
      val woff = Woff2Fixtures.writeTransformedWoff2(seed,
        shortLoca = seed % 2 == 0, withHmtx = true)
      val hmtx = Woff2Codec.extractTable(woff, "hmtx")
        .getOrElse(fail(s"hmtx reconstruction refused seed=$seed"))
      val xMins = Woff2Fixtures.modelXMins(seed)
      val advances = Woff2Fixtures.modelAdvances(seed)
      val n = xMins.length
      val numHMetrics = n - 1
      assert(hmtx.length == 4 * numHMetrics + 2 * (n - numHMetrics))
      def u16(i: Int) = ((hmtx(i) & 0xff) << 8) | (hmtx(i + 1) & 0xff)
      for (i <- 0 until numHMetrics) {
        assert(u16(4 * i) == advances(i), s"seed=$seed advance $i")
        assert(u16(4 * i + 2).toShort.toInt == xMins(i),
          s"seed=$seed lsb $i (proportional lsbs omitted → xMin)")
      }
      val tail = u16(4 * numHMetrics).toShort.toInt
      if (seed % 2 == 0)
        assert(tail == xMins(n - 1), "flags 3: monospace lsb = xMin")
      else
        assert(tail == xMins(n - 1) + 7,
          "flags 1: retained monospace lsb comes from the stream")
      // glyf/loca still reconstruct on the 5-table container
      assert(Woff2Codec.extractTable(woff, "glyf").isDefined)
      assert(Woff2Codec.extractTable(woff, "hhea").exists(_.length == 36))
    }
  }

  test("hostile input: truncations and bit flips never throw") {
    val woff = Woff2Fixtures.writeTransformedWoff2(1L, shortLoca = false)
    val rnd = new scala.util.Random(3)
    for (_ <- 0 until 200) {
      val m = woff.clone()
      m(rnd.nextInt(m.length)) =
        (m(rnd.nextInt(m.length)) ^ (1 << rnd.nextInt(8))).toByte
      Woff2Codec.extractTable(m, "glyf") // Option either way
      Woff2Codec.census(m)
    }
    for (cut <- Seq(0, 4, 47, 60, woff.length / 2, woff.length - 1)) {
      val m = java.util.Arrays.copyOf(woff, cut)
      assert(Woff2Codec.extractTable(m, "glyf").isEmpty ||
        cut == woff.length)
    }
  }

}
