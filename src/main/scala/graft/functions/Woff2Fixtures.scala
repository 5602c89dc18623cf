package graft.functions

/** WOFF2 containers hand-built at fixture time with REFERENCE-brotli
  * compressed table blobs (brotli 1.2.0) — the gate for
  * [[Woff2Codec]]: header + directory parse, UIntBase128, known-tag
  * and explicit-tag arms, blob decompression, per-table extraction. */
object Woff2Fixtures {

  private def hexBytes(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  final case class Fixture(bytes: Array[Byte], nTables: Int,
                           blobLen: Int, nameMd5: String,
                           tags: Seq[String])

  private val W0: Array[Byte] = hexBytes(
    "774f46324f54544f000000b300030000000000cc0000007d000100000000000000000000000000000000000000000000" +
    "0028052f01361b8c00001ca9515fcceebee9f17d4a9488446cdbc03ceb1c4a596a224e0e9c7309e4a3814875fd9d13a8" +
    "32535c5f1c90c5a2e6123427aa86ed85495e77e3b23b5e1eef1fc9f092663a7e84ab67efa35841d64c2788b3b2e9a7ed" +
    "70be3d3f7f9a1315dd72c324afda61deafe7e78f11399fe51a665f82ed199720148031")

  private val W1: Array[Byte] = hexBytes(
    "774f4632000100000000012e0004000000000150000000f2000100000000000000000000000000000000000000000000" +
    "0535063c3f5847464243134a1bfd00001ca9515fccee06e619d2143a801b9898571d84de570a9fd0fd06e6b9b9e424f3" +
    "4c0654612eb455cefe7c7fff8364b6586d7687b3d5ee747bfd0846500c2748cb765ccfd71fc6619ce61503255951b55c" +
    "be50a65069740693e5f6787d7ebd783a5faeb7fb93c5e670797c228a9334cb8bf3ba9ff7fb0ba22080b09266e1342f1b" +
    "0e4fa0daec0ea7cbede9f6faf9f174a1d2e80c268bedf1fafc46142febb61fe7cdb01ccf17c42090e224cd261841311c" +
    "de6034992d565bbdd16cb1395c1e1f3796ca956aadde78bede9fefef3fc98aaae94659d54ddbf501100021185135318a" +
    "9374dbed0fc7d3b945b174be5c07")

  private val W2: Array[Byte] = hexBytes(
    "774f4632000100000000010a00050000000001f4000000d0000100000000000000000000000000000000000000000000" +
    "0042054901500457035e1b8f01001ca9515fccee06e619fa4a00758a03f30c6576ae4b9dbcc481790e2ab9c83a096ca7" +
    "dbdddb6c6058a061428172140005376063bad203fa64b93b3fbea61717b5f660b63e5c5f7f5636dc286fc6fdf9413880" +
    "d2820a62b4a0d9412c5da8b607d3d5fef2fc5b7e52aa7746f30dfd33bdcbc3d9fa787b939c6c7871d14efbf3870910a0" +
    "050dc21951b343f14cb1d61eccd687ebeb6f0569b9d11dcdb7a7fb87e215cb4f6a18a6241b8aaae517c3b95f8ab98fd7" +
    "5fc9b5a2bbf12c7da61979edaf3b217e953adcc91c3823ea4e08")

  private val W3: Array[Byte] = hexBytes(
    "774f46324f54544f000001be00060000000002b80000017e000100000000000000000000000000000000000000000000" +
    "054f06563f584746445d13640c6b08721b4202001ca9515fccee06e619e214ba7d8303f30ce5007b52a903798803f39c" +
    "146a456eb06f80c80e64361b281ef8c018503997dc863d3adc5d5e1c4a4b8637591d6e5fc50ab266da5fdf201e454a0d" +
    "941675873f9a2ed6bbe3d5e1f6017156b182d9e6f4f86b4e5474cbf1fe8549205b69e1ac6cba82f164beda1eceb75d45" +
    "dd8fecee62b1ae2fe272af6cfa533ddc2c376f0ec4b2e552a337591d6e5f88e0142b986fcf4f4173e2b25f8ff72f4281" +
    "b94a0be714cb1d8c672badc16c737afc114ad09cd1727f7d4b8697d6e3f6fcfc634caa50eb908266f78693f95a67f4ff" +
    "c979acb73edebf10c1ab7638df9e5fa2eec665bf393d7e0805e6ab6d82532c4f2891abb406f3edf9c92294a8bbe3e5fe" +
    "fa914d3fadc7dde505609154b1dea504cdee8ba40ab5ce68b9bfbe018c914d7fba3ede7faadfb96cb9d99f6e4e8f1f4c" +
    "f29a335aec2e2fc9f0926ad89c9f7f944ee66b1d92576d9e30343b0c94b9be61bbbe81fce93a3bccfb404418236da6d4" +
    "e8df43726100c2c6109a1bd3a48b")

  private val W4: Array[Byte] = hexBytes(
    "774f463200010000000001110003000000000168000000db000100000000000000000000000000000000000000000000" +
    "005c0563016a1b2801001ca9515fccee06e659ca4207711213eb0ced01e4f4ad911378dbc03c27865457a272037db319" +
    "5084962317c6bd5763b23e3d7927a976c6abe3e36f0679b73a3e011cc0391565642b98c8d77bd3cdf9257869ad3b599f" +
    "5eb21516fdfafc020990e0758c55ec50b2d8e8cfb697b7e467f5de7473792b76540e5b6e7ffb9a41de1ccc77d78fea26" +
    "f5b4bb7e101aa1259010742f9a29b746cbc3fd6785656bb8d8dfbeba9736f3fef643199491214a34fc58b6d219af8e8f" +
    "bf1d57daa3e5e1fe33fcac5d0e8f3fc602ac82184b4b66209eab4d703d9d681500")

  private val W5: Array[Byte] = hexBytes(
    "774f4632000100000000017b00040000000002200000013f000100000000000000000000000000000000000000000000" +
    "056906703f5847464677137e1bcd01001ca9515fccee06b66d6c726cda206c6cecc0469bb0b1b107e619ea00b4b8d496" +
    "0a786ab877eff2c03c47841a990ba46bf72e22130e64400162429c109ee1c96dd75dcce3e3ef563ae9f270ff3b49bb3a" +
    "3e00022045dce109a7caedd1727b792b517338dd9c3f6658ceb6972fca22ac4a0ba294aff7a68669095eb59be5c54375" +
    "d36e9c9e20095012e1f446d2155959edae1fbbd41acdb617a3d19f19a625fab55e96174fcdcbba717a4114484904eb8b" +
    "662ab2a2ee6f5fbbd48ae7bbebd78aeac5fef6c3389cd76dae60a2d81cccd7a7a714d4fbe3d5f1a5fb79bf3ebd611aa6" +
    "6592f3c7b2d5ce583bdc7f4eb99d2cf6b79f1d37444f2f2c553ca89787fb1fe77101b3bb43c9626bb8d89c5f52d8184c" +
    "d6a7971114c3e6fc46188451282e10cfd5ba134d4fa229711d2b6afefc6386d57c77fda22cca698c204a0c")

  val all: Seq[Fixture] = Seq(
    Fixture(W0, 3, 141, "4a5fc9918ad97718f8747ce07fd3dc31", Seq("cmap", "name", "head")),
    Fixture(W1, 4, 254, "a7f3d6d251e74ffc72ef5b3918114db0", Seq("name", "OS/2", "XGFB", "kern")),
    Fixture(W2, 5, 400, "20acae9db3999aea7112a98335ff865c", Seq("cmap", "name", "head", "maxp", "hmtx")),
    Fixture(W3, 6, 579, "f2022c3354d8c55b970c098de5e8590d", Seq("name", "OS/2", "XGFD", "kern", "prep", "cvt ")),
    Fixture(W4, 3, 297, "c89264fc6028ad81caeedffa70de35b5", Seq("cmap", "name", "head")),
    Fixture(W5, 4, 462, "fcd269e12ebf554cb27e710313e92b84", Seq("name", "OS/2", "XGFF", "kern")),
  )

  // ============== transformed-glyf fixtures (spec §5.1, round 13) ====
  //
  // woff2_compress's DEFAULT output transforms glyf/loca, so real fonts
  // need the reconstruction path. These fixtures are built at runtime:
  // a deterministic glyph set → transformed streams (every triplet
  // class, 255UInt16 arms, bbox bitmap both ways, composite records,
  // overlap bitmap) → a container whose blob is wrapped in STORED-mode
  // brotli ([[BrotliCodec.encodeStored]] — real RFC 7932 framing).

  /** One model glyph: simple = contours of absolute on/off points;
    * composite = raw component records + instructions. */
  final case class GlyphModel(contours: Seq[Seq[(Int, Int, Boolean)]],
                              instructions: Array[Byte],
                              explicitBbox: Option[(Int, Int, Int, Int)],
                              composite: Option[(Seq[(Int, Int, Array[Byte])],
                                Array[Byte])])

  private[functions] final class W {
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def u32(v: Long): Unit = { u8((v >> 24).toInt); u8((v >> 16).toInt)
      u8((v >> 8).toInt); u8(v.toInt) }
    def bytes(b: Array[Byte]): Unit = out.write(b, 0, b.length)
    def result: Array[Byte] = out.toByteArray
  }

  /** 255UInt16 encoder; `arm` forces a specific coding for values that
    * admit several (the decoder must accept all). */
  private[functions] def write255(w: W, v: Int, arm: Int = -1): Unit = {
    require(v >= 0 && v <= 0xffff)
    arm match {
      case 0 => require(v < 253); w.u8(v)
      case 1 => w.u8(253); w.u16(v) // word code, always legal
      case 2 => require(v >= 253 && v <= 253 + 255); w.u8(255); w.u8(v - 253)
      case 3 => require(v >= 506 && v <= 506 + 255); w.u8(254); w.u8(v - 506)
      case _ => if (v < 253) w.u8(v) else { w.u8(253); w.u16(v) }
    }
  }

  /** Triplet encoder — the exact inverse of the decoder's class rules,
    * picking the smallest applicable class. */
  private def writeTriplet(flags: W, data: W, dx: Int, dy: Int,
                           onCurve: Boolean): Unit = {
    val ax = math.abs(dx); val ay = math.abs(dy)
    val sx = if (dx >= 0) 1 else 0
    val sy = if (dy >= 0) 1 else 0
    val (flag: Int, emit: (() => Unit)) =
      if (dx == 0 && ay <= 2047)
        ((((ay >> 8) << 1) | sy, () => data.u8(ay & 0xff)))
      else if (dy == 0 && ax <= 2047)
        ((10 + (((ax >> 8) << 1) | sx), () => data.u8(ax & 0xff)))
      else if (ax >= 1 && ax <= 64 && ay >= 1 && ay <= 64)
        ((20 + ((((ax - 1) >> 4) << 4) | (((ay - 1) >> 4) << 2) |
          (sy << 1) | sx),
          () => data.u8((((ax - 1) & 0xf) << 4) | ((ay - 1) & 0xf))))
      else if (ax >= 1 && ax <= 768 && ay >= 1 && ay <= 768)
        ((84 + ((ax - 1) >> 8) * 12 + (((ay - 1) >> 8) << 2) +
          (sy << 1) + sx,
          () => { data.u8((ax - 1) & 0xff); data.u8((ay - 1) & 0xff) }))
      else if (ax <= 4095 && ay <= 4095)
        ((120 + (sy << 1) + sx, () => {
          data.u8(ax >> 4); data.u8(((ax & 0xf) << 4) | (ay >> 8))
          data.u8(ay & 0xff)
        }))
      else
        ((124 + (sy << 1) + sx, () => {
          data.u8(ax >> 8); data.u8(ax & 0xff)
          data.u8(ay >> 8); data.u8(ay & 0xff)
        }))
    flags.u8(flag | (if (onCurve) 0 else 0x80))
    emit()
  }

  private def uintBase128(w: W, v: Long): Unit = {
    val bytes = scala.collection.mutable.ArrayBuffer[Int](
      (v & 0x7f).toInt)
    var r = v >> 7
    while (r != 0) { bytes.prepend(((r & 0x7f) | 0x80).toInt); r >>= 7 }
    bytes.foreach(w.u8)
  }

  /** Deterministic glyph set: per seed, 4 + seed%3 glyphs cycling
    * empty / small-simple / wide-simple (explicit bbox) / composite —
    * every triplet class and both bbox paths get coverage. */
  def glyphModels(seed: Long): Seq[GlyphModel] = {
    val n = 4 + (seed % 3).toInt
    (0 until n).map { g =>
      (g % 4) match {
        case 0 => GlyphModel(Nil, Array.emptyByteArray, None, None)
        case 1 =>
          val k = 3 + ((seed + g) % 4).toInt
          val pts = (0 until k).map { j =>
            (10 + (g % 5) + 7 * j, 20 + 11 * j, j != 1)
          }
          GlyphModel(Seq(pts), Array.tabulate(2 + g % 3)(_.toByte), None,
            None)
        case 2 =>
          // two contours: mid-range, 12-bit and 16-bit deltas
          val c1 = Seq((300, 700, true), (1000, 900, true), (300, 1200, true))
          val c2 = Seq((3000, 100, true), (7995, 4000, false),
            (-6000, 4100, true))
          GlyphModel(Seq(c1, c2), Array.emptyByteArray,
            Some((-6001, 99, 8000, 4101)), None)
        case _ =>
          val comp = Seq(
            // ARG_1_AND_2_ARE_WORDS | MORE_COMPONENTS
            (0x0021, 1, Array[Byte](0, 50, 0, 60)),
            // plain byte args + WE_HAVE_INSTRUCTIONS
            (0x0100, 1, Array[Byte](5, 6)))
          GlyphModel(Nil, Array.emptyByteArray, Some((0, 0, 500, 600)),
            Some((comp, Array.tabulate(3)(i => (i + 9).toByte))))
      }
    }
  }

  /** Model xMin per glyph (what omitted hmtx lsbs must come back as). */
  def modelXMins(seed: Long): Seq[Int] = glyphModels(seed).map { gm =>
    gm.explicitBbox match {
      case Some((x0, _, _, _)) => x0
      case None if gm.contours.nonEmpty => gm.contours.flatten.map(_._1).min
      case None => 0
    }
  }

  /** Model advance widths; numHMetrics = numGlyphs - 1 so the
    * monospace tail array has one entry. */
  def modelAdvances(seed: Long): Seq[Int] =
    (0 until glyphModels(seed).length - 1).map(i => 500 + 10 * i)

  /** Build a WOFF2 container whose glyf/loca are TRANSFORMED (version
    * 0), with an untransformed head carrying indexToLocFormat.
    * `withHmtx` adds an untransformed hhea + a TRANSFORMED hmtx
    * (version 1): flags 3 (both lsb arrays omitted → derived from glyf
    * xMins) when seed is even, flags 1 (monospace tail retained, set
    * to xMin+7 to prove the stream is read, not re-derived) when odd. */
  def writeTransformedWoff2(seed: Long, shortLoca: Boolean,
                            overlapBitmap: Boolean = false,
                            withHmtx: Boolean = false): Array[Byte] = {
    val glyphs = glyphModels(seed)
    val n = glyphs.length
    val nContourS = new W; val nPointsS = new W; val flagS = new W
    val glyphS = new W; val compositeS = new W; val bboxValsS = new W
    val instrS = new W
    val bboxBitmap = new Array[Byte](((n + 31) >> 5) << 2)
    val overlap = new Array[Byte]((n + 7) / 8)
    glyphs.zipWithIndex.foreach { case (gm, g) =>
      gm.composite match {
        case Some((comps, instrs)) =>
          nContourS.u16(0xffff) // -1
          bboxBitmap(g >> 3) = (bboxBitmap(g >> 3) |
            (0x80 >> (g & 7))).toByte
          val (x0, y0, x1, y1) = gm.explicitBbox.get
          bboxValsS.u16(x0); bboxValsS.u16(y0)
          bboxValsS.u16(x1); bboxValsS.u16(y1)
          comps.foreach { case (fl, idx, args) =>
            compositeS.u16(fl); compositeS.u16(idx)
            compositeS.bytes(args)
          }
          if (comps.exists(c => (c._1 & 0x0100) != 0)) {
            write255(glyphS, instrs.length)
            instrS.bytes(instrs)
          }
        case None if gm.contours.isEmpty =>
          nContourS.u16(0)
        case None =>
          nContourS.u16(gm.contours.length)
          gm.contours.foreach { c =>
            // use the word-code arm for one contour per font so the
            // decoder's 253 path stays exercised
            write255(nPointsS, c.size, arm = if (g == 1) 1 else -1)
          }
          var px = 0; var py = 0
          gm.contours.flatten.foreach { case (x, y, on) =>
            writeTriplet(flagS, glyphS, x - px, y - py, on)
            px = x; py = y
          }
          write255(glyphS, gm.instructions.length)
          instrS.bytes(gm.instructions)
          gm.explicitBbox.foreach { case (x0, y0, x1, y1) =>
            bboxBitmap(g >> 3) = (bboxBitmap(g >> 3) |
              (0x80 >> (g & 7))).toByte
            bboxValsS.u16(x0); bboxValsS.u16(y0)
            bboxValsS.u16(x1); bboxValsS.u16(y1)
          }
          if (overlapBitmap && gm.contours.nonEmpty)
            overlap(g >> 3) = (overlap(g >> 3) | (0x80 >> (g & 7))).toByte
      }
    }
    // assemble the transformed glyf table
    val t = new W
    t.u16(0) // reserved
    t.u16(if (overlapBitmap) 1 else 0)
    t.u16(n)
    t.u16(if (shortLoca) 0 else 1)
    val bboxStream = bboxBitmap ++ bboxValsS.result
    val streams = Seq(nContourS.result, nPointsS.result, flagS.result,
      glyphS.result, compositeS.result, bboxStream, instrS.result)
    streams.foreach(s => t.u32(s.length.toLong))
    streams.foreach(t.bytes)
    if (overlapBitmap) t.bytes(overlap)
    val transformedGlyf = t.result
    // head (54 bytes) with indexToLocFormat at offset 50
    val head = new W
    head.u32(0x00010000L); head.u32(0x00010000L) // version, fontRevision
    head.u32(0); head.u32(0x5f0f3cf5L) // checksumAdj, magic
    head.u16(0); head.u16(1000) // flags, unitsPerEm
    (0 until 16).foreach(_ => head.u8(0)) // dates
    head.u16(0); head.u16(0); head.u16(1000); head.u16(1000) // bbox
    head.u16(0); head.u16(8); head.u16(2) // macStyle, lowestRec, direction
    head.u16(if (shortLoca) 0 else 1) // indexToLocFormat
    head.u16(0) // glyphDataFormat
    val headBytes = head.result
    // hhea (36 bytes): numHMetrics in the last u16
    val numHMetrics = n - 1
    val hhea = new W
    hhea.u32(0x00010000L) // version
    hhea.u16(800); hhea.u16(0xff38); hhea.u16(90) // ascent/descent/gap
    hhea.u16(1000); hhea.u16(0); hhea.u16(0); hhea.u16(1000) // widths/lsbs
    hhea.u16(1); hhea.u16(0) // caret slope
    (0 until 5).foreach(_ => hhea.u16(0)) // caret offset + reserved
    hhea.u16(0) // metricDataFormat
    hhea.u16(numHMetrics)
    val hheaBytes = hhea.result
    // transformed hmtx (version 1): flags + advances (+ retained tail)
    val xMins = modelXMins(seed)
    val hmtxT = new W
    if (withHmtx) {
      val flags = if (seed % 2 == 0) 3 else 1
      hmtxT.u8(flags)
      modelAdvances(seed).foreach(hmtxT.u16)
      if (flags == 1) // monospace tail retained: xMin + 7
        (numHMetrics until n).foreach(g => hmtxT.u16(xMins(g) + 7))
    }
    val hmtxBytes = hmtxT.result
    // blob in directory order: head, [hhea,] transformed glyf, loca(0)
    // [, transformed hmtx]; stored-brotli framing
    val blob =
      if (withHmtx) headBytes ++ hheaBytes ++ transformedGlyf ++ hmtxBytes
      else headBytes ++ transformedGlyf
    val compressed = BrotliCodec.encodeStored(blob)
    // directory: head (idx 1, untransformed), [hhea (idx 2),] glyf
    // (idx 10, transform 0 = transformed), loca (idx 11, transform 0,
    // stored length 0) [, hmtx (idx 3, transform VERSION 1)]
    val dir = new W
    dir.u8(1); uintBase128(dir, headBytes.length.toLong)
    if (withHmtx) { dir.u8(2); uintBase128(dir, hheaBytes.length.toLong) }
    dir.u8(10); uintBase128(dir, 4096L) // orig length (unvalidated)
    uintBase128(dir, transformedGlyf.length.toLong)
    dir.u8(11); uintBase128(dir, ((n + 1) * (if (shortLoca) 2 else 4)).toLong)
    uintBase128(dir, 0L)
    if (withHmtx) {
      dir.u8(3 | (1 << 6)) // hmtx, preTransform 1
      uintBase128(dir, (4L * numHMetrics + 2L * (n - numHMetrics)))
      uintBase128(dir, hmtxBytes.length.toLong)
    }
    val dirBytes = dir.result
    val w = new W
    w.bytes("wOF2".getBytes("ISO-8859-1"))
    w.u32(0x00010000L) // flavor
    w.u32((48 + dirBytes.length + compressed.length).toLong)
    w.u16(if (withHmtx) 5 else 3); w.u16(0) // numTables, reserved
    w.u32(4096L) // totalSfntSize (advisory)
    w.u32(compressed.length.toLong)
    w.u16(1); w.u16(0) // version
    w.u32(0); w.u32(0); w.u32(0) // meta
    w.u32(0); w.u32(0) // priv
    w.bytes(dirBytes)
    w.bytes(compressed)
    w.result
  }
}
