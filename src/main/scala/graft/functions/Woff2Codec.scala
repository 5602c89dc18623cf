package graft.functions

/** WOFF2 web-font census + table extraction (W3C WOFF File Format
  * 2.0) — the biggest consumer of brotli on the web besides HTTP
  * bodies. Shipped scope: the 48-byte header, the table directory
  * (known-tag indices and the 0x3f explicit-tag arm, UIntBase128
  * lengths with the spec's rejection rules), reference-brotli blob
  * decompression via [[BrotliCodec]], and extraction of UNTRANSFORMED
  * tables (glyf/loca/hmtx transform reconstruction is out of scope —
  * the census reports the transform version so a pipeline can route
  * those; extraction of a transformed table returns None honestly).
  * TTC collections (flavor 'ttcf') are censused but not exploded.
  * The known-tag order is the spec's Table 1 (vendored; fixtures
  * exercise both arms, so a wrong entry cannot pass). Hostile input
  * returns None. */
object Woff2Codec {

  /** Spec Table 1: tag for directory indices 0..62 (63 = explicit). */
  val KnownTags: Array[String] = Array(
    "cmap", "head", "hhea", "hmtx", "maxp", "name", "OS/2", "post",
    "cvt ", "fpgm", "glyf", "loca", "prep", "CFF ", "VORG", "EBDT",
    "EBLC", "gasp", "hdmx", "kern", "LTSH", "PCLT", "VDMX", "vhea",
    "vmtx", "BASE", "GDEF", "GPOS", "GSUB", "EBSC", "JSTF", "MATH",
    "CBDT", "CBLC", "COLR", "CPAL", "SVG ", "sbix", "acnt", "avar",
    "bdat", "bloc", "bsln", "cvar", "fdsc", "feat", "fmtx", "fvar",
    "gvar", "hsty", "just", "lcar", "mort", "morx", "opbd", "prop",
    "trak", "Zapf", "Silf", "Glat", "Gloc", "Feat", "Sill")

  private def u16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def u32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  /** UIntBase128 (spec §5.2): ≤ 5 bytes, no leading 0x80 byte, must
    * not overflow 2^32-1. Returns (value, bytesConsumed) or null. */
  private def uintBase128(b: Array[Byte], at: Int): (Long, Int) = {
    var v = 0L
    var i = 0
    while (i < 5) {
      if (at + i >= b.length) return null
      val byte = b(at + i) & 0xff
      if (i == 0 && byte == 0x80) return null // leading zero forbidden
      if ((v & 0xfe000000L) != 0) return null // would overflow 32 bits
      v = (v << 7) | (byte & 0x7f)
      if ((byte & 0x80) == 0) return (v, i + 1)
      i += 1
    }
    null // 6th byte would follow
  }

  final case class Woff2Table(tag: String, transform: Int,
                              origLength: Long, storedLength: Long)
  final case class Woff2Meta(flavor: String, numTables: Int,
                             totalSfntSize: Long, tables: Seq[Woff2Table],
                             blobOk: Boolean, blobLen: Long)

  private def parse(b: Array[Byte])
      : Option[(Woff2Meta, Array[Byte])] = {
    try {
      if (b.length < 48 || !(b(0) == 'w' && b(1) == 'O' && b(2) == 'F' &&
        b(3) == '2')) return None
      val flavor = new String(b, 4, 4, "ISO-8859-1")
      val numTables = u16(b, 12)
      val totalSfnt = u32(b, 16)
      val compressedSize = u32(b, 20)
      if (numTables <= 0 || numTables > 4096) return None
      var p = 48
      val tables = Seq.newBuilder[Woff2Table]
      var sumStored = 0L
      var i = 0
      while (i < numTables) {
        if (p >= b.length) return None
        val flags = b(p) & 0xff
        p += 1
        val tagIdx = flags & 0x3f
        val preTransform = flags >>> 6
        val tag =
          if (tagIdx == 0x3f) {
            if (p + 4 > b.length) return None
            val t = new String(b, p, 4, "ISO-8859-1")
            p += 4
            t
          } else KnownTags(tagIdx)
        // spec §5.3: for glyf/loca version 3 is the null transform and
        // 0 is transformed; for other tables 0 is null
        val isGlyfLoca = tag == "glyf" || tag == "loca"
        val transformed =
          if (isGlyfLoca) preTransform != 3
          else preTransform != 0
        val orig = uintBase128(b, p) match {
          case null => return None
          case (v, n) => p += n; v
        }
        val stored =
          if (transformed) uintBase128(b, p) match {
            case null => return None
            case (v, n) => p += n; v
          }
          else orig
        if (stored < 0 || sumStored + stored > (1L << 26)) return None
        sumStored += stored
        tables += Woff2Table(tag, preTransform, orig, stored)
        i += 1
      }
      if (p.toLong + compressedSize > b.length.toLong) return None
      val blob = BrotliCodec.decode(
        java.util.Arrays.copyOfRange(b, p, p + compressedSize.toInt))
      val ts = tables.result()
      val ok = blob.exists(_.length.toLong == sumStored)
      Some((Woff2Meta(flavor, numTables, totalSfnt, ts, ok, sumStored),
        blob.orNull))
    } catch {
      case _: IndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
  }

  /** Census: flavor, table inventory with transform versions and
    * lengths, whether the brotli blob decompresses to the directory's
    * exact stored-length sum. */
  def census(b: Array[Byte]): Option[Woff2Meta] = parse(b).map(_._1)

  /** Extract one table's bytes. Untransformed tables come straight
    * from their slice of the decompressed blob; TRANSFORMED glyf/loca
    * (transform version 0 — woff2_compress's default output) are
    * RECONSTRUCTED per spec §5.1 (triplet coordinate decode, 255UInt16
    * point counts, bbox bitmap, composite passthrough, loca
    * resynthesis). None for absent tags, non-glyf/loca transforms
    * (hmtx transform stays census-only), or a blob that does not
    * decompress. */
  def extractTable(b: Array[Byte], tag: String): Option[Array[Byte]] =
    parse(b).flatMap { case (meta, blob) =>
      if (blob == null || !meta.blobOk) None
      else {
        var off = 0L
        meta.tables.foreach { t =>
          if (t.tag == tag) {
            val isGlyfLoca = t.tag == "glyf" || t.tag == "loca"
            val transformed =
              if (isGlyfLoca) t.transform != 3 else t.transform != 0
            if (!transformed)
              return Some(java.util.Arrays.copyOfRange(blob, off.toInt,
                (off + t.storedLength).toInt))
            if (tag == "hmtx" && t.transform == 1)
              return reconstructHmtx(meta, blob,
                java.util.Arrays.copyOfRange(blob, off.toInt,
                  (off + t.storedLength).toInt))
            if (!isGlyfLoca || t.transform != 0) return None
            // transformed loca has zero stored bytes: its content is a
            // by-product of the glyf reconstruction — find the glyf
            // slice (also transform 0 per spec) and rebuild both
            var gOff = 0L
            var glyfT: Woff2Table = null
            meta.tables.foreach { g =>
              if (g.tag == "glyf" && glyfT == null) glyfT = g
              else if (glyfT == null) gOff += g.storedLength
            }
            if (glyfT == null || glyfT.transform != 0) return None
            return reconstructGlyfLoca(java.util.Arrays.copyOfRange(blob,
              gOff.toInt, (gOff + glyfT.storedLength).toInt))
              .map { case (glyf, loca) => if (tag == "glyf") glyf else loca }
          }
          off += t.storedLength
        }
        None
      }
    }

  final case class GlyfFeatures(nGlyphs: Int, nContours: Int,
                                nPoints: Int, nComposites: Int,
                                nEmpty: Int)

  /** Walk a (reconstructed or native) glyf table via its loca offsets
    * and count contours/points/composites — the census features the
    * corpus query exposes. `shortLoca` selects the offset width. */
  def glyfFeatures(glyf: Array[Byte], loca: Array[Byte],
                   shortLoca: Boolean): Option[GlyfFeatures] =
    try {
      val entryW = if (shortLoca) 2 else 4
      if (loca.length % entryW != 0 || loca.length < 2 * entryW) return None
      val n = loca.length / entryW - 1
      var contours = 0
      var points = 0
      var composites = 0
      var empty = 0
      var g = 0
      def off(i: Int): Int =
        if (shortLoca) u16(loca, i * 2) * 2
        else u32(loca, i * 4).toInt
      while (g < n) {
        val a = off(g); val b = off(g + 1)
        if (a > b || b > glyf.length) return None
        if (a == b) empty += 1
        else {
          val nc = ((glyf(a) & 0xff) << 8 | (glyf(a + 1) & 0xff)).toShort
          if (nc < 0) composites += 1
          else {
            contours += nc
            // last endPtsOfContours entry + 1 = point count
            val lastEnd = u16(glyf, a + 10 + 2 * (nc - 1))
            points += lastEnd + 1
          }
        }
        g += 1
      }
      Some(GlyfFeatures(n, contours, points, composites, empty))
    } catch {
      case _: IndexOutOfBoundsException => None
    }

  /** xMin per glyph from a (reconstructed) glyf/loca pair — what the
    * hmtx transform derives omitted left side bearings from. Empty
    * glyphs get 0. */
  private def glyfXMins(glyf: Array[Byte], loca: Array[Byte],
                        shortLoca: Boolean): Option[Array[Int]] = {
    val entryW = if (shortLoca) 2 else 4
    if (loca.length % entryW != 0 || loca.length < 2 * entryW) return None
    val n = loca.length / entryW - 1
    def off(i: Int): Int =
      if (shortLoca) u16(loca, i * 2) * 2 else u32(loca, i * 4).toInt
    val out = new Array[Int](n)
    var g = 0
    while (g < n) {
      val a = off(g); val b = off(g + 1)
      if (a > b || b > glyf.length) return None
      if (b > a) {
        if (a + 4 > glyf.length) return None
        out(g) = u16(glyf, a + 2).toShort.toInt
      }
      g += 1
    }
    Some(out)
  }

  /** Reconstruct a TRANSFORMED hmtx (spec §5.4, transform version 1):
    * flags byte (bit 0 = proportional lsb[] omitted, bit 1 = monospace
    * leftSideBearing[] omitted — omitted values equal the glyph's
    * glyf xMin), advanceWidth[numHMetrics], then whichever lsb arrays
    * were retained. Needs hhea (numHMetrics) and the reconstructed
    * glyf/loca for the xMins, so the glyf transform must be present —
    * the only shape woff2_compress emits transformed hmtx in. */
  private def reconstructHmtx(meta: Woff2Meta, blob: Array[Byte],
                              t: Array[Byte]): Option[Array[Byte]] = {
    // locate hhea (untransformed) and the transformed glyf slice
    var hheaOff = -1L; var hheaLen = 0L
    var glyfOff = -1L
    var glyfT: Woff2Table = null
    var at = 0L
    meta.tables.foreach { tb =>
      if (tb.tag == "hhea" && hheaOff < 0) { hheaOff = at; hheaLen = tb.storedLength }
      if (tb.tag == "glyf" && glyfT == null) { glyfT = tb; glyfOff = at }
      at += tb.storedLength
    }
    if (hheaOff < 0 || hheaLen < 36 || glyfT == null ||
      glyfT.transform != 0) return None
    val numHMetrics = u16(blob, hheaOff.toInt + 34)
    val (glyf, loca) = reconstructGlyfLoca(java.util.Arrays.copyOfRange(
      blob, glyfOff.toInt, (glyfOff + glyfT.storedLength).toInt))
      .getOrElse(return None)
    // index format from the transformed glyf header
    val shortLoca = u16(blob, glyfOff.toInt + 6) == 0
    val xMins = glyfXMins(glyf, loca, shortLoca).getOrElse(return None)
    val numGlyphs = xMins.length
    if (numHMetrics < 1 || numHMetrics > numGlyphs) return None
    try {
      val r = new Rd(t, 0, t.length)
      val flags = r.u8()
      if ((flags & 0xfc) != 0) return None // reserved bits
      val hasProportional = (flags & 0x01) == 0
      val hasMonospace = (flags & 0x02) == 0
      val advances = Array.fill(numHMetrics)(r.u16())
      val lsbProp =
        if (hasProportional) Array.fill(numHMetrics)(r.i16())
        else xMins.take(numHMetrics)
      val lsbMono =
        if (hasMonospace) Array.fill(numGlyphs - numHMetrics)(r.i16())
        else xMins.drop(numHMetrics)
      if (r.remaining != 0) return None
      val out = new java.io.ByteArrayOutputStream()
      def w16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
      var i = 0
      while (i < numHMetrics) { w16(advances(i)); w16(lsbProp(i) & 0xffff); i += 1 }
      i = 0
      while (i < numGlyphs - numHMetrics) { w16(lsbMono(i) & 0xffff); i += 1 }
      Some(out.toByteArray)
    } catch {
      case _: IndexOutOfBoundsException => None
    }
  }

  // -------------------- transformed glyf reconstruction (spec §5.1)

  private final class Rd(val b: Array[Byte], var at: Int, val end: Int) {
    def u8(): Int = {
      if (at >= end) throw new IndexOutOfBoundsException("stream")
      val v = b(at) & 0xff; at += 1; v
    }
    def u16(): Int = (u8() << 8) | u8()
    def i16(): Int = u16().toShort.toInt
    def take(n: Int): Array[Byte] = {
      if (n < 0 || at + n > end) throw new IndexOutOfBoundsException("take")
      val out = java.util.Arrays.copyOfRange(b, at, at + n); at += n; out
    }
    def remaining: Int = end - at
  }

  /** 255UInt16 (spec §5.2): 253 → 16-bit word, 255 → byte + 253,
    * 254 → byte + 506, else the byte itself. */
  private def read255(r: Rd): Int = r.u8() match {
    case 253 => r.u16()
    case 255 => r.u8() + 253
    case 254 => r.u8() + 506
    case v => v
  }

  /** Triplet coordinate decode (spec §5.2): flag byte bit 7 = OFF-curve;
    * low 7 bits select byte count and dx/dy packing; sign bits ride in
    * the flag's low bits (1 = positive). Returns (dx, dy, onCurve). */
  private def triplet(flagByte: Int, data: Rd): (Int, Int, Boolean) = {
    val onCurve = (flagByte >> 7) == 0
    val flag = flagByte & 0x7f
    def sgn(bit: Int, v: Int): Int = if ((bit & 1) == 1) v else -v
    val (dx, dy) =
      if (flag < 10) (0, sgn(flag, ((flag & 14) << 7) + data.u8()))
      else if (flag < 20)
        (sgn(flag, (((flag - 10) & 14) << 7) + data.u8()), 0)
      else if (flag < 84) {
        val b0 = flag - 20
        val b1 = data.u8()
        (sgn(flag, 1 + (b0 & 0x30) + (b1 >> 4)),
          sgn(flag >> 1, 1 + ((b0 & 0x0c) << 2) + (b1 & 0x0f)))
      } else if (flag < 120) {
        val b0 = flag - 84
        (sgn(flag, 1 + ((b0 / 12) << 8) + data.u8()),
          sgn(flag >> 1, 1 + (((b0 % 12) >> 2) << 8) + data.u8()))
      } else if (flag < 124) {
        val d0 = data.u8(); val b2 = data.u8(); val d2 = data.u8()
        (sgn(flag, (d0 << 4) + (b2 >> 4)),
          sgn(flag >> 1, ((b2 & 0x0f) << 8) + d2))
      } else {
        val d0 = data.u8(); val d1 = data.u8()
        val d2 = data.u8(); val d3 = data.u8()
        (sgn(flag, (d0 << 8) + d1), sgn(flag >> 1, (d2 << 8) + d3))
      }
    (dx, dy, onCurve)
  }

  /** Rebuild (glyf, loca) from a transformed glyf table. Emits plain
    * TrueType records: simple glyphs with per-point flag bytes (no
    * repeat packing), computed or bitmap-supplied bounding boxes,
    * composite passthrough with instruction splice; glyphs padded to
    * even length so short loca (indexFormat 0) stays exact. */
  private[functions] def reconstructGlyfLoca(t: Array[Byte])
      : Option[(Array[Byte], Array[Byte])] =
    try {
      if (t.length < 36) return None
      val hdr = new Rd(t, 0, t.length)
      hdr.u16() // reserved
      val optionFlags = hdr.u16()
      val numGlyphs = hdr.u16()
      val indexFormat = hdr.u16()
      if (numGlyphs > 65535) return None
      val sizes = Array.fill(7)((hdr.u16().toLong << 16) | hdr.u16())
      if (sizes.exists(s => s < 0 || s > (1 << 26))) return None
      var at = 36L
      val streams = sizes.map { s =>
        if (at + s > t.length) return None
        val r = new Rd(t, at.toInt, (at + s).toInt)
        at += s
        r
      }
      val Array(nContourS, nPointsS, flagS, glyphS, compositeS, bboxS,
        instrS) = streams
      val overlapBitmap =
        if ((optionFlags & 1) != 0) {
          val n = (numGlyphs + 7) / 8
          if (at + n > t.length) return None
          java.util.Arrays.copyOfRange(t, at.toInt, at.toInt + n)
        } else null
      // bbox bitmap heads the bbox stream, 4-byte aligned
      val bitmapLen = ((numGlyphs + 31) >> 5) << 2
      val bboxBitmap = bboxS.take(math.min(bitmapLen, bboxS.remaining))
      if (bboxBitmap.length != bitmapLen) return None
      def bboxSet(g: Int): Boolean =
        (bboxBitmap(g >> 3) & (0x80 >> (g & 7))) != 0
      val glyf = new java.io.ByteArrayOutputStream()
      val loca = new Array[Int](numGlyphs + 1)
      def w16(v: Int): Unit = { glyf.write((v >> 8) & 0xff); glyf.write(v & 0xff) }
      var g = 0
      while (g < numGlyphs) {
        loca(g) = glyf.size()
        val nContours = nContourS.i16()
        if (nContours == 0) {
          // empty glyph: zero bytes; spec forbids a bbox for it
          if (bboxSet(g)) return None
        } else if (nContours > 0) {
          // ---- simple glyph
          val endPts = new Array[Int](nContours)
          var totalPoints = 0
          var c = 0
          while (c < nContours) {
            val n = read255(nPointsS)
            if (n <= 0 || totalPoints + n > 0xffff) return None
            totalPoints += n
            endPts(c) = totalPoints - 1
            c += 1
          }
          val xs = new Array[Int](totalPoints)
          val ys = new Array[Int](totalPoints)
          val on = new Array[Boolean](totalPoints)
          var x = 0; var y = 0
          var i = 0
          while (i < totalPoints) {
            val (dx, dy, onc) = triplet(flagS.u8(), glyphS)
            x += dx; y += dy
            xs(i) = x; ys(i) = y; on(i) = onc
            i += 1
          }
          val instrLen = read255(glyphS)
          val instrs = instrS.take(instrLen)
          val (x0, y0, x1, y1) =
            if (bboxSet(g)) (bboxS.i16(), bboxS.i16(), bboxS.i16(),
              bboxS.i16())
            else (xs.min, ys.min, xs.max, ys.max)
          w16(nContours); w16(x0); w16(y0); w16(x1); w16(y1)
          endPts.foreach(w16)
          w16(instrLen)
          glyf.write(instrs, 0, instrs.length)
          val overlap = overlapBitmap != null &&
            (overlapBitmap(g >> 3) & (0x80 >> (g & 7))) != 0
          i = 0
          while (i < totalPoints) {
            var fl = if (on(i)) 0x01 else 0x00
            if (i == 0 && overlap) fl |= 0x40
            val dx = if (i == 0) xs(0) else xs(i) - xs(i - 1)
            val dy = if (i == 0) ys(0) else ys(i) - ys(i - 1)
            if (dx == 0) fl |= 0x10
            else if (dx >= -255 && dx <= 255) {
              fl |= 0x02; if (dx > 0) fl |= 0x10
            }
            if (dy == 0) fl |= 0x20
            else if (dy >= -255 && dy <= 255) {
              fl |= 0x04; if (dy > 0) fl |= 0x20
            }
            glyf.write(fl)
            i += 1
          }
          i = 0
          while (i < totalPoints) { // x deltas
            val dx = if (i == 0) xs(0) else xs(i) - xs(i - 1)
            if (dx == 0) ()
            else if (dx >= -255 && dx <= 255) glyf.write(math.abs(dx))
            else w16(dx & 0xffff)
            i += 1
          }
          i = 0
          while (i < totalPoints) { // y deltas
            val dy = if (i == 0) ys(0) else ys(i) - ys(i - 1)
            if (dy == 0) ()
            else if (dy >= -255 && dy <= 255) glyf.write(math.abs(dy))
            else w16(dy & 0xffff)
            i += 1
          }
        } else {
          // ---- composite glyph: bbox MUST be explicit (spec §5.1)
          if (!bboxSet(g)) return None
          val (x0, y0, x1, y1) = (bboxS.i16(), bboxS.i16(), bboxS.i16(),
            bboxS.i16())
          w16(nContours & 0xffff); w16(x0); w16(y0); w16(x1); w16(y1)
          var more = true
          var haveInstr = false
          while (more) {
            val flags = compositeS.u16()
            val glyphIdx = compositeS.u16()
            more = (flags & 0x0020) != 0
            haveInstr ||= (flags & 0x0100) != 0
            var argBytes = if ((flags & 0x0001) != 0) 4 else 2
            if ((flags & 0x0008) != 0) argBytes += 2
            if ((flags & 0x0040) != 0) argBytes += 4
            if ((flags & 0x0080) != 0) argBytes += 8
            val args = compositeS.take(argBytes)
            w16(flags); w16(glyphIdx)
            glyf.write(args, 0, args.length)
          }
          if (haveInstr) {
            val instrLen = read255(glyphS)
            val instrs = instrS.take(instrLen)
            w16(instrLen)
            glyf.write(instrs, 0, instrs.length)
          }
        }
        if (glyf.size() % 2 == 1) glyf.write(0) // even padding for loca
        g += 1
      }
      loca(numGlyphs) = glyf.size()
      val locaBytes = new java.io.ByteArrayOutputStream()
      loca.foreach { off =>
        if (indexFormat == 0) {
          if (off % 2 != 0 || (off >> 1) > 0xffff) return None
          locaBytes.write((off >> 9) & 0xff); locaBytes.write((off >> 1) & 0xff)
        } else {
          locaBytes.write((off >> 24) & 0xff); locaBytes.write((off >> 16) & 0xff)
          locaBytes.write((off >> 8) & 0xff); locaBytes.write(off & 0xff)
        }
      }
      Some((glyf.toByteArray, locaBytes.toByteArray))
    } catch {
      case _: IndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
}
