package graft.functions

/** Pure-JVM TIFF codec (TIFF 6.0, the container scanned-document
  * corpora arrive in). Both byte orders (`II`/`MM`), multi-page IFD
  * walk for the census, and REAL strip-based pixel decode for the
  * baseline profile a crawl actually sees: 8-bit grayscale (both
  * photometric polarities) and 8-bit RGB, uncompressed, PackBits
  * (§9), and LZW (§13 — MSB-first code packing, 9→12-bit widths with
  * the spec's early-change bump, Clear/EOI handling, table reset)
  * with the horizontal-differencing predictor (§14). The encoder
  * emits real conformant files across the same option space so the
  * spec laws can round-trip the full matrix and cross-validate both
  * directions against `javax.imageio`'s independent TIFF plugin.
  * Hostile input returns None — rejects side-channel, same contract
  * as the other image codecs. Tiling, 16-bit, CMYK, JPEG-in-TIFF
  * return None too (census still reports them). */
object TiffCodec {

  final case class TiffMeta(byteOrder: String, width: Int, height: Int,
                            bitsPerSample: Int, samplesPerPixel: Int,
                            compression: Int, photometric: Int, nPages: Int)

  // --------------------------------------------------------- raw reads

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def u16(b: Array[Byte], i: Int, be: Boolean): Int =
    if (be) (u8(b, i) << 8) | u8(b, i + 1)
    else u8(b, i) | (u8(b, i + 1) << 8)
  private def u32(b: Array[Byte], i: Int, be: Boolean): Long =
    if (be) (u16(b, i, be).toLong << 16) | u16(b, i + 2, be).toLong
    else u16(b, i, be).toLong | (u16(b, i + 2, be).toLong << 16)

  /** One IFD entry's scalar/array values (SHORT and LONG types only —
    * enough for the baseline tag set; others are skipped). */
  private def tagValues(b: Array[Byte], entryAt: Int, be: Boolean,
                        maxN: Int): Option[Array[Long]] = {
    val typ = u16(b, entryAt + 2, be)
    val cnt = u32(b, entryAt + 4, be)
    if (cnt <= 0 || cnt > maxN) return None
    val n = cnt.toInt
    val elemSize = typ match {
      case 3 => 2
      case 4 => 4
      case _ => return None
    }
    val at =
      if (n * elemSize <= 4) entryAt + 8
      else {
        val off = u32(b, entryAt + 8, be)
        if (off < 0 || off + n.toLong * elemSize > b.length) return None
        off.toInt
      }
    Some(Array.tabulate(n)(i =>
      if (elemSize == 2) u16(b, at + 2 * i, be).toLong
      else u32(b, at + 4 * i, be)))
  }

  private def headerOrder(b: Array[Byte]): Option[Boolean] = {
    if (b.length < 8) return None
    if (b(0) == 'I' && b(1) == 'I' && u16(b, 2, be = false) == 42) Some(false)
    else if (b(0) == 'M' && b(1) == 'M' && u16(b, 2, be = true) == 42) Some(true)
    else None
  }

  /** Census: first-page geometry/compression + total page count via the
    * IFD chain walk (cycle- and bounds-guarded). */
  def meta(b: Array[Byte]): Option[TiffMeta] =
    try {
      val be = headerOrder(b) match { case Some(x) => x; case None => return None }
      var ifdAt = u32(b, 4, be)
      var nPages = 0
      var first: Option[(Int, Int, Int, Int, Int, Int)] = None
      while (ifdAt != 0 && nPages < 1000) {
        if (ifdAt < 8 || ifdAt + 2 > b.length) return None
        val at = ifdAt.toInt
        val nEntries = u16(b, at, be)
        if (at + 2 + 12 * nEntries + 4 > b.length) return None
        if (nPages == 0) {
          var w = 0; var h = 0; var bps = 0; var spp = 1
          var comp = 1; var photo = -1
          var e = 0
          while (e < nEntries) {
            val ea = at + 2 + 12 * e
            val tag = u16(b, ea, be)
            def v1: Long =
              tagValues(b, ea, be, 8).map(_.head).getOrElse(-1L)
            tag match {
              case 256 => w = v1.toInt
              case 257 => h = v1.toInt
              case 258 => bps = v1.toInt
              case 259 => comp = v1.toInt
              case 262 => photo = v1.toInt
              case 277 => spp = v1.toInt
              case _ => ()
            }
            e += 1
          }
          if (w <= 0 || h <= 0) return None
          first = Some((w, h, bps, spp, comp, photo))
        }
        nPages += 1
        ifdAt = u32(b, at + 2 + 12 * nEntries, be)
      }
      first.map { case (w, h, bps, spp, comp, photo) =>
        TiffMeta(if (be) "MM" else "II", w, h, bps, spp, comp, photo, nPages)
      }
    } catch { case _: IndexOutOfBoundsException => None }

  // ------------------------------------------------------ pixel decode

  /** Strip-based baseline decode of the first page. */
  def decodePixels(b: Array[Byte]): Option[ImageCodec.ImagePixels] =
    decodePage(b, 0)

  /** Decode page `page` of a (possibly multi-page) TIFF by walking the
    * IFD chain. */
  def decodePage(b: Array[Byte], page: Int): Option[ImageCodec.ImagePixels] =
    try {
      if (page < 0 || page > 1000) return None
      val be = headerOrder(b) match { case Some(x) => x; case None => return None }
      var ifdAt0 = u32(b, 4, be)
      var skip = page
      while (skip > 0) {
        if (ifdAt0 < 8 || ifdAt0 + 2 > b.length) return None
        val a0 = ifdAt0.toInt
        val n0 = u16(b, a0, be)
        if (a0 + 2 + 12 * n0 + 4 > b.length) return None
        ifdAt0 = u32(b, a0 + 2 + 12 * n0, be)
        skip -= 1
      }
      if (ifdAt0 < 8 || ifdAt0 + 2 > b.length) return None
      val at = ifdAt0.toInt
      val nEntries = u16(b, at, be)
      if (at + 2 + 12 * nEntries + 4 > b.length) return None
      var w = 0; var h = 0; var spp = 1; var comp = 1; var photo = -1
      var rowsPerStrip = Int.MaxValue; var predictor = 1; var planar = 1
      var bpsOk = true
      var offsets: Array[Long] = null
      var counts: Array[Long] = null
      var e = 0
      while (e < nEntries) {
        val ea = at + 2 + 12 * e
        val tag = u16(b, ea, be)
        def v1: Long = tagValues(b, ea, be, 8).map(_.head).getOrElse(-1L)
        tag match {
          case 256 => w = v1.toInt
          case 257 => h = v1.toInt
          case 258 =>
            bpsOk = tagValues(b, ea, be, 8).exists(_.forall(_ == 8L))
          case 259 => comp = v1.toInt
          case 262 => photo = v1.toInt
          case 273 =>
            offsets = tagValues(b, ea, be, 1 << 16) match {
              case Some(x) => x; case None => return None
            }
          case 277 => spp = v1.toInt
          case 278 => rowsPerStrip = math.min(v1, Int.MaxValue.toLong).toInt
          case 279 =>
            counts = tagValues(b, ea, be, 1 << 16) match {
              case Some(x) => x; case None => return None
            }
          case 284 => planar = v1.toInt
          case 317 => predictor = v1.toInt
          case 322 | 323 => return None // tiled layout unsupported
          case _ => ()
        }
        e += 1
      }
      if (w <= 0 || h <= 0 || !bpsOk || offsets == null || counts == null)
        return None
      if (offsets.length != counts.length || offsets.isEmpty) return None
      if (planar != 1 || (spp != 1 && spp != 3)) return None
      if (photo != 0 && photo != 1 && photo != 2) return None
      if (photo == 2 && spp != 3) return None
      if (comp != 1 && comp != 5 && comp != 32773) return None
      if (predictor != 1 && (predictor != 2 || comp == 1)) return None
      if (rowsPerStrip <= 0) rowsPerStrip = h
      if (w.toLong * h > (1L << 24)) return None // hostile-dims cap
      val rps = math.min(rowsPerStrip, h)
      val nStrips = (h + rps - 1) / rps
      if (nStrips != offsets.length) return None
      val rowBytes = w * spp
      val out = new Array[Byte](3 * w * h)
      var strip = 0
      while (strip < nStrips) {
        val rows = math.min(rps, h - strip * rps)
        val need = rows * rowBytes
        val off = offsets(strip); val len = counts(strip)
        if (off < 0 || len < 0 || off + len > b.length) return None
        val raw = comp match {
          case 1 =>
            if (len < need) return None
            java.util.Arrays.copyOfRange(b, off.toInt, off.toInt + need)
          case 32773 =>
            unpackBits(b, off.toInt, len.toInt, need) match {
              case Some(x) => x; case None => return None
            }
          case _ =>
            lzwDecode(b, off.toInt, len.toInt, need) match {
              case Some(x) => x; case None => return None
            }
        }
        if (predictor == 2) {
          var r = 0
          while (r < rows) {
            var i = r * rowBytes + spp
            val end = (r + 1) * rowBytes
            while (i < end) { raw(i) = (raw(i) + raw(i - spp)).toByte; i += 1 }
            r += 1
          }
        }
        // to RGB
        var r2 = 0
        while (r2 < rows) {
          val y = strip * rps + r2
          var x = 0
          while (x < w) {
            val o = 3 * (y * w + x)
            if (spp == 3) {
              out(o) = raw(r2 * rowBytes + 3 * x)
              out(o + 1) = raw(r2 * rowBytes + 3 * x + 1)
              out(o + 2) = raw(r2 * rowBytes + 3 * x + 2)
            } else {
              val v0 = raw(r2 * rowBytes + x) & 0xff
              val v = if (photo == 0) 255 - v0 else v0
              out(o) = v.toByte; out(o + 1) = v.toByte; out(o + 2) = v.toByte
            }
            x += 1
          }
          r2 += 1
        }
        strip += 1
      }
      Some(ImageCodec.ImagePixels("tiff", w, h, out))
    } catch {
      case _: IndexOutOfBoundsException | _: NegativeArraySizeException => None
    }

  /** PackBits (§9): literal runs and repeat runs; -128 is a no-op. */
  private def unpackBits(b: Array[Byte], off: Int, len: Int,
                         need: Int): Option[Array[Byte]] = {
    val out = new Array[Byte](need)
    var i = off; val end = off + len
    var o = 0
    while (o < need && i < end) {
      val n = b(i); i += 1
      if (n >= 0) {
        if (i + n + 1 > end || o + n + 1 > need) return None
        System.arraycopy(b, i, out, o, n + 1)
        i += n + 1; o += n + 1
      } else if (n != -128) {
        if (i >= end || o + (1 - n) > need) return None
        java.util.Arrays.fill(out, o, o + 1 - n, b(i))
        i += 1; o += 1 - n
      }
    }
    if (o == need) Some(out) else None
  }

  /** TIFF LZW (§13): MSB-first bit packing, Clear=256/EOI=257, code
    * width 9→12 with the early-change bump (width grows when the NEXT
    * table slot would need it, one code early). */
  private def lzwDecode(b: Array[Byte], off: Int, len: Int,
                        need: Int): Option[Array[Byte]] = {
    val out = new Array[Byte](need)
    var o = 0
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4096)
    var next = 258; var width = 9
    var bitPos = 0L
    val bitEnd = len.toLong * 8
    def read(): Int = {
      if (bitPos + width > bitEnd) return -1
      var v = 0; var k = 0
      while (k < width) {
        val byteAt = off + (bitPos >> 3).toInt
        v = (v << 1) | ((b(byteAt) >> (7 - (bitPos & 7).toInt)) & 1)
        bitPos += 1; k += 1
      }
      v
    }
    var prev = -1
    var code = read()
    while (code != -1 && code != 257 && o < need) {
      if (code == 256) {
        next = 258; width = 9; prev = -1
      } else {
        if (prev == -1) {
          if (code > 255) return None
          out(o) = code.toByte; o += 1
        } else {
          var sp = 0
          var c = code
          if (code >= next) { // KwKwK case: code == next only
            if (code != next) return None
            c = prev
            stack(sp) = firstByte(prefix, suffix, prev); sp += 1
          }
          while (c > 255) {
            if (sp >= stack.length - 1) return None
            stack(sp) = suffix(c); sp += 1; c = prefix(c)
          }
          if (sp >= stack.length) return None
          stack(sp) = c.toByte; sp += 1
          // emit reversed
          if (o + sp > need) return None
          var k = sp - 1
          while (k >= 0) { out(o) = stack(k); o += 1; k -= 1 }
          if (next < 4096) {
            prefix(next) = prev
            suffix(next) = stack(sp - 1) // first byte of current string
            next += 1
          }
        }
        prev = code
        if (next == (1 << width) - 1 && width < 12) width += 1
      }
      code = read()
    }
    if (o == need) Some(out) else None
  }

  private def firstByte(prefix: Array[Int], suffix: Array[Byte],
                        code0: Int): Byte = {
    var c = code0
    while (c > 255) c = prefix(c)
    c.toByte
  }

  // ----------------------------------------------------------- encoder

  /** Encoder options: byte order × compression × predictor × color
    * space × strip blocking — the decoder-path matrix the spec laws
    * sweep. `compression`: 1 none, 5 LZW, 32773 PackBits. */
  final case class TiffOpts(bigEndian: Boolean = false,
                            compression: Int = 1,
                            predictor: Boolean = false,
                            gray: Boolean = false,
                            rowsPerStrip: Int = 8,
                            whiteIsZero: Boolean = false)

  /** Real conformant single-page TIFF from `px(x, y) -> 0xRRGGBB`
    * (gray mode keeps the red channel). Ascending-tag IFD, strip
    * layout, optional LZW/PackBits compression and horizontal
    * predictor. */
  def writeTiffPixels(width: Int, height: Int, px: (Int, Int) => Int,
                      opts: TiffOpts = TiffOpts()): Array[Byte] =
    writeTiffPages(Seq((width, height, px)), opts)

  /** Multi-page TIFF: one chained IFD per page (the scanned-document
    * layout — page k's next-IFD pointer leads to page k+1). All pages
    * share `opts`. */
  def writeTiffPages(pages: Seq[(Int, Int, (Int, Int) => Int)],
                     opts: TiffOpts = TiffOpts()): Array[Byte] = {
    require(pages.nonEmpty, "no pages")
    require(opts.compression == 1 || opts.compression == 5 ||
      opts.compression == 32773, "bad compression")
    pages.foreach { case (w, h, _) =>
      require(w > 0 && h > 0 && w.toLong * h <= (1 << 24), s"bad dims ${w}x$h")
    }
    val be = opts.bigEndian
    val spp = if (opts.gray) 1 else 3
    val photo = if (opts.gray) (if (opts.whiteIsZero) 0 else 1) else 2
    // pass 1: per-page strips + layout sizes
    val pageStrips = pages.map { case (width, height, px) =>
      val rps = math.max(1, math.min(opts.rowsPerStrip, height))
      val nStrips = (height + rps - 1) / rps
      val rowBytes = width * spp
      val usePred = opts.predictor && opts.compression != 1
      val strips = Array.tabulate(nStrips) { s =>
        val rows = math.min(rps, height - s * rps)
        val raw = new Array[Byte](rows * rowBytes)
        var r = 0
        while (r < rows) {
          val y = s * rps + r
          var x = 0
          while (x < width) {
            val c = px(x, y)
            if (spp == 3) {
              raw(r * rowBytes + 3 * x) = (c >>> 16).toByte
              raw(r * rowBytes + 3 * x + 1) = (c >>> 8).toByte
              raw(r * rowBytes + 3 * x + 2) = c.toByte
            } else {
              val g0 = (c >>> 16) & 0xff
              raw(r * rowBytes + x) =
                (if (photo == 0) 255 - g0 else g0).toByte
            }
            x += 1
          }
          r += 1
        }
        if (usePred) {
          var r2 = rows - 1
          while (r2 >= 0) {
            var i = (r2 + 1) * rowBytes - 1
            while (i >= r2 * rowBytes + spp) {
              raw(i) = (raw(i) - raw(i - spp)).toByte
              i -= 1
            }
            r2 -= 1
          }
        }
        opts.compression match {
          case 1 => raw
          case 32773 => packBits(raw)
          case _ => lzwEncode(raw)
        }
      }
      (rps, strips)
    }
    // pass 2: emit — header | per page (strips | aux arrays | IFD)
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit =
      if (be) { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
      else { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit =
      if (be) { w16(((v >> 16) & 0xffff).toInt); w16((v & 0xffff).toInt) }
      else { w16((v & 0xffff).toInt); w16(((v >> 16) & 0xffff).toInt) }
    out.write(if (be) 'M' else 'I'); out.write(if (be) 'M' else 'I')
    w16(42)
    // layout math for every page up front so next-IFD pointers are known
    val usePred = opts.predictor && opts.compression != 1
    var pos = 8L
    val layouts = pages.indices.map { pi =>
      val (rps, strips) = pageStrips(pi)
      val nStrips = strips.length
      val nEntries = 9 + (if (usePred) 1 else 0)
      val stripOffsets = new Array[Long](nStrips)
      var s = 0
      while (s < nStrips) { stripOffsets(s) = pos; pos += strips(s).length; s += 1 }
      val bpsArrayAt = pos
      if (spp == 3) pos += 6
      val offArrayAt = pos
      if (nStrips > 1) pos += 4L * nStrips
      val cntArrayAt = pos
      if (nStrips > 1) pos += 4L * nStrips
      val ifdAt = pos
      pos += 2L + 12L * nEntries + 4L
      (rps, strips, stripOffsets, bpsArrayAt, offArrayAt, cntArrayAt, ifdAt)
    }
    w32(layouts.head._7) // first-IFD pointer
    pages.indices.foreach { pi =>
      val (width, height, _) = pages(pi)
      val (rps, strips, stripOffsets, bpsArrayAt, offArrayAt, cntArrayAt, _) =
        layouts(pi)
      val nStrips = strips.length
      var s = 0
      while (s < nStrips) { out.write(strips(s)); s += 1 }
      if (spp == 3) { w16(8); w16(8); w16(8) }
      if (nStrips > 1) {
        var i = 0; while (i < nStrips) { w32(stripOffsets(i)); i += 1 }
        i = 0; while (i < nStrips) { w32(strips(i).length.toLong); i += 1 }
      }
      // IFD: ascending tags
      final case class Entry(tag: Int, typ: Int, cnt: Int, value: Long)
      val entries = scala.collection.mutable.ArrayBuffer[Entry]()
      entries += Entry(256, 4, 1, width.toLong)
      entries += Entry(257, 4, 1, height.toLong)
      if (spp == 3) entries += Entry(258, 3, 3, bpsArrayAt)
      else entries += Entry(258, 3, 1, 8L)
      entries += Entry(259, 3, 1, opts.compression.toLong)
      entries += Entry(262, 3, 1, photo.toLong)
      entries += Entry(273, 4, nStrips,
        if (nStrips > 1) offArrayAt else stripOffsets(0))
      entries += Entry(277, 3, 1, spp.toLong)
      entries += Entry(278, 4, 1, rps.toLong)
      entries += Entry(279, 4, nStrips,
        if (nStrips > 1) cntArrayAt else strips(0).length.toLong)
      if (usePred) entries += Entry(317, 3, 1, 2L)
      w16(entries.length)
      entries.foreach { en =>
        w16(en.tag); w16(en.typ); w32(en.cnt.toLong)
        if (en.typ == 3 && en.cnt == 1) { w16(en.value.toInt); w16(0) }
        else w32(en.value)
      }
      w32(if (pi + 1 < pages.length) layouts(pi + 1)._7 else 0L)
    }
    out.toByteArray
  }

  private def packBits(raw: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    val n = raw.length
    while (i < n) {
      // find run length at i
      var run = 1
      while (i + run < n && run < 128 && raw(i + run) == raw(i)) run += 1
      if (run >= 2) {
        out.write(1 - run); out.write(raw(i)); i += run
      } else {
        // literal run until the next >=3 repeat (2-byte repeats aren't
        // worth breaking a literal for)
        var j = i + 1
        var lit = 1
        while (j < n && lit < 128 &&
               !(j + 2 < n && raw(j) == raw(j + 1) && raw(j) == raw(j + 2))) {
          j += 1; lit += 1
        }
        out.write(lit - 1)
        out.write(raw, i, lit)
        i += lit
      }
    }
    out.toByteArray
  }

  private def lzwEncode(raw: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nb = 0
    var width = 9
    def put(code: Int): Unit = {
      acc = (acc << width) | code; nb += width
      while (nb >= 8) { out.write(((acc >> (nb - 8)) & 0xff).toInt); nb -= 8 }
    }
    val table = new java.util.HashMap[Long, Integer]()
    var next = 258
    def reset(): Unit = { table.clear(); next = 258; width = 9 }
    put(256) // Clear
    reset()
    var prev = -1 // current prefix code
    var i = 0
    while (i < raw.length) {
      val c = raw(i) & 0xff
      if (prev == -1) prev = c
      else {
        val key = (prev.toLong << 8) | c
        val hit = table.get(key)
        if (hit != null) prev = hit.intValue()
        else {
          put(prev)
          if (next < 4096) { table.put(key, next); next += 1 }
          // early change, lag-compensated: the decoder's table is one
          // entry behind the encoder's at each read, so the encoder
          // bumps at 2^w where the decoder bumps at 2^w - 1 — both
          // sides then widen before the same emitted code
          if (next == (1 << width) && width < 12) width += 1
          if (next >= 4094) { put(256); reset() }
          prev = c
        }
      }
      i += 1
    }
    if (prev != -1) put(prev)
    if (next == (1 << width) - 1 && width < 12) width += 1
    put(257) // EOI
    if (nb > 0) out.write(((acc << (8 - nb)) & 0xff).toInt)
    out.toByteArray
  }
}
