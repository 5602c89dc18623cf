package graft.functions

/** Pure-JVM GIF codec — the palette-image layer behind [[ImageCodec]]
  * (GIF87a/89a are a steady share of crawled corpora; until this landed
  * the engine could census GIF headers but not decode pixels, so the
  * perceptual-dedup suite silently routed them to rejects).
  *
  * Decoder: logical screen descriptor, global/local color tables,
  * extension-block skip (GCE/comment/application), the FIRST image
  * descriptor (static fixtures; animation frames after the first are
  * ignored), 4-pass interlace, and full LZW decompression (variable
  * code width 3–12 bits, LSB-first packing, CLEAR/END codes, 4096-entry
  * dictionary per GIF89a Appendix F). Corrupt/truncated payloads return
  * None — the rejects side-channel contract every codec here shares.
  *
  * Encoder: 256-entry grayscale palette + the classic "uncompressed
  * GIF" emission — every pixel a literal 9-bit code with a CLEAR
  * emitted before the decoder's dictionary would force a width growth.
  * Gray content (all the twin fixtures) round-trips EXACTLY, which
  * keeps the near-dup gate on exact-grid semantics like PNG/BMP.
  */
object GifCodec {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)

  // ------------------------------------------------------------ decoder

  /** Decode the first frame of a GIF to an RGB raster; None on
    * non-GIF/corrupt/truncated input. */
  def decodePixels(b: Array[Byte]): Option[ImageCodec.ImagePixels] =
    try decodeImpl(b, all = false).flatMap(_.headOption)
    catch {
      case _: IndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }

  /** Decode EVERY frame of an animated GIF — the frame-sampling entry
    * point (the AVI-frame-extraction twin for the animation format
    * crawls actually contain). Full-frame descriptors only (left=0,
    * top=0, frame dims == screen dims): partial-update animations
    * return None rather than silently compositing wrong. */
  def decodeFrames(b: Array[Byte]): Option[Seq[ImageCodec.ImagePixels]] =
    try decodeImpl(b, all = true)
    catch {
      case _: IndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }

  private def decodeImpl(b: Array[Byte], all: Boolean)
      : Option[Seq[ImageCodec.ImagePixels]] = {
    if (b.length < 13) return None
    val sig = new String(b, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val sw = le16(b, 6); val sh = le16(b, 8)
    if (sw <= 0 || sh <= 0 || sw.toLong * sh * 3 > Int.MaxValue) return None
    val packed = u8(b, 10)
    var i = 13
    var gct: Array[Int] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      gct = readPalette(b, i, n)
      i += 3 * n
    }
    val frames = scala.collection.mutable.ArrayBuffer[ImageCodec.ImagePixels]()
    // block walk over the image descriptors (first only, or all)
    while (i < b.length) {
      u8(b, i) match {
        case 0x21 => // extension: label + sub-blocks
          i += 2
          var len = u8(b, i)
          while (len != 0) { i += 1 + len; len = u8(b, i) }
          i += 1
        case 0x2c => // image descriptor
          val left = le16(b, i + 1); val top = le16(b, i + 3)
          val iw = le16(b, i + 5); val ih = le16(b, i + 7)
          val ipacked = u8(b, i + 9)
          if (iw <= 0 || ih <= 0 || iw.toLong * ih * 3 > Int.MaxValue) return None
          // multi-frame mode requires full-frame updates (no compositing)
          if (all && (left != 0 || top != 0 || iw != sw || ih != sh)) return None
          i += 10
          var pal = gct
          if ((ipacked & 0x80) != 0) {
            val n = 2 << (ipacked & 7)
            pal = readPalette(b, i, n)
            i += 3 * n
          }
          if (pal == null) return None
          val interlaced = (ipacked & 0x40) != 0
          val minCode = u8(b, i); i += 1
          if (minCode < 2 || minCode > 11) return None
          // concatenate the data sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          var len = u8(b, i)
          while (len != 0) {
            data.write(b, i + 1, len)
            i += 1 + len
            len = u8(b, i)
          }
          i += 1 // block terminator
          val idx = lzwDecode(data.toByteArray, minCode, iw * ih)
          if (idx == null) return None
          val out = new Array[Byte](iw * ih * 3)
          val rowOrder = if (interlaced) interlaceRows(ih) else null
          var y = 0
          while (y < ih) {
            val destY = if (rowOrder == null) y else rowOrder(y)
            var x = 0
            while (x < iw) {
              val c = idx(y * iw + x) & 0xff
              val rgb = if (c < pal.length) pal(c) else 0
              val o = (destY * iw + x) * 3
              out(o) = (rgb >>> 16).toByte
              out(o + 1) = (rgb >>> 8).toByte
              out(o + 2) = rgb.toByte
              x += 1
            }
            y += 1
          }
          frames += ImageCodec.ImagePixels("gif", iw, ih, out)
          if (!all) return Some(frames.toSeq)
        case 0x3b => // trailer
          return if (frames.nonEmpty) Some(frames.toSeq) else None
        case _ => return None
      }
    }
    if (frames.nonEmpty) Some(frames.toSeq) else None
  }

  private def readPalette(b: Array[Byte], at: Int, n: Int): Array[Int] = {
    val p = new Array[Int](n)
    var k = 0
    while (k < n) {
      p(k) = (u8(b, at + 3 * k) << 16) | (u8(b, at + 3 * k + 1) << 8) |
        u8(b, at + 3 * k + 2)
      k += 1
    }
    p
  }

  /** The source rows of an interlaced image in storage order: passes at
    * strides 8/8/4/2 starting from rows 0/4/2/1. `result(k)` is the
    * destination row of the k-th stored row. */
  private def interlaceRows(h: Int): Array[Int] = {
    val rows = new Array[Int](h)
    var k = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
      var y = start
      while (y < h) { rows(k) = y; k += 1; y += step }
    }
    rows
  }

  /** GIF-flavor LZW: LSB-first bit packing, variable code width starting
    * at minCode+1, CLEAR resets the dictionary, END stops; returns
    * exactly `expected` pixel indices or null on malformed streams. */
  private def lzwDecode(d: Array[Byte], minCode: Int, expected: Int): Array[Byte] = {
    val clear = 1 << minCode
    val end = clear + 1
    val out = new Array[Byte](expected)
    var outPos = 0
    // dictionary as (prefix link, tail byte); entries < clear are roots
    val prefix = new Array[Int](4096)
    val tail = new Array[Byte](4096)
    var dictSize = end + 1
    var codeWidth = minCode + 1
    var prev = -1
    var acc = 0
    var accBits = 0
    var p = 0
    val tmp = new Array[Byte](4096)
    def emit(code: Int): Boolean = { // expand a code to out; false on overflow
      var c = code
      var n = 0
      while (c >= clear) { // walk links (entries <= end never link)
        if (n >= 4096) return false
        tmp(n) = tail(c); n += 1
        c = prefix(c)
      }
      if (outPos + n + 1 > expected) return false
      out(outPos) = c.toByte; outPos += 1
      var k = n - 1
      while (k >= 0) { out(outPos) = tmp(k); outPos += 1; k -= 1 }
      true
    }
    def firstByte(code: Int): Byte = {
      var c = code
      while (c >= clear) c = prefix(c)
      c.toByte
    }
    while (p < d.length || accBits >= codeWidth) {
      while (accBits < codeWidth && p < d.length) {
        acc |= (d(p) & 0xff) << accBits
        accBits += 8
        p += 1
      }
      if (accBits < codeWidth) return null // truncated stream
      val code = acc & ((1 << codeWidth) - 1)
      acc >>>= codeWidth
      accBits -= codeWidth
      if (code == clear) {
        dictSize = end + 1
        codeWidth = minCode + 1
        prev = -1
      } else if (code == end) {
        return if (outPos == expected) out else null
      } else if (prev == -1) {
        if (code >= clear) return null // first code must be a root
        if (!emit(code)) return null
        prev = code
      } else {
        if (code > dictSize || code == end) return null
        // add the new entry FIRST: in the KwKwK case (code == dictSize)
        // the code refers to the entry being defined right now
        if (dictSize < 4096) {
          prefix(dictSize) = prev
          tail(dictSize) = firstByte(if (code == dictSize) prev else code)
          dictSize += 1
          if (dictSize == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
        } else if (code == dictSize) return null
        if (!emit(code)) return null
        prev = code
      }
      if (outPos == expected) return out // some encoders omit END
    }
    if (outPos == expected) out else null
  }

  // ------------------------------------------------------------ encoder

  /** One image descriptor + uncompressed-LZW frame emission — shared by
    * the static and animated writers. */
  private def emitFrame(out: java.io.ByteArrayOutputStream,
                        width: Int, height: Int,
                        px: (Int, Int) => Int): Unit = {
    def le16w(v: Int): Unit = { out.write(v & 0xff); out.write(v >>> 8) }
    out.write(0x2c) // image descriptor
    le16w(0); le16w(0); le16w(width); le16w(height)
    out.write(0) // no LCT, not interlaced
    out.write(8) // LZW min code size
    val clear = 256
    // literal codes at fixed 9-bit width; CLEAR every 250 codes keeps
    // the decoder's dictionary below the 512-entry width-growth point
    val body = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var accBits = 0
    def put(code: Int): Unit = {
      acc |= code.toLong << accBits
      accBits += 9
      while (accBits >= 8) {
        body.write((acc & 0xff).toInt)
        acc >>>= 8
        accBits -= 8
      }
    }
    put(clear)
    var since = 0
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        if (since == 250) { put(clear); since = 0 }
        val c = px(x, y)
        val r = (c >>> 16) & 0xff; val g = (c >>> 8) & 0xff; val b = c & 0xff
        val gray =
          if (r == g && g == b) r
          else math.min(255, math.round(0.299 * r + 0.587 * g + 0.114 * b).toInt)
        put(gray)
        since += 1
        x += 1
      }
      y += 1
    }
    put(clear + 1) // END
    if (accBits > 0) body.write((acc & 0xff).toInt)
    val data = body.toByteArray
    var o = 0
    while (o < data.length) { // 255-byte sub-blocks
      val n = math.min(255, data.length - o)
      out.write(n)
      out.write(data, o, n)
      o += n
    }
    out.write(0) // block terminator
  }

  private def header(out: java.io.ByteArrayOutputStream,
                     width: Int, height: Int): Unit = {
    out.write("GIF89a".getBytes("US-ASCII"))
    def le16w(v: Int): Unit = { out.write(v & 0xff); out.write(v >>> 8) }
    le16w(width); le16w(height)
    out.write(0xf7) // GCT present, 8 bits/channel, 256 entries
    out.write(0); out.write(0)
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
  }

  /** Render `px(x, y) -> 0xRRGGBB` to a GIF89a with a 256-entry GRAY
    * palette (index i = (i,i,i)): gray content round-trips exactly.
    * Non-gray input maps through its luma-rounded gray. Uses literal
    * 9-bit codes with periodic CLEARs (the classic uncompressed-GIF
    * device), so the LZW layer is trivially correct and deterministic. */
  def writeGifPixels(width: Int, height: Int,
                     px: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val out = new java.io.ByteArrayOutputStream()
    header(out, width, height)
    emitFrame(out, width, height, px)
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** ANIMATED GIF89a: NETSCAPE2.0 loop extension + per-frame Graphic
    * Control Extension (delay in centiseconds) + frame raster. The
    * fixture source for the animation census. */
  def writeGifAnimated(width: Int, height: Int, frames: Int,
                       delayCs: Int, loopCount: Int,
                       px: (Int, Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0 && frames > 0, "bad animation shape")
    val out = new java.io.ByteArrayOutputStream()
    header(out, width, height)
    // NETSCAPE2.0 application extension: loop count (0 = forever)
    out.write(0x21); out.write(0xff); out.write(11)
    out.write("NETSCAPE2.0".getBytes("US-ASCII"))
    out.write(3); out.write(1)
    out.write(loopCount & 0xff); out.write((loopCount >> 8) & 0xff)
    out.write(0)
    var f = 0
    while (f < frames) {
      // Graphic Control Extension: delay + no transparency
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write(0)
      out.write(delayCs & 0xff); out.write((delayCs >> 8) & 0xff)
      out.write(0); out.write(0)
      val ff = f
      emitFrame(out, width, height, (x, y) => px(ff, x, y))
      f += 1
    }
    out.write(0x3b)
    out.toByteArray
  }

  final case class GifAnim(nFrames: Int, totalDelayCs: Long, loopCount: Int)

  /** ANIMATION CENSUS: frame count, total duration (centiseconds,
    * summed over Graphic Control Extensions), and the NETSCAPE loop
    * count — the animated-GIF governance readout (frame-sampling
    * budgets, short-loop spam detection) without decoding any frame
    * raster beyond the block walk. */
  def animMeta(b: Array[Byte]): Option[GifAnim] =
    try {
      if (b.length < 13) return None
      val sig = new String(b, 0, 6, "US-ASCII")
      if (sig != "GIF87a" && sig != "GIF89a") return None
      val packed = u8(b, 10)
      var i = 13
      if ((packed & 0x80) != 0) i += 3 * (2 << (packed & 7))
      var frames = 0
      var delay = 0L
      var loop = -1
      var pendingDelay = 0L
      while (i < b.length) {
        u8(b, i) match {
          case 0x21 =>
            val label = u8(b, i + 1)
            if (label == 0xf9 && i + 4 < b.length) // GCE: delay at +4
              pendingDelay = le16(b, i + 4).toLong
            // 21 FF 0B "NETSCAPE2.0" 03 01 <loop lo> <loop hi> 00
            if (label == 0xff && i + 17 < b.length &&
                new String(b, i + 3, 11, "US-ASCII") == "NETSCAPE2.0")
              loop = le16(b, i + 16)
            i += 2
            var len = u8(b, i)
            while (len != 0) { i += 1 + len; len = u8(b, i) }
            i += 1
          case 0x2c =>
            frames += 1
            delay += pendingDelay
            pendingDelay = 0L
            val ipacked = u8(b, i + 9)
            i += 10
            if ((ipacked & 0x80) != 0) i += 3 * (2 << (ipacked & 7))
            i += 1 // LZW min code size
            var len = u8(b, i)
            while (len != 0) { i += 1 + len; len = u8(b, i) }
            i += 1
          case 0x3b =>
            return if (frames > 0) Some(GifAnim(frames, delay, loop)) else None
          case _ => return None
        }
      }
      if (frames > 0) Some(GifAnim(frames, delay, loop)) else None
    } catch {
      case _: IndexOutOfBoundsException => None
    }
}
