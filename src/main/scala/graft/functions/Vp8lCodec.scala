package graft.functions

/** WebP VP8L (lossless) bitstream codec — pure JVM, per the public WebP
  * Lossless Bitstream Specification (RFC 9649): LSB-first bit stream,
  * canonical prefix codes (simple 1–2-symbol and full code-length-code
  * forms), meta prefix groups, color cache, LZ77 backward references
  * with the 120-entry neighbor distance map, and all four transforms
  * (predictor, color, subtract-green, color-indexing with pixel
  * bundling). This upgrades WebP from census-only ([[WebpCodec]]) to a
  * real pixel layer like PNG/BMP/JPEG/GIF: lossless, so cross-format
  * near-dup twins keep the exact-grid semantics.
  *
  * The encoder emits a spec-legal subset chosen to exercise EVERY
  * decoder path (each transform, cache on/off, mapped and unmapped
  * distances, simple and full prefix codes, meta groups), so the
  * ScalaCheck round-trip laws cover the code the decoder runs on real
  * input. Hostile payloads: every read is bounds-checked and incomplete
  * prefix codes are rejected — corrupt input returns None, never
  * throws. Decode is capped at 2^24 pixels (a 64 MiB ARGB raster) so a
  * hostile 16383×16383 header cannot balloon an executor task. */
object Vp8lCodec {

  private final class DecodeError extends RuntimeException

  // kCodeLengthCodeOrder (spec §"prefix code lengths")
  private val ClcOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** The spec's distance-mapping table: dist_code 1..120 → (dx, dy)
    * with dist = dx + dy·width (dx > 0 = left). */
  private val DistMap: Array[(Int, Int)] = Array(
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7))

  private def subSize(size: Int, bits: Int): Int =
    (size + (1 << bits) - 1) >> bits

  // ---------------------------------------------------------- bit I/O

  private final class BitReader(b: Array[Byte], start: Int) {
    private var pos = start
    private var bit = 0
    def readBit(): Int = {
      if (pos >= b.length) throw new DecodeError
      val v = (b(pos) >> bit) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      v
    }
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v |= readBit() << i; i += 1 }
      v
    }
  }

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var bit = 0
    def writeBit(v: Int): Unit = {
      cur |= (v & 1) << bit
      bit += 1
      if (bit == 8) { out.write(cur); cur = 0; bit = 0 }
    }
    def writeBits(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) { writeBit((v >> i) & 1); i += 1 }
    }
    /** Prefix codes are written MSB of the code first. */
    def writeCode(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { writeBit((code >> i) & 1); i -= 1 }
    }
    def toBytes: Array[Byte] = {
      if (bit > 0) { out.write(cur); cur = 0; bit = 0 }
      out.toByteArray
    }
  }

  // ------------------------------------------------ prefix code tables

  /** Canonical prefix decoder: DEFLATE-style canonical assignment
    * (codes in symbol order within each length), bits read MSB-first.
    * A single used symbol is a 0-bit code. Incomplete or oversubscribed
    * codes are rejected. */
  private final class PrefixCode(lengths: Array[Int]) {
    private val maxLen = if (lengths.isEmpty) 0 else lengths.max
    private val used = lengths.count(_ > 0)
    val singleSymbol: Int = if (used == 1) lengths.indexWhere(_ > 0) else -1
    private val count = new Array[Int](maxLen + 1)
    private val firstCode = new Array[Int](maxLen + 2)
    private val offset = new Array[Int](maxLen + 2)
    private val sorted = new Array[Int](used)
    if (used > 1) {
      lengths.foreach(l => if (l > 0) count(l) += 1)
      var code = 0
      var kraft = 0L
      for (l <- 1 to maxLen) {
        firstCode(l) = code
        offset(l + 1) = offset(l) + count(l)
        code = (code + count(l)) << 1
        kraft += count(l).toLong << (maxLen - l)
      }
      if (kraft != (1L << maxLen)) throw new DecodeError // incomplete
      val fill = new Array[Int](maxLen + 1)
      for (s <- lengths.indices) {
        val l = lengths(s)
        if (l > 0) { sorted(offset(l) + fill(l)) = s; fill(l) += 1 }
      }
    } else if (used == 0) throw new DecodeError
    def read(br: BitReader): Int = {
      if (singleSymbol >= 0) return singleSymbol
      var acc = 0
      var l = 1
      while (l <= maxLen) {
        acc = (acc << 1) | br.readBit()
        val idx = acc - firstCode(l)
        if (idx >= 0 && idx < count(l)) return sorted(offset(l) + idx)
        l += 1
      }
      throw new DecodeError
    }
  }

  /** Simple 2-symbol code read as listed (bit 0 → first symbol). */
  private final class SimplePair(s0: Int, s1: Int) {
    def read(br: BitReader): Int = if (br.readBit() == 0) s0 else s1
  }

  private sealed trait Code { def read(br: BitReader): Int }
  private final case class Full(p: PrefixCode) extends Code {
    def read(br: BitReader): Int = p.read(br)
  }
  private final case class Single(s: Int) extends Code {
    def read(br: BitReader): Int = s
  }
  private final case class Pair(p: SimplePair) extends Code {
    def read(br: BitReader): Int = p.read(br)
  }

  private def readCode(br: BitReader, alphabet: Int): Code =
    if (br.readBit() == 1) { // simple
      val numSym = br.readBit() + 1
      val first8 = br.readBit() == 1
      val s0 = br.readBits(if (first8) 8 else 1)
      if (s0 >= alphabet) throw new DecodeError
      if (numSym == 1) Single(s0)
      else {
        val s1 = br.readBits(8)
        if (s1 >= alphabet) throw new DecodeError
        Pair(new SimplePair(s0, s1))
      }
    } else {
      val numClc = 4 + br.readBits(4)
      val clcLen = new Array[Int](19)
      for (i <- 0 until numClc) clcLen(ClcOrder(i)) = br.readBits(3)
      val clc = new PrefixCode(clcLen)
      val lengths = new Array[Int](alphabet)
      var maxSymbol =
        if (br.readBit() == 1) {
          val nbits = 2 + 2 * br.readBits(3)
          2 + br.readBits(nbits)
        } else alphabet
      var symbol = 0
      var prevLen = 8
      while (symbol < alphabet && maxSymbol > 0) {
        maxSymbol -= 1
        val cl = if (clc.singleSymbol >= 0) clc.singleSymbol else clc.read(br)
        if (cl < 16) {
          lengths(symbol) = cl
          symbol += 1
          if (cl != 0) prevLen = cl
        } else {
          val (extra, base, usePrev) = cl match {
            case 16 => (2, 3, true)
            case 17 => (3, 3, false)
            case _ => (7, 11, false)
          }
          var repeat = br.readBits(extra) + base
          if (symbol + repeat > alphabet) throw new DecodeError
          val fillLen = if (usePrev) prevLen else 0
          while (repeat > 0) {
            lengths(symbol) = fillLen; symbol += 1; repeat -= 1
          }
        }
      }
      val p = new PrefixCode(lengths)
      if (p.singleSymbol >= 0) Single(p.singleSymbol) else Full(p)
    }

  // --------------------------------------------------------- transforms

  private sealed trait Transform { def appliedWidth: Int }
  private final case class Predictor(bits: Int, tiles: Array[Int],
                                     appliedWidth: Int) extends Transform
  private final case class ColorTx(bits: Int, tiles: Array[Int],
                                   appliedWidth: Int) extends Transform
  private final case class SubGreen(appliedWidth: Int) extends Transform
  private final case class Palette(table: Array[Int], widthBits: Int,
                                   appliedWidth: Int) extends Transform

  private def avg2(a: Int, b: Int): Int =
    (((a ^ b) & 0xfefefefe) >>> 1) + (a & b)

  private def clip255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private def addPixels(a: Int, b: Int): Int = {
    val rb = ((a & 0x00ff00ff) + (b & 0x00ff00ff)) & 0x00ff00ff
    val ag = ((a & 0xff00ff00) + (b & 0xff00ff00)) & 0xff00ff00
    rb | ag
  }
  /** Per-channel mod-256 subtraction. Channels must be isolated: a
    * packed two-channel subtract lets a low-channel borrow corrupt the
    * channel above it (unlike addition, where the masked carry is
    * harmless). */
  private def subPixels(a: Int, b: Int): Int = {
    def s(sh: Int): Int = (((a >>> sh) & 0xff) - ((b >>> sh) & 0xff)) & 0xff
    (s(24) << 24) | (s(16) << 16) | (s(8) << 8) | s(0)
  }

  private def select(t: Int, l: Int, tl: Int): Int = {
    def sub3(a: Int, b: Int, c: Int): Int =
      math.abs(b - c) - math.abs(a - c)
    val d = sub3(t >>> 24, l >>> 24, tl >>> 24) +
      sub3((t >>> 16) & 0xff, (l >>> 16) & 0xff, (tl >>> 16) & 0xff) +
      sub3((t >>> 8) & 0xff, (l >>> 8) & 0xff, (tl >>> 8) & 0xff) +
      sub3(t & 0xff, l & 0xff, tl & 0xff)
    if (d <= 0) t else l
  }

  private def clampAddSubFull(l: Int, t: Int, tl: Int): Int = {
    def c(sh: Int): Int = clip255(((l >>> sh) & 0xff) + ((t >>> sh) & 0xff) -
      ((tl >>> sh) & 0xff))
    (c(24) << 24) | (c(16) << 16) | (c(8) << 8) | c(0)
  }

  private def clampAddSubHalf(l: Int, t: Int, tl: Int): Int = {
    val ave = avg2(l, t)
    def c(sh: Int): Int = {
      val a = (ave >>> sh) & 0xff
      clip255(a + (a - ((tl >>> sh) & 0xff)) / 2)
    }
    (c(24) << 24) | (c(16) << 16) | (c(8) << 8) | c(0)
  }

  private def predict(mode: Int, l: Int, t: Int, tl: Int, tr: Int): Int =
    mode match {
      case 0 => 0xff000000
      case 1 => l
      case 2 => t
      case 3 => tr
      case 4 => tl
      case 5 => avg2(avg2(l, tr), t)
      case 6 => avg2(l, tl)
      case 7 => avg2(l, t)
      case 8 => avg2(tl, t)
      case 9 => avg2(t, tr)
      case 10 => avg2(avg2(l, tl), avg2(t, tr))
      case 11 => select(t, l, tl)
      case 12 => clampAddSubFull(l, t, tl)
      case 13 => clampAddSubHalf(l, t, tl)
      case _ => throw new DecodeError
    }

  /** ColorTransformDelta: signed-byte product, arithmetic >> 5. */
  private def ctDelta(t: Int, c: Int): Int = (t.toByte * c.toByte) >> 5

  // ----------------------------------------------------------- decoder

  /** Decode a VP8L chunk payload (starting at the 0x2f signature) to
    * (width, height, row-major ARGB). None on anything malformed. */
  def decodeArgb(b: Array[Byte]): Option[(Int, Int, Array[Int])] =
    try {
      if (b.length < 5 || (b(0) & 0xff) != 0x2f) return None
      val br = new BitReader(b, 1)
      val w = br.readBits(14) + 1
      val h = br.readBits(14) + 1
      br.readBit() // alpha hint
      if (br.readBits(3) != 0) return None // version must be 0
      if (w.toLong * h > (1L << 24)) return None // hostile-dims cap
      // transforms (level 0 only); color-indexing shrinks the running
      // width every LATER read (and the main image) decodes at
      var xsize = w
      var transforms = List.empty[Transform]
      var seen = Set.empty[Int]
      while (br.readBit() == 1) {
        val ttype = br.readBits(2)
        if (seen(ttype)) throw new DecodeError // each at most once
        seen += ttype
        ttype match {
          case 0 =>
            val bits = br.readBits(3) + 2
            val tiles = decodeStream(br, subSize(xsize, bits),
              subSize(h, bits))
            transforms ::= Predictor(bits, tiles, xsize)
          case 1 =>
            val bits = br.readBits(3) + 2
            val tiles = decodeStream(br, subSize(xsize, bits),
              subSize(h, bits))
            transforms ::= ColorTx(bits, tiles, xsize)
          case 2 =>
            transforms ::= SubGreen(xsize)
          case _ =>
            val size = br.readBits(8) + 1
            val deltas = decodeStream(br, size, 1)
            val table = new Array[Int](size)
            var acc = 0
            for (i <- 0 until size) {
              acc = addPixels(acc, deltas(i)); table(i) = acc
            }
            val widthBits =
              if (size <= 2) 3 else if (size <= 4) 2
              else if (size <= 16) 1 else 0
            transforms ::= Palette(table, widthBits, xsize)
            xsize = subSize(xsize, widthBits)
        }
      }
      var pixels = decodeMain(br, xsize, h)
      var width = xsize
      // inverse transforms, reverse read order (transforms is already
      // reversed by the :: pushes)
      for (t <- transforms) {
        t match {
          case SubGreen(_) =>
            var i = 0
            while (i < pixels.length) {
              val p = pixels(i)
              val g = (p >>> 8) & 0xff
              val r = (((p >>> 16) & 0xff) + g) & 0xff
              val bl = ((p & 0xff) + g) & 0xff
              pixels(i) = (p & 0xff00ff00) | (r << 16) | bl
              i += 1
            }
          case Predictor(bits, tiles, aw) =>
            if (aw != width) throw new DecodeError
            val tpr = subSize(aw, bits)
            var i = 0
            var y = 0
            while (y < h) {
              var x = 0
              while (x < aw) {
                val pred =
                  if (y == 0 && x == 0) 0xff000000
                  else if (y == 0) pixels(i - 1)
                  else if (x == 0) pixels(i - aw)
                  else {
                    val mode =
                      (tiles(tpr * (y >> bits) + (x >> bits)) >>> 8) & 0xff
                    predict(mode, pixels(i - 1), pixels(i - aw),
                      pixels(i - aw - 1), pixels(i - aw + 1))
                  }
                pixels(i) = addPixels(pixels(i), pred)
                i += 1; x += 1
              }
              y += 1
            }
          case ColorTx(bits, tiles, aw) =>
            if (aw != width) throw new DecodeError
            val tpr = subSize(aw, bits)
            var i = 0
            var y = 0
            while (y < h) {
              var x = 0
              while (x < aw) {
                val e = tiles(tpr * (y >> bits) + (x >> bits))
                val g2r = e & 0xff
                val g2b = (e >>> 8) & 0xff
                val r2b = (e >>> 16) & 0xff
                val p = pixels(i)
                val g = (p >>> 8) & 0xff
                val r = (((p >>> 16) & 0xff) + ctDelta(g2r, g)) & 0xff
                val bl = ((p & 0xff) + ctDelta(g2b, g) + ctDelta(r2b, r)) & 0xff
                pixels(i) = (p & 0xff00ff00) | (r << 16) | bl
                i += 1; x += 1
              }
              y += 1
            }
          case Palette(table, widthBits, aw) =>
            val out = new Array[Int](aw * h)
            val xsub = 1 << widthBits
            val bpp = 8 >> widthBits
            val mask = (1 << bpp) - 1
            var y = 0
            while (y < h) {
              var x = 0
              while (x < aw) {
                val packed = pixels(y * width + (x >> widthBits))
                val idx =
                  (((packed >>> 8) & 0xff) >> ((x & (xsub - 1)) * bpp)) & mask
                out(y * aw + x) = if (idx < table.length) table(idx) else 0
                x += 1
              }
              y += 1
            }
            pixels = out
            width = aw
        }
      }
      if (width != w) throw new DecodeError
      Some((w, h, pixels))
    } catch {
      case _: DecodeError => None
      case _: IndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }

  /** Entropy-coded sub-image (no transforms, no meta groups). */
  private def decodeStream(br: BitReader, w: Int, h: Int): Array[Int] =
    decodePixelStream(br, w, h, metaAllowed = false)._1

  private def decodeMain(br: BitReader, w: Int, h: Int): Array[Int] =
    decodePixelStream(br, w, h, metaAllowed = true)._1

  private def decodePixelStream(br: BitReader, w: Int, h: Int,
      metaAllowed: Boolean): (Array[Int], Int) = {
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 24)) throw new DecodeError
    val cacheBits = if (br.readBit() == 1) br.readBits(4) else 0
    if (cacheBits > 11) throw new DecodeError
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    var metaBits = 0
    var metaImage: Array[Int] = null
    var numGroups = 1
    if (metaAllowed && br.readBit() == 1) {
      metaBits = br.readBits(3) + 2
      metaImage = decodeStream(br, subSize(w, metaBits), subSize(h, metaBits))
      numGroups = metaImage.map(p => (p >>> 8) & 0xffff).max + 1
    }
    val greenAlpha = 256 + 24 + cacheSize
    val groups = Array.fill(numGroups) {
      val g = readCode(br, greenAlpha)
      val r = readCode(br, 256)
      val bl = readCode(br, 256)
      val a = readCode(br, 256)
      val d = readCode(br, 40)
      (g, r, bl, a, d)
    }
    val cache = new Array[Int](math.max(cacheSize, 1))
    def cacheInsert(p: Int): Unit =
      if (cacheSize > 0)
        cache((0x1e35a7bd * p) >>> (32 - cacheBits)) = p
    def prefixValue(sym: Int): Int =
      if (sym < 4) sym + 1
      else {
        val extra = (sym - 2) >> 1
        val base = (2 + (sym & 1)) << extra
        base + br.readBits(extra) + 1
      }
    val n = w * h
    val out = new Array[Int](n)
    val tilesPerRow = if (metaBits > 0) subSize(w, metaBits) else 0
    var pos = 0
    while (pos < n) {
      val grp =
        if (metaBits > 0) {
          val x = pos % w; val y = pos / w
          val m = metaImage(tilesPerRow * (y >> metaBits) + (x >> metaBits))
          (m >>> 8) & 0xffff
        } else 0
      val (gC, rC, bC, aC, dC) = groups(grp)
      val s = gC.read(br)
      if (s < 256) {
        val r = rC.read(br)
        val bl = bC.read(br)
        val a = aC.read(br)
        val p = (a << 24) | (r << 16) | (s << 8) | bl
        out(pos) = p
        cacheInsert(p)
        pos += 1
      } else if (s < 280) {
        val len = prefixValue(s - 256)
        val distCode = prefixValue(dC.read(br))
        val dist0 =
          if (distCode > 120) distCode - 120
          else {
            val (dx, dy) = DistMap(distCode - 1)
            math.max(1, dx + dy * w)
          }
        if (dist0 > pos || pos + len > n) throw new DecodeError
        var k = 0
        while (k < len) {
          val p = out(pos - dist0)
          out(pos) = p
          cacheInsert(p)
          pos += 1; k += 1
        }
      } else {
        val idx = s - 280
        if (idx >= cacheSize) throw new DecodeError
        out(pos) = cache(idx)
        pos += 1
      }
    }
    (out, cacheBits)
  }

  // ----------------------------------------------------------- encoder

  /** Encoder options — each flag routes the stream through a different
    * decoder path; defaults produce the plainest legal stream. Palette
    * requires ≤256 distinct colors and is exclusive with the other
    * transforms (the subset real encoders use). */
  final case class Vp8lOptions(subtractGreen: Boolean = false,
                               predictor: Boolean = false,
                               colorTransform: Boolean = false,
                               palette: Boolean = false,
                               cacheBits: Int = 0,
                               useLz77: Boolean = true,
                               mapDistances: Boolean = false,
                               metaBits: Int = 0)

  private val PredictorMode = 2 // "top" — exercises the tile machinery
  private val TileBits = 4
  private val CtElement = 0x00100c06 // r2b=0x10, g2b=0x0c, g2r=0x06

  def encode(w: Int, h: Int, argbIn: Array[Int],
             opts: Vp8lOptions = Vp8lOptions()): Array[Byte] = {
    require(w >= 1 && w <= 16384 && h >= 1 && h <= 16384 &&
      argbIn.length == w * h, "bad dims")
    require(opts.cacheBits >= 0 && opts.cacheBits <= 11, "bad cache")
    require(!(opts.palette &&
      (opts.subtractGreen || opts.predictor || opts.colorTransform)),
      "palette is exclusive with the pixel transforms")
    val bw = new BitWriter
    bw.writeBits(w - 1, 14)
    bw.writeBits(h - 1, 14)
    bw.writeBit(0) // alpha hint
    bw.writeBits(0, 3) // version
    var pixels = argbIn.clone()
    var width = w
    if (opts.palette) {
      val distinct = pixels.distinct
      require(distinct.length <= 256, "palette needs <=256 colors")
      val table = distinct.sorted
      val index = table.zipWithIndex.toMap
      bw.writeBit(1); bw.writeBits(3, 2) // COLOR_INDEXING
      bw.writeBits(table.length - 1, 8)
      val deltas = new Array[Int](table.length)
      var prev = 0
      for (i <- table.indices) {
        deltas(i) = subPixels(table(i), prev); prev = table(i)
      }
      encodeStream(bw, deltas, table.length, 1, Sub)
      val widthBits =
        if (table.length <= 2) 3 else if (table.length <= 4) 2
        else if (table.length <= 16) 1 else 0
      val xsub = 1 << widthBits
      val bpp = 8 >> widthBits
      val pw = subSize(w, widthBits)
      val packed = new Array[Int](pw * h)
      for (y <- 0 until h; x <- 0 until w) {
        val idx = index(pixels(y * w + x))
        val at = y * pw + (x >> widthBits)
        packed(at) |= idx << (8 + (x & (xsub - 1)) * bpp)
      }
      pixels = packed
      width = pw
    } else {
      if (opts.subtractGreen) {
        bw.writeBit(1); bw.writeBits(2, 2)
        var i = 0
        while (i < pixels.length) {
          val p = pixels(i)
          val g = (p >>> 8) & 0xff
          val r = (((p >>> 16) & 0xff) - g) & 0xff
          val bl = ((p & 0xff) - g) & 0xff
          pixels(i) = (p & 0xff00ff00) | (r << 16) | bl
          i += 1
        }
      }
      if (opts.colorTransform) {
        bw.writeBit(1); bw.writeBits(1, 2)
        bw.writeBits(TileBits - 2, 3)
        val tw = subSize(width, TileBits)
        val th = subSize(h, TileBits)
        encodeStream(bw, Array.fill(tw * th)(CtElement), tw, th, Sub)
        val g2r = CtElement & 0xff
        val g2b = (CtElement >>> 8) & 0xff
        val r2b = (CtElement >>> 16) & 0xff
        var i = 0
        while (i < pixels.length) {
          val p = pixels(i)
          val g = (p >>> 8) & 0xff
          val origR = (p >>> 16) & 0xff
          val r = (origR - ctDelta(g2r, g)) & 0xff
          val bl = ((p & 0xff) - ctDelta(g2b, g) - ctDelta(r2b, origR)) & 0xff
          pixels(i) = (p & 0xff00ff00) | (r << 16) | bl
          i += 1
        }
      }
      if (opts.predictor) {
        bw.writeBit(1); bw.writeBits(0, 2)
        bw.writeBits(TileBits - 2, 3)
        val tw = subSize(width, TileBits)
        val th = subSize(h, TileBits)
        encodeStream(bw, Array.fill(tw * th)(0xff000000 | (PredictorMode << 8)),
          tw, th, Sub)
        // residuals bottom-up so earlier pixels keep original values
        // until they have been used as this pixel's prediction context
        val res = new Array[Int](pixels.length)
        var i = pixels.length - 1
        while (i >= 0) {
          val y = i / width; val x = i % width
          val pred =
            if (y == 0 && x == 0) 0xff000000
            else if (y == 0) pixels(i - 1)
            else if (x == 0) pixels(i - width)
            else predict(PredictorMode, pixels(i - 1), pixels(i - width),
              pixels(i - width - 1), pixels(i - width + 1))
          res(i) = subPixels(pixels(i), pred)
          i -= 1
        }
        pixels = res
      }
    }
    bw.writeBit(0) // no more transforms
    encodeStream(bw, pixels, width, h, Main(opts))
    (Array(0x2f.toByte) ++ bw.toBytes)
  }

  private sealed trait StreamRole
  private case object Sub extends StreamRole
  private final case class Main(opts: Vp8lOptions) extends StreamRole

  private sealed trait Token
  private final case class Lit(p: Int) extends Token
  private final case class Cached(idx: Int) extends Token
  private final case class Copy(len: Int, dist: Int) extends Token

  /** Emit one entropy-coded image (sub-images use the plainest form:
    * no cache, no LZ77, single group). */
  private def encodeStream(bw: BitWriter, pixels: Array[Int], w: Int,
                           h: Int, role: StreamRole): Unit = {
    val (cacheBits, useLz77, mapDist, metaBits) = role match {
      case Sub => (0, false, false, 0)
      case Main(o) =>
        // meta grouping needs >=2 tiles so both parity groups exist
        // (the decoder sizes its group table from the meta image's max)
        val mb =
          if (o.metaBits > 0 &&
            subSize(w, o.metaBits).toLong * subSize(h, o.metaBits) >= 2)
            o.metaBits
          else 0
        (o.cacheBits, o.useLz77, o.mapDistances, mb)
    }
    if (cacheBits > 0) { bw.writeBit(1); bw.writeBits(cacheBits, 4) }
    else bw.writeBit(0)
    val tilesPerRow = if (metaBits > 0) subSize(w, metaBits) else 0
    val numGroups = if (metaBits > 0) 2 else 1
    role match {
      case Main(_) =>
        if (metaBits > 0) {
          bw.writeBit(1)
          bw.writeBits(metaBits - 2, 3)
          // tile-parity grouping: two real groups through the meta path
          val tw = tilesPerRow
          val th = subSize(h, metaBits)
          val meta = Array.tabulate(tw * th)(i =>
            (((i % tw) + (i / tw)) % 2) << 8)
          encodeStream(bw, meta, tw, th, Sub)
        } else bw.writeBit(0)
      case Sub => // sub-images never carry the meta bit
    }
    def groupOf(pos: Int): Int =
      if (metaBits > 0)
        (((pos % w) >> metaBits) + ((pos / w) >> metaBits)) % 2
      else 0
    // tokenize, mirroring the decoder's cache/copy state machine
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = new Array[Int](math.max(cacheSize, 1))
    def cacheIdx(p: Int): Int = (0x1e35a7bd * p) >>> (32 - cacheBits)
    val tokens = new Array[scala.collection.mutable.ArrayBuffer[Token]](numGroups)
    for (g <- 0 until numGroups)
      tokens(g) = scala.collection.mutable.ArrayBuffer.empty[Token]
    var pos = 0
    val n = pixels.length
    while (pos < n) {
      val g = groupOf(pos)
      if (useLz77 && pos > 0 && pixels(pos) == pixels(pos - 1)) {
        var len = 0
        while (pos + len < n && pixels(pos + len) == pixels(pos - 1) &&
          len < 4096) len += 1
        tokens(g) += Copy(len, 1)
        var k = 0
        while (k < len) {
          if (cacheSize > 0) cache(cacheIdx(pixels(pos))) = pixels(pos)
          pos += 1; k += 1
        }
      } else {
        val p = pixels(pos)
        if (cacheSize > 0 && cache(cacheIdx(p)) == p)
          tokens(g) += Cached(cacheIdx(p))
        else
          tokens(g) += Lit(p)
        if (cacheSize > 0) cache(cacheIdx(p)) = p
        pos += 1
      }
    }
    // prefix-code the length/distance values
    def prefixParts(value: Int): (Int, Int, Int) = {
      if (value <= 4) (value - 1, 0, 0)
      else {
        val v = value - 1
        val hbit = 31 - Integer.numberOfLeadingZeros(v)
        val second = (v >> (hbit - 1)) & 1
        val sym = 2 + 2 * (hbit - 1) + second
        val rest = v - ((2 + second) << (hbit - 1))
        (sym, hbit - 1, rest)
      }
    }
    def distCodeOf(dist: Int): Int =
      if (mapDist && dist == 1) 2 // table entry (1, 0)
      else dist + 120
    val greenAlpha = 256 + 24 + cacheSize
    // per-group frequency tables → canonical codes (local: encode must
    // be safe under concurrent executor threads)
    val groupCodes = new Array[(WCode, WCode, WCode, WCode, WCode)](numGroups)
    for (grp <- 0 until numGroups) {
      val fg = new Array[Long](greenAlpha)
      val fr = new Array[Long](256)
      val fb = new Array[Long](256)
      val fa = new Array[Long](256)
      val fd = new Array[Long](40)
      tokens(grp).foreach {
        case Lit(p) =>
          fg((p >>> 8) & 0xff) += 1
          fr((p >>> 16) & 0xff) += 1
          fb(p & 0xff) += 1
          fa(p >>> 24) += 1
        case Cached(i) => fg(280 + i) += 1
        case Copy(len, dist) =>
          fg(256 + prefixParts(len)._1) += 1
          fd(prefixParts(distCodeOf(dist))._1) += 1
      }
      val cg = writeCodeDef(bw, fg)
      val cr = writeCodeDef(bw, fr)
      val cb = writeCodeDef(bw, fb)
      val ca = writeCodeDef(bw, fa)
      val cd = writeCodeDef(bw, fd)
      // stash for the emission pass
      groupCodes(grp) = (cg, cr, cb, ca, cd)
    }
    // emission must interleave groups in pixel order
    val iters = Array.tabulate(numGroups)(g => tokens(g).iterator)
    pos = 0
    while (pos < n) {
      val g = groupOf(pos)
      val (cg, cr, cb, ca, cd) = groupCodes(g)
      iters(g).next() match {
        case Lit(p) =>
          emit(bw, cg, (p >>> 8) & 0xff)
          emit(bw, cr, (p >>> 16) & 0xff)
          emit(bw, cb, p & 0xff)
          emit(bw, ca, p >>> 24)
          pos += 1
        case Cached(i) =>
          emit(bw, cg, 280 + i)
          pos += 1
        case Copy(len, dist) =>
          val (ls, le, lr) = prefixParts(len)
          emit(bw, cg, 256 + ls)
          bw.writeBits(lr, le)
          val (ds, de, dr) = prefixParts(distCodeOf(dist))
          emit(bw, cd, ds)
          bw.writeBits(dr, de)
          pos += len
      }
    }
  }

  // (symbol → (code, len)); len 0 with a single entry = 0-bit code
  private type WCode = Map[Int, (Int, Int)]

  private def emit(bw: BitWriter, c: WCode, sym: Int): Unit = {
    val (code, len) = c(sym)
    if (len > 0) bw.writeCode(code, len)
  }

  /** Huffman code lengths (≤ maxLen) from frequencies; scales down on
    * depth overflow. */
  private def huffLengths(freq: Array[Long], maxLen: Int): Array[Int] = {
    val used = freq.indices.filter(freq(_) > 0)
    val lengths = new Array[Int](freq.length)
    if (used.isEmpty) return lengths
    if (used.length == 1) { lengths(used.head) = 1; return lengths }
    var f = used.map(freq(_)).toArray
    var ok = false
    while (!ok) {
      // plain heap huffman over the used symbols
      final case class Node(weight: Long, depthSyms: List[(Int, Int)])
      val pq = scala.collection.mutable.PriorityQueue.empty[Node](
        Ordering.by[Node, Long](_.weight).reverse)
      for (i <- used.indices) pq.enqueue(Node(f(i), List((i, 0))))
      while (pq.size > 1) {
        val a = pq.dequeue(); val b = pq.dequeue()
        pq.enqueue(Node(a.weight + b.weight,
          (a.depthSyms ++ b.depthSyms).map { case (s, d) => (s, d + 1) }))
      }
      val result = pq.dequeue().depthSyms
      if (result.forall(_._2 <= maxLen)) {
        result.foreach { case (i, d) => lengths(used(i)) = d }
        ok = true
      } else f = f.map(v => math.max(1L, v >> 1))
    }
    lengths
  }

  // ------------------------------------------- ImagePixels/RIFF bridge

  /** Decode a full .webp container's VP8L chunk to the shared
    * [[ImageCodec.ImagePixels]] raster (row-major RGB, alpha dropped).
    * Lossy/extended variants and corrupt containers return None. */
  def decodePixels(b: Array[Byte]): Option[ImageCodec.ImagePixels] =
    try {
      if (b.length < 20 || !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
          b(3) == 'F' && b(8) == 'W' && b(9) == 'E' && b(10) == 'B' &&
          b(11) == 'P')) return None
      var i = 12
      while (i + 8 <= b.length) {
        val len = (b(i + 4) & 0xff) | ((b(i + 5) & 0xff) << 8) |
          ((b(i + 6) & 0xff) << 16) | ((b(i + 7) & 0xff) << 24)
        val from = i + 8
        if (len < 0 || from.toLong + len > b.length.toLong) return None
        if (b(i) == 'V' && b(i + 1) == 'P' && b(i + 2) == '8' &&
            b(i + 3) == 'L') {
          val payload = java.util.Arrays.copyOfRange(b, from, from + len)
          return decodeArgb(payload).map { case (w, h, argb) =>
            val rgb = new Array[Byte](3 * w * h)
            var k = 0
            while (k < argb.length) {
              val p = argb(k)
              rgb(3 * k) = ((p >>> 16) & 0xff).toByte
              rgb(3 * k + 1) = ((p >>> 8) & 0xff).toByte
              rgb(3 * k + 2) = (p & 0xff).toByte
              k += 1
            }
            ImageCodec.ImagePixels("webp", w, h, rgb)
          }
        }
        i = from + len + (len & 1)
      }
      None
    } catch {
      case _: IndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }

  /** Write a real lossless .webp (RIFF + VP8L) with per-pixel content
    * `px(x, y) -> 0xRRGGBB` — the fixture source for the cross-format
    * near-dup twins, mirroring [[ImageCodec.writePngPixels]]. */
  def writeWebpPixels(width: Int, height: Int, px: (Int, Int) => Int,
                      opts: Vp8lOptions = Vp8lOptions()): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val argb = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        argb(y * width + x) = 0xff000000 | (px(x, y) & 0xffffff)
        x += 1
      }
      y += 1
    }
    val payload = encode(width, height, argb, opts)
    val padded = if (payload.length % 2 == 1) payload :+ 0.toByte else payload
    val le32 = (v: Int) => Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    "RIFF".getBytes("US-ASCII") ++ le32(4 + 8 + padded.length) ++
      "WEBP".getBytes("US-ASCII") ++ "VP8L".getBytes("US-ASCII") ++
      le32(payload.length) ++ padded
  }

  /** Canonical codes from lengths (DEFLATE-style assignment). */
  private def canonical(lengths: Array[Int]): Map[Int, (Int, Int)] = {
    val maxLen = lengths.max
    val count = new Array[Int](maxLen + 1)
    lengths.foreach(l => if (l > 0) count(l) += 1)
    val next = new Array[Int](maxLen + 2)
    var code = 0
    for (l <- 1 to maxLen) { next(l) = code; code = (code + count(l)) << 1 }
    val out = scala.collection.mutable.Map.empty[Int, (Int, Int)]
    for (s <- lengths.indices if lengths(s) > 0) {
      out(s) = (next(lengths(s)), lengths(s))
      next(lengths(s)) += 1
    }
    out.toMap
  }

  /** Write one prefix-code definition; returns the emission codes. */
  private def writeCodeDef(bw: BitWriter, freq: Array[Long]): WCode = {
    val used = freq.indices.filter(freq(_) > 0)
    if (used.isEmpty || (used.length <= 2 && used.forall(_ < 256))) {
      // simple form (an unused code still needs a legal definition:
      // declare symbol 0)
      val syms = if (used.isEmpty) Seq(0) else used.sorted
      bw.writeBit(1)
      bw.writeBit(if (syms.length == 2) 1 else 0)
      if (syms.head > 1) { bw.writeBit(1); bw.writeBits(syms.head, 8) }
      else { bw.writeBit(0); bw.writeBit(syms.head) }
      if (syms.length == 2) {
        bw.writeBits(syms(1), 8)
        Map(syms.head -> (0, 1), syms(1) -> (1, 1))
      } else Map(syms.head -> (0, 0))
    } else {
      val lengths = huffLengths(freq, 15)
      // RLE the zero gaps through code-length symbols 17/18. Must cover
      // the ENTIRE alphabet (incl. trailing zeros): with no explicit
      // max_symbol the decoder reads lengths until the alphabet is full.
      val clSyms = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
      var i = 0
      val last = lengths.length - 1
      while (i <= last) {
        if (lengths(i) == 0) {
          var run = 0
          while (i + run <= last && lengths(i + run) == 0) run += 1
          var left = run
          while (left > 0) {
            if (left < 3) { clSyms += ((0, 0, 0)); left -= 1 }
            else if (left <= 10) { clSyms += ((17, left - 3, 3)); left = 0 }
            else {
              val take = math.min(left, 138)
              clSyms += ((18, take - 11, 7)); left -= take
            }
          }
          i += run
        } else {
          clSyms += ((lengths(i), 0, 0)); i += 1
        }
      }
      val clFreq = new Array[Long](19)
      clSyms.foreach { case (s, _, _) => clFreq(s) += 1 }
      val clLengths = huffLengths(clFreq, 7)
      val clCodes = canonical(clLengths)
      val numClc = math.max(4,
        ClcOrder.lastIndexWhere(clLengths(_) > 0) + 1)
      bw.writeBit(0) // full form
      bw.writeBits(numClc - 4, 4)
      for (k <- 0 until numClc) bw.writeBits(clLengths(ClcOrder(k)), 3)
      bw.writeBit(0) // no explicit max_symbol
      val singleCl = clFreq.count(_ > 0) == 1
      clSyms.foreach { case (s, extra, extraBits) =>
        if (!singleCl) { val (c, l) = clCodes(s); bw.writeCode(c, l) }
        if (extraBits > 0) bw.writeBits(extra, extraBits)
      }
      // single-symbol full codes decode as 0-bit reads
      if (used.length == 1) Map(used.head -> (0, 0))
      else canonical(lengths)
    }
  }
}
