package graft.functions

/** VP8 lossy KEY-FRAME decode (RFC 6386) — the majority encoding of
  * real-world WebP. Intra-only by design: inter frames (which cannot
  * occur in a still WebP's `VP8 ` chunk) and non-keyframes reject to
  * None, the same honest scoping VP8L used. The decoder covers the
  * full keyframe feature set real encoders emit — segmentation with
  * per-segment quantizers, all 16x16/chroma intra modes, all ten
  * B_PRED subblock modes, multiple token partitions, and the NORMAL
  * loop filter — and is validated pixel-exact against the system
  * libwebp's own decode of libwebp-encoded frames (Round10Vp8Spec).
  *
  * [[encode]] emits a minimal conformant keyframe (DC_PRED
  * macroblocks, one token partition, loop filter level 0, default
  * probabilities) — fixture source for the oracle queries; the
  * reference decoder accepts its output byte-for-byte.
  *
  * All constant tables (quantizer lookups, coefficient probabilities,
  * keyframe mode probabilities) are from RFC 6386; see [[Vp8Tables]].
  */
object Vp8Codec {

  // ------------------------------------------------------ bool coder

  /** RFC 6386 §7.2 boolean decoder: 16-bit value window over the
    * partition bytes; reads past the end supply zero bytes. */
  private final class BoolDec(b: Array[Byte], off: Int, end: Int) {
    private var pos = off + 2
    private var value: Int =
      (((if (off < end) b(off) & 0xff else 0) << 8) |
        (if (off + 1 < end) b(off + 1) & 0xff else 0))
    private var range = 255
    private var bitCount = 0

    def bool(prob: Int): Int = {
      val split = 1 + (((range - 1) * prob) >> 8)
      val bigSplit = split << 8
      var ret = 0
      if (value >= bigSplit) { ret = 1; range -= split; value -= bigSplit }
      else range = split
      while (range < 128) {
        value <<= 1; range <<= 1
        bitCount += 1
        if (bitCount == 8) {
          bitCount = 0
          value |= (if (pos < end) b(pos) & 0xff else 0)
          pos += 1
        }
      }
      ret
    }

    def literal(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bool(128); i += 1 }
      v
    }

    /** flag → (n-bit magnitude, sign) else 0. */
    def signedDelta(n: Int): Int =
      if (bool(128) == 1) {
        val mag = literal(n)
        if (bool(128) == 1) -mag else mag
      } else 0

    def tree(t: Array[Int], probs: Array[Int], probOff: Int, start: Int): Int = {
      var i = start
      do i = t(i + bool(probs(probOff + (i >> 1))))
      while (i > 0)
      -i
    }
  }

  /** libvpx-style boolean encoder (carry-propagating). */
  private final class BoolEnc {
    private var lowvalue = 0L
    private var range = 255
    private var count = -24
    private val buf = new java.io.ByteArrayOutputStream()
    private var bytes = scala.collection.mutable.ArrayBuffer.empty[Int]

    def put(bit: Int, prob: Int): Unit = {
      val split = 1 + (((range - 1) * prob) >> 8)
      if (bit != 0) { lowvalue += split; range -= split }
      else range = split
      var shift = 0
      var r = range
      while (r < 128) { r <<= 1; shift += 1 }
      range = r
      count += shift
      if (count >= 0) {
        val offset = shift - count
        if (((lowvalue << (offset - 1)) & 0x80000000L) != 0) {
          var x = bytes.length - 1
          while (x >= 0 && bytes(x) == 0xff) { bytes(x) = 0; x -= 1 }
          if (x >= 0) bytes(x) += 1
        }
        bytes += ((lowvalue >> (24 - offset)) & 0xff).toInt
        lowvalue <<= offset
        shift = count
        lowvalue &= 0xffffff
        count -= 8
      }
      lowvalue <<= shift
    }

    def putLiteral(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { put((v >> i) & 1, 128); i -= 1 }
    }

    def finish(): Array[Byte] = {
      var i = 0
      while (i < 32) { put(0, 128); i += 1 }
      bytes.map(_.toByte).toArray
    }
  }

  // -------------------------------------------------------- trees

  // token ids
  private val ZERO = 0; private val ONE = 1; private val TWO = 2
  private val THREE = 3; private val FOUR = 4
  private val CAT1 = 5; private val CAT2 = 6; private val CAT3 = 7
  private val CAT4 = 8; private val CAT5 = 9; private val CAT6 = 10
  private val EOB = 11

  private val TokenTree = Array(
    -EOB, 2, -ZERO, 4, -ONE, 6, 8, 12, -TWO, 10, -THREE, -FOUR,
    14, 16, -CAT1, -CAT2, 18, 20, -CAT3, -CAT4, -CAT5, -CAT6)

  private val CatBase = Array(5, 7, 11, 19, 35, 67)
  private val CatProbs: Array[Array[Int]] = Array(
    Array(159), Array(165, 145), Array(173, 148, 140),
    Array(176, 155, 140, 135), Array(180, 157, 141, 134, 130),
    Array(254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129))

  // y modes: DC=0 V=1 H=2 TM=3 B_PRED=4
  private val KfYModeTree = Array(-4, 2, 4, 6, -0, -1, -2, -3)
  private val KfYModeProbs = Array(145, 156, 163, 128)
  private val UvModeTree = Array(-0, 2, -1, 4, -2, -3)
  private val KfUvProbs = Array(142, 114, 183)
  // b modes: DC=0 TM=1 VE=2 HE=3 LD=4 RD=5 VR=6 VL=7 HD=8 HU=9
  private val BModeTree = Array(
    -0, 2, -1, 4, -2, 6, 8, 12, -3, 10, -5, -6, -4, 14, -7, 16, -8, -9)
  private val SegTree = Array(2, 4, -0, -1, -2, -3)

  private val CoeffBands = Array(0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)
  private val Zigzag = Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
  private def clampQ(v: Int): Int = if (v < 0) 0 else if (v > 127) 127 else v

  // -------------------------------------------------------- transforms

  /** RFC 6386 §14.3 inverse DCT, in place over a 16-int block. */
  private def idct4x4(c: Array[Int]): Unit = {
    val t = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val a1 = c(i) + c(8 + i)
      val b1 = c(i) - c(8 + i)
      var t1 = (c(4 + i) * 35468) >> 16
      var t2 = c(12 + i) + ((c(12 + i) * 20091) >> 16)
      val c1 = t1 - t2
      t1 = c(4 + i) + ((c(4 + i) * 20091) >> 16)
      t2 = (c(12 + i) * 35468) >> 16
      val d1 = t1 + t2
      t(i) = a1 + d1; t(12 + i) = a1 - d1
      t(4 + i) = b1 + c1; t(8 + i) = b1 - c1
      i += 1
    }
    i = 0
    while (i < 4) {
      val r = 4 * i
      val a1 = t(r) + t(r + 2)
      val b1 = t(r) - t(r + 2)
      var t1 = (t(r + 1) * 35468) >> 16
      var t2 = t(r + 3) + ((t(r + 3) * 20091) >> 16)
      val c1 = t1 - t2
      t1 = t(r + 1) + ((t(r + 1) * 20091) >> 16)
      t2 = (t(r + 3) * 35468) >> 16
      val d1 = t1 + t2
      c(r) = (a1 + d1 + 4) >> 3; c(r + 3) = (a1 - d1 + 4) >> 3
      c(r + 1) = (b1 + c1 + 4) >> 3; c(r + 2) = (b1 - c1 + 4) >> 3
      i += 1
    }
  }

  /** Inverse Walsh-Hadamard for the Y2 block. */
  private def iwht4x4(c: Array[Int]): Unit = {
    val t = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val a1 = c(i) + c(12 + i)
      val b1 = c(4 + i) + c(8 + i)
      val c1 = c(4 + i) - c(8 + i)
      val d1 = c(i) - c(12 + i)
      t(i) = a1 + b1; t(4 + i) = c1 + d1
      t(8 + i) = a1 - b1; t(12 + i) = d1 - c1
      i += 1
    }
    i = 0
    while (i < 4) {
      val r = 4 * i
      val a1 = t(r) + t(r + 3)
      val b1 = t(r + 1) + t(r + 2)
      val c1 = t(r + 1) - t(r + 2)
      val d1 = t(r) - t(r + 3)
      c(r) = (a1 + b1 + 3) >> 3; c(r + 1) = (c1 + d1 + 3) >> 3
      c(r + 2) = (a1 - b1 + 3) >> 3; c(r + 3) = (d1 - c1 + 3) >> 3
      i += 1
    }
  }

  /** Forward DCT (libvpx reference) for the encoder. */
  private def fdct4x4(in: Array[Int], out: Array[Int]): Unit = {
    val t = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val r = 4 * i
      val a1 = (in(r) + in(r + 3)) << 3
      val b1 = (in(r + 1) + in(r + 2)) << 3
      val c1 = (in(r + 1) - in(r + 2)) << 3
      val d1 = (in(r) - in(r + 3)) << 3
      t(r) = a1 + b1; t(r + 2) = a1 - b1
      t(r + 1) = (c1 * 2217 + d1 * 5352 + 14500) >> 12
      t(r + 3) = (d1 * 2217 - c1 * 5352 + 7500) >> 12
      i += 1
    }
    i = 0
    while (i < 4) {
      val a1 = t(i) + t(12 + i)
      val b1 = t(4 + i) + t(8 + i)
      val c1 = t(4 + i) - t(8 + i)
      val d1 = t(i) - t(12 + i)
      out(i) = (a1 + b1 + 7) >> 4
      out(8 + i) = (a1 - b1 + 7) >> 4
      out(4 + i) = ((c1 * 2217 + d1 * 5352 + 12000) >> 16) + (if (d1 != 0) 1 else 0)
      out(12 + i) = (d1 * 2217 - c1 * 5352 + 51000) >> 16
      i += 1
    }
  }

  /** Forward Walsh-Hadamard (libvpx reference) for the encoder. */
  private def fwht4x4(in: Array[Int], out: Array[Int]): Unit = {
    val t = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val r = 4 * i
      val a1 = (in(r) + in(r + 2)) << 2
      val d1 = (in(r + 1) + in(r + 3)) << 2
      val c1 = (in(r + 1) - in(r + 3)) << 2
      val b1 = (in(r) - in(r + 2)) << 2
      t(r) = a1 + d1 + (if (a1 != 0) 1 else 0)
      t(r + 1) = b1 + c1
      t(r + 2) = b1 - c1
      t(r + 3) = a1 - d1
      i += 1
    }
    i = 0
    while (i < 4) {
      val a1 = t(i) + t(8 + i)
      val d1 = t(4 + i) + t(12 + i)
      val c1 = t(4 + i) - t(12 + i)
      val b1 = t(i) - t(8 + i)
      var a2 = a1 + d1; var b2 = b1 + c1; var c2 = b1 - c1; var d2 = a1 - d1
      if (a2 < 0) a2 += 1
      if (b2 < 0) b2 += 1
      if (c2 < 0) c2 += 1
      if (d2 < 0) d2 += 1
      out(i) = (a2 + 3) >> 3
      out(4 + i) = (b2 + 3) >> 3
      out(8 + i) = (c2 + 3) >> 3
      out(12 + i) = (d2 + 3) >> 3
      i += 1
    }
  }

  // -------------------------------------------------------- quantizers

  private final case class Quant(y1dc: Int, y1ac: Int, y2dc: Int, y2ac: Int,
                                 uvdc: Int, uvac: Int)

  private def quantFor(qi: Int, yDcD: Int, y2DcD: Int, y2AcD: Int,
                       uvDcD: Int, uvAcD: Int): Quant = {
    def dcq(i: Int) = Vp8Tables.DcQLookup(clampQ(i))
    def acq(i: Int) = Vp8Tables.AcQLookup(clampQ(i))
    val y2ac = math.max(acq(qi + y2AcD) * 155 / 100, 8)
    Quant(dcq(qi + yDcD), acq(qi), dcq(qi + y2DcD) * 2, y2ac,
      math.min(dcq(qi + uvDcD), 132), acq(qi + uvAcD))
  }

  // -------------------------------------------------------- frame state

  /** Decoded YUV420: y is w*h, u/v are ((w+1)/2)*((h+1)/2) at stride
    * cw; internal reconstruction is macroblock-padded. */
  final case class Yuv(width: Int, height: Int,
                       y: Array[Byte], u: Array[Byte], v: Array[Byte]) {
    def cw: Int = (width + 1) / 2
    def ch: Int = (height + 1) / 2
  }

  /** Decode the VP8 key frame inside `data` (a raw VP8 bitstream, no
    * RIFF); None on anything malformed or non-key. */
  def decodeFrame(data: Array[Byte]): Option[Yuv] =
    try decodeFrameImpl(data)
    catch {
      case _: IndexOutOfBoundsException | _: ArithmeticException |
           _: NegativeArraySizeException => None
    }

  /** Unwrap a WebP RIFF container's `VP8 ` chunk and decode. */
  def decodeWebp(b: Array[Byte]): Option[Yuv] = {
    if (b.length < 20 || new String(b, 0, 4, "US-ASCII") != "RIFF" ||
      new String(b, 8, 4, "US-ASCII") != "WEBP") return None
    var p = 12
    while (p + 8 <= b.length) {
      val tag = new String(b, p, 4, "US-ASCII")
      val size = ((b(p + 4) & 0xffL) | ((b(p + 5) & 0xffL) << 8) |
        ((b(p + 6) & 0xffL) << 16) | ((b(p + 7) & 0xffL) << 24)).toInt
      if (size < 0 || p + 8 + size > b.length) return None
      if (tag == "VP8 ")
        return decodeFrame(java.util.Arrays.copyOfRange(b, p + 8, p + 8 + size))
      p += 8 + size + (size & 1)
    }
    None
  }

  private def decodeFrameImpl(data: Array[Byte]): Option[Yuv] = {
    if (data.length < 10) return None
    val tag = (data(0) & 0xff) | ((data(1) & 0xff) << 8) | ((data(2) & 0xff) << 16)
    val keyFrame = (tag & 1) == 0
    val firstPartSize = tag >> 5
    if (!keyFrame) return None
    if ((data(3) & 0xff) != 0x9d || (data(4) & 0xff) != 0x01 ||
      (data(5) & 0xff) != 0x2a) return None
    val width = ((data(6) & 0xff) | ((data(7) & 0xff) << 8)) & 0x3fff
    val height = ((data(8) & 0xff) | ((data(9) & 0xff) << 8)) & 0x3fff
    if (width <= 0 || height <= 0 || width > 8192 || height > 8192) return None
    val partOff = 10
    if (partOff + firstPartSize > data.length) return None
    val bd = new BoolDec(data, partOff, partOff + firstPartSize)

    bd.literal(1) // color space
    bd.literal(1) // clamping
    // segmentation
    var segEnabled = false
    var segUpdateMap = false
    val segTreeProbs = Array(255, 255, 255)
    var segAbsolute = false
    val segQ = new Array[Int](4)
    val segLf = new Array[Int](4)
    if (bd.bool(128) == 1) {
      segEnabled = true
      segUpdateMap = bd.bool(128) == 1
      val updateData = bd.bool(128) == 1
      if (updateData) {
        segAbsolute = bd.bool(128) == 1
        var i = 0
        while (i < 4) { segQ(i) = bd.signedDelta(7); i += 1 }
        i = 0
        while (i < 4) { segLf(i) = bd.signedDelta(6); i += 1 }
      }
      if (segUpdateMap) {
        var i = 0
        while (i < 3) {
          if (bd.bool(128) == 1) segTreeProbs(i) = bd.literal(8)
          i += 1
        }
      }
    }
    val filterType = bd.literal(1) // 0 = normal, 1 = simple
    val filterLevel = bd.literal(6)
    val sharpness = bd.literal(3)
    var lfDeltaEnabled = false
    val refLfDeltas = new Array[Int](4)
    val modeLfDeltas = new Array[Int](4)
    if (bd.bool(128) == 1) {
      lfDeltaEnabled = true
      if (bd.bool(128) == 1) {
        var i = 0
        while (i < 4) { refLfDeltas(i) = bd.signedDelta(6); i += 1 }
        i = 0
        while (i < 4) { modeLfDeltas(i) = bd.signedDelta(6); i += 1 }
      }
    }
    val nParts = 1 << bd.literal(2)
    val baseQi = bd.literal(7)
    val yDcD = bd.signedDelta(4)
    val y2DcD = bd.signedDelta(4)
    val y2AcD = bd.signedDelta(4)
    val uvDcD = bd.signedDelta(4)
    val uvAcD = bd.signedDelta(4)
    bd.literal(1) // refresh entropy probs (keyframe: ignored)

    // coefficient probability updates
    val coefProbs = Vp8Tables.DefaultCoefProbs.clone()
    var ci = 0
    while (ci < 1056) {
      if (bd.bool(Vp8Tables.CoefUpdateProbs(ci)) == 1)
        coefProbs(ci) = bd.literal(8)
      ci += 1
    }
    val mbNoSkip = bd.bool(128) == 1
    val probSkip = if (mbNoSkip) bd.literal(8) else 0

    val mbW = (width + 15) / 16
    val mbH = (height + 15) / 16

    // token partitions: sizes after the first partition
    val partsBase = partOff + firstPartSize
    val sizesLen = 3 * (nParts - 1)
    if (partsBase + sizesLen > data.length) return None
    val partBounds = new Array[(Int, Int)](nParts)
    var off = partsBase + sizesLen
    var pi = 0
    while (pi < nParts) {
      val sz =
        if (pi < nParts - 1) {
          val s = partsBase + 3 * pi
          (data(s) & 0xff) | ((data(s + 1) & 0xff) << 8) | ((data(s + 2) & 0xff) << 16)
        } else data.length - off
      if (sz < 0 || off + sz > data.length) return None
      partBounds(pi) = (off, off + sz)
      off += sz
      pi += 1
    }
    val tokenBd = partBounds.map { case (s, e) => new BoolDec(data, s, e) }

    // ------------- per-MB mode parse (whole first partition, in order)
    val yModes = new Array[Int](mbW * mbH)
    val segIds = new Array[Int](mbW * mbH)
    val skips = new Array[Boolean](mbW * mbH)
    val bModes = new Array[Array[Int]](mbW * mbH) // 16 per B_PRED mb
    val uvModes = new Array[Int](mbW * mbH)
    // subblock-mode rows for B_PRED contexts
    val aboveBMode = Array.fill((mbW + 1) * 4)(0)
    var my = 0
    while (my < mbH) {
      val leftBMode = Array.fill(4)(0)
      var mx = 0
      while (mx < mbW) {
        val mi = my * mbW + mx
        if (segEnabled && segUpdateMap)
          segIds(mi) = bd.tree(SegTree, segTreeProbs, 0, 0)
        if (mbNoSkip) skips(mi) = bd.bool(probSkip) == 1
        val ym = bd.tree(KfYModeTree, KfYModeProbs, 0, 0)
        yModes(mi) = ym
        if (ym == 4) { // B_PRED
          val bm = new Array[Int](16)
          var sy = 0
          while (sy < 4) {
            var sx = 0
            while (sx < 4) {
              val above =
                if (sy == 0) aboveBMode(mx * 4 + sx)
                else bm((sy - 1) * 4 + sx)
              val left =
                if (sx == 0) leftBMode(sy)
                else bm(sy * 4 + sx - 1)
              val m = bd.tree(BModeTree, Vp8Tables.KfBModeProbs,
                (above * 10 + left) * 9, 0)
              bm(sy * 4 + sx) = m
              sx += 1
            }
            sy += 1
          }
          bModes(mi) = bm
          var k = 0
          while (k < 4) {
            aboveBMode(mx * 4 + k) = bm(12 + k)
            leftBMode(k) = bm(k * 4 + 3)
            k += 1
          }
        } else {
          // equivalent submodes for neighbor context: DC->B_DC, V->B_VE,
          // H->B_HE, TM->B_TM
          val eq = ym match {
            case 0 => 0; case 1 => 2; case 2 => 3; case _ => 1
          }
          var k = 0
          while (k < 4) {
            aboveBMode(mx * 4 + k) = eq; leftBMode(k) = eq; k += 1
          }
        }
        uvModes(mi) = bd.tree(UvModeTree, KfUvProbs, 0, 0)
        mx += 1
      }
      my += 1
    }

    // ------------- token decode + reconstruction
    // padded reconstruction planes (macroblock-aligned)
    val pw = mbW * 16; val ph = mbH * 16
    val cpw = mbW * 8; val cph = mbH * 8
    val Y = new Array[Byte](pw * ph)
    val U = new Array[Byte](cpw * cph)
    val V = new Array[Byte](cpw * cph)

    // nonzero contexts: above per mb-column, left per row; layout:
    // 0..3 Y columns, 4..5 U, 6..7 V, 8 Y2
    val aboveNz = Array.ofDim[Boolean](mbW, 9)
    val hasCoeffs = new Array[Boolean](mbW * mbH)

    // per-MB coefficient storage for one MB: 25 blocks x 16
    val coefs = Array.ofDim[Int](25, 16)

    def decodeCoeffs(tb: BoolDec, plane: Int, ctx0: Int, firstCoeff: Int,
                     qdc: Int, qac: Int, out: Array[Int]): Boolean = {
      // returns block-has-nonzero; fills dequantized coeffs (natural order)
      java.util.Arrays.fill(out, 0)
      var ctx = ctx0
      var n = firstCoeff
      var nonzero = false
      var skipEob = false
      while (n < 16) {
        val band = CoeffBands(n)
        val probOff = ((plane * 8 + band) * 3 + ctx) * 11
        val start = if (skipEob) 2 else 0
        val tok = tb.tree(TokenTree, coefProbs, probOff, start)
        if (tok == EOB) return nonzero
        if (tok == ZERO) {
          ctx = 0; skipEob = true
          n += 1
        } else {
          var v = 0
          if (tok <= FOUR) v = tok
          else {
            val cat = tok - CAT1
            v = CatBase(cat)
            val ps = CatProbs(cat)
            var i = 0
            while (i < ps.length) { v += tb.bool(ps(i)) << (ps.length - 1 - i); i += 1 }
          }
          if (tb.bool(128) == 1) v = -v
          val zz = Zigzag(n)
          out(zz) = v * (if (n == 0) qdc else qac)
          nonzero = true
          ctx = if (v == 1 || v == -1) 1 else 2
          skipEob = false
          n += 1
        }
      }
      nonzero
    }

    // quantizers per segment
    val quants = (0 until 4).map { s =>
      val qi =
        if (!segEnabled) baseQi
        else if (segAbsolute) segQ(s)
        else baseQi + segQ(s)
      quantFor(clampQ(qi), yDcD, y2DcD, y2AcD, uvDcD, uvAcD)
    }.toArray

    // ---- intra prediction helpers over padded planes
    def pget(p: Array[Byte], stride: Int, x: Int, y: Int): Int = p(y * stride + x) & 0xff

    def predict16(p: Array[Byte], stride: Int, bx: Int, by: Int, size: Int,
                  mode: Int): Unit = {
      val hasA = by > 0
      val hasL = bx > 0
      mode match {
        case 0 => // DC
          var sum = 0; var cnt = 0
          if (hasA) { var i = 0; while (i < size) { sum += pget(p, stride, bx + i, by - 1); i += 1 }; cnt += size }
          if (hasL) { var i = 0; while (i < size) { sum += pget(p, stride, bx - 1, by + i); i += 1 }; cnt += size }
          val dc = if (cnt == 0) 128 else (sum + cnt / 2) / cnt
          var y0 = 0
          while (y0 < size) {
            var x0 = 0
            while (x0 < size) { p((by + y0) * stride + bx + x0) = dc.toByte; x0 += 1 }
            y0 += 1
          }
        case 1 => // V
          var y0 = 0
          while (y0 < size) {
            var x0 = 0
            while (x0 < size) {
              val a = if (hasA) pget(p, stride, bx + x0, by - 1) else 127
              p((by + y0) * stride + bx + x0) = a.toByte; x0 += 1
            }
            y0 += 1
          }
        case 2 => // H
          var y0 = 0
          while (y0 < size) {
            val l = if (hasL) pget(p, stride, bx - 1, by + y0) else 129
            var x0 = 0
            while (x0 < size) { p((by + y0) * stride + bx + x0) = l.toByte; x0 += 1 }
            y0 += 1
          }
        case _ => // TM
          // corner conventions: top row of MBs sees the 127 top border
          // (including its [-1]); left column sees the 129 left border
          val al = if (!hasA) 127
            else if (!hasL) 129
            else pget(p, stride, bx - 1, by - 1)
          var y0 = 0
          while (y0 < size) {
            val l = if (hasL) pget(p, stride, bx - 1, by + y0) else 129
            var x0 = 0
            while (x0 < size) {
              val a = if (hasA) pget(p, stride, bx + x0, by - 1) else 127
              p((by + y0) * stride + bx + x0) = clamp255(l + a - al).toByte
              x0 += 1
            }
            y0 += 1
          }
      }
    }

    def addResidual(p: Array[Byte], stride: Int, bx: Int, by: Int,
                    c: Array[Int]): Unit = {
      var r = 0
      while (r < 4) {
        var cidx = 4 * r
        var x0 = 0
        while (x0 < 4) {
          val at = (by + r) * stride + bx + x0
          p(at) = clamp255((p(at) & 0xff) + c(cidx)).toByte
          cidx += 1; x0 += 1
        }
        r += 1
      }
    }

    /** B_PRED subblock prediction: 4x4 at (bx, by) in the Y plane,
      * using edge pixels (above row incl 4 above-right, left col,
      * above-left). `ar` supplies the 4 above-right pixels. */
    def predictB(p: Array[Byte], stride: Int, bx: Int, by: Int, mode: Int,
                 aboveRow: Array[Int], left: Array[Int], al: Int): Unit = {
      val a = aboveRow // length 8: above 0..3, above-right 4..7
      val l = left // length 4
      def set(x: Int, y: Int, v: Int): Unit =
        p((by + y) * stride + bx + x) = clamp255(v).toByte
      def avg3(x: Int, y: Int, z: Int): Int = (x + 2 * y + z + 2) >> 2
      def avg2(x: Int, y: Int): Int = (x + y + 1) >> 1
      mode match {
        case 0 => // B_DC
          var sum = 4
          var i = 0
          while (i < 4) { sum += a(i) + l(i); i += 1 }
          val dc = sum >> 3
          var y0 = 0
          while (y0 < 4) { var x0 = 0; while (x0 < 4) { set(x0, y0, dc); x0 += 1 }; y0 += 1 }
        case 1 => // B_TM
          var y0 = 0
          while (y0 < 4) {
            var x0 = 0
            while (x0 < 4) { set(x0, y0, l(y0) + a(x0) - al); x0 += 1 }
            y0 += 1
          }
        case 2 => // B_VE
          val e = Array(avg3(al, a(0), a(1)), avg3(a(0), a(1), a(2)),
            avg3(a(1), a(2), a(3)), avg3(a(2), a(3), a(4)))
          var y0 = 0
          while (y0 < 4) { var x0 = 0; while (x0 < 4) { set(x0, y0, e(x0)); x0 += 1 }; y0 += 1 }
        case 3 => // B_HE
          val e = Array(avg3(al, l(0), l(1)), avg3(l(0), l(1), l(2)),
            avg3(l(1), l(2), l(3)), avg3(l(2), l(3), l(3)))
          var y0 = 0
          while (y0 < 4) { var x0 = 0; while (x0 < 4) { set(x0, y0, e(y0)); x0 += 1 }; y0 += 1 }
        case 4 => // B_LD (down-left)
          var y0 = 0
          while (y0 < 4) {
            var x0 = 0
            while (x0 < 4) {
              val i = x0 + y0
              val v = if (i < 6) avg3(a(i), a(i + 1), a(i + 2))
                else avg3(a(6), a(7), a(7))
              set(x0, y0, v); x0 += 1
            }
            y0 += 1
          }
        case 5 => // B_RD (down-right)
          val e = Array(l(3), l(2), l(1), l(0), al, a(0), a(1), a(2), a(3))
          var y0 = 0
          while (y0 < 4) {
            var x0 = 0
            while (x0 < 4) {
              val i = x0 - y0 + 4
              set(x0, y0, avg3(e(i - 1), e(i), e(i + 1))); x0 += 1
            }
            y0 += 1
          }
        case 6 => // B_VR
          val e = Array(l(3), l(2), l(1), l(0), al, a(0), a(1), a(2), a(3))
          // per libvpx reconintra4x4
          set(0, 3, avg3(e(1), e(2), e(3)))
          set(0, 2, avg3(e(2), e(3), e(4)))
          set(1, 3, avg3(e(3), e(4), e(5))); set(0, 1, avg3(e(3), e(4), e(5)))
          set(1, 2, avg2(e(4), e(5))); set(0, 0, avg2(e(4), e(5)))
          set(2, 3, avg3(e(4), e(5), e(6))); set(1, 1, avg3(e(4), e(5), e(6)))
          set(2, 2, avg2(e(5), e(6))); set(1, 0, avg2(e(5), e(6)))
          set(3, 3, avg3(e(5), e(6), e(7))); set(2, 1, avg3(e(5), e(6), e(7)))
          set(3, 2, avg2(e(6), e(7))); set(2, 0, avg2(e(6), e(7)))
          set(3, 1, avg3(e(6), e(7), e(8)))
          set(3, 0, avg2(e(7), e(8)))
        case 7 => // B_VL
          set(0, 0, avg2(a(0), a(1)))
          set(0, 1, avg3(a(0), a(1), a(2)))
          set(0, 2, avg2(a(1), a(2))); set(1, 0, avg2(a(1), a(2)))
          set(1, 1, avg3(a(1), a(2), a(3))); set(0, 3, avg3(a(1), a(2), a(3)))
          set(1, 2, avg2(a(2), a(3))); set(2, 0, avg2(a(2), a(3)))
          set(2, 1, avg3(a(2), a(3), a(4))); set(1, 3, avg3(a(2), a(3), a(4)))
          set(2, 2, avg2(a(3), a(4))); set(3, 0, avg2(a(3), a(4)))
          set(3, 1, avg3(a(3), a(4), a(5))); set(2, 3, avg3(a(3), a(4), a(5)))
          set(3, 2, avg3(a(4), a(5), a(6)))
          set(3, 3, avg3(a(5), a(6), a(7)))
        case 8 => // B_HD
          val e = Array(l(3), l(2), l(1), l(0), al, a(0), a(1), a(2))
          set(0, 3, avg2(e(0), e(1)))
          set(1, 3, avg3(e(0), e(1), e(2)))
          set(0, 2, avg2(e(1), e(2))); set(2, 3, avg2(e(1), e(2)))
          set(1, 2, avg3(e(1), e(2), e(3))); set(3, 3, avg3(e(1), e(2), e(3)))
          set(2, 2, avg2(e(2), e(3))); set(0, 1, avg2(e(2), e(3)))
          set(3, 2, avg3(e(2), e(3), e(4))); set(1, 1, avg3(e(2), e(3), e(4)))
          set(2, 1, avg2(e(3), e(4))); set(0, 0, avg2(e(3), e(4)))
          set(3, 1, avg3(e(3), e(4), e(5))); set(1, 0, avg3(e(3), e(4), e(5)))
          set(2, 0, avg3(e(4), e(5), e(6)))
          set(3, 0, avg3(e(5), e(6), e(7)))
        case _ => // B_HU
          set(0, 0, avg2(l(0), l(1)))
          set(1, 0, avg3(l(0), l(1), l(2)))
          set(2, 0, avg2(l(1), l(2))); set(0, 1, avg2(l(1), l(2)))
          set(3, 0, avg3(l(1), l(2), l(3))); set(1, 1, avg3(l(1), l(2), l(3)))
          set(2, 1, avg2(l(2), l(3))); set(0, 2, avg2(l(2), l(3)))
          set(3, 1, avg3(l(2), l(3), l(3))); set(1, 2, avg3(l(2), l(3), l(3)))
          set(2, 2, l(3)); set(3, 2, l(3))
          set(0, 3, l(3)); set(1, 3, l(3)); set(2, 3, l(3)); set(3, 3, l(3))
      }
    }

    my = 0
    while (my < mbH) {
      val leftNz = new Array[Boolean](9)
      val tb = tokenBd(my % nParts)
      var mx = 0
      while (mx < mbW) {
        val mi = my * mbW + mx
        val ym = yModes(mi)
        val q = quants(if (segEnabled) segIds(mi) else 0)
        val hasY2 = ym != 4
        var mbNonzero = false

        if (skips(mi)) {
          // skipped MB: clear entropy contexts for coded planes
          var k = 0
          while (k < 8) { aboveNz(mx)(k) = false; leftNz(k) = false; k += 1 }
          if (hasY2) { aboveNz(mx)(8) = false; leftNz(8) = false }
          var b = 0
          while (b < 25) { java.util.Arrays.fill(coefs(b), 0); b += 1 }
        } else {
          // Y2 first
          if (hasY2) {
            val ctx = (if (aboveNz(mx)(8)) 1 else 0) + (if (leftNz(8)) 1 else 0)
            val nz = decodeCoeffs(tb, 1, ctx, 0, q.y2dc, q.y2ac, coefs(24))
            aboveNz(mx)(8) = nz; leftNz(8) = nz
            if (nz) mbNonzero = true
            iwht4x4(coefs(24))
          }
          val yPlane = if (hasY2) 0 else 3
          val firstC = if (hasY2) 1 else 0
          var sb = 0
          while (sb < 16) {
            val sx = sb & 3; val sy = sb >> 2
            val ctx = (if (aboveNz(mx)(sx)) 1 else 0) + (if (leftNz(sy)) 1 else 0)
            val nz = decodeCoeffs(tb, yPlane, ctx, firstC, q.y1dc, q.y1ac, coefs(sb))
            aboveNz(mx)(sx) = nz; leftNz(sy) = nz
            if (nz) mbNonzero = true
            if (hasY2) coefs(sb)(0) = coefs(24)(sb)
            sb += 1
          }
          var cb = 0
          while (cb < 8) {
            val isU = cb < 4
            val k = cb & 3
            val sx = k & 1; val sy = k >> 1
            val nzIdx = (if (isU) 4 else 6) + sx
            val lfIdx = (if (isU) 4 else 6) + sy
            val ctx = (if (aboveNz(mx)(nzIdx)) 1 else 0) + (if (leftNz(lfIdx)) 1 else 0)
            val nz = decodeCoeffs(tb, 2, ctx, 0, q.uvdc, q.uvac, coefs(16 + cb))
            aboveNz(mx)(nzIdx) = nz; leftNz(lfIdx) = nz
            if (nz) mbNonzero = true
            cb += 1
          }
        }
        hasCoeffs(mi) = mbNonzero

        // ---- reconstruction
        val bx0 = mx * 16; val by0 = my * 16
        if (ym != 4) {
          predict16(Y, pw, bx0, by0, 16, ym)
          if (!skips(mi)) {
            var sb = 0
            while (sb < 16) {
              val c = coefs(sb)
              var any = false
              var k = 0
              while (k < 16 && !any) { any = c(k) != 0; k += 1 }
              if (any) {
                idct4x4(c)
                addResidual(Y, pw, bx0 + (sb & 3) * 4, by0 + (sb >> 2) * 4, c)
              }
              sb += 1
            }
          }
        } else {
          val bm = bModes(mi)
          var sb = 0
          while (sb < 16) {
            val sx = sb & 3; val sy = sb >> 2
            val bx = bx0 + sx * 4; val by = by0 + sy * 4
            // gather edges: above row + above-right, left col, above-left
            val aRow = new Array[Int](8)
            var i = 0
            while (i < 4) {
              aRow(i) = if (by > 0) pget(Y, pw, bx + i, by - 1) else 127
              i += 1
            }
            // above-right: inner subblocks read the reconstructed row
            // above; right-edge subblocks (sx == 3) read the above-MB
            // row — on the frame's rightmost MB column that row's last
            // pixel is REPLICATED (the reference decoder's convention),
            // and above the frame the 127 border extends right
            i = 0
            while (i < 4) {
              aRow(4 + i) =
                if (sx < 3) {
                  if (by > 0) pget(Y, pw, bx + 4 + i, by - 1) else 127
                } else {
                  val ary = by0 - 1
                  if (ary < 0) 127
                  else if (mx < mbW - 1) pget(Y, pw, bx + 4 + i, ary)
                  else pget(Y, pw, pw - 1, ary) // replicate last above pixel
                }
              i += 1
            }
            val lCol = new Array[Int](4)
            i = 0
            while (i < 4) {
              lCol(i) = if (bx > 0) pget(Y, pw, bx - 1, by + i) else 129
              i += 1
            }
            val al =
              if (bx > 0 && by > 0) pget(Y, pw, bx - 1, by - 1)
              else if (by > 0) 129
              else if (bx > 0) 127
              else 127
            predictB(Y, pw, bx, by, bm(sb), aRow, lCol, al)
            if (!skips(mi)) {
              val c = coefs(sb)
              var any = false
              var k = 0
              while (k < 16 && !any) { any = c(k) != 0; k += 1 }
              if (any) { idct4x4(c); addResidual(Y, pw, bx, by, c) }
            }
            sb += 1
          }
        }
        // chroma
        val cx0 = mx * 8; val cy0 = my * 8
        predict16(U, cpw, cx0, cy0, 8, uvModes(mi))
        predict16(V, cpw, cx0, cy0, 8, uvModes(mi))
        if (!skips(mi)) {
          var cb = 0
          while (cb < 8) {
            val c = coefs(16 + cb)
            var any = false
            var k = 0
            while (k < 16 && !any) { any = c(k) != 0; k += 1 }
            if (any) {
              idct4x4(c)
              val plane = if (cb < 4) U else V
              val kk = cb & 3
              addResidual(plane, cpw, cx0 + (kk & 1) * 4, cy0 + (kk >> 1) * 4, c)
            }
            cb += 1
          }
        }
        mx += 1
      }
      my += 1
    }

    // ---- loop filter
    if (filterLevel > 0) {
      loopFilter(Y, U, V, pw, cpw, mbW, mbH, filterType, filterLevel,
        sharpness, segEnabled, segIds, segLf, segAbsolute, lfDeltaEnabled,
        refLfDeltas, modeLfDeltas, yModes, skips, hasCoeffs)
    }

    // crop to requested size
    val y = new Array[Byte](width * height)
    var r = 0
    while (r < height) {
      System.arraycopy(Y, r * pw, y, r * width, width); r += 1
    }
    val cw = (width + 1) / 2; val ch = (height + 1) / 2
    val u = new Array[Byte](cw * ch)
    val v = new Array[Byte](cw * ch)
    r = 0
    while (r < ch) {
      System.arraycopy(U, r * cpw, u, r * cw, cw)
      System.arraycopy(V, r * cpw, v, r * cw, cw)
      r += 1
    }
    Some(Yuv(width, height, y, u, v))
  }

  // -------------------------------------------------------- loop filter

  private def sclamp(v: Int): Int = if (v < -128) -128 else if (v > 127) 127 else v

  /** Normal/simple loop filter (RFC 6386 §15), applied MB by MB after
    * full-frame reconstruction. */
  private def loopFilter(Y: Array[Byte], U: Array[Byte], V: Array[Byte],
                         pw: Int, cpw: Int, mbW: Int, mbH: Int,
                         filterType: Int, baseLevel: Int, sharpness: Int,
                         segEnabled: Boolean, segIds: Array[Int],
                         segLf: Array[Int], segAbsolute: Boolean,
                         lfDelta: Boolean, refLfDeltas: Array[Int],
                         modeLfDeltas: Array[Int], yModes: Array[Int],
                         skips: Array[Boolean], hasCoeffs: Array[Boolean]): Unit = {
    def levelFor(mi: Int): Int = {
      var lvl =
        if (!segEnabled) baseLevel
        else if (segAbsolute) segLf(segIds(mi))
        else baseLevel + segLf(segIds(mi))
      if (lfDelta) {
        lvl += refLfDeltas(0) // intra frame
        if (yModes(mi) == 4) lvl += modeLfDeltas(0) // B_PRED
      }
      if (lvl < 0) 0 else if (lvl > 63) 63 else lvl
    }

    // pixel accessors: s = stride step between the two sides of the edge
    def u2s(x: Int): Int = x - 128

    def filterMask(I: Int, E: Int, p: Array[Byte], at: Int, s: Int): Boolean = {
      def px(k: Int): Int = p(at + k * s) & 0xff
      math.abs(px(-4) - px(-3)) <= I && math.abs(px(-3) - px(-2)) <= I &&
      math.abs(px(-2) - px(-1)) <= I && math.abs(px(3) - px(2)) <= I &&
      math.abs(px(2) - px(1)) <= I && math.abs(px(1) - px(0)) <= I &&
      math.abs(px(-1) - px(0)) * 2 + math.abs(px(-2) - px(1)) / 2 <= E
    }

    def hev(T: Int, p: Array[Byte], at: Int, s: Int): Boolean = {
      def px(k: Int): Int = p(at + k * s) & 0xff
      math.abs(px(-2) - px(-1)) > T || math.abs(px(1) - px(0)) > T
    }

    def commonAdjust(useOuter: Boolean, p: Array[Byte], at: Int, s: Int): Int = {
      def px(k: Int): Int = p(at + k * s) & 0xff
      def set(k: Int, v: Int): Unit = p(at + k * s) = clamp255(v + 128).toByte
      val P1 = u2s(px(-2)); val P0 = u2s(px(-1))
      val Q0 = u2s(px(0)); val Q1 = u2s(px(1))
      var a = sclamp((if (useOuter) sclamp(P1 - Q1) else 0) + 3 * (Q0 - P0))
      val f1 = sclamp(a + 4) >> 3
      val f2 = sclamp(a + 3) >> 3
      set(0, sclamp(Q0 - f1))
      set(-1, sclamp(P0 + f2))
      f1
    }

    def simpleSegment(edgeLimit: Int, p: Array[Byte], at: Int, s: Int): Unit = {
      def px(k: Int): Int = p(at + k * s) & 0xff
      if (math.abs(px(-1) - px(0)) * 2 + math.abs(px(-2) - px(1)) / 2 <= edgeLimit)
        commonAdjust(true, p, at, s)
    }

    def subblockFilter(T: Int, I: Int, E: Int, p: Array[Byte], at: Int, s: Int): Unit = {
      def px(k: Int): Int = p(at + k * s) & 0xff
      def set(k: Int, v: Int): Unit = p(at + k * s) = clamp255(v + 128).toByte
      if (filterMask(I, E, p, at, s)) {
        val hv = hev(T, p, at, s)
        val f = commonAdjust(hv, p, at, s)
        if (!hv) {
          val g = (f + 1) >> 1
          set(1, sclamp(u2s(px(1)) - g))
          set(-2, sclamp(u2s(px(-2)) + g))
        }
      }
    }

    def mbFilter(T: Int, I: Int, E: Int, p: Array[Byte], at: Int, s: Int): Unit = {
      def px(k: Int): Int = p(at + k * s) & 0xff
      def set(k: Int, v: Int): Unit = p(at + k * s) = clamp255(v + 128).toByte
      if (filterMask(I, E, p, at, s)) {
        if (!hev(T, p, at, s)) {
          val P2 = u2s(px(-3)); val P1 = u2s(px(-2)); val P0 = u2s(px(-1))
          val Q0 = u2s(px(0)); val Q1 = u2s(px(1)); val Q2 = u2s(px(2))
          val w = sclamp(sclamp(P1 - Q1) + 3 * (Q0 - P0))
          var a = (27 * w + 63) >> 7
          set(0, sclamp(Q0 - a)); set(-1, sclamp(P0 + a))
          a = (18 * w + 63) >> 7
          set(1, sclamp(Q1 - a)); set(-2, sclamp(P1 + a))
          a = (9 * w + 63) >> 7
          set(2, sclamp(Q2 - a)); set(-3, sclamp(P2 + a))
        } else commonAdjust(true, p, at, s)
      }
    }

    var my = 0
    while (my < mbH) {
      var mx = 0
      while (mx < mbW) {
        val mi = my * mbW + mx
        val lvl = levelFor(mi)
        if (lvl > 0) {
          var interior = lvl
          if (sharpness > 0) {
            interior >>= (if (sharpness > 4) 2 else 1)
            if (interior > 9 - sharpness) interior = 9 - sharpness
          }
          if (interior < 1) interior = 1
          val hevT =
            if (lvl >= 40) 2 else if (lvl >= 15) 1 else 0
          val mbE = (lvl + 2) * 2 + interior
          val sbE = lvl * 2 + interior
          val inner = hasCoeffs(mi) || yModes(mi) == 4
          if (filterType == 1) {
            // simple: Y only
            val by0 = my * 16; val bx0 = mx * 16
            if (mx > 0) {
              var r = 0
              while (r < 16) { simpleSegment(mbE, Y, (by0 + r) * pw + bx0, 1); r += 1 }
            }
            if (inner) {
              var c = 4
              while (c < 16) {
                var r = 0
                while (r < 16) { simpleSegment(sbE, Y, (by0 + r) * pw + bx0 + c, 1); r += 1 }
                c += 4
              }
            }
            if (my > 0) {
              var c = 0
              while (c < 16) { simpleSegment(mbE, Y, by0 * pw + bx0 + c, pw); c += 1 }
            }
            if (inner) {
              var rr = 4
              while (rr < 16) {
                var c = 0
                while (c < 16) { simpleSegment(sbE, Y, (by0 + rr) * pw + bx0 + c, pw); c += 1 }
                rr += 4
              }
            }
          } else {
            // normal: Y + chroma
            val by0 = my * 16; val bx0 = mx * 16
            val cy0 = my * 8; val cx0 = mx * 8
            if (mx > 0) {
              var r = 0
              while (r < 16) { mbFilter(hevT, interior, mbE, Y, (by0 + r) * pw + bx0, 1); r += 1 }
              r = 0
              while (r < 8) {
                mbFilter(hevT, interior, mbE, U, (cy0 + r) * cpw + cx0, 1)
                mbFilter(hevT, interior, mbE, V, (cy0 + r) * cpw + cx0, 1)
                r += 1
              }
            }
            if (inner) {
              var c = 4
              while (c < 16) {
                var r = 0
                while (r < 16) { subblockFilter(hevT, interior, sbE, Y, (by0 + r) * pw + bx0 + c, 1); r += 1 }
                c += 4
              }
              var r = 0
              while (r < 8) {
                subblockFilter(hevT, interior, sbE, U, (cy0 + r) * cpw + cx0 + 4, 1)
                subblockFilter(hevT, interior, sbE, V, (cy0 + r) * cpw + cx0 + 4, 1)
                r += 1
              }
            }
            if (my > 0) {
              var c = 0
              while (c < 16) { mbFilter(hevT, interior, mbE, Y, by0 * pw + bx0 + c, pw); c += 1 }
              c = 0
              while (c < 8) {
                mbFilter(hevT, interior, mbE, U, cy0 * cpw + cx0 + c, cpw)
                mbFilter(hevT, interior, mbE, V, cy0 * cpw + cx0 + c, cpw)
                c += 1
              }
            }
            if (inner) {
              var rr = 4
              while (rr < 16) {
                var c = 0
                while (c < 16) { subblockFilter(hevT, interior, sbE, Y, (by0 + rr) * pw + bx0 + c, pw); c += 1 }
                rr += 4
              }
              var c = 0
              while (c < 8) {
                subblockFilter(hevT, interior, sbE, U, (cy0 + 4) * cpw + cx0 + c, cpw)
                subblockFilter(hevT, interior, sbE, V, (cy0 + 4) * cpw + cx0 + c, cpw)
                c += 1
              }
            }
          }
        }
        mx += 1
      }
      my += 1
    }
  }

  // ------------------------------------------------------------ encoder

  /** Minimal conformant VP8 key-frame encoder: every macroblock is
    * DC_PRED (Y and chroma), one token partition, loop filter level 0,
    * no segmentation, default coefficient probabilities, no skip
    * flags. Input is YUV420 planes; output is the raw VP8 bitstream.
    * Reconstruction runs in lockstep with the decoder so prediction
    * never drifts. */
  def encodeFrame(yuv: Yuv, qi: Int = 20): Array[Byte] = {
    require(qi >= 0 && qi <= 127, "bad quantizer index")
    val width = yuv.width; val height = yuv.height
    val mbW = (width + 15) / 16
    val mbH = (height + 15) / 16
    val pw = mbW * 16; val ph = mbH * 16
    val cpw = mbW * 8; val cph = mbH * 8
    // padded source planes (edge-replicated)
    val sy = padPlane(yuv.y, width, height, pw, ph)
    val cw = yuv.cw; val ch = yuv.ch
    val su = padPlane(yuv.u, cw, ch, cpw, cph)
    val sv = padPlane(yuv.v, cw, ch, cpw, cph)
    // reconstruction planes
    val Y = new Array[Byte](pw * ph)
    val U = new Array[Byte](cpw * cph)
    val V = new Array[Byte](cpw * cph)

    val q = quantFor(qi, 0, 0, 0, 0, 0)
    val hdr = new BoolEnc
    // color space + clamping
    hdr.put(0, 128); hdr.put(0, 128)
    hdr.put(0, 128) // segmentation off
    hdr.putLiteral(0, 1) // filter type normal
    hdr.putLiteral(0, 6) // level 0 -> no filtering
    hdr.putLiteral(0, 3) // sharpness
    hdr.put(0, 128) // no lf deltas
    hdr.putLiteral(0, 2) // 1 token partition
    hdr.putLiteral(qi, 7)
    var i = 0
    while (i < 5) { hdr.put(0, 128); i += 1 } // no quant deltas
    hdr.put(1, 128) // refresh entropy probs
    i = 0
    while (i < 1056) { hdr.put(0, Vp8Tables.CoefUpdateProbs(i)); i += 1 }
    hdr.put(0, 128) // mb_no_skip_coeff = 0

    val tok = new BoolEnc
    val aboveNz = Array.ofDim[Boolean](mbW, 9)

    // token emission for one quantized block (natural order in `qc`)
    def putCoeffs(plane: Int, ctx0: Int, firstCoeff: Int,
                  qc: Array[Int]): Boolean = {
      var last = -1
      var n = 15
      while (n >= firstCoeff && last < 0) {
        if (qc(Zigzag(n)) != 0) last = n
        n -= 1
      }
      var ctx = ctx0
      var skipEob = false
      n = firstCoeff
      var emitted = false
      while (n <= last) {
        val v0 = qc(Zigzag(n))
        val band = CoeffBands(n)
        val probOff = ((plane * 8 + band) * 3 + ctx) * 11
        val start = if (skipEob) 2 else 0
        if (v0 == 0) {
          putTok(ZERO, probOff, start)
          ctx = 0; skipEob = true
        } else {
          val av = math.abs(v0)
          val tokId =
            if (av <= 4) av
            else if (av < CatBase(1)) CAT1
            else if (av < CatBase(2)) CAT2
            else if (av < CatBase(3)) CAT3
            else if (av < CatBase(4)) CAT4
            else if (av < CatBase(5)) CAT5
            else CAT6
          putTok(tokId, probOff, start)
          if (tokId >= CAT1) {
            val cat = tokId - CAT1
            val extra = av - CatBase(cat)
            val ps = CatProbs(cat)
            var k = 0
            while (k < ps.length) {
              tok.put((extra >> (ps.length - 1 - k)) & 1, ps(k)); k += 1
            }
          }
          tok.put(if (v0 < 0) 1 else 0, 128)
          ctx = if (av == 1) 1 else 2
          skipEob = false
          emitted = true
        }
        n += 1
      }
      if (n < 16) {
        val band = CoeffBands(n)
        val probOff = ((plane * 8 + band) * 3 + ctx) * 11
        val start = if (skipEob) 2 else 0
        // a trailing EOB is only writable when the previous token was
        // nonzero (zeros never precede EOB by construction above)
        putTok(EOB, probOff, start)
      }
      emitted
    }

    def putTok(leaf: Int, probOff: Int, start: Int): Unit = {
      var idx = start
      var done = false
      while (!done) {
        def subtreeHas(i: Int): Boolean =
          if (i <= 0) -i == leaf
          else subtreeHas(TokenTree(i)) || subtreeHas(TokenTree(i + 1))
        val leftHas = subtreeHas(TokenTree(idx))
        val bit = if (leftHas) 0 else 1
        tok.put(bit, coefProb(probOff + (idx >> 1)))
        val next = TokenTree(idx + bit)
        if (next <= 0) done = true else idx = next
      }
    }

    def coefProb(flat: Int): Int = Vp8Tables.DefaultCoefProbs(flat)

    // per-MB DC prediction over the reconstruction (encoder mirror)
    def predDc(p: Array[Byte], stride: Int, bx: Int, by: Int, size: Int): Int = {
      val hasA = by > 0; val hasL = bx > 0
      var sum = 0; var cnt = 0
      if (hasA) { var k = 0; while (k < size) { sum += p((by - 1) * stride + bx + k) & 0xff; k += 1 }; cnt += size }
      if (hasL) { var k = 0; while (k < size) { sum += p((by + k) * stride + bx - 1) & 0xff; k += 1 }; cnt += size }
      if (cnt == 0) 128 else (sum + cnt / 2) / cnt
    }

    def quantize(c: Array[Int], qdc: Int, qac: Int, firstC: Int,
                 qout: Array[Int], dout: Array[Int]): Unit = {
      var k = 0
      while (k < 16) {
        if (k < firstC) { qout(k) = 0; dout(k) = 0 }
        else {
          val qf = if (k == 0) qdc else qac
          val v = c(k)
          var qv = (math.abs(v) + qf / 2) / qf
          if (qv > 2047) qv = 2047
          if (v < 0) qv = -qv
          qout(k) = qv
          dout(k) = qv * qf
        }
        k += 1
      }
    }

    var my = 0
    while (my < mbH) {
      val leftNz = new Array[Boolean](9)
      var mx = 0
      while (mx < mbW) {
        val bx0 = mx * 16; val by0 = my * 16
        // per-MB: ymode DC_PRED via kf tree (root=1, then 0, 0)
        hdr.put(1, KfYModeProbs(0)); hdr.put(0, KfYModeProbs(1))
        hdr.put(0, KfYModeProbs(2))
        hdr.put(0, KfUvProbs(0)) // uv DC

        val dcY = predDc(Y, pw, bx0, by0, 16)
        // residual per Y subblock, fdct, collect DCs for Y2
        val res = new Array[Int](16)
        val yQ = Array.ofDim[Int](16, 16)
        val yD = Array.ofDim[Int](16, 16)
        val dcs = new Array[Int](16)
        var sb = 0
        while (sb < 16) {
          val sx = (sb & 3) * 4; val syy = (sb >> 2) * 4
          var r = 0
          while (r < 4) {
            var c = 0
            while (c < 4) {
              res(r * 4 + c) =
                (sy((by0 + syy + r) * pw + bx0 + sx + c) & 0xff) - dcY
              c += 1
            }
            r += 1
          }
          val f = new Array[Int](16)
          fdct4x4(res, f)
          dcs(sb) = f(0)
          quantize(f, q.y1dc, q.y1ac, 1, yQ(sb), yD(sb))
          yD(sb)(0) = 0
          sb += 1
        }
        val y2f = new Array[Int](16)
        fwht4x4(dcs, y2f)
        val y2Q = new Array[Int](16)
        val y2D = new Array[Int](16)
        quantize(y2f, q.y2dc, q.y2ac, 0, y2Q, y2D)
        // tokens: Y2 (plane 1), Y (plane 0, from coeff 1), then chroma
        val ctxY2 = (if (aboveNz(mx)(8)) 1 else 0) + (if (leftNz(8)) 1 else 0)
        val nzY2 = putCoeffs(1, ctxY2, 0, y2Q)
        aboveNz(mx)(8) = nzY2; leftNz(8) = nzY2
        sb = 0
        while (sb < 16) {
          val sx = sb & 3; val syy = sb >> 2
          val ctx = (if (aboveNz(mx)(sx)) 1 else 0) + (if (leftNz(syy)) 1 else 0)
          val nz = putCoeffs(0, ctx, 1, yQ(sb))
          aboveNz(mx)(sx) = nz; leftNz(syy) = nz
          sb += 1
        }
        // reconstruct Y: iwht(y2D) DCs + per-block idct
        iwht4x4(y2D)
        sb = 0
        while (sb < 16) {
          val d = yD(sb)
          d(0) = y2D(sb)
          idct4x4(d)
          val sx = (sb & 3) * 4; val syy = (sb >> 2) * 4
          var r = 0
          while (r < 4) {
            var c = 0
            while (c < 4) {
              Y((by0 + syy + r) * pw + bx0 + sx + c) =
                clamp255(dcY + d(r * 4 + c)).toByte
              c += 1
            }
            r += 1
          }
          sb += 1
        }
        // chroma
        val cx0 = mx * 8; val cy0 = my * 8
        var dcU = 0; var dcV = 0
        var cb = 0
        while (cb < 8) {
          val isU = cb < 4
          val src = if (isU) su else sv
          val rec = if (isU) U else V
          val k = cb & 3
          if (k == 0) {
            if (isU) dcU = predDc(U, cpw, cx0, cy0, 8)
            else dcV = predDc(V, cpw, cx0, cy0, 8)
          }
          val dcC = if (isU) dcU else dcV
          val sx = (k & 1) * 4; val syy = (k >> 1) * 4
          var r = 0
          while (r < 4) {
            var c = 0
            while (c < 4) {
              res(r * 4 + c) =
                (src((cy0 + syy + r) * cpw + cx0 + sx + c) & 0xff) - dcC
              c += 1
            }
            r += 1
          }
          val f = new Array[Int](16)
          fdct4x4(res, f)
          val cQ = new Array[Int](16)
          val cD = new Array[Int](16)
          quantize(f, q.uvdc, q.uvac, 0, cQ, cD)
          val sxNz = k & 1; val syNz = k >> 1
          val nzIdx = (if (isU) 4 else 6) + sxNz
          val lfIdx = (if (isU) 4 else 6) + syNz
          val ctx = (if (aboveNz(mx)(nzIdx)) 1 else 0) + (if (leftNz(lfIdx)) 1 else 0)
          val nz = putCoeffs(2, ctx, 0, cQ)
          aboveNz(mx)(nzIdx) = nz; leftNz(lfIdx) = nz
          idct4x4(cD)
          r = 0
          while (r < 4) {
            var c = 0
            while (c < 4) {
              rec((cy0 + syy + r) * cpw + cx0 + sx + c) =
                clamp255(dcC + cD(r * 4 + c)).toByte
              c += 1
            }
            r += 1
          }
          cb += 1
        }
        mx += 1
      }
      my += 1
    }

    val part1 = hdr.finish()
    val tokens = tok.finish()
    val out = new java.io.ByteArrayOutputStream()
    val tag = (part1.length << 5) | (1 << 4) | 0 // keyframe, version 0, show
    out.write(tag & 0xff); out.write((tag >> 8) & 0xff); out.write((tag >> 16) & 0xff)
    out.write(0x9d); out.write(0x01); out.write(0x2a)
    out.write(width & 0xff); out.write((width >> 8) & 0x3f)
    out.write(height & 0xff); out.write((height >> 8) & 0x3f)
    out.write(part1, 0, part1.length)
    out.write(tokens, 0, tokens.length)
    out.toByteArray
  }

  private def padPlane(src: Array[Byte], w: Int, h: Int,
                       pw: Int, ph: Int): Array[Byte] = {
    val out = new Array[Byte](pw * ph)
    var r = 0
    while (r < ph) {
      val sr = math.min(r, h - 1)
      var c = 0
      while (c < pw) {
        out(r * pw + c) = src(sr * w + math.min(c, w - 1))
        c += 1
      }
      r += 1
    }
    out
  }

  /** Wrap a raw VP8 frame in a WebP RIFF container. */
  def wrapWebp(frame: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    out.write("RIFF".getBytes("US-ASCII"))
    val payload = 4 + 8 + frame.length + (frame.length & 1)
    le32(payload)
    out.write("WEBP".getBytes("US-ASCII"))
    out.write("VP8 ".getBytes("US-ASCII"))
    le32(frame.length)
    out.write(frame, 0, frame.length)
    if ((frame.length & 1) == 1) out.write(0)
    out.toByteArray
  }

  /** Encode YUV420 into a lossy WebP container. */
  def encodeWebp(yuv: Yuv, qi: Int = 20): Array[Byte] =
    wrapWebp(encodeFrame(yuv, qi))

  /** Integer BT.601 YUV->RGB for downstream perceptual use (this is a
    * display conversion, not part of VP8 conformance). */
  def toRgb(yuv: Yuv): Array[Int] = {
    val out = new Array[Int](yuv.width * yuv.height)
    val cw = yuv.cw
    var r = 0
    while (r < yuv.height) {
      var c = 0
      while (c < yuv.width) {
        val yv = (yuv.y(r * yuv.width + c) & 0xff) - 16
        val uv = (yuv.u((r / 2) * cw + c / 2) & 0xff) - 128
        val vv = (yuv.v((r / 2) * cw + c / 2) & 0xff) - 128
        val rr = clamp255((298 * yv + 409 * vv + 128) >> 8)
        val gg = clamp255((298 * yv - 100 * uv - 208 * vv + 128) >> 8)
        val bb = clamp255((298 * yv + 516 * uv + 128) >> 8)
        out(r * yuv.width + c) = (rr << 16) | (gg << 8) | bb
        c += 1
      }
      r += 1
    }
    out
  }
}
