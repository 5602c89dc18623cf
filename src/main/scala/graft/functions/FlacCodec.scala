package graft.functions

/** Pure-JVM FLAC codec per the public format spec (RFC 9639).
  *
  * Census layer: `fLaC` magic, metadata block walk, and the mandatory
  * STREAMINFO block (sample rate, channels, bits per sample, total
  * samples) — the rate/precision mix an audio-corpus governance pass
  * needs for transcode budgeting, plus VORBIS_COMMENT presence (tag
  * metadata, the PII surface).
  *
  * Sample layer ([[decodePcm]]): REAL lossless frame decode — frame
  * header parse (sync, blocksize/rate/channel/sample-size codes, UTF-8
  * coded frame number, CRC-8), all subframe types (constant, verbatim,
  * fixed orders 0–4, LPC with quantized coefficients), Rice-coded
  * residual partitions (4- and 5-bit parameter forms, escape
  * partitions), wasted-bits shift, all four stereo decorrelation modes
  * (independent, left/side, right/side, mid/side), and the frame-footer
  * CRC-16 — the audio analog of [[Vp8lCodec]]'s pixel layer. The
  * encoder ([[writeFlacPcm]]) emits real spec-conformant streams whose
  * option flags exercise every decoder path; the spec laws round-trip
  * an options × dims matrix exactly and fuzz both layers. Hostile
  * input (bad magic, CRC mismatch, truncation, absurd dims) returns
  * None — the rejects side-channel's problem, same contract as the
  * image codecs. */
object FlacCodec {

  final case class FlacMeta(sampleRate: Int, channels: Int,
                            bitsPerSample: Int, totalSamples: Long,
                            hasTags: Boolean, nBlocks: Int)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff

  def meta(b: Array[Byte]): Option[FlacMeta] = metaEnd(b).map(_._1)

  /** Metadata walk that also reports where the audio frames start. */
  private def metaEnd(b: Array[Byte]): Option[(FlacMeta, Int)] =
    try {
      if (b.length < 4 + 4 + 34) return None
      if (b(0) != 'f' || b(1) != 'L' || b(2) != 'a' || b(3) != 'C') return None
      var p = 4
      var streaminfo: Option[(Int, Int, Int, Long)] = None
      var hasTags = false
      var nBlocks = 0
      var last = false
      while (!last) {
        if (p + 4 > b.length) return None
        val head = u8(b, p)
        last = (head & 0x80) != 0
        val btype = head & 0x7f
        val len = (u8(b, p + 1) << 16) | (u8(b, p + 2) << 8) | u8(b, p + 3)
        p += 4
        if (p.toLong + len > b.length.toLong) return None
        if (btype == 0) {
          // STREAMINFO: 34 bytes; rate/channels/bps/total packed after
          // the block- and frame-size ranges (RFC 9639 §8.2)
          if (len < 34) return None
          val sr = (u8(b, p + 10) << 12) | (u8(b, p + 11) << 4) |
            (u8(b, p + 12) >> 4)
          val ch = ((u8(b, p + 12) >> 1) & 7) + 1
          val bps = (((u8(b, p + 12) & 1) << 4) | (u8(b, p + 13) >> 4)) + 1
          val total = ((u8(b, p + 13) & 0xf).toLong << 32) |
            (u8(b, p + 14).toLong << 24) | (u8(b, p + 15).toLong << 16) |
            (u8(b, p + 16).toLong << 8) | u8(b, p + 17).toLong
          if (sr == 0) return None // 0 is invalid for audio streams
          streaminfo = Some((sr, ch, bps, total))
        } else if (btype == 4) hasTags = true
        else if (btype == 127) return None // forbidden value
        nBlocks += 1
        p += len
      }
      streaminfo.map { case (sr, ch, bps, total) =>
        (FlacMeta(sr, ch, bps, total, hasTags, nBlocks), p)
      }
    } catch {
      case _: IndexOutOfBoundsException => None
    }

  /** Structurally-valid fixture: `fLaC` + STREAMINFO (+ optional
    * VORBIS_COMMENT with one tag + PADDING), no audio frames — the
    * census never reads past the metadata chain. */
  def writeFlacHeader(sampleRate: Int, channels: Int, bitsPerSample: Int,
                      totalSamples: Long, tags: Boolean): Array[Byte] = {
    require(sampleRate > 0 && sampleRate < (1 << 20) &&
      channels >= 1 && channels <= 8 &&
      bitsPerSample >= 4 && bitsPerSample <= 32 &&
      totalSamples >= 0 && totalSamples < (1L << 36), "bad params")
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    def block(btype: Int, last: Boolean, body: Array[Byte]): Unit = {
      out.write((if (last) 0x80 else 0) | btype)
      out.write((body.length >> 16) & 0xff)
      out.write((body.length >> 8) & 0xff)
      out.write(body.length & 0xff)
      out.write(body)
    }
    val si = new Array[Byte](34)
    def be16(i: Int, v: Int): Unit = {
      si(i) = (v >> 8).toByte; si(i + 1) = v.toByte
    }
    be16(0, 1024); be16(2, 1024) // min/max block size (fixed-size stream)
    // min/max frame size 0 = unknown (bytes 4..9 stay zero)
    si(10) = (sampleRate >> 12).toByte
    si(11) = ((sampleRate >> 4) & 0xff).toByte
    si(12) = (((sampleRate & 0xf) << 4) | ((channels - 1) << 1) |
      ((bitsPerSample - 1) >> 4)).toByte
    si(13) = ((((bitsPerSample - 1) & 0xf) << 4) |
      ((totalSamples >> 32) & 0xf).toInt).toByte
    si(14) = ((totalSamples >> 24) & 0xff).toByte
    si(15) = ((totalSamples >> 16) & 0xff).toByte
    si(16) = ((totalSamples >> 8) & 0xff).toByte
    si(17) = (totalSamples & 0xff).toByte
    // MD5 of the unencoded audio: zero = unknown (bytes 18..33)
    block(0, last = !tags, si)
    if (tags) {
      // VORBIS_COMMENT: LE vendor-length + vendor + LE tag count + tags
      val vc = new java.io.ByteArrayOutputStream()
      def le32(v: Int): Unit = {
        vc.write(v & 0xff); vc.write((v >> 8) & 0xff)
        vc.write((v >> 16) & 0xff); vc.write((v >> 24) & 0xff)
      }
      val vendor = "graft".getBytes("UTF-8")
      le32(vendor.length); vc.write(vendor)
      val tag = "TITLE=fixture".getBytes("UTF-8")
      le32(1); le32(tag.length); vc.write(tag)
      block(4, last = false, vc.toByteArray)
      block(1, last = true, new Array[Byte](16)) // PADDING
    }
    out.toByteArray
  }

  // ------------------------------------------------- sample layer: CRCs

  // CRC-8 poly x⁸+x²+x+1 (0x07) over frame header; CRC-16 poly 0x8005
  // over the whole frame — both init 0, per RFC 9639 §9.2/§9.3.
  private val Crc8Table: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i; var k = 0
      while (k < 8) {
        c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff else (c << 1) & 0xff
        k += 1
      }
      t(i) = c; i += 1
    }
    t
  }
  private val Crc16Table: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i << 8; var k = 0
      while (k < 8) {
        c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff
            else (c << 1) & 0xffff
        k += 1
      }
      t(i) = c; i += 1
    }
    t
  }
  private def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var c = 0; var i = from
    while (i < until) { c = Crc8Table(c ^ (b(i) & 0xff)); i += 1 }
    c
  }
  private def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var c = 0; var i = from
    while (i < until) {
      c = Crc16Table((c >> 8) ^ (b(i) & 0xff)) ^ ((c << 8) & 0xffff)
      i += 1
    }
    c
  }

  // ---------------------------------------------- sample layer: bit I/O

  /** MSB-first bit writer (FLAC packs bits big-endian). Per-call local
    * — no shared encoder state under 32 executor threads. */
  private final class BitW {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0; private var nb = 0
    def put(v: Long, bits: Int): Unit = {
      var k = bits - 1
      while (k >= 0) {
        acc = (acc << 1) | ((v >>> k) & 1L).toInt
        nb += 1
        if (nb == 8) { out.write(acc); acc = 0; nb = 0 }
        k -= 1
      }
    }
    def putUnary(q: Int): Unit = {
      var i = 0; while (i < q) { put(0L, 1); i += 1 }; put(1L, 1)
    }
    def bytes: Array[Byte] = { while (nb != 0) put(0L, 1); out.toByteArray }
  }

  /** MSB-first bit reader. Out-of-bounds reads throw (caught at the
    * [[decodePcm]] boundary → None); unary runs are bounded so hostile
    * all-zero streams cannot spin a task. */
  private final class BitR(b: Array[Byte], startByte: Int) {
    private var pos = startByte
    private var bit = 0
    def bytePos: Int = pos
    def align(): Unit = if (bit != 0) { bit = 0; pos += 1 }
    def u1(): Int = {
      val v = (b(pos) >> (7 - bit)) & 1
      bit += 1; if (bit == 8) { bit = 0; pos += 1 }
      v
    }
    def uL(bits: Int): Long = {
      var v = 0L; var i = 0
      while (i < bits) { v = (v << 1) | u1(); i += 1 }
      v
    }
    def u(bits: Int): Int = uL(bits).toInt
    def sL(bits: Int): Long = {
      val v = uL(bits)
      if (bits == 0) 0L
      else if ((v & (1L << (bits - 1))) != 0) v - (1L << bits)
      else v
    }
    def s(bits: Int): Int = sL(bits).toInt
    def unary(): Int = {
      var q = 0
      while (u1() == 0) {
        q += 1
        if (q > (1 << 22)) throw new IllegalArgumentException("unary bound")
      }
      q
    }
  }

  private def mask(bits: Int): Long = if (bits <= 0) 0L else (1L << bits) - 1

  /** UTF-8-style extended coded number (frame/sample number field). */
  private def readUtf8Num(r: BitR): Long = {
    val b0 = r.u(8)
    if ((b0 & 0x80) == 0) return b0.toLong
    var n = 0; var m = 0x40
    while (m != 0 && (b0 & m) != 0) { n += 1; m >>= 1 }
    if (n < 1 || n > 6) throw new IllegalArgumentException("utf8 head")
    var v = (b0 & (m - 1)).toLong
    var i = 0
    while (i < n) {
      val bx = r.u(8)
      if ((bx & 0xc0) != 0x80) throw new IllegalArgumentException("utf8 cont")
      v = (v << 6) | (bx & 0x3f)
      i += 1
    }
    v
  }

  private def writeUtf8Num(w: BitW, v: Long): Unit = {
    if (v < 0x80) { w.put(v, 8); return }
    var n = 1
    while (n < 6 && v >= (1L << (6 + 5 * n))) n += 1
    val headOnes = ((1 << (n + 1)) - 1) << (7 - n)
    val top = ((v >>> (6 * n)) & ((1L << (6 - n)) - 1)).toInt
    w.put((headOnes | top).toLong, 8)
    var i = n - 1
    while (i >= 0) { w.put(0x80L | ((v >>> (6 * i)) & 0x3f), 8); i -= 1 }
  }

  // ---------------------------------------------- sample layer: decoder

  /** Decoded PCM: interleaved frame-major samples, sign-extended. */
  final case class FlacPcm(sampleRate: Int, channels: Int,
                           bitsPerSample: Int, samples: Array[Int])

  /** REAL FLAC frame decode — every subframe type, both Rice parameter
    * widths, escape partitions, wasted bits, all four stereo modes,
    * CRC-8 + CRC-16 verified per frame. Streams with unknown total
    * length, >32-bit effective sample width, or any structural/CRC
    * fault return None (rejects side-channel). */
  def decodePcm(b: Array[Byte]): Option[FlacPcm] =
    try {
      val (fm, dataAt) = metaEnd(b) match {
        case Some(x) => x; case None => return None
      }
      if (fm.totalSamples <= 0 || fm.totalSamples > (1L << 24) ||
          fm.channels > 8 || fm.bitsPerSample > 32) return None
      val total = fm.totalSamples.toInt
      val out = new Array[Int](total * fm.channels)
      var got = 0
      var p = dataAt
      while (got < total) {
        val r = new BitR(b, p)
        if (r.u(14) != 0x3ffe) return None
        if (r.u1() != 0) return None
        r.u1() // blocking strategy — number field is skipped either way
        val bsCode = r.u(4); val srCode = r.u(4)
        val chanCode = r.u(4); val ssCode = r.u(3)
        if (r.u1() != 0) return None
        readUtf8Num(r)
        val blockSize = bsCode match {
          case 0 => return None
          case 1 => 192
          case c if c <= 5 => 576 << (c - 2)
          case 6 => r.u(8) + 1
          case 7 => r.u(16) + 1
          case c => 256 << (c - 8)
        }
        srCode match { // rate itself comes from STREAMINFO; skip fields
          case 12 => r.u(8)
          case 13 | 14 => r.u(16)
          case 15 => return None
          case _ => ()
        }
        if (chanCode > 10) return None
        val nCh = if (chanCode < 8) chanCode + 1 else 2
        if (nCh != fm.channels) return None
        val bps = ssCode match {
          case 0 => fm.bitsPerSample
          case 1 => 8; case 2 => 12; case 3 => return None
          case 4 => 16; case 5 => 20; case 6 => 24; case 7 => 32
        }
        val hEnd = r.bytePos
        if (crc8(b, p, hEnd) != r.u(8)) return None
        if (blockSize <= 0 || got + blockSize > total) return None
        val chans = new Array[Array[Int]](nCh)
        var c = 0
        while (c < nCh) {
          val extra = chanCode match {
            case 8 => if (c == 1) 1 else 0  // left/side
            case 9 => if (c == 0) 1 else 0  // side/right
            case 10 => if (c == 1) 1 else 0 // mid/side
            case _ => 0
          }
          chans(c) = decodeSubframe(r, blockSize, bps + extra) match {
            case Some(x) => x; case None => return None
          }
          c += 1
        }
        chanCode match {
          case 8 => // stored (left, side): right = left - side
            var i = 0
            while (i < blockSize) {
              chans(1)(i) = chans(0)(i) - chans(1)(i); i += 1
            }
          case 9 => // stored (side, right): left = side + right
            var i = 0
            while (i < blockSize) {
              chans(0)(i) = chans(0)(i) + chans(1)(i); i += 1
            }
          case 10 => // stored (mid, side): mid = (l+r)>>1, side = l-r
            var i = 0
            while (i < blockSize) {
              val side = chans(1)(i)
              val lrSum = (chans(0)(i) << 1) | (side & 1)
              chans(0)(i) = (lrSum + side) >> 1
              chans(1)(i) = (lrSum - side) >> 1
              i += 1
            }
          case _ => ()
        }
        r.align()
        val fEnd = r.bytePos
        if (crc16(b, p, fEnd) != r.u(16)) return None
        var s = 0
        while (s < blockSize) {
          var c2 = 0
          while (c2 < nCh) {
            out((got + s) * nCh + c2) = chans(c2)(s); c2 += 1
          }
          s += 1
        }
        got += blockSize
        p = r.bytePos
      }
      Some(FlacPcm(fm.sampleRate, fm.channels, fm.bitsPerSample, out))
    } catch {
      case _: IndexOutOfBoundsException | _: IllegalArgumentException |
           _: NegativeArraySizeException | _: MatchError => None
    }

  private def decodeSubframe(r: BitR, n: Int, bps0: Int): Option[Array[Int]] = {
    if (r.u1() != 0) return None
    val t = r.u(6)
    var wasted = 0
    if (r.u1() == 1) wasted = r.unary() + 1
    val bps = bps0 - wasted
    if (bps <= 0 || bps > 32) return None
    val out = new Array[Int](n)
    if (t == 0) { // constant
      java.util.Arrays.fill(out, r.s(bps))
    } else if (t == 1) { // verbatim
      var i = 0; while (i < n) { out(i) = r.s(bps); i += 1 }
    } else if ((t & 0x38) == 0x08 && (t & 7) <= 4) { // fixed 001xxx
      val order = t & 7
      if (order > n) return None
      var i = 0
      while (i < order) { out(i) = r.s(bps); i += 1 }
      val res = readResidual(r, n, order) match {
        case Some(x) => x; case None => return None
      }
      i = order
      while (i < n) {
        val pred = order match {
          case 0 => 0L
          case 1 => out(i - 1).toLong
          case 2 => 2L * out(i - 1) - out(i - 2)
          case 3 => 3L * out(i - 1) - 3L * out(i - 2) + out(i - 3)
          case _ => 4L * out(i - 1) - 6L * out(i - 2) +
                    4L * out(i - 3) - out(i - 4)
        }
        val v = res(i - order) + pred
        if (v < Int.MinValue || v > Int.MaxValue) return None
        out(i) = v.toInt
        i += 1
      }
    } else if ((t & 0x20) == 0x20) { // LPC 1xxxxx
      val order = (t & 0x1f) + 1
      if (order > n) return None
      var i = 0
      while (i < order) { out(i) = r.s(bps); i += 1 }
      val precM1 = r.u(4)
      if (precM1 == 15) return None
      val prec = precM1 + 1
      val shift = r.s(5)
      if (shift < 0) return None
      val coef = new Array[Int](order)
      i = 0
      while (i < order) { coef(i) = r.s(prec); i += 1 }
      val res = readResidual(r, n, order) match {
        case Some(x) => x; case None => return None
      }
      i = order
      while (i < n) {
        var acc = 0L; var j = 0
        while (j < order) { acc += coef(j).toLong * out(i - 1 - j); j += 1 }
        val v = res(i - order) + (acc >> shift)
        if (v < Int.MinValue || v > Int.MaxValue) return None
        out(i) = v.toInt
        i += 1
      }
    } else return None
    if (wasted > 0) {
      var i = 0; while (i < n) { out(i) = out(i) << wasted; i += 1 }
    }
    Some(out)
  }

  private def readResidual(r: BitR, n: Int, order: Int): Option[Array[Long]] = {
    val method = r.u(2)
    if (method > 1) return None
    val pBits = if (method == 0) 4 else 5
    val esc = if (method == 0) 15 else 31
    val pOrd = r.u(4)
    if (pOrd > 15) return None
    val parts = 1 << pOrd
    if (n % parts != 0) return None
    val per = n / parts
    if (per < order || (per == order && parts == 1)) return None
    val out = new Array[Long](n - order)
    var idx = 0; var part = 0
    while (part < parts) {
      val cnt = if (part == 0) per - order else per
      val param = r.u(pBits)
      if (param == esc) {
        val raw = r.u(5)
        var i = 0
        while (i < cnt) {
          out(idx) = if (raw == 0) 0L else r.sL(raw)
          idx += 1; i += 1
        }
      } else {
        var i = 0
        while (i < cnt) {
          val q = r.unary()
          val u = (q.toLong << param) | r.uL(param)
          out(idx) = (u >>> 1) ^ -(u & 1L)
          idx += 1; i += 1
        }
      }
      part += 1
    }
    Some(out)
  }

  // ---------------------------------------------- sample layer: encoder

  /** Encoder options — each field selects a decoder path; the spec laws
    * sweep the matrix. `subframe` selects the subframe type for channel
    * 0 (channel c uses `(subframe + c) % 9`): 0 verbatim, 1 constant
    * when possible (else fixed-1), 2–6 fixed order 0–4, 7 LPC order 1
    * (coef [1]), 8 LPC order 2 (coef [2,-1]) — the LPC forms predict
    * like fixed 1/2 but travel the quantized-coefficient path.
    * `stereoMode`: 0 independent, 1 left/side, 2 right/side, 3
    * mid/side. */
  final case class FlacOpts(blockSize: Int = 256,
                            stereoMode: Int = 0,
                            subframe: Int = 2,
                            partOrder: Int = 0,
                            rice5: Boolean = false,
                            escape: Boolean = false,
                            wasted: Boolean = false,
                            rateInHeader: Boolean = false,
                            blockSizeCode16: Boolean = false)

  /** Real spec-conformant FLAC stream from 16-bit PCM: STREAMINFO +
    * fixed-blocksize frames whose subframe/stereo/Rice forms follow
    * `opts`. Lossless — [[decodePcm]] round-trips it exactly (spec
    * law over the full options × dims matrix). */
  def writeFlacPcm(sampleRate: Int, channels: Int, nSamples: Int,
                   sample: (Int, Int) => Short,
                   opts: FlacOpts = FlacOpts()): Array[Byte] = {
    require(sampleRate > 0 && sampleRate < (1 << 20) &&
      channels >= 1 && channels <= 8 &&
      nSamples > 0 && nSamples <= (1 << 22), "bad params")
    val bs0 = math.max(1, math.min(opts.blockSize, 65535))
    val pcm = Array.tabulate(channels) { c =>
      Array.tabulate(nSamples)(s => sample(s, c).toInt)
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    out.write(0x80); out.write(0); out.write(0); out.write(34)
    val si = new Array[Byte](34)
    val sibs = math.max(16, bs0)
    si(0) = (sibs >> 8).toByte; si(1) = sibs.toByte
    si(2) = (sibs >> 8).toByte; si(3) = sibs.toByte
    si(10) = (sampleRate >> 12).toByte
    si(11) = ((sampleRate >> 4) & 0xff).toByte
    si(12) = (((sampleRate & 0xf) << 4) | ((channels - 1) << 1) |
      ((16 - 1) >> 4)).toByte
    si(13) = ((((16 - 1) & 0xf) << 4) | ((nSamples.toLong >> 32) & 0xf).toInt).toByte
    si(14) = ((nSamples >> 24) & 0xff).toByte
    si(15) = ((nSamples >> 16) & 0xff).toByte
    si(16) = ((nSamples >> 8) & 0xff).toByte
    si(17) = (nSamples & 0xff).toByte
    out.write(si)
    val stereo = channels == 2 && opts.stereoMode >= 1 && opts.stereoMode <= 3
    val chanCode = if (stereo) 7 + opts.stereoMode else channels - 1
    var f = 0; var done = 0
    while (done < nSamples) {
      val cnt = math.min(bs0, nSamples - done)
      // per-channel (data, bps) after the stereo pre-transform
      val slices = Array.tabulate(channels)(c =>
        java.util.Arrays.copyOfRange(pcm(c), done, done + cnt))
      val subs: Array[(Array[Int], Int)] =
        if (!stereo) slices.map(d => (d, 16))
        else {
          val l = slices(0); val rr = slices(1)
          val side = Array.tabulate(cnt)(i => l(i) - rr(i))
          opts.stereoMode match {
            case 1 => Array((l, 16), (side, 17))
            case 2 => Array((side, 17), (rr, 16))
            case _ =>
              val mid = Array.tabulate(cnt)(i => (l(i) + rr(i)) >> 1)
              Array((mid, 16), (side, 17))
          }
        }
      val hw = new BitW
      hw.put(0x3ffeL, 14); hw.put(0L, 1); hw.put(0L, 1)
      val bsCode =
        if (opts.blockSizeCode16) 7
        else if (cnt == 192) 1
        else if (cnt >= 576 && Integer.bitCount(cnt / 576) == 1 &&
                 cnt % 576 == 0 && cnt / 576 <= 8) 2 + Integer.numberOfTrailingZeros(cnt / 576)
        else if (cnt >= 256 && Integer.bitCount(cnt) == 1 && cnt <= 32768) 8 + Integer.numberOfTrailingZeros(cnt / 256)
        else if (cnt <= 256) 6
        else 7
      hw.put(bsCode.toLong, 4)
      val srCode =
        if (opts.rateInHeader && sampleRate <= 65535) 13
        else if (sampleRate == 8000) 4
        else 0
      hw.put(srCode.toLong, 4)
      hw.put(chanCode.toLong, 4); hw.put(4L, 3); hw.put(0L, 1)
      writeUtf8Num(hw, f.toLong)
      if (bsCode == 6) hw.put((cnt - 1).toLong, 8)
      else if (bsCode == 7) hw.put((cnt - 1).toLong, 16)
      if (srCode == 13) hw.put(sampleRate.toLong, 16)
      val hb = hw.bytes
      val fw = new BitW
      var c = 0
      while (c < subs.length) {
        encodeSubframe(fw, subs(c)._1, subs(c)._2,
          (opts.subframe + c) % 9, opts)
        c += 1
      }
      val body = fw.bytes
      val fb = new java.io.ByteArrayOutputStream()
      fb.write(hb, 0, hb.length)
      fb.write(crc8(hb, 0, hb.length))
      fb.write(body, 0, body.length)
      val fbytes = fb.toByteArray
      val c16 = crc16(fbytes, 0, fbytes.length)
      out.write(fbytes, 0, fbytes.length)
      out.write((c16 >> 8) & 0xff); out.write(c16 & 0xff)
      done += cnt; f += 1
    }
    out.toByteArray
  }

  private def putWasted(w: BitW, k: Int): Unit =
    if (k == 0) w.put(0L, 1)
    else {
      w.put(1L, 1)
      var i = 0; while (i < k - 1) { w.put(0L, 1); i += 1 }
      w.put(1L, 1)
    }

  private def encodeSubframe(w: BitW, data0: Array[Int], bps0: Int,
                             sel: Int, opts: FlacOpts): Unit = {
    val n = data0.length
    var wasted = 0
    if (opts.wasted) {
      var k = 32; var all0 = true; var i = 0
      while (i < n) {
        val v = data0(i)
        if (v != 0) {
          all0 = false
          k = math.min(k, java.lang.Integer.numberOfTrailingZeros(v))
        }
        i += 1
      }
      if (!all0 && k > 0) wasted = math.min(k, bps0 - 1)
    }
    val bps = bps0 - wasted
    val data = if (wasted == 0) data0 else data0.map(_ >> wasted)
    var allEq = true
    var eqI = 1
    while (eqI < n) { if (data(eqI) != data(0)) allEq = false; eqI += 1 }
    val kind = if (sel == 1) { if (allEq) 1 else 3 } else sel
    w.put(0L, 1)
    def verbatim(): Unit = {
      w.put(1L, 6); putWasted(w, wasted)
      var i = 0; while (i < n) { w.put(data(i).toLong & mask(bps), bps); i += 1 }
    }
    kind match {
      case 0 => verbatim()
      case 1 =>
        w.put(0L, 6); putWasted(w, wasted)
        w.put(data(0).toLong & mask(bps), bps)
      case k2 if k2 >= 2 && k2 <= 6 =>
        val ord = math.min(k2 - 2, math.max(0, n - 1))
        w.put((8 | ord).toLong, 6); putWasted(w, wasted)
        var i = 0
        while (i < ord) { w.put(data(i).toLong & mask(bps), bps); i += 1 }
        writeResidual(w, fixedResidual(data, ord), n, ord, opts)
      case _ =>
        val ordWant = kind - 6
        if (n <= ordWant) verbatim()
        else {
          w.put((0x20 | (ordWant - 1)).toLong, 6); putWasted(w, wasted)
          var i = 0
          while (i < ordWant) { w.put(data(i).toLong & mask(bps), bps); i += 1 }
          w.put(14L, 4) // precision 15
          w.put(0L, 5)  // shift 0
          val coef = if (ordWant == 1) Array(1) else Array(2, -1)
          i = 0
          while (i < ordWant) { w.put(coef(i).toLong & 0x7fff, 15); i += 1 }
          writeResidual(w, lpcResidual(data, coef), n, ordWant, opts)
        }
    }
  }

  private def fixedResidual(x: Array[Int], ord: Int): Array[Long] = {
    val n = x.length
    val out = new Array[Long](n - ord)
    var i = ord
    while (i < n) {
      out(i - ord) = ord match {
        case 0 => x(i).toLong
        case 1 => x(i).toLong - x(i - 1)
        case 2 => x(i).toLong - 2L * x(i - 1) + x(i - 2)
        case 3 => x(i).toLong - 3L * x(i - 1) + 3L * x(i - 2) - x(i - 3)
        case _ => x(i).toLong - 4L * x(i - 1) + 6L * x(i - 2) -
                  4L * x(i - 3) + x(i - 4)
      }
      i += 1
    }
    out
  }

  private def lpcResidual(x: Array[Int], coef: Array[Int]): Array[Long] = {
    val ord = coef.length; val n = x.length
    val out = new Array[Long](n - ord)
    var i = ord
    while (i < n) {
      var acc = 0L; var j = 0
      while (j < ord) { acc += coef(j).toLong * x(i - 1 - j); j += 1 }
      out(i - ord) = x(i).toLong - acc // shift 0
      i += 1
    }
    out
  }

  private def writeResidual(w: BitW, res: Array[Long], n: Int, order: Int,
                            opts: FlacOpts): Unit = {
    val pBits = if (opts.rice5) 5 else 4
    val esc = if (opts.rice5) 31 else 15
    w.put(if (opts.rice5) 1L else 0L, 2)
    var pOrd = math.max(0, math.min(opts.partOrder, 4))
    while (pOrd > 0 &&
           (n % (1 << pOrd) != 0 || n / (1 << pOrd) <= order)) pOrd -= 1
    if (pOrd == 0 && n <= order) pOrd = 0 // degenerate: zero residuals
    w.put(pOrd.toLong, 4)
    val parts = 1 << pOrd
    val per = n / parts
    var idx = 0; var part = 0
    while (part < parts) {
      val cnt = if (part == 0) per - order else per
      if (opts.escape) {
        var raw = 0; var i = 0
        while (i < cnt) {
          val v = res(idx + i); var bnd = 1
          while (v < -(1L << (bnd - 1)) || v >= (1L << (bnd - 1))) bnd += 1
          if (bnd > raw) raw = bnd
          i += 1
        }
        w.put(esc.toLong, pBits); w.put(raw.toLong, 5)
        i = 0
        while (i < cnt) { w.put(res(idx + i) & mask(raw), raw); i += 1 }
      } else {
        // parameter: start at the folded mean's magnitude, then bound
        // the worst-case unary run
        var sum = 0L; var worst = 0L; var i = 0
        while (i < cnt) {
          val v = res(idx + i); val u = (v << 1) ^ (v >> 63)
          sum += u; if (u > worst) worst = u
          i += 1
        }
        val mean = if (cnt == 0) 0L else sum / cnt
        var k = 0
        while (k < esc - 1 && (1L << (k + 1)) < mean + 1) k += 1
        while (k < esc - 1 && (worst >>> k) > 48) k += 1
        w.put(k.toLong, pBits)
        i = 0
        while (i < cnt) {
          val v = res(idx + i); val u = (v << 1) ^ (v >> 63)
          w.putUnary((u >>> k).toInt)
          if (k > 0) w.put(u & mask(k), k)
          i += 1
        }
      }
      idx += cnt
      part += 1
    }
  }
}
