package graft.functions

/** Pure-JVM Vorbis I codec — REAL sample decode for the dominant
  * compressed web-audio format, plus the mirrored encoder that makes
  * the decode oracle-gateable in a container with no libvorbis.
  *
  * Decode follows the Vorbis I specification (Xiph.Org, 2020-07-04)
  * structurally: Ogg depacketization (RFC 3533 lacing, CRC-gated like
  * [[OggCodec]]), the three header packets, codebook parse with the
  * spec's canonical codeword-assignment algorithm and lookup-type-1/2
  * VQ tables (float32_unpack per §9.2.2), floor type 1 with the spec's
  * INTEGER render_line / render_point / neighbor algorithms (§7.2.3-4,
  * bit-exact across platforms by construction), residue types 0/1/2
  * with the 8-pass cascade (§8.6.2-5), square-polar channel coupling
  * (§4.3.5), the window-shape machinery for long/short block
  * transitions (§4.3.1), and a direct O(n²) IMDCT of the spec's basis
  * with overlap-add on an absolute timeline. Granule truncation per
  * the Ogg mapping.
  *
  * The ENCODER is an exact mirror (analysis window → forward MDCT →
  * two-pass coarse/fine residue quantization on a 1/32 grid → the same
  * partition/classword traversal in reverse), emitting spec-conformant
  * streams: real id/comment/setup headers, complete-tree Huffman
  * codebooks, a flat floor at curve index 255 (whose inverse-dB value
  * is exactly 1.0, so the spectrum IS the residue grid value — the
  * device that keeps the lossy round-trip on a predictable grid, same
  * trick as the JPEG mid-band fixtures). Worst-case time-domain drift
  * is bounded by halfN·(fineDelta/2)·2 ≤ 4, so fixtures whose samples
  * sit on a 64-step amplitude grid decode back EXACTLY after snapping.
  *
  * Honesty notes: no libvorbis/ffmpeg exists in this container, so
  * conformance is own-encoder round-trip + structural spec fidelity,
  * stated as such (the same gate the PDF and VP8-encoder layers use).
  * The inverse-dB table is generated from the spec's generator curve
  * (10^(-7·(255-i)/255) shape, table[255] = 1.0 exactly — the only
  * entry our streams use); end-of-packet mid-decode routes the stream
  * to rejects rather than zero-filling. Hostile input returns None.
  *
  * Reference behavior anchor: /root/reference has no audio handling at
  * all (PySpark ETL only) — this operator family is builder's-brief
  * scope (100 TB crawl curation), cited to the public spec.
  */
object VorbisCodec {

  // ------------------------------------------------------------ errors
  private final class Bail extends RuntimeException with
    scala.util.control.NoStackTrace
  private def bail(): Nothing = throw new Bail

  // ------------------------------------------------- bit IO (LSb-first)
  /** Vorbis bitpacker read side: bit 0 of byte 0 first. */
  final class BitReader(b: Array[Byte], from: Int, until: Int) {
    private var pos = from
    private var bit = 0
    def read(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        if (pos >= until) bail()
        v |= (((b(pos) >> bit) & 1) << i)
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        i += 1
      }
      v
    }
    /** Read n bits WITHOUT consuming, zero-padded past end-of-packet
      * (the Huffman fast path peeks a fixed window). */
    def peekBits(n: Int): Int = {
      var v = 0
      var p = pos
      var bi = bit
      var i = 0
      while (i < n) {
        if (p < until) v |= (((b(p) >> bi) & 1) << i)
        bi += 1
        if (bi == 8) { bi = 0; p += 1 }
        i += 1
      }
      v
    }
    def skip(n: Int): Unit = {
      val total = bit + n
      pos += total >> 3
      bit = total & 7
      if (pos > until || (pos == until && bit > 0)) bail()
    }
    def readLong(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) {
        if (pos >= until) bail()
        v |= (((b(pos) >> bit) & 1).toLong << i)
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        i += 1
      }
      v
    }
    def readBit(): Int = read(1)
  }

  /** Vorbis bitpacker write side. */
  final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var bit = 0
    def write(v: Int, n: Int): Unit = writeLong(v.toLong & 0xffffffffL, n)
    def writeLong(v: Long, n: Int): Unit = {
      var i = 0
      while (i < n) {
        cur |= (((v >> i) & 1L).toInt << bit)
        bit += 1
        if (bit == 8) { out.write(cur); cur = 0; bit = 0 }
        i += 1
      }
    }
    def writeBit(v: Int): Unit = write(v & 1, 1)
    def bytes: Array[Byte] = {
      if (bit > 0) { out.write(cur); cur = 0; bit = 0 }
      out.toByteArray
    }
  }

  /** Huffman fast-path window width (≥ the longest code our encoder
    * emits, so corpus decode never touches the map fallback). */
  private val FastBits = 12

  /** Spec ilog: position of the highest set bit; ilog(0)=0, ilog(7)=3. */
  def ilog(x0: Int): Int = {
    var x = x0; var r = 0
    while (x > 0) { r += 1; x >>= 1 }
    r
  }

  // ------------------------------------------------ float32 pack/unpack
  /** §9.2.2 float32_unpack: 21-bit mantissa, 10-bit exponent biased 788,
    * sign bit 31. */
  def float32Unpack(x: Long): Double = {
    val mant = (x & 0x1fffffL).toDouble
    val exp = ((x & 0x7fe00000L) >> 21).toInt
    val m = if ((x & 0x80000000L) != 0) -mant else mant
    m * math.pow(2.0, (exp - 788).toDouble)
  }

  /** Inverse for dyadic rationals (all our codebook params are). */
  def float32Pack(v: Double): Long = {
    if (v == 0.0) return 0L
    var m = math.abs(v)
    var exp = 788
    while (m < (1L << 20) && exp > 0) { m *= 2; exp -= 1 }
    while (m >= (1L << 21)) { m /= 2; exp += 1 }
    val mi = math.rint(m).toLong
    require(mi * math.pow(2.0, (exp - 788).toDouble) == math.abs(v),
      s"not dyadic-representable: $v")
    (if (v < 0) 0x80000000L else 0L) | (exp.toLong << 21) | mi
  }

  // ------------------------------------------------------- codebooks
  /** One codebook: Huffman lengths per entry (0 = unused) plus the
    * optional VQ lookup (type 1 implicit grid / type 2 explicit). */
  final case class Codebook(dims: Int, lengths: Array[Int],
                            lookupType: Int = 0,
                            minimum: Double = 0.0, delta: Double = 0.0,
                            valueBits: Int = 0, sequenceP: Boolean = false,
                            mults: Array[Int] = Array.emptyIntArray) {
    def entries: Int = lengths.length

    /** §3.2.1 lookup1_values: largest v with v^dims <= entries. A VAL —
      * [[vqVector]] runs per decoded symbol, and an O(entries) probe
      * there turned the decode hot loop quadratic (caught by jstack on
      * the first corpus bench, 800+ s in this frame). */
    lazy val lookup1Values: Int = {
      def pow(v: Int): Long = {
        var r = 1L
        var i = 0
        while (i < dims) {
          r *= v
          if (r > entries) return Long.MaxValue
          i += 1
        }
        r
      }
      var v = 1
      while (pow(v + 1) <= entries) v += 1
      v
    }

    /** Per-entry VQ vectors, materialized once per codebook (decode
      * reads one per symbol — table build is O(entries·dims), bounded
      * by the read-time size gate). */
    lazy val vqTable: Array[Array[Double]] =
      Array.tabulate(entries)(vqVectorSlow)

    /** Canonical codeword per entry (MSB-first value; -1 unused), via the
      * spec's first-fit tree-building algorithm. */
    lazy val codewords: Array[Int] = {
      val cw = Array.fill(entries)(-1)
      val available = new Array[Long](33)
      var first = true
      var i = 0
      while (i < entries) {
        val len = lengths(i)
        if (len > 0) {
          if (len > 32) bail()
          if (first) {
            cw(i) = 0
            var j = 1
            while (j <= len) { available(j) = 1L << (32 - j); j += 1 }
            first = false
          } else {
            var z = len
            while (z > 0 && available(z) == 0L) z -= 1
            if (z == 0) bail() // over-specified tree
            val res = available(z)
            available(z) = 0L
            cw(i) = (res >>> (32 - len)).toInt
            var y = len
            while (y > z) { available(y) = res + (1L << (32 - y)); y -= 1 }
          }
        }
        i += 1
      }
      cw
    }

    /** (len<<32 | code) -> entry. */
    lazy val decodeMap: java.util.HashMap[java.lang.Long, Integer] = {
      val m = new java.util.HashMap[java.lang.Long, Integer]()
      var i = 0
      while (i < entries) {
        if (lengths(i) > 0)
          m.put((lengths(i).toLong << 32) | (codewords(i).toLong & 0xffffffffL), i)
        i += 1
      }
      m
    }

    /** Flat lookup over the first [[FastBits]] stream bits (LSb-first
      * peek order): value = entry<<6 | len, -1 = no code ≤ FastBits
      * here. Covers every book our encoder emits (max len 11); longer
      * codes fall back to the per-bit map walk. */
    lazy val fastTable: Array[Int] = {
      val t = Array.fill(1 << FastBits)(-1)
      var e = 0
      while (e < entries) {
        val len = lengths(e)
        if (len > 0 && len <= FastBits) {
          // reverse the MSB-first codeword into peek bit order
          var base = 0
          var i = 0
          while (i < len) {
            base |= ((codewords(e) >> (len - 1 - i)) & 1) << i
            i += 1
          }
          var s = 0
          while (s < (1 << (FastBits - len))) {
            t(base | (s << len)) = (e << 6) | len
            s += 1
          }
        }
        e += 1
      }
      t
    }

    def decodeScalar(br: BitReader): Int = {
      val hit = fastTable(br.peekBits(FastBits))
      if (hit >= 0) {
        br.skip(hit & 63)
        return hit >>> 6
      }
      var code = 0L
      var len = 0
      while (len <= 32) {
        code = (code << 1) | br.readBit()
        len += 1
        if (len > FastBits) {
          val e = decodeMap.get((len.toLong << 32) | code)
          if (e != null) return e.intValue()
        }
      }
      bail()
    }

    def vqVector(entry: Int): Array[Double] = vqTable(entry)

    /** VQ vector for an entry (§3.3: lookup type 1 implicit multiplicand
      * grid with sequence_p accumulation, type 2 explicit list). */
    private def vqVectorSlow(entry: Int): Array[Double] = {
      val out = new Array[Double](dims)
      var last = 0.0
      if (lookupType == 1) {
        val lv = lookup1Values
        var div = 1
        var j = 0
        while (j < dims) {
          val off = (entry / div) % lv
          out(j) = mults(off) * delta + minimum + last
          if (sequenceP) last = out(j)
          div *= lv
          j += 1
        }
      } else if (lookupType == 2) {
        var j = 0
        while (j < dims) {
          out(j) = mults(entry * dims + j) * delta + minimum + last
          if (sequenceP) last = out(j)
          j += 1
        }
      } else bail()
      out
    }

    def writeCodeword(bw: BitWriter, entry: Int): Unit = {
      val len = lengths(entry)
      val code = codewords(entry)
      var i = len - 1
      while (i >= 0) { bw.writeBit((code >> i) & 1); i -= 1 }
    }

    def writeConfig(bw: BitWriter): Unit = {
      bw.write(0x564342, 24)
      bw.write(dims, 16)
      bw.write(entries, 24)
      bw.writeBit(0) // not ordered
      bw.writeBit(0) // not sparse
      var i = 0
      while (i < entries) { bw.write(lengths(i) - 1, 5); i += 1 }
      bw.write(lookupType, 4)
      if (lookupType == 1 || lookupType == 2) {
        bw.writeLong(float32Pack(minimum), 32)
        bw.writeLong(float32Pack(delta), 32)
        bw.write(valueBits - 1, 4)
        bw.writeBit(if (sequenceP) 1 else 0)
        val n = if (lookupType == 1) lookup1Values else entries * dims
        require(mults.length == n, s"mults ${mults.length} != $n")
        var j = 0
        while (j < n) { bw.write(mults(j), valueBits); j += 1 }
      }
    }
  }

  def readCodebook(br: BitReader): Codebook = {
    if (br.read(24) != 0x564342) bail()
    val dims = br.read(16)
    val entries = br.read(24)
    if (dims <= 0 || entries <= 0 || entries > (1 << 22)) bail()
    val lengths = new Array[Int](entries)
    val ordered = br.readBit() == 1
    if (!ordered) {
      val sparse = br.readBit() == 1
      var i = 0
      while (i < entries) {
        if (sparse) {
          if (br.readBit() == 1) lengths(i) = br.read(5) + 1
        } else lengths(i) = br.read(5) + 1
        i += 1
      }
    } else {
      var cur = 0
      var len = br.read(5) + 1
      while (cur < entries) {
        val num = br.read(ilog(entries - cur))
        if (cur + num > entries) bail()
        var j = 0
        while (j < num) { lengths(cur + j) = len; j += 1 }
        cur += num
        len += 1
        if (len > 32) bail()
      }
    }
    val lookupType = br.read(4)
    if (lookupType == 0) Codebook(dims, lengths)
    else if (lookupType == 1 || lookupType == 2) {
      val minimum = float32Unpack(br.readLong(32))
      val delta = float32Unpack(br.readLong(32))
      val valueBits = br.read(4) + 1
      val seqP = br.readBit() == 1
      val cb0 = Codebook(dims, lengths, lookupType, minimum, delta,
        valueBits, seqP)
      // size gate: the decoder materializes entries×dims VQ values
      if (entries.toLong * dims > (1 << 22)) bail()
      val n = if (lookupType == 1) cb0.lookup1Values else entries * dims
      if (n > (1 << 22)) bail()
      val mults = new Array[Int](n)
      var j = 0
      while (j < n) { mults(j) = br.read(valueBits); j += 1 }
      cb0.copy(mults = mults)
    } else bail()
  }

  // --------------------------------------------------------- floor 1
  final case class Floor1(partitionClasses: Array[Int],
                          classDims: Array[Int],
                          classSubclasses: Array[Int],
                          classMasterbooks: Array[Int],
                          subclassBooks: Array[Array[Int]],
                          multiplier: Int, rangebits: Int,
                          xList: Array[Int]) {
    def range: Int = Array(256, 128, 86, 64)(multiplier - 1)
    def yBits: Int = ilog(range - 1)

    def writeConfig(bw: BitWriter): Unit = {
      bw.write(1, 16) // floor type 1
      bw.write(partitionClasses.length, 5)
      partitionClasses.foreach(c => bw.write(c, 4))
      val maxClass = if (partitionClasses.isEmpty) -1
        else partitionClasses.max
      for (c <- 0 to maxClass) {
        bw.write(classDims(c) - 1, 3)
        bw.write(classSubclasses(c), 2)
        if (classSubclasses(c) != 0) bw.write(classMasterbooks(c), 8)
        for (j <- 0 until (1 << classSubclasses(c)))
          bw.write(subclassBooks(c)(j) + 1, 8)
      }
      bw.write(multiplier - 1, 2)
      bw.write(rangebits, 4)
      var k = 2
      for (i <- partitionClasses.indices; _ <- 0 until
             classDims(partitionClasses(i))) {
        bw.write(xList(k), rangebits)
        k += 1
      }
    }
  }

  def readFloor1(br: BitReader): Floor1 = {
    val partitions = br.read(5)
    val pcls = Array.fill(partitions)(br.read(4))
    val maxClass = if (partitions == 0) -1 else pcls.max
    val dims = new Array[Int](maxClass + 1)
    val subs = new Array[Int](maxClass + 1)
    val masters = Array.fill(maxClass + 1)(-1)
    val sbooks = new Array[Array[Int]](maxClass + 1)
    for (c <- 0 to maxClass) {
      dims(c) = br.read(3) + 1
      subs(c) = br.read(2)
      if (subs(c) != 0) masters(c) = br.read(8)
      sbooks(c) = Array.fill(1 << subs(c))(br.read(8) - 1)
    }
    val multiplier = br.read(2) + 1
    val rangebits = br.read(4)
    val xs = scala.collection.mutable.ArrayBuffer[Int](0, 1 << rangebits)
    for (i <- 0 until partitions; _ <- 0 until dims(pcls(i)))
      xs += br.read(rangebits)
    if (xs.length > 65 || xs.distinct.length != xs.length) bail()
    Floor1(pcls, dims, subs, masters, sbooks, multiplier, rangebits,
      xs.toArray)
  }

  /** §9.2.6 low_neighbor: index (below i) of the greatest x smaller
    * than x(i); high_neighbor: least x greater. */
  private def lowNeighbor(x: Array[Int], i: Int): Int = {
    var best = -1
    var j = 0
    while (j < i) {
      if (x(j) < x(i) && (best < 0 || x(j) > x(best))) best = j
      j += 1
    }
    if (best < 0) bail()
    best
  }
  private def highNeighbor(x: Array[Int], i: Int): Int = {
    var best = -1
    var j = 0
    while (j < i) {
      if (x(j) > x(i) && (best < 0 || x(j) < x(best))) best = j
      j += 1
    }
    if (best < 0) bail()
    best
  }

  /** §9.2.7 render_point — pure integer. */
  def renderPoint(x0: Int, y0: Int, x1: Int, y1: Int, x: Int): Int = {
    val dy = y1 - y0
    val adx = x1 - x0
    val ady = math.abs(dy)
    val err = ady * (x - x0)
    val off = err / adx
    if (dy < 0) y0 - off else y0 + off
  }

  /** §9.2.8 render_line — pure integer Bresenham into v[x0, min(x1,n)). */
  def renderLine(x0: Int, y0: Int, x1: Int, y1: Int, v: Array[Int],
                 n: Int): Unit = {
    val dy = y1 - y0
    val adx = x1 - x0
    var ady = math.abs(dy)
    val base = dy / adx
    var x = x0
    var y = y0
    var err = 0
    val sy = if (dy < 0) base - 1 else base + 1
    ady -= math.abs(base) * adx
    if (x0 < n) v(x0) = y
    x = x0 + 1
    while (x < math.min(x1, n)) {
      err += ady
      if (err >= adx) { err -= adx; y += sy } else y += base
      v(x) = y
      x += 1
    }
  }

  /** Decoded floor1 packet state: the final Y values (curve synthesis
    * deferred so the encoder can reuse the decode struct). */
  final case class Floor1Packet(finalY: Array[Int], step2: Array[Boolean])

  /** §7.2.3 floor1 packet decode; None = "unused" (silent channel). */
  def decodeFloor1Packet(br: BitReader, f: Floor1,
                         books: Array[Codebook]): Option[Floor1Packet] = {
    if (br.readBit() == 0) return None
    val values = f.xList.length
    val y = new Array[Int](values)
    y(0) = br.read(f.yBits)
    y(1) = br.read(f.yBits)
    var offset = 2
    var i = 0
    while (i < f.partitionClasses.length) {
      val cls = f.partitionClasses(i)
      val cdim = f.classDims(cls)
      val cbits = f.classSubclasses(cls)
      val csub = (1 << cbits) - 1
      var cval = 0
      if (cbits > 0) cval = books(f.classMasterbooks(cls)).decodeScalar(br)
      var j = 0
      while (j < cdim) {
        val book = f.subclassBooks(cls)(cval & csub)
        cval >>>= cbits
        y(offset + j) = if (book >= 0) books(book).decodeScalar(br) else 0
        j += 1
      }
      offset += cdim
      i += 1
    }
    // §7.2.4 step 1: amplitude value synthesis
    val range = f.range
    val finalY = new Array[Int](values)
    val step2 = new Array[Boolean](values)
    finalY(0) = y(0); finalY(1) = y(1)
    step2(0) = true; step2(1) = true
    i = 2
    while (i < values) {
      val lo = lowNeighbor(f.xList, i)
      val hi = highNeighbor(f.xList, i)
      val predicted = renderPoint(f.xList(lo), finalY(lo),
        f.xList(hi), finalY(hi), f.xList(i))
      val v = y(i)
      val highroom = range - predicted
      val lowroom = predicted
      val room = 2 * math.min(highroom, lowroom)
      if (v != 0) {
        step2(lo) = true; step2(hi) = true; step2(i) = true
        finalY(i) =
          if (v >= room) {
            if (highroom > lowroom) v - lowroom + predicted
            else predicted - (v - highroom) - 1
          } else if ((v & 1) == 1) predicted - ((v + 1) / 2)
          else predicted + v / 2
      } else {
        step2(i) = false
        finalY(i) = predicted
      }
      finalY(i) = math.max(0, math.min(range - 1, finalY(i)))
      i += 1
    }
    Some(Floor1Packet(finalY, step2))
  }

  /** §7.2.4 step 2: curve synthesis over n2 bins (pre-dB ints). */
  def floor1Curve(f: Floor1, p: Floor1Packet, n2: Int): Array[Int] = {
    val order = f.xList.indices.sortBy(f.xList(_))
    val out = new Array[Int](n2)
    var lx = 0
    var ly = p.finalY(order.head) * f.multiplier
    var k = 1
    while (k < order.length) {
      val i = order(k)
      if (p.step2(i)) {
        val hx = f.xList(i)
        val hy = p.finalY(i) * f.multiplier
        renderLine(lx, ly, hx, hy, out, n2)
        lx = hx; ly = hy
      }
      k += 1
    }
    if (lx < n2) {
      var x = lx
      while (x < n2) { out(x) = ly; x += 1 }
    }
    out
  }

  /** The spec's floor1_inverse_dB_table shape: 256 steps spanning
    * -140 dB to 0 dB, table(255) = 1.0 exactly (the only entry our
    * encoder emits; see the header honesty note). */
  val InverseDbTable: Array[Double] = Array.tabulate(256) { i =>
    if (i == 255) 1.0
    else math.exp(-0.11512925 * (255 - i).toDouble * 140.0 / 256.0)
  }

  // --------------------------------------------------------- residue
  final case class Residue(resType: Int, begin: Int, end: Int,
                           partitionSize: Int, classifications: Int,
                           classbook: Int, cascade: Array[Int],
                           books: Array[Array[Int]]) {
    def writeConfig(bw: BitWriter): Unit = {
      bw.write(resType, 16)
      bw.write(begin, 24)
      bw.write(end, 24)
      bw.write(partitionSize - 1, 24)
      bw.write(classifications - 1, 6)
      bw.write(classbook, 8)
      for (c <- 0 until classifications) {
        bw.write(cascade(c) & 7, 3)
        val high = cascade(c) >> 3
        if (high != 0) { bw.writeBit(1); bw.write(high, 5) }
        else bw.writeBit(0)
      }
      for (c <- 0 until classifications; p <- 0 until 8)
        if ((cascade(c) & (1 << p)) != 0) bw.write(books(c)(p), 8)
    }
  }

  def readResidue(br: BitReader): Residue = {
    val t = br.read(16)
    if (t > 2) bail()
    val begin = br.read(24)
    val end = br.read(24)
    val psize = br.read(24) + 1
    val cls = br.read(6) + 1
    val classbook = br.read(8)
    val cascade = new Array[Int](cls)
    for (c <- 0 until cls) {
      val low = br.read(3)
      val high = if (br.readBit() == 1) br.read(5) else 0
      cascade(c) = (high << 3) | low
    }
    val books = Array.fill(cls)(Array.fill(8)(-1))
    for (c <- 0 until cls; p <- 0 until 8)
      if ((cascade(c) & (1 << p)) != 0) books(c)(p) = br.read(8)
    if (begin > end) bail()
    Residue(t, begin, end, psize, cls, classbook, cascade, books)
  }

  /** §8.6.2 residue decode into `nVec` vectors of length `vecLen`
    * (format 2 callers pass nVec=1 over the interleaved length). */
  def decodeResidueVectors(br: BitReader, r: Residue,
                           books: Array[Codebook], nVec: Int, vecLen: Int,
                           doNotDecode: Array[Boolean])
      : Array[Array[Double]] = {
    val out = Array.fill(nVec)(new Array[Double](vecLen))
    val limit = math.min(r.end, vecLen)
    if (r.begin >= limit) return out
    val nToRead = limit - r.begin
    if (nToRead % r.partitionSize != 0) bail()
    val partitionsToRead = nToRead / r.partitionSize
    val cb = books(r.classbook)
    val cw = cb.dims
    if (cw <= 0) bail()
    val classifications =
      Array.fill(nVec)(new Array[Int](partitionsToRead + cw))
    var pass = 0
    while (pass < 8) {
      var partitionCount = 0
      while (partitionCount < partitionsToRead) {
        if (pass == 0) {
          var j = 0
          while (j < nVec) {
            if (!doNotDecode(j)) {
              var temp = cb.decodeScalar(br)
              var i = cw - 1
              while (i >= 0) {
                classifications(j)(partitionCount + i) =
                  temp % r.classifications
                temp /= r.classifications
                i -= 1
              }
            }
            j += 1
          }
        }
        var i = 0
        while (i < cw && partitionCount < partitionsToRead) {
          var j = 0
          while (j < nVec) {
            if (!doNotDecode(j)) {
              val vqclass = classifications(j)(partitionCount)
              val bookIdx = r.books(vqclass)(pass)
              if (bookIdx >= 0) {
                val book = books(bookIdx)
                val offset = r.begin + partitionCount * r.partitionSize
                if (r.resType == 0) {
                  val step = r.partitionSize / book.dims
                  var i2 = 0
                  while (i2 < step) {
                    val v = book.vqVector(book.decodeScalar(br))
                    var d = 0
                    while (d < book.dims) {
                      out(j)(offset + i2 + d * step) += v(d)
                      d += 1
                    }
                    i2 += 1
                  }
                } else {
                  var i2 = 0
                  while (i2 < r.partitionSize) {
                    val v = book.vqVector(book.decodeScalar(br))
                    var d = 0
                    while (d < book.dims) {
                      out(j)(offset + i2 + d) += v(d)
                      d += 1
                    }
                    i2 += book.dims
                  }
                }
              }
            }
            j += 1
          }
          partitionCount += 1
          i += 1
        }
      }
      pass += 1
    }
    out
  }

  // ----------------------------------------------- mappings and modes
  final case class Mapping(couplingMag: Array[Int], couplingAng: Array[Int],
                           mux: Array[Int], submapFloor: Array[Int],
                           submapResidue: Array[Int]) {
    def submaps: Int = submapFloor.length
    def writeConfig(bw: BitWriter, channels: Int): Unit = {
      bw.write(0, 16) // mapping type 0
      if (submaps > 1) { bw.writeBit(1); bw.write(submaps - 1, 4) }
      else bw.writeBit(0)
      if (couplingMag.nonEmpty) {
        bw.writeBit(1)
        bw.write(couplingMag.length - 1, 8)
        val b = ilog(channels - 1)
        for (s <- couplingMag.indices) {
          bw.write(couplingMag(s), b)
          bw.write(couplingAng(s), b)
        }
      } else bw.writeBit(0)
      bw.write(0, 2) // reserved
      if (submaps > 1) mux.foreach(m => bw.write(m, 4))
      for (s <- 0 until submaps) {
        bw.write(0, 8) // unused time config
        bw.write(submapFloor(s), 8)
        bw.write(submapResidue(s), 8)
      }
    }
  }

  def readMapping(br: BitReader, channels: Int): Mapping = {
    if (br.read(16) != 0) bail()
    val submaps = if (br.readBit() == 1) br.read(4) + 1 else 1
    var mag = Array.emptyIntArray
    var ang = Array.emptyIntArray
    if (br.readBit() == 1) {
      val steps = br.read(8) + 1
      val b = ilog(channels - 1)
      mag = new Array[Int](steps)
      ang = new Array[Int](steps)
      for (s <- 0 until steps) {
        mag(s) = br.read(b)
        ang(s) = br.read(b)
        if (mag(s) == ang(s) || mag(s) >= channels || ang(s) >= channels)
          bail()
      }
    }
    if (br.read(2) != 0) bail()
    val mux =
      if (submaps > 1) Array.fill(channels)(br.read(4))
      else new Array[Int](channels)
    if (mux.exists(_ >= submaps)) bail()
    val sf = new Array[Int](submaps)
    val sr = new Array[Int](submaps)
    for (s <- 0 until submaps) {
      br.read(8) // unused time config
      sf(s) = br.read(8)
      sr(s) = br.read(8)
    }
    Mapping(mag, ang, mux, sf, sr)
  }

  final case class Mode(blockflag: Boolean, mapping: Int)

  // ---------------------------------------------------- setup header
  final case class Setup(books: Array[Codebook], floors: Array[Floor1],
                         residues: Array[Residue],
                         mappings: Array[Mapping], modes: Array[Mode])

  def writeSetup(s: Setup, channels: Int): Array[Byte] = {
    val bw = new BitWriter
    bw.write(5, 8)
    "vorbis".getBytes("US-ASCII").foreach(c => bw.write(c & 0xff, 8))
    bw.write(s.books.length - 1, 8)
    s.books.foreach(_.writeConfig(bw))
    bw.write(0, 6) // time_count - 1
    bw.write(0, 16) // the single mandated-zero time transform
    bw.write(s.floors.length - 1, 6)
    s.floors.foreach(_.writeConfig(bw))
    bw.write(s.residues.length - 1, 6)
    s.residues.foreach(_.writeConfig(bw))
    bw.write(s.mappings.length - 1, 6)
    s.mappings.foreach(_.writeConfig(bw, channels))
    bw.write(s.modes.length - 1, 6)
    s.modes.foreach { m =>
      bw.writeBit(if (m.blockflag) 1 else 0)
      bw.write(0, 16); bw.write(0, 16)
      bw.write(m.mapping, 8)
    }
    bw.writeBit(1) // framing
    bw.bytes
  }

  def readSetup(p: Array[Byte], channels: Int): Setup = {
    if (p.length < 7 || (p(0) & 0xff) != 5 ||
      new String(p, 1, 6, "US-ASCII") != "vorbis") bail()
    val br = new BitReader(p, 7, p.length)
    val books = Array.fill(br.read(8) + 1)(readCodebook(br))
    val timeCount = br.read(6) + 1
    for (_ <- 0 until timeCount) if (br.read(16) != 0) bail()
    val floors = Array.fill(br.read(6) + 1) {
      val t = br.read(16)
      if (t != 1) bail() // floor 0 (LSP) not in scope; reject honestly
      readFloor1(br)
    }
    val residues = Array.fill(br.read(6) + 1)(readResidue(br))
    val mappings = Array.fill(br.read(6) + 1)(readMapping(br, channels))
    val modes = Array.fill(br.read(6) + 1) {
      val bf = br.readBit() == 1
      if (br.read(16) != 0 || br.read(16) != 0) bail()
      Mode(bf, br.read(8))
    }
    if (br.readBit() != 1) bail()
    // referential integrity before any packet decode
    if (modes.exists(_.mapping >= mappings.length)) bail()
    if (mappings.exists(m => m.submapFloor.exists(_ >= floors.length) ||
      m.submapResidue.exists(_ >= residues.length))) bail()
    if (residues.exists(r => r.classbook >= books.length ||
      r.books.flatten.exists(b => b >= books.length))) bail()
    if (floors.exists(f => f.classMasterbooks.exists(_ >= books.length) ||
      f.subclassBooks.flatten.exists(_ >= books.length))) bail()
    Setup(books, floors, residues, mappings, modes)
  }

  // -------------------------------------------------- window and MDCT
  /** §4.3.1 window shape parameters for one block. */
  final case class WindowShape(n: Int, leftStart: Int, leftEnd: Int,
                               rightStart: Int, rightEnd: Int,
                               leftN: Int, rightN: Int)

  def windowShape(n: Int, blockflag: Boolean, prevFlag: Boolean,
                  nextFlag: Boolean, bs0: Int): WindowShape = {
    val (ls, le, ln) =
      if (blockflag && !prevFlag) (n / 4 - bs0 / 4, n / 4 + bs0 / 4, bs0 / 2)
      else (0, n / 2, n / 2)
    val (rs, re, rn) =
      if (blockflag && !nextFlag)
        (n / 2 + n / 4 - bs0 / 4, n / 2 + n / 4 + bs0 / 4, bs0 / 2)
      else (n / 2, n, n / 2)
    WindowShape(n, ls, le, rs, re, ln, rn)
  }

  def windowArray(w: WindowShape): Array[Double] = {
    val v = new Array[Double](w.n)
    var i = w.leftStart
    while (i < w.leftEnd) {
      val x = math.sin((i - w.leftStart + 0.5) / w.leftN * (math.Pi / 2))
      v(i) = math.sin(math.Pi / 2 * x * x)
      i += 1
    }
    i = w.leftEnd
    while (i < w.rightStart) { v(i) = 1.0; i += 1 }
    i = w.rightStart
    while (i < w.rightEnd) {
      val x = math.sin((i - w.rightStart + 0.5) / w.rightN *
        (math.Pi / 2) + math.Pi / 2)
      v(i) = math.sin(math.Pi / 2 * x * x)
      i += 1
    }
    v
  }

  /** cos(π/(2n)·(2j+1+n/2)·(2k+1)) basis, cached per block size. */
  private val basisCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Array[Double]]]()
  private def basis(n: Int): Array[Array[Double]] =
    basisCache.computeIfAbsent(n, { (_: Integer) =>
      Array.tabulate(n / 2, n)((k, j) =>
        math.cos(math.Pi / (2.0 * n) * (2 * j + 1 + n / 2) * (2 * k + 1)))
    })

  /** Spec IMDCT: y[j] = Σ_k X[k]·cos(π/(2n)(2j+1+n/2)(2k+1)). Direct
    * O(n²) — fixtures are hundreds of samples; at corpus scale decode
    * is embarrassingly parallel and this is still ~1 µs/block. */
  def imdct(x: Array[Double], n: Int): Array[Double] = {
    val b = basis(n)
    val y = new Array[Double](n)
    var j = 0
    while (j < n) {
      var acc = 0.0
      var k = 0
      while (k < n / 2) { acc += x(k) * b(k)(j); k += 1 }
      y(j) = acc
      j += 1
    }
    y
  }

  /** Forward MDCT paired with the spec IMDCT: X[k] = (4/n)·Σ_j z[j]·b —
    * the factor that makes window²-overlap-add the identity (TDAC). */
  def mdctForward(z: Array[Double], n: Int): Array[Double] = {
    val b = basis(n)
    val x = new Array[Double](n / 2)
    var k = 0
    while (k < n / 2) {
      var acc = 0.0
      var j = 0
      while (j < n) { acc += z(j) * b(k)(j); j += 1 }
      x(k) = acc * 4.0 / n
      k += 1
    }
    x
  }

  // ------------------------------------------------ Ogg packet layer
  /** Depacketize a CRC-valid single-stream Ogg byte string into packets
    * (lacing reassembly incl. spanning) + the final granule. */
  private[functions] def depacketize(b: Array[Byte])
      : Option[(Vector[Array[Byte]], Long)] = {
    try {
      var p = 0
      var lastGranule = 0L
      val packets = Vector.newBuilder[Array[Byte]]
      var nPackets = 0
      // segments of the in-flight packet as (offset, len) spans into b —
      // the packet array is allocated EXACT-SIZE on completion (growing
      // a stream buffer per packet is measurable churn on the corpus
      // decode path, where this runs once per document)
      var spans = List.empty[(Int, Int)]
      var curLen = 0
      var inPacket = false
      def u8(i: Int): Int = b(i) & 0xff
      while (p + 27 <= b.length) {
        if (b(p) != 'O' || b(p + 1) != 'g' || b(p + 2) != 'g' ||
          b(p + 3) != 'S' || u8(p + 4) != 0) return None
        var g = 0L
        for (i <- 7 to 0 by -1) g = (g << 8) | u8(p + 6 + i)
        val continued = (u8(p + 5) & 1) != 0
        val nSegs = u8(p + 26)
        if (p + 27 + nSegs > b.length) return None
        var payloadLen = 0
        for (s <- 0 until nSegs) payloadLen += u8(p + 27 + s)
        val dataAt = p + 27 + nSegs
        if (dataAt.toLong + payloadLen > b.length.toLong) return None
        if (OggCodec.pageCrcCheck(b, p, dataAt + payloadLen) == false)
          return None
        if (continued != inPacket) return None // lacing desync
        var off = dataAt
        for (s <- 0 until nSegs) {
          val l = u8(p + 27 + s)
          if (l > 0) { spans = (off, l) :: spans; curLen += l }
          off += l
          inPacket = l == 255
          if (!inPacket) {
            val pk = new Array[Byte](curLen)
            var at = curLen
            spans.foreach { case (so, sl) =>
              at -= sl; System.arraycopy(b, so, pk, at, sl)
            }
            packets += pk
            spans = Nil; curLen = 0
            nPackets += 1
            if (nPackets > 100000) return None
          }
        }
        lastGranule = g
        p = dataAt + payloadLen
      }
      if (p != b.length || inPacket) return None
      Some((packets.result(), lastGranule))
    } catch {
      case _: IndexOutOfBoundsException => None
    }
  }

  // ------------------------------------------------------ the decoder
  final case class VorbisAudio(sampleRate: Int, channels: Int,
                               samples: Array[Int])

  /** Decode a complete Ogg Vorbis stream to interleaved PCM (rounded to
    * nearest integer; sample units are whatever the encoder used — our
    * encoder codes int16 sample units directly through the flat 1.0
    * floor). Hostile or out-of-scope input → None. */
  def decodePcm(b: Array[Byte]): Option[VorbisAudio] =
    decodePcmF(b).map { case (sr, ch, frames) =>
      VorbisAudio(sr, ch, frames.map(v => math.rint(v).toInt))
    }

  def decodePcmF(b: Array[Byte]): Option[(Int, Int, Array[Double])] =
    try {
      val (packets, lastGranule) = depacketize(b).getOrElse(return None)
      if (packets.length < 4) return None
      // --- id header
      val id = packets(0)
      if (id.length < 30 || (id(0) & 0xff) != 1 ||
        new String(id, 1, 6, "US-ASCII") != "vorbis") return None
      val ibr = new BitReader(id, 7, id.length)
      if (ibr.readLong(32) != 0L) return None // version
      val channels = ibr.read(8)
      val sampleRate = ibr.readLong(32).toInt
      ibr.readLong(32); ibr.readLong(32); ibr.readLong(32) // bitrates
      val bs0 = 1 << ibr.read(4)
      val bs1 = 1 << ibr.read(4)
      if (ibr.readBit() != 1) return None
      if (channels < 1 || channels > 8 || sampleRate <= 0 ||
        bs0 < 64 || bs0 > 8192 || bs1 < bs0 || bs1 > 8192) return None
      // --- comment header (packet 1): type-checked, content skipped
      val cm = packets(1)
      if (cm.length < 7 || (cm(0) & 0xff) != 3 ||
        new String(cm, 1, 6, "US-ASCII") != "vorbis") return None
      val setup = readSetup(packets(2), channels)
      if (setup.modes.isEmpty) return None
      val modeBits = ilog(setup.modes.length - 1)
      // --- audio packets, overlap-added on an absolute timeline
      val audio = packets.drop(3)
      if (lastGranule < 0 || lastGranule > (1L << 24)) return None
      var totalN = 0L
      audio.foreach(_ => totalN += bs1)
      // allocation below is channels × (totalN + 2·bs1) doubles, so the
      // hostile-size gate must bound the PRODUCT — an 8-channel stream
      // must not buy 8× the samples a mono one can
      if (totalN > (1L << 26) / channels) return None
      val outLen = (totalN + 2L * bs1).toInt
      val out = Array.fill(channels)(new Array[Double](outLen))
      var t = bs1 // base margin (short→long transitions step back n/4)
      var firstCenter = -1L
      var lastCenter = 0L
      var prevN = -1
      for (pk <- audio) {
        val br = new BitReader(pk, 0, pk.length)
        if (br.readBit() != 0) return None // not an audio packet
        val mode = setup.modes(br.read(modeBits))
        val n = if (mode.blockflag) bs1 else bs0
        var prevFlag = true
        var nextFlag = true
        if (mode.blockflag) {
          prevFlag = br.readBit() == 1
          nextFlag = br.readBit() == 1
        }
        val mapping = setup.mappings(mode.mapping)
        val n2 = n / 2
        // floors
        val floorPackets = new Array[Option[Floor1Packet]](channels)
        val floorCfg = new Array[Floor1](channels)
        for (c <- 0 until channels) {
          val f = setup.floors(mapping.submapFloor(mapping.mux(c)))
          floorCfg(c) = f
          floorPackets(c) = decodeFloor1Packet(br, f, setup.books)
        }
        // §4.3.2 nonzero propagation across coupling pairs
        val nonzero = floorPackets.map(_.isDefined)
        for (s <- mapping.couplingMag.indices) {
          if (nonzero(mapping.couplingMag(s)) ||
            nonzero(mapping.couplingAng(s))) {
            nonzero(mapping.couplingMag(s)) = true
            nonzero(mapping.couplingAng(s)) = true
          }
        }
        // residues per submap
        val spectrum = Array.fill(channels)(new Array[Double](n2))
        for (s <- 0 until mapping.submaps) {
          val chs = (0 until channels).filter(mapping.mux(_) == s)
          val r = setup.residues(mapping.submapResidue(s))
          if (r.resType == 2) {
            val dnd = Array(chs.forall(c => !nonzero(c)))
            val v = decodeResidueVectors(br, r, setup.books, 1,
              chs.length * n2, dnd)(0)
            for (j <- 0 until n2; (c, ci) <- chs.zipWithIndex)
              spectrum(c)(j) = v(j * chs.length + ci)
          } else {
            val dnd = chs.map(c => !nonzero(c)).toArray
            val v = decodeResidueVectors(br, r, setup.books, chs.length,
              n2, dnd)
            for ((c, ci) <- chs.zipWithIndex) spectrum(c) = v(ci)
          }
        }
        // §4.3.5 inverse coupling (square polar)
        var s = mapping.couplingMag.length - 1
        while (s >= 0) {
          val mv = spectrum(mapping.couplingMag(s))
          val av = spectrum(mapping.couplingAng(s))
          var j = 0
          while (j < n2) {
            val m = mv(j); val a = av(j)
            if (m > 0) {
              if (a > 0) { mv(j) = m; av(j) = m - a }
              else { av(j) = m; mv(j) = m + a }
            } else {
              if (a > 0) { mv(j) = m; av(j) = m + a }
              else { av(j) = m; mv(j) = m - a }
            }
            j += 1
          }
          s -= 1
        }
        // floor curve multiply + IMDCT + window + overlap-add
        val shape = windowShape(n, mode.blockflag, prevFlag, nextFlag, bs0)
        val win = windowArray(shape)
        if (prevN > 0) t += 3 * prevN / 4 - n / 4
        for (c <- 0 until channels) {
          floorPackets(c).foreach { fp =>
            val curve = floor1Curve(floorCfg(c), fp, n2)
            var j = 0
            while (j < n2) {
              spectrum(c)(j) *=
                InverseDbTable(math.max(0, math.min(255, curve(j))))
              j += 1
            }
          }
          // §4.3: a channel whose floor packet is UNUSED renders silence
          // even when coupling propagation decoded residue for it (the
          // residue feeds the coupling partner only) — gate synthesis on
          // the floor, not on the propagated nonzero vector
          if (floorPackets(c).isDefined) {
            val y = imdct(spectrum(c), n)
            var j = 0
            while (j < n) {
              out(c)(t + j) += y(j) * win(j)
              j += 1
            }
          }
        }
        if (prevN < 0) firstCenter = t + n / 2
        lastCenter = t + n / 2
        prevN = n
      }
      if (firstCenter < 0) return None
      val produced = lastCenter - firstCenter
      val nOut = math.min(produced, lastGranule).toInt
      if (nOut < 0) return None
      val frames = new Array[Double](nOut * channels)
      var i = 0
      while (i < nOut) {
        var c = 0
        while (c < channels) {
          frames(i * channels + c) = out(c)((firstCenter + i).toInt)
          c += 1
        }
        i += 1
      }
      Some((sampleRate, channels, frames))
    } catch {
      case _: Bail => None
      case _: IndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }

  // ======================================================= the encoder

  /** Encoder knobs, rotated per document so the corpus decode crosses
    * the whole surface: block switching cadence (0 = all long, 1 = all
    * short, k = every k-th block short), residue type (1 per-channel /
    * 2 interleaved), and square-polar coupling (stereo only; fixture
    * channels must keep the angle vector inside the coarse book range —
    * identical channels give angle 0). */
  /** `unusedFloorCh` ≥ 0 marks that channel's floor UNUSED in every
    * audio packet — legal only with stereo coupling + residue type 2
    * (coupling propagation keeps the residue decode in sync), modelling
    * the externally-encoded silent-coupled-channel shape the spec says
    * must render silence (§4.3). */
  final case class VorbisOpts(shortEvery: Int = 0, residueType: Int = 2,
                              coupling: Boolean = false,
                              unusedFloorCh: Int = -1)

  val Bs0 = 64
  val Bs1 = 256
  private val CoarseHalf = 512 // coarse grid ±512 steps of 8 → ±4096
  private val FineHalf = 128   // fine grid ±128 steps of 1/32 → ±4

  /** Complete-tree canonical lengths for n entries: d = 2^L − n entries
    * one bit shorter (Kraft sum exactly 1 — no under-specified trees). */
  def completeLengths(n: Int): Array[Int] = {
    require(n >= 2, "degenerate codebook")
    var l = 1
    while ((1 << l) < n) l += 1
    val d = (1 << l) - n
    Array.tabulate(n)(i => if (i < d) l - 1 else l)
  }

  /** The four-book/one-floor/two-residue/two-mapping/two-mode setup our
    * encoder emits (see the file header for why these ranges). */
  def buildSetup(channels: Int, opts: VorbisOpts): Setup = {
    val classbook = Codebook(2, completeLengths(4))
    val coarse = Codebook(1, completeLengths(2 * CoarseHalf + 1),
      lookupType = 1, minimum = -4096.0, delta = 8.0, valueBits = 11,
      sequenceP = false, mults = Array.tabulate(2 * CoarseHalf + 1)(identity))
    val fine = Codebook(1, completeLengths(2 * FineHalf + 1),
      lookupType = 1, minimum = -4.0, delta = 1.0 / 32, valueBits = 9,
      sequenceP = false, mults = Array.tabulate(2 * FineHalf + 1)(identity))
    val floorBook = Codebook(1, completeLengths(256))
    val floor = Floor1(partitionClasses = Array(0), classDims = Array(2),
      classSubclasses = Array(0), classMasterbooks = Array(-1),
      subclassBooks = Array(Array(3)), multiplier = 1, rangebits = 7,
      xList = Array(0, 128, 32, 96))
    def residue(n: Int): Residue = {
      val vecLen = if (opts.residueType == 2) channels * n / 2 else n / 2
      Residue(opts.residueType, begin = 0, end = vecLen, partitionSize = 32,
        classifications = 2, classbook = 0, cascade = Array(0, 3),
        books = Array(Array.fill(8)(-1),
          Array(1, 2, -1, -1, -1, -1, -1, -1)))
    }
    val coupling = opts.coupling && channels == 2
    def mapping(res: Int): Mapping = Mapping(
      couplingMag = if (coupling) Array(0) else Array.emptyIntArray,
      couplingAng = if (coupling) Array(1) else Array.emptyIntArray,
      mux = new Array[Int](channels), submapFloor = Array(0),
      submapResidue = Array(res))
    Setup(Array(classbook, coarse, fine, floorBook), Array(floor),
      Array(residue(Bs0), residue(Bs1)), Array(mapping(0), mapping(1)),
      Array(Mode(blockflag = false, 0), Mode(blockflag = true, 1)))
  }

  /** Square-polar forward coupling — exact inverse of §4.3.5. */
  def forwardCouple(l: Double, r: Double): (Double, Double) =
    if (l > 0 && l > r) (l, l - r)
    else if (r > 0) (r, l - r)
    else if (r > l) (l, r - l)
    else (r, r - l)

  /** Decompose a grid value into (coarse, fine) book entries. */
  private def decompose(v: Double): (Int, Int) = {
    val m = math.round(v / 8.0).toInt
    val r = math.round((v - 8.0 * m) * 32.0).toInt
    require(m >= -CoarseHalf && m <= CoarseHalf &&
      r >= -FineHalf && r <= FineHalf, s"coefficient $v out of book range")
    (m + CoarseHalf, r + FineHalf)
  }
  private def gridValue(v: Double): Double = {
    val m = math.round(v / 8.0).toInt
    val r = math.round((v - 8.0 * m) * 32.0).toInt
    8.0 * m + r / 32.0
  }

  /** Mirror of [[decodeResidueVectors]]: same pass/classword/partition
    * traversal, writing instead of reading. `entries(vec)(pass)(j)` is
    * the book entry for position j. */
  private def encodeResidue(bw: BitWriter, r: Residue,
                            books: Array[Codebook],
                            entries: Array[Array[Array[Int]]]): Unit = {
    val nVec = entries.length
    val vecLen = entries(0)(0).length
    val limit = math.min(r.end, vecLen)
    val partitionsToRead = (limit - r.begin) / r.partitionSize
    val cb = books(r.classbook)
    val cw = cb.dims
    // all partitions are class 1: classword entry = Σ 1·cls^i
    var classwordEntry = 0
    for (_ <- 0 until cw)
      classwordEntry = classwordEntry * r.classifications + 1
    var pass = 0
    while (pass < 8) {
      var partitionCount = 0
      while (partitionCount < partitionsToRead) {
        if (pass == 0) {
          var j = 0
          while (j < nVec) { cb.writeCodeword(bw, classwordEntry); j += 1 }
        }
        var i = 0
        while (i < cw && partitionCount < partitionsToRead) {
          val bookIdx = r.books(1)(pass)
          if (bookIdx >= 0) {
            val book = books(bookIdx)
            var j = 0
            while (j < nVec) {
              val offset = r.begin + partitionCount * r.partitionSize
              var i2 = 0
              while (i2 < r.partitionSize) {
                book.writeCodeword(bw, entries(j)(pass)(offset + i2))
                i2 += book.dims
              }
              j += 1
            }
          }
          partitionCount += 1
          i += 1
        }
      }
      pass += 1
    }
  }

  /** Encode PCM (sample units, |coeff| must stay within ±4096 — the
    * fixture-writer contract) into a complete Ogg Vorbis stream. */
  def writeVorbisPcm(sampleRate: Int, channels: Int, nSamples: Int,
                     gen: (Int, Int) => Int,
                     opts: VorbisOpts = VorbisOpts(),
                     tags: Seq[(String, String)] = Nil,
                     vendor: String = "graft"): Array[Byte] = {
    require(channels >= 1 && channels <= 8 && sampleRate > 0 &&
      nSamples >= 1 && nSamples <= (1 << 22), "bad params")
    require(opts.residueType == 1 || opts.residueType == 2, "residue type")
    require(opts.unusedFloorCh < 0 ||
      (opts.coupling && channels == 2 && opts.residueType == 2),
      "unusedFloorCh needs stereo coupling + residue type 2")
    val setup = buildSetup(channels, opts)
    val coupling = opts.coupling && channels == 2
    // ---- block plan on the absolute timeline
    def sizeOf(i: Int): Int =
      if (opts.shortEvery == 0) Bs1
      else if (opts.shortEvery == 1) Bs0
      else if (i % opts.shortEvery == 0) Bs0
      else Bs1
    val t0 = Bs1
    val off = t0 + sizeOf(0) / 2
    val sizes = scala.collection.mutable.ArrayBuffer[Int]()
    val starts = scala.collection.mutable.ArrayBuffer[Int]()
    var t = t0
    var i = 0
    while (sizes.length < 2 ||
      starts.last + sizes.last / 2 < off + nSamples) {
      if (i > 0) t += 3 * sizes(i - 1) / 4 - sizeOf(i) / 4
      sizes += sizeOf(i)
      starts += t
      i += 1
    }
    val nBlocks = sizes.length
    // ---- absolute signal
    val sigLen = starts.last + sizes.last + Bs1
    val sig = Array.fill(channels)(new Array[Double](sigLen))
    for (f <- 0 until nSamples; c <- 0 until channels)
      sig(c)(off + f) = gen(f, c).toDouble
    // ---- per-block packets
    val packets = scala.collection.mutable.ArrayBuffer[(Array[Byte], Long)]()
    for (b <- 0 until nBlocks) {
      val n = sizes(b)
      val long = n == Bs1
      val prevFlag = b == 0 || sizes(b - 1) == Bs1
      val nextFlag = b == nBlocks - 1 || sizes(b + 1) == Bs1
      val shape = windowShape(n, long, prevFlag, nextFlag, Bs0)
      val win = windowArray(shape)
      val n2 = n / 2
      // analysis: window, forward MDCT, snap to the coarse+fine grid
      val grid = Array.ofDim[Double](channels, n2)
      for (c <- 0 until channels) {
        val z = new Array[Double](n)
        var j = 0
        while (j < n) { z(j) = sig(c)(starts(b) + j) * win(j); j += 1 }
        val x = mdctForward(z, n)
        var k = 0
        while (k < n2) { grid(c)(k) = gridValue(x(k)); k += 1 }
      }
      // forward coupling on grid values (exact)
      if (coupling) {
        var k = 0
        while (k < n2) {
          val (m, a) = forwardCouple(grid(0)(k), grid(1)(k))
          grid(0)(k) = m; grid(1)(k) = a
          k += 1
        }
      }
      // book entries per (vector, pass, position)
      val res = setup.residues(if (long) 1 else 0)
      val entries: Array[Array[Array[Int]]] =
        if (opts.residueType == 2) {
          val v = Array.ofDim[Int](2, channels * n2)
          var k = 0
          while (k < n2) {
            var c = 0
            while (c < channels) {
              val (cm, cf) = decompose(grid(c)(k))
              v(0)(k * channels + c) = cm
              v(1)(k * channels + c) = cf
              c += 1
            }
            k += 1
          }
          Array(Array(v(0), v(1)))
        } else {
          Array.tabulate(channels) { c =>
            val cm = new Array[Int](n2)
            val cf = new Array[Int](n2)
            var k = 0
            while (k < n2) {
              val (a, f) = decompose(grid(c)(k))
              cm(k) = a; cf(k) = f
              k += 1
            }
            Array(cm, cf)
          }
        }
      val bw = new BitWriter
      bw.writeBit(0) // audio packet
      bw.write(if (long) 1 else 0, 1) // mode number (2 modes → 1 bit)
      if (long) {
        bw.writeBit(if (prevFlag) 1 else 0)
        bw.writeBit(if (nextFlag) 1 else 0)
      }
      // flat floor per channel: nonzero, Y0=Y1=255, two book-0 values;
      // the unusedFloorCh knob writes the single "unused" bit instead
      // (residue stays fully coupled so the partner still round-trips)
      for (c <- 0 until channels) {
        if (c == opts.unusedFloorCh) bw.writeBit(0)
        else {
          bw.writeBit(1)
          bw.write(255, 8)
          bw.write(255, 8)
          setup.books(3).writeCodeword(bw, 0)
          setup.books(3).writeCodeword(bw, 0)
        }
      }
      encodeResidue(bw, res, setup.books, entries)
      val granule = math.min((starts(b) + n / 2 - off).toLong,
        nSamples.toLong)
      packets += ((bw.bytes, math.max(granule, 0L)))
    }
    // ---- headers
    val idBw = new BitWriter
    idBw.write(1, 8)
    "vorbis".getBytes("US-ASCII").foreach(c => idBw.write(c & 0xff, 8))
    idBw.writeLong(0L, 32) // version
    idBw.write(channels, 8)
    idBw.writeLong(sampleRate.toLong, 32)
    idBw.writeLong(0L, 32); idBw.writeLong(0L, 32); idBw.writeLong(0L, 32)
    idBw.write(ilog(Bs0) - 1, 4)
    idBw.write(ilog(Bs1) - 1, 4)
    idBw.writeBit(1)
    val idPk = idBw.bytes
    val commentPk = OggCodec.commentPacket("vorbis", vendor, tags)
    val setupPk = writeSetup(setup, channels)
    // ---- pages (headers on their own pages, one audio packet per page)
    val serial = 0x764f // arbitrary fixed stream serial
    val out = new java.io.ByteArrayOutputStream()
    out.write(OggCodec.page(serial, 0, 0L, 0x02, idPk))
    out.write(OggCodec.page(serial, 1, 0L, 0x00, commentPk))
    out.write(OggCodec.page(serial, 2, 0L, 0x00, setupPk))
    var seq = 3
    for (((pk, granule), idx) <- packets.zipWithIndex) {
      val flags = if (idx == packets.length - 1) 0x04 else 0x00
      val g = if (idx == packets.length - 1) nSamples.toLong else granule
      out.write(OggCodec.page(serial, seq, g, flags, pk))
      seq += 1
    }
    out.toByteArray
  }
}
