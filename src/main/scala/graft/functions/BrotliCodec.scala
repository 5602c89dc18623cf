package graft.functions

/** Brotli DECODER (RFC 7932) — decode-only, the honest scope for the
  * remaining big web-compression surface (WOFF2 fonts, HTTP/WARC
  * payloads). Everything here is the RFC's structure and formulas:
  * the window-bits code, meta-block headers, simple + complex prefix
  * codes (code-length code with its fixed 4-bit-peek table, repeat
  * codes 16/17 with chained counts), block switching for the three
  * categories, context maps (RLE + inverse move-to-front), the
  * insert-and-copy command algebra (the 704-symbol range LUTs and the
  * base/extra tables, every one of which telescopes: base[i+1] =
  * base[i] + 2^extra[i] — checked in the spec), the distance ring
  * buffer with its ±1..3 variant codes and the NPOSTFIX/NDIRECT
  * formula, and STATIC DICTIONARY references with all 121 word
  * transforms (data extracted verbatim from this container's
  * libbrotlicommon — see [[BrotliData]]).
  *
  * Conformance gate: [[BrotliCliFixtures]] embeds streams produced by
  * the reference ENCODER (brotli 1.2.0 via its cffi binding, the same
  * device as [[ZstdCliFixtures]]); they must decode byte-exact, which
  * exercises entropy-coded blocks, context maps, dictionary words and
  * transforms against the reference implementation — not just this
  * repo's own expectations. Hostile input returns None, never throws.
  */
object BrotliCodec {

  private final class Bail extends RuntimeException
    with scala.util.control.NoStackTrace
  /** Last refusal site, for diagnostics (tests only — single-threaded
    * use; production callers only see None). */
  @volatile private[functions] var lastBail: String = ""
  private def bail(tag: String = ""): Nothing = {
    lastBail = tag
    throw new Bail
  }

  // ----------------------------------------------- LSB-first bit input
  final class BitReader(b: Array[Byte]) {
    var pos = 0L // bit position
    private val endBit = b.length.toLong * 8
    def readBit(): Int = {
      if (pos >= endBit) bail("L42")
      val v = (b((pos >> 3).toInt) >> (pos & 7).toInt) & 1
      pos += 1
      v
    }
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v |= readBit() << i; i += 1 }
      v
    }
    /** Peek up to 4 bits (missing bits read as 0 — only the consumed
      * count is bounds-checked). */
    def peek4(): Int = {
      var v = 0
      var i = 0
      while (i < 4) {
        val p = pos + i
        if (p < endBit) v |= ((b((p >> 3).toInt) >> (p & 7).toInt) & 1) << i
        i += 1
      }
      v
    }
    def align(): Unit = pos = (pos + 7) & ~7L
    def bytePos: Int = (pos >> 3).toInt
  }

  // ------------------------------------------------ canonical prefix
  /** Canonical prefix code over `lengths` (0 = unused), decoded by
    * accumulating bits MSB-first (the DEFLATE/brotli convention). */
  final class Prefix(lengths: Array[Int]) {
    private val maxLen = lengths.max
    val single: Int = {
      var s = -1; var n = 0
      var i = 0
      while (i < lengths.length) {
        if (lengths(i) > 0) { s = i; n += 1 }
        i += 1
      }
      if (n == 1) s else -1
    }
    // per length: first canonical code, symbol table offset
    private val count = new Array[Int](maxLen + 1)
    lengths.foreach(l => if (l > 0) count(l) += 1)
    private val first = new Array[Int](maxLen + 2)
    private val offset = new Array[Int](maxLen + 2)
    locally {
      var code = 0
      var off = 0
      var l = 1
      while (l <= maxLen) {
        first(l) = code
        offset(l) = off
        code = (code + count(l)) << 1
        off += count(l)
        l += 1
      }
      // completeness: the kraft sum must be exactly 1 for multi-symbol
      // codes (single-symbol codes read zero bits)
      if (single < 0) {
        var kraft = 0L
        var i = 0
        while (i < lengths.length) {
          if (lengths(i) > 0) kraft += (1L << (32 - lengths(i)))
          i += 1
        }
        if (kraft != (1L << 32)) bail("L108")
      }
    }
    private val syms: Array[Int] = {
      val out = new Array[Int](lengths.count(_ > 0))
      val at = offset.clone()
      var i = 0
      while (i < lengths.length) {
        if (lengths(i) > 0) { out(at(lengths(i))) = i; at(lengths(i)) += 1 }
        i += 1
      }
      out
    }
    def decode(br: BitReader): Int = {
      if (single >= 0) return single
      var acc = 0
      var l = 1
      while (l <= maxLen) {
        acc = (acc << 1) | br.readBit()
        val idx = acc - first(l)
        if (idx >= 0 && idx < count(l)) return syms(offset(l) + idx)
        l += 1
      }
      bail("L131")
    }
  }

  // --------------------------------------------------- fixed tables
  private val ClOrder =
    Array(1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9, 10, 11, 12, 13, 14, 15)
  private[functions] val ClPeekLen =
    Array(2, 2, 2, 3, 2, 2, 2, 4, 2, 2, 2, 3, 2, 2, 2, 4)
  private[functions] val ClPeekVal =
    Array(0, 4, 3, 2, 0, 4, 3, 1, 0, 4, 3, 2, 0, 4, 3, 5)

  private val InsBase = Array(0, 1, 2, 3, 4, 5, 6, 8, 10, 14, 18, 26, 34,
    50, 66, 98, 130, 194, 322, 578, 1090, 2114, 6210, 22594)
  private val InsExtra = Array(0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4,
    5, 5, 6, 7, 8, 9, 10, 12, 14, 24)
  private val CopyBase = Array(2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 14, 18, 22,
    30, 38, 54, 70, 102, 134, 198, 326, 582, 1094, 2118)
  private val CopyExtra = Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3,
    4, 4, 5, 5, 6, 7, 8, 9, 10, 24)
  private val InsRangeLut = Array(0, 0, 8, 8, 0, 16, 8, 16, 16)
  private val CopyRangeLut = Array(0, 8, 0, 8, 16, 0, 16, 8, 16)

  private val BlockLenBase = Array(1, 5, 9, 13, 17, 25, 33, 41, 49, 65,
    81, 97, 113, 145, 177, 209, 241, 305, 369, 497, 753, 1265, 2289,
    4337, 8433, 16625)
  private val BlockLenExtra = Array(2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4,
    5, 5, 5, 5, 6, 6, 7, 8, 9, 10, 11, 12, 13, 24)

  // expose the telescoping law for the spec
  private[functions] def tables
      : Seq[(Array[Int], Array[Int])] =
    Seq((InsBase, InsExtra), (CopyBase, CopyExtra),
      (BlockLenBase, BlockLenExtra))

  // ----------------------------------------------------- prefix input

  private def log2ceil(n: Int): Int = {
    var b = 0
    while ((1 << b) < n) b += 1
    b
  }

  /** §3.4/3.5: read one prefix code over `alphabet` symbols. */
  private[functions] def readPrefixCode(br: BitReader, alphabet: Int): Prefix = {
    val hskip = br.readBits(2)
    if (hskip == 1) {
      // simple code: 1-4 symbols
      val nsym = br.readBits(2) + 1
      val bits = log2ceil(alphabet)
      val symbols = Array.fill(nsym)(br.readBits(bits))
      if (symbols.exists(_ >= alphabet)) bail("L182")
      if (symbols.distinct.length != nsym) bail("L183")
      val lengths = new Array[Int](alphabet)
      // §3.4: TRANSMISSION ORDER is meaningful — the first listed
      // symbol gets the shortest code; only symbols sharing a length
      // are ordered canonically (by value, which the canonical builder
      // does anyway)
      nsym match {
        case 1 => lengths(symbols(0)) = 1 // read as zero bits via single
        case 2 =>
          lengths(symbols(0)) = 1; lengths(symbols(1)) = 1
        case 3 =>
          lengths(symbols(0)) = 1
          lengths(symbols(1)) = 2; lengths(symbols(2)) = 2
        case _ =>
          val treeSelect = br.readBit() == 1
          if (treeSelect) {
            lengths(symbols(0)) = 1; lengths(symbols(1)) = 2
            lengths(symbols(2)) = 3; lengths(symbols(3)) = 3
          } else symbols.foreach(lengths(_) = 2)
      }
      new Prefix(lengths)
    } else {
      // complex: code lengths for the code-length alphabet
      val clLengths = new Array[Int](18)
      var space = 32
      var numCodes = 0
      var i = hskip
      while (i < 18 && space > 0) {
        val p = br.peek4()
        val cl = ClPeekVal(p)
        br.pos += ClPeekLen(p)
        clLengths(ClOrder(i)) = cl
        if (cl != 0) {
          space -= 32 >> cl
          numCodes += 1
        }
        i += 1
      }
      if (numCodes != 1 && space != 0) bail("L219")
      val clCode = new Prefix(clLengths)
      // symbol code lengths with repeat codes
      val lengths = new Array[Int](alphabet)
      var symSpace = 32768
      var prevNonZero = 8
      var at = 0
      var lastRepeat = -1 // 16 or 17 while a chain is active
      var repeat = 0
      while (at < alphabet && symSpace > 0) {
        val s = clCode.decode(br)
        if (s < 16) {
          lastRepeat = -1
          lengths(at) = s
          at += 1
          if (s != 0) {
            prevNonZero = s
            symSpace -= 32768 >> s
          }
        } else {
          val extraBits = if (s == 16) 2 else 3
          val old = if (lastRepeat == s) repeat else 0
          repeat =
            if (lastRepeat == s)
              ((repeat - 2) << extraBits) + 3 + br.readBits(extraBits)
            else 3 + br.readBits(extraBits)
          lastRepeat = s
          val delta = repeat - old
          if (at + delta > alphabet) bail("L246")
          val fill = if (s == 16) prevNonZero else 0
          var k = 0
          while (k < delta) {
            lengths(at) = fill
            at += 1
            if (fill != 0) symSpace -= 32768 >> fill
            k += 1
          }
        }
      }
      // §3.5: complex SYMBOL codes must be exactly full — the
      // single-code under-full exception applies only to the
      // code-length code (the numCodes != 1 branch above). The
      // reference decoder rejects an under-full complex code even
      // when one symbol remains (ERROR_FORMAT_HUFFMAN_SPACE); a
      // single-symbol code is expressible only via the simple form.
      if (symSpace != 0) bail("L257")
      new Prefix(lengths)
    }
  }

  /** §6: 0..255 variable-length count (NBLTYPES/NTREES carry +1). */
  private def readVarLenUint8(br: BitReader): Int =
    if (br.readBit() == 0) 0
    else {
      val n = br.readBits(3)
      if (n == 0) 1 else br.readBits(n) + (1 << n)
    }

  /** §7.3: context map with RLE zeros + optional inverse MTF. */
  private def readContextMap(br: BitReader, size: Int,
                             ntrees: Int): Array[Int] = {
    val rleMax = if (br.readBit() == 1) br.readBits(4) + 1 else 0
    val code = readPrefixCode(br, rleMax + ntrees)
    val out = new Array[Int](size)
    var i = 0
    while (i < size) {
      val s = code.decode(br)
      if (s == 0) i += 1
      else if (s <= rleMax) {
        val reps = (1 << s) + br.readBits(s)
        if (i + reps > size) bail("L282")
        i += reps
      } else {
        out(i) = s - rleMax
        i += 1
      }
    }
    if (br.readBit() == 1) {
      // inverse move-to-front
      val mtf = Array.tabulate(256)(identity)
      var k = 0
      while (k < size) {
        val idx = out(k)
        val v = mtf(idx)
        out(k) = v
        var j = idx
        while (j > 0) { mtf(j) = mtf(j - 1); j -= 1 }
        mtf(0) = v
        k += 1
      }
    }
    if (out.exists(_ >= ntrees)) bail("L303")
    out
  }

  private def readBlockLength(br: BitReader, code: Prefix): Int = {
    val s = code.decode(br)
    if (s >= 26) bail("L309")
    BlockLenBase(s) + br.readBits(BlockLenExtra(s))
  }

  // ------------------------------------------------- word transforms

  /** §8: apply transform `tid` to a dictionary word. */
  private[functions] def transformWord(word: Array[Byte],
                                       tid: Int): Array[Byte] = {
    val t = BrotliData.transforms
    val ps = BrotliData.prefixSuffix
    def psStr(idx: Int): Array[Byte] = {
      var off = 0
      var k = 0
      while (k < idx) { off += 1 + (ps(off) & 0xff); k += 1 }
      java.util.Arrays.copyOfRange(ps, off + 1, off + 1 + (ps(off) & 0xff))
    }
    val prefix = psStr(t(3 * tid) & 0xff)
    val kind = t(3 * tid + 1) & 0xff
    val suffix = psStr(t(3 * tid + 2) & 0xff)
    val core: Array[Byte] =
      if (kind == 0) word // identity
      else if (kind >= 1 && kind <= 9) { // omit last 1..9
        if (word.length <= kind) Array.emptyByteArray
        else java.util.Arrays.copyOf(word, word.length - kind)
      } else if (kind >= 12 && kind <= 20) { // omit first 1..9
        val n = kind - 11
        if (word.length <= n) Array.emptyByteArray
        else java.util.Arrays.copyOfRange(word, n, word.length)
      } else { // 10 = uppercase first, 11 = uppercase all
        val w = word.clone()
        var i = 0
        var done = false
        while (i < w.length && !done) {
          val c = w(i) & 0xff
          if (c < 192) {
            if (c >= 'a' && c <= 'z') w(i) = (c ^ 32).toByte
            i += 1
          } else if (c < 224) {
            if (i + 1 < w.length) w(i + 1) = (w(i + 1) ^ 32).toByte
            i += 2
          } else {
            if (i + 2 < w.length) w(i + 2) = (w(i + 2) ^ 5).toByte
            i += 3
          }
          if (kind == 10) done = true
        }
        w
      }
    prefix ++ core ++ suffix
  }

  // ------------------------------------------------- stored encoder

  /** STORED-mode encoder: a valid RFC 7932 stream of uncompressed
    * meta-blocks (§9.2 ISUNCOMPRESSED) — no entropy coding, so it
    * needs none of the encoder machinery this object deliberately
    * lacks. Decodable by any conformant brotli (and by [[decode]],
    * which the spec pins). Used by fixture writers that need to wrap
    * arbitrary bytes in real brotli framing (e.g. WOFF2 containers). */
  def encodeStored(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length + 8 +
      4 * (data.length / 65536 + 1))
    var acc = 0
    var nbits = 0
    def put(v: Int, n: Int): Unit = {
      acc |= v << nbits
      nbits += n
      while (nbits >= 8) { out.write(acc & 0xff); acc >>>= 8; nbits -= 8 }
    }
    def alignByte(): Unit =
      if (nbits > 0) { out.write(acc & 0xff); acc = 0; nbits = 0 }
    put(0, 1) // WBITS = 16
    var at = 0
    while (at < data.length) {
      val chunk = math.min(1 << 16, data.length - at)
      put(0, 1) // ISLAST = 0
      put(0, 2) // MNIBBLES = 4
      put(chunk - 1, 16) // MLEN - 1
      put(1, 1) // ISUNCOMPRESSED
      alignByte()
      out.write(data, at, chunk)
      at += chunk
    }
    put(1, 1); put(1, 1) // ISLAST, ISLASTEMPTY
    alignByte()
    out.toByteArray
  }

  // ------------------------------------------------------- decoder

  /** Decode a complete brotli stream. None on malformed/hostile input
    * or output beyond the 2^26-byte gate. */
  def decode(b: Array[Byte]): Option[Array[Byte]] =
    try {
      val br = new BitReader(b)
      // window bits
      val wbits =
        if (br.readBit() == 0) 16
        else {
          val n = br.readBits(3)
          if (n != 0) 17 + n
          else {
            val m = br.readBits(3)
            if (m == 1) return None // reserved (large-window extension)
            else if (m == 0) 17
            else 8 + m // 2..7 → WBITS 10..15
          }
        }
      val windowSize = (1 << wbits) - 16
      var out = new Array[Byte](64 * 1024)
      var pos = 0
      def ensure(n: Int): Unit = {
        if (pos + n > (1 << 26)) bail("L385")
        if (pos + n > out.length) {
          var cap = out.length
          while (cap < pos + n) cap *= 2
          out = java.util.Arrays.copyOf(out, math.min(cap, 1 << 26))
        }
      }
      val ring = Array(4, 11, 15, 16) // ring(0) = last distance
      def pushRing(d: Int): Unit = {
        ring(3) = ring(2); ring(2) = ring(1); ring(1) = ring(0); ring(0) = d
      }
      var isLast = false
      while (!isLast) {
        isLast = br.readBit() == 1
        if (isLast && br.readBit() == 1) {
          // ISLASTEMPTY
        } else {
          val nibCode = br.readBits(2)
          if (nibCode == 3) {
            // metadata block: reserved bit, skip bytes
            if (br.readBit() != 0) bail("L405")
            val mskip = br.readBits(2)
            val skip =
              if (mskip == 0) 0
              else {
                val v = br.readBits(8 * mskip)
                if (mskip > 1 && (v >> (8 * (mskip - 1))) == 0) bail("L411")
                v + 1
              }
            br.align()
            br.pos += skip.toLong * 8
            if (br.pos > b.length.toLong * 8) bail("L416")
          } else {
            val nibbles = 4 + nibCode
            val mlenM1 = br.readBits(4 * nibbles)
            if (nibbles > 4 && (mlenM1 >> (4 * (nibbles - 1))) == 0) bail("L420")
            val mlen = mlenM1 + 1
            val uncompressed = !isLast && br.readBit() == 1
            ensure(mlen)
            if (uncompressed) {
              br.align()
              val from = br.bytePos
              if (from + mlen > b.length) bail("L427")
              System.arraycopy(b, from, out, pos, mlen)
              pos += mlen
              br.pos += mlen.toLong * 8
            } else {
              // --- category setup: 0=L literals, 1=I commands, 2=D dists
              val nbl = new Array[Int](3)
              val typeCodes = new Array[Prefix](3)
              val countCodes = new Array[Prefix](3)
              val blockLen = new Array[Int](3)
              val curType = new Array[Int](3)
              val prevType = new Array[Int](3)
              var cat = 0
              while (cat < 3) {
                nbl(cat) = readVarLenUint8(br) + 1
                curType(cat) = 0
                prevType(cat) = 1
                if (nbl(cat) >= 2) {
                  typeCodes(cat) = readPrefixCode(br, nbl(cat) + 2)
                  countCodes(cat) = readPrefixCode(br, 26)
                  blockLen(cat) = readBlockLength(br, countCodes(cat))
                } else blockLen(cat) = Int.MaxValue
                cat += 1
              }
              def switchBlock(c: Int): Unit = {
                val s = typeCodes(c).decode(br)
                val nt =
                  if (s == 0) prevType(c)
                  else if (s == 1) (curType(c) + 1) % nbl(c)
                  else s - 2
                prevType(c) = curType(c)
                curType(c) = nt
                blockLen(c) = readBlockLength(br, countCodes(c))
              }
              val npostfix = br.readBits(2)
              val ndirect = br.readBits(4) << npostfix
              val contextModes = Array.fill(nbl(0))(br.readBits(2))
              val ntreesL = readVarLenUint8(br) + 1
              val cmapL =
                if (ntreesL >= 2) readContextMap(br, 64 * nbl(0), ntreesL)
                else new Array[Int](64 * nbl(0))
              val ntreesD = readVarLenUint8(br) + 1
              val cmapD =
                if (ntreesD >= 2) readContextMap(br, 4 * nbl(2), ntreesD)
                else new Array[Int](4 * nbl(2))
              val litTrees = Array.fill(ntreesL)(readPrefixCode(br, 256))
              val icTrees = Array.fill(nbl(1))(readPrefixCode(br, 704))
              val distAlpha = 16 + ndirect + (48 << npostfix)
              val distTrees = Array.fill(ntreesD)(readPrefixCode(br, distAlpha))
              val ctx = BrotliData.contextLookup
              var metaLeft = mlen
              while (metaLeft > 0) {
                if (blockLen(1) == 0) switchBlock(1)
                blockLen(1) -= 1
                val cmd = icTrees(curType(1)).decode(br)
                var ri = cmd >> 6
                val implicitDist = ri < 2
                if (!implicitDist) ri -= 2
                val insCode = InsRangeLut(ri) + ((cmd >> 3) & 7)
                val copyCode = CopyRangeLut(ri) + (cmd & 7)
                val insLen = InsBase(insCode) + br.readBits(InsExtra(insCode))
                val copyLen = CopyBase(copyCode) +
                  br.readBits(CopyExtra(copyCode))
                if (insLen > metaLeft) bail("L490")
                ensure(insLen)
                var j = 0
                while (j < insLen) {
                  if (blockLen(0) == 0) switchBlock(0)
                  blockLen(0) -= 1
                  val mode = contextModes(curType(0))
                  val p1 = if (pos > 0) out(pos - 1) & 0xff else 0
                  val p2 = if (pos > 1) out(pos - 2) & 0xff else 0
                  val c = (ctx(512 * mode + p1) & 0xff) |
                    (ctx(512 * mode + 256 + p2) & 0xff)
                  val tree = litTrees(cmapL(64 * curType(0) + c))
                  out(pos) = tree.decode(br).toByte
                  pos += 1
                  j += 1
                }
                metaLeft -= insLen
                if (metaLeft > 0) {
                  // distance
                  var distance = 0
                  var pushed = false
                  if (implicitDist) distance = ring(0)
                  else {
                    if (blockLen(2) == 0) switchBlock(2)
                    blockLen(2) -= 1
                    val dctx = math.min(copyLen, 5) - 2
                    val dsym = distTrees(
                      cmapD(4 * curType(2) + dctx)).decode(br)
                    if (dsym < 16) {
                      distance = dsym match {
                        case 0 => ring(0)
                        case 1 => ring(1)
                        case 2 => ring(2)
                        case 3 => ring(3)
                        case 4 => ring(0) - 1
                        case 5 => ring(0) + 1
                        case 6 => ring(0) - 2
                        case 7 => ring(0) + 2
                        case 8 => ring(0) - 3
                        case 9 => ring(0) + 3
                        case 10 => ring(1) - 1
                        case 11 => ring(1) + 1
                        case 12 => ring(1) - 2
                        case 13 => ring(1) + 2
                        case 14 => ring(1) - 3
                        case _ => ring(1) + 3
                      }
                      if (distance <= 0) bail("L537")
                      pushed = dsym != 0
                    } else if (dsym < 16 + ndirect) {
                      distance = dsym - 16 + 1
                      pushed = true
                    } else {
                      val dcode = dsym - ndirect - 16
                      val postfixMask = (1 << npostfix) - 1
                      val ndistbits = 1 + (dcode >> (npostfix + 1))
                      if (ndistbits > 24) bail("L546")
                      val dextra = br.readBits(ndistbits)
                      val hcode = dcode >> npostfix
                      val lcode = dcode & postfixMask
                      val offset = ((2 + (hcode & 1)) << ndistbits) - 4
                      distance =
                        ((offset + dextra) << npostfix) + lcode + ndirect + 1
                      pushed = true
                    }
                  }
                  val maxDist = math.min(pos, windowSize)
                  if (distance <= maxDist) {
                    if (copyLen > metaLeft) bail("L558")
                    if (pushed) pushRing(distance)
                    ensure(copyLen)
                    var k = 0
                    while (k < copyLen) {
                      out(pos) = out(pos - distance)
                      pos += 1
                      k += 1
                    }
                    metaLeft -= copyLen
                  } else {
                    // static dictionary reference
                    if (copyLen < 4 || copyLen > 24) bail("L570")
                    val nbits = BrotliData.sizeBits(copyLen)
                    if (nbits == 0) bail("L572")
                    val idx = distance - maxDist - 1
                    val wordIdx = idx & ((1 << nbits) - 1)
                    val tid = idx >>> nbits
                    if (tid >= 121) bail("L576")
                    val base = BrotliData.dictOffsets(copyLen) +
                      wordIdx * copyLen
                    val word = java.util.Arrays.copyOfRange(
                      BrotliData.dictionary, base, base + copyLen)
                    val tw = transformWord(word, tid)
                    if (tw.length > metaLeft) bail("L582")
                    ensure(tw.length)
                    System.arraycopy(tw, 0, out, pos, tw.length)
                    pos += tw.length
                    metaLeft -= tw.length
                  }
                }
              }
            }
          }
        }
      }
      Some(java.util.Arrays.copyOf(out, pos))
    } catch {
      case _: Bail => None
      case _: IndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
      case _: ArithmeticException => None
    }
}
