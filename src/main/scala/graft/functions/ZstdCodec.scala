package graft.functions

/** Zstandard decoder (RFC 8878) — the compression wrapper modern data
  * pipelines ship everything in.
  *
  *  - [[census]] parses any zstd frame's header and block structure
  *    (magic, frame-header descriptor, window/single-segment, dict
  *    id, frame content size, block census by type) — block headers
  *    are plain 3-byte little-endian records even when block payloads
  *    are FSE/Huffman-coded.
  *  - [[extract]] fully decodes frames: Raw and RLE blocks (§3.1.1.2.2
  *    types 0/1) AND Compressed blocks (type 2) — Huffman-coded
  *    literals (direct or FSE-compressed weights, 1- or 4-stream,
  *    treeless reuse), FSE-coded sequences (predefined / RLE / FSE /
  *    repeat table modes), repeat-offset history, and cross-block
  *    match copies. When the frame carries a content checksum the
  *    XXH64 low-32 is verified. Dictionary frames (dictId != 0) and
  *    structurally invalid input return None (rejects channel) —
  *    the decoder never throws on hostile bytes.
  *
  * [[writeFrame]] emits conformant single-segment frames from
  * raw/RLE parts, and [[writeCompressedFrame]] from Compressed blocks
  * (Huffman literals + RLE-mode sequences) — both validated against
  * the reference `zstd` CLI; the fixture queries build on them so the
  * oracle can predict extracted content by formula.
  */
object ZstdCodec {

  final case class ZstdMeta(singleSegment: Boolean, dictId: Long,
                            contentSize: Long, nBlocks: Int, nRaw: Int,
                            nRle: Int, nCompressed: Int)

  private val Magic = Array(0x28, 0xb5, 0x2f, 0xfd).map(_.toByte)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def leN(b: Array[Byte], i: Int, n: Int): Long = {
    var v = 0L
    var k = 0
    while (k < n) { v |= (b(i + k) & 0xffL) << (8 * k); k += 1 }
    v
  }

  /** One raw/RLE part of a frame body. */
  sealed trait Part
  final case class RawPart(data: Array[Byte]) extends Part
  final case class RlePart(byte: Byte, count: Int) extends Part

  /** Write a single-segment zstd frame whose blocks are the given
    * parts verbatim (block sizes are bounded at 1 MiB by parts'
    * construction; RFC caps block size at min(window, 128 KiB) — the
    * fixtures stay far below it). */
  def writeFrame(parts: Seq[Part]): Array[Byte] = {
    require(parts.nonEmpty, "empty frame")
    val contentSize = parts.map {
      case RawPart(d) => d.length.toLong
      case RlePart(_, n) => n.toLong
    }.sum
    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic, 0, 4)
    // frame-header descriptor: single-segment, no checksum, no dict;
    // FCS field size by value (§3.1.1.1.1: flag 0 + single segment →
    // 1 byte, flag 1 → 2 bytes (value-256), flag 2 → 4 bytes)
    if (contentSize < 256) {
      out.write(0x20) // FCS flag 0 | single_segment
      out.write(contentSize.toInt)
    } else if (contentSize < 65536 + 256) {
      out.write(0x60) // FCS flag 1 | single_segment
      val v = contentSize - 256
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
    } else {
      out.write(0xa0) // FCS flag 2 | single_segment
      var v = contentSize
      for (_ <- 0 until 4) { out.write((v & 0xff).toInt); v >>= 8 }
    }
    parts.zipWithIndex.foreach { case (p, i) =>
      val last = if (i == parts.size - 1) 1 else 0
      val (typ, size) = p match {
        case RawPart(d) => (0, d.length)
        case RlePart(_, n) => (1, n)
      }
      val hdr = last | (typ << 1) | (size << 3)
      out.write(hdr & 0xff); out.write((hdr >> 8) & 0xff)
      out.write((hdr >> 16) & 0xff)
      p match {
        case RawPart(d) => out.write(d, 0, d.length)
        case RlePart(b, _) => out.write(b)
      }
    }
    out.toByteArray
  }

  // ------------------------------------------------- entropy encoding

  /** One sequence for [[writeCompressedFrame]]: emit `ll` literal
    * bytes, then copy `ml` bytes from `offset` back (repCode 1–3 emits
    * the corresponding repeat-offset code instead of an absolute
    * offset). */
  final case class Seqn(ll: Int, ml: Int, offset: Long = 0L, repCode: Int = 0)

  /** Literal-section coding for one Compressed block. */
  sealed trait LitMode
  case object Lit1Stream extends LitMode
  case object Lit4Stream extends LitMode
  /** Reuse the previous block's Huffman table (type 3) — the literal
    * alphabet must be a subset of that block's. */
  case object LitTreeless extends LitMode
  case object LitRle extends LitMode
  case object LitRaw extends LitMode

  final case class CompBlock(literals: Array[Byte], sequences: Seq[Seqn],
                             litMode: LitMode = Lit1Stream)

  /** Backward bit writer (§3.1.1.7): first `put` is the first value the
    * decoder reads; a sentinel 1-bit tops the stream. */
  private final class WBits {
    private val vals = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
    def put(v: Long, n: Int): Unit = {
      require(n >= 0 && (n == 0 || (v >> n) == 0), s"value $v over $n bits")
      vals += ((v, n))
    }
    def pack(): Array[Byte] = {
      val total = vals.iterator.map(_._2).sum
      val out = new Array[Byte]((total + 8) / 8)
      def set(idx: Int): Unit =
        out(idx >> 3) = (out(idx >> 3) | (1 << (idx & 7))).toByte
      set(total) // sentinel
      var idx = total - 1
      vals.foreach { case (v, n) =>
        var k = 0
        while (k < n) {
          if (((v >> (n - 1 - k)) & 1) != 0) set(idx)
          idx -= 1; k += 1
        }
      }
      out
    }
  }

  /** Canonical Huffman codes for the byte histogram of `lit`:
    * (explicitWeights, perSymbol (code, nbBits), maxBits). Lengths are
    * Kraft-exact by a greedy deficit fix, so the implicit-last-weight
    * convention reproduces them. */
  private def hufAssign(lit: Array[Byte]): (Array[Int], Array[Int], Array[Int], Int) = {
    val freq = new Array[Long](256)
    lit.foreach(b => freq(b & 0xff) += 1)
    val present = (0 until 256).filter(freq(_) > 0)
    require(present.size >= 2, "huffman needs >= 2 distinct symbols")
    val lastSym = present.max
    require(lastSym <= 128, "direct-weight header covers symbols 0..128")
    val n = present.size
    val L = math.max(1, 32 - Integer.numberOfLeadingZeros(n - 1)) // ceil(log2 n)
    val len = new Array[Int](256)
    present.foreach(len(_) = L)
    var deficit = (1 << L) - n
    // greedy: shorten highest-frequency symbols first, each contributing
    // 2^m - 1 toward the Kraft deficit
    val byFreq = present.sortBy(-freq(_)).iterator
    while (deficit > 0) {
      val s = byFreq.next()
      var m = 1
      while ((1 << (m + 1)) - 1 <= deficit && L - (m + 1) >= 1) m += 1
      len(s) = L - m
      deficit -= (1 << m) - 1
    }
    val maxBits = L
    val weights = new Array[Int](256)
    present.foreach(s => weights(s) = maxBits + 1 - len(s))
    // code assignment mirrors the decode-table fill: weight ascending,
    // symbol ascending; code = cur >> (w-1)
    val code = new Array[Int](256)
    val nb = new Array[Int](256)
    var cur = 0
    var w = 1
    while (w <= maxBits) {
      var s = 0
      while (s <= lastSym) {
        if (weights(s) == w) {
          nb(s) = maxBits + 1 - w
          code(s) = cur >> (w - 1)
          cur += 1 << (w - 1)
        }
        s += 1
      }
      w += 1
    }
    val explicit = (0 until lastSym).map(weights(_)).toArray
    (explicit, code, nb, maxBits)
  }

  /** Encode one Huffman stream (first literal first). */
  private def hufStream(lit: Array[Byte], from: Int, until: Int,
                        code: Array[Int], nb: Array[Int]): Array[Byte] = {
    val wb = new WBits
    var i = from
    while (i < until) {
      val s = lit(i) & 0xff
      wb.put(code(s).toLong, nb(s))
      i += 1
    }
    wb.pack()
  }

  /** Literals section bytes for a Compressed block; returns
    * (bytes, codes, nb) so treeless blocks can reuse the table. */
  private def encodeLiterals(lit: Array[Byte], mode: LitMode,
                             prev: Option[(Array[Int], Array[Int])]): (Array[Byte], Option[(Array[Int], Array[Int])]) = {
    val out = new java.io.ByteArrayOutputStream()
    def rawHeader(typ: Int, regen: Int): Unit =
      if (regen <= 31) out.write(typ | (regen << 3))
      else if (regen <= 4095) {
        val v = typ | (1 << 2) | (regen << 4)
        out.write(v & 0xff); out.write((v >> 8) & 0xff)
      } else {
        val v = typ | (3 << 2) | (regen << 4)
        out.write(v & 0xff); out.write((v >> 8) & 0xff); out.write((v >> 16) & 0xff)
      }
    mode match {
      case LitRaw =>
        rawHeader(0, lit.length)
        out.write(lit, 0, lit.length)
        (out.toByteArray, prev)
      case LitRle =>
        require(lit.nonEmpty && lit.forall(_ == lit(0)), "RLE literals must be uniform")
        rawHeader(1, lit.length)
        out.write(lit(0))
        (out.toByteArray, prev)
      case LitTreeless =>
        val (code, nb) = prev.getOrElse(
          throw new IllegalArgumentException("treeless without prior table"))
        lit.foreach(b => require(nb(b & 0xff) > 0, "treeless alphabet not covered"))
        val body = hufStream(lit, 0, lit.length, code, nb)
        require(lit.length <= 1023 && body.length <= 1023, "1-stream caps at 1023")
        val v = 3L | (0L << 2) | (lit.length.toLong << 4) | (body.length.toLong << 14)
        out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
        out.write(((v >> 16) & 0xff).toInt)
        out.write(body, 0, body.length)
        (out.toByteArray, prev)
      case Lit1Stream | Lit4Stream =>
        val (explicit, code, nb, _) = hufAssign(lit)
        val tree = new java.io.ByteArrayOutputStream()
        tree.write(127 + explicit.length)
        var i = 0
        while (i < explicit.length) {
          val hi = explicit(i)
          val lo = if (i + 1 < explicit.length) explicit(i + 1) else 0
          tree.write((hi << 4) | lo)
          i += 2
        }
        val treeB = tree.toByteArray
        val body = new java.io.ByteArrayOutputStream()
        if (mode == Lit1Stream) {
          val s = hufStream(lit, 0, lit.length, code, nb)
          body.write(s, 0, s.length)
          val comp = treeB.length + body.size()
          require(lit.length <= 1023 && comp <= 1023, "1-stream caps at 1023")
          val v = 2L | (0L << 2) | (lit.length.toLong << 4) | (comp.toLong << 14)
          out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
          out.write(((v >> 16) & 0xff).toInt)
        } else {
          val r13 = (lit.length + 3) / 4
          val r4 = lit.length - 3 * r13
          require(r4 >= 1, s"4-stream needs a non-empty 4th stream (len ${lit.length})")
          val ss = Array(
            hufStream(lit, 0, r13, code, nb),
            hufStream(lit, r13, 2 * r13, code, nb),
            hufStream(lit, 2 * r13, 3 * r13, code, nb),
            hufStream(lit, 3 * r13, lit.length, code, nb))
          ss.take(3).foreach { s =>
            body.write(s.length & 0xff); body.write((s.length >> 8) & 0xff)
          }
          ss.foreach(s => body.write(s, 0, s.length))
          val comp = treeB.length + body.size()
          // pick the smallest 4-stream size format that fits
          if (lit.length <= 1023 && comp <= 1023) {
            val v = 2L | (1L << 2) | (lit.length.toLong << 4) | (comp.toLong << 14)
            out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
            out.write(((v >> 16) & 0xff).toInt)
          } else if (lit.length <= 16383 && comp <= 16383) {
            val v = 2L | (2L << 2) | (lit.length.toLong << 4) | (comp.toLong << 18)
            out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
            out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
          } else {
            require(lit.length <= 262143, "literal section too large")
            val v = 2L | (3L << 2) | (lit.length.toLong << 4) | (comp.toLong << 22)
            var k = 0
            while (k < 5) { out.write(((v >> (8 * k)) & 0xff).toInt); k += 1 }
          }
        }
        out.write(treeB, 0, treeB.length)
        body.writeTo(out)
        (out.toByteArray, Some((code, nb)))
    }
  }

  /** Map a literals-length value to its (code, extraBits). */
  private def llCodeOf(v: Int): (Int, Int) =
    if (v < 16) (v, 0)
    else {
      var c = 35
      while (LLBase(c) > v) c -= 1
      (c, LLExtra(c))
    }

  private def mlCodeOf(v: Int): (Int, Int) = {
    require(v >= 3, "match length >= 3")
    if (v <= 34) (v - 3, 0)
    else {
      var c = 52
      while (MLBase(c) > v) c -= 1
      (c, MLExtra(c))
    }
  }

  /** Emit a Compressed-block zstd frame (single segment). Literals are
    * Huffman/RLE/raw coded per block; sequences use RLE table mode, so
    * all sequences within one block must share their LL/ML/OF codes
    * (extra bits may differ). Optionally appends the XXH64 content
    * checksum. Returns (frame, decodedContent). */
  def writeCompressedFrame(blocks: Seq[CompBlock],
                           checksum: Boolean = false): (Array[Byte], Array[Byte]) = {
    require(blocks.nonEmpty, "empty frame")
    // simulate execution to size the FCS, validate offsets, and hash
    val sim = new OutBuf(256)
    var rep1 = 1L; var rep2 = 4L; var rep3 = 8L
    val encoded = blocks.map { blk =>
      var litPos = 0
      blk.sequences.foreach { q =>
        require(q.ll >= 0 && litPos + q.ll <= blk.literals.length, "ll overruns literals")
        sim.write(blk.literals, litPos, q.ll); litPos += q.ll
        val offset: Long =
          if (q.repCode == 0) {
            require(q.offset > 0, "absolute offset must be > 0")
            rep3 = rep2; rep2 = rep1; rep1 = q.offset
            q.offset
          } else {
            val idx = q.repCode + (if (q.ll == 0) 1 else 0)
            val o = idx match {
              case 1 => rep1
              case 2 => val x = rep2; rep2 = rep1; rep1 = x; x
              case 3 => val x = rep3; rep3 = rep2; rep2 = rep1; rep1 = x; x
              case _ =>
                val x = rep1 - 1
                require(x > 0, "rep1-1 offset must be > 0")
                rep3 = rep2; rep2 = rep1; rep1 = x; x
            }
            o
          }
        require(offset <= sim.n, s"offset $offset reaches before frame start")
        sim.ensure(q.ml)
        val a = sim.a
        val src = sim.n - offset.toInt
        var k = 0
        while (k < q.ml) { a(sim.n) = a(src + k); sim.n += 1; k += 1 }
      }
      sim.write(blk.literals, litPos, blk.literals.length - litPos)
      blk
    }
    val content = sim.toArray
    // assemble blocks
    var prevTable: Option[(Array[Int], Array[Int])] = None
    var r1 = 1L; var r2 = 4L; var r3 = 8L
    val blockBytes = encoded.map { blk =>
      val (litSec, table) = encodeLiterals(blk.literals, blk.litMode, prevTable)
      prevTable = table
      val seqSec = new java.io.ByteArrayOutputStream()
      if (blk.sequences.isEmpty) seqSec.write(0)
      else {
        val n = blk.sequences.size
        require(n < 128, "fixture blocks keep nbSeq < 128")
        seqSec.write(n)
        // RLE table mode for all three families
        seqSec.write((1 << 6) | (1 << 4) | (1 << 2))
        // per-sequence codes; RLE mode requires one shared code per family
        val triples = blk.sequences.map { q =>
          val ofValue: Long =
            if (q.repCode == 0) {
              r3 = r2; r2 = r1; r1 = q.offset
              q.offset + 3
            } else {
              val idx = q.repCode + (if (q.ll == 0) 1 else 0)
              idx match {
                case 1 => ()
                case 2 => val x = r2; r2 = r1; r1 = x
                case 3 => val x = r3; r3 = r2; r2 = r1; r1 = x
                case _ => val x = r1 - 1; r3 = r2; r2 = r1; r1 = x
              }
              q.repCode.toLong
            }
          val ofCode = 63 - java.lang.Long.numberOfLeadingZeros(ofValue)
          val ofExtra = ofValue - (1L << ofCode)
          val (llC, llB) = llCodeOf(q.ll)
          val (mlC, mlB) = mlCodeOf(q.ml)
          (ofCode.toInt, ofExtra, llC, llB, q.ll - LLBase(llC), mlC, mlB,
            q.ml - MLBase(mlC))
        }
        val (ofCode, _, llC, _, _, mlC, _, _) = triples.head
        require(triples.forall(t => t._1 == ofCode && t._3 == llC && t._6 == mlC),
          "RLE sequence mode needs shared LL/ML/OF codes within a block")
        seqSec.write(llC); seqSec.write(ofCode); seqSec.write(mlC)
        val wb = new WBits
        // RLE tables have accuracy 0: state init reads no bits; per
        // sequence the decoder reads OF extra, ML extra, LL extra
        triples.foreach { case (ofC, ofE, _, llB, llE, _, mlB, mlE) =>
          wb.put(ofE, ofC)
          wb.put(mlE.toLong, mlB)
          wb.put(llE.toLong, llB)
        }
        val bs = wb.pack()
        seqSec.write(bs, 0, bs.length)
      }
      val litB = litSec
      val body = new Array[Byte](litB.length + seqSec.size())
      System.arraycopy(litB, 0, body, 0, litB.length)
      System.arraycopy(seqSec.toByteArray, 0, body, litB.length, seqSec.size())
      body
    }
    // frame header: explicit 128 KiB window (NOT single-segment — a
    // single-segment window equals the content size, and the reference
    // decoder enforces compressed-block-size <= window, which tiny
    // contents with Huffman-table overhead would violate), 4-byte FCS
    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic, 0, 4)
    val checkBit = if (checksum) 0x04 else 0x00
    val contentSize = content.length.toLong
    out.write(0x80 | checkBit) // FCS flag 2 (4 bytes), windowed, no dict
    out.write(0x38)            // window descriptor: exponent 7 -> 128 KiB
    var v = contentSize
    for (_ <- 0 until 4) { out.write((v & 0xff).toInt); v >>= 8 }
    blockBytes.zipWithIndex.foreach { case (body, i) =>
      val last = if (i == blockBytes.size - 1) 1 else 0
      val hdr = last | (2 << 1) | (body.length << 3)
      out.write(hdr & 0xff); out.write((hdr >> 8) & 0xff)
      out.write((hdr >> 16) & 0xff)
      out.write(body, 0, body.length)
    }
    if (checksum) {
      val h = xxh64(content)
      var k = 0
      while (k < 4) { out.write(((h >> (8 * k)) & 0xff).toInt); k += 1 }
    }
    (out.toByteArray, content)
  }

  /** Walk block headers, returning (meta, payloadOffsets) — shared by
    * census and extract. None on malformed structure; sizes validated
    * in Long space. */
  private def walk(b: Array[Byte], start: Int = 0): Option[(ZstdMeta, Seq[(Int, Int, Int)])] = {
    if (b.length - start < 6 || b(start) != Magic(0) || b(start + 1) != Magic(1) ||
      b(start + 2) != Magic(2) || b(start + 3) != Magic(3)) return None
    val fhd = u8(b, start + 4)
    val fcsFlag = fhd >> 6
    val singleSegment = (fhd & 0x20) != 0
    val checksum = (fhd & 0x04) != 0
    val didFlag = fhd & 0x03
    var p = start + 5
    if (!singleSegment) p += 1 // window descriptor
    val didSize = Array(0, 1, 2, 4)(didFlag)
    if (p + didSize > b.length) return None
    val dictId = leN(b, p, didSize)
    p += didSize
    val fcsSize = fcsFlag match {
      case 0 => if (singleSegment) 1 else 0
      case 1 => 2
      case 2 => 4
      case _ => 8
    }
    if (p + fcsSize > b.length) return None
    val contentSize = fcsSize match {
      case 0 => -1L
      case 2 => leN(b, p, 2) + 256
      case n => leN(b, p, n)
    }
    p += fcsSize
    val blocks = Seq.newBuilder[(Int, Int, Int)]
    var nBlocks = 0; var nRaw = 0; var nRle = 0; var nComp = 0
    var last = false
    while (!last) {
      if (p + 3 > b.length) return None
      val hdr = leN(b, p, 3)
      last = (hdr & 1) != 0
      val typ = ((hdr >> 1) & 3).toInt
      val size = (hdr >> 3).toInt
      if (typ == 3) return None // reserved
      val stored = if (typ == 1) 1 else size
      if (p + 3L + stored > b.length) return None
      blocks += ((typ, p + 3, size))
      nBlocks += 1
      typ match {
        case 0 => nRaw += 1
        case 1 => nRle += 1
        case _ => nComp += 1
      }
      p += 3 + stored
    }
    if (checksum && p + 4 > b.length) return None
    Some((ZstdMeta(singleSegment, dictId, contentSize, nBlocks, nRaw,
      nRle, nComp), blocks.result()))
  }

  /** Skippable-frame magics 0x184D2A50..5F (RFC 8878 §3.1.2). */
  private def isSkippable(b: Array[Byte], p: Int): Boolean =
    p + 8 <= b.length && (u8(b, p) & 0xf0) == 0x50 && u8(b, p + 1) == 0x2a &&
      u8(b, p + 2) == 0x4d && u8(b, p + 3) == 0x18

  def census(b: Array[Byte]): Option[ZstdMeta] =
    try walk(b).map(_._1)
    catch { case _: IndexOutOfBoundsException => None }

  // ------------------------------------------------- entropy decoding

  /** Hard cap on decoded output — a hostile frame can claim ~2 MiB per
    * 4-byte RLE block header; bound the amplification. */
  private val MaxOut = 1 << 26

  private def highBit(v: Int): Int = 31 - Integer.numberOfLeadingZeros(v)

  /** Backward bitstream (§3.1.1.7): values are read MSB-first starting
    * just below the sentinel 1-bit at the top of the last byte. Reads
    * below the start zero-fill (legal only for the final Huffman peek);
    * `avail` goes negative to flag over-reads. */
  private final class RBits(buf: Array[Byte], off: Int, len: Int) {
    var avail: Int =
      if (len <= 0) -1
      else {
        val lastB = buf(off + len - 1) & 0xff
        if (lastB == 0) -1 // missing sentinel = corrupt
        else (len - 1) * 8 + highBit(lastB)
      }
    def ok: Boolean = avail >= 0
    private def bitAt(idx: Int): Int =
      if (idx < 0) 0 else (buf(off + (idx >> 3)) >> (idx & 7)) & 1
    /** Read n bits MSB-first from the top of the remaining stream. */
    def read(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bitAt(avail - 1 - i); i += 1 }
      avail -= n
      v
    }
    def readLong(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | bitAt(avail - 1 - i); i += 1 }
      avail -= n
      v
    }
    /** Peek n bits without consuming (zero-filled below the start). */
    def peek(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bitAt(avail - 1 - i); i += 1 }
      v
    }
    def skip(n: Int): Unit = avail -= n
  }

  /** FSE decoding table: per-state symbol / bit count / next-state base. */
  private final class FseTable(val accuracyLog: Int, val symbol: Array[Int],
                               val nbBits: Array[Int], val nextBase: Array[Int])

  private object FseTable {
    /** Single-state table (RLE mode §3.1.1.4.2.3): one symbol, 0 bits. */
    def rle(sym: Int): FseTable =
      new FseTable(0, Array(sym), Array(0), Array(0))

    /** Build the decode table from normalized counts (§4.1.1). */
    def fromNorm(norm: Array[Int], accuracyLog: Int): Option[FseTable] = {
      val tableSize = 1 << accuracyLog
      val symbol = new Array[Int](tableSize)
      val nbBits = new Array[Int](tableSize)
      val nextBase = new Array[Int](tableSize)
      val symbolNext = new Array[Int](norm.length)
      var highThreshold = tableSize - 1
      var s = 0
      while (s < norm.length) {
        if (norm(s) == -1) {
          if (highThreshold < 0) return None
          symbol(highThreshold) = s; highThreshold -= 1
          symbolNext(s) = 1
        } else symbolNext(s) = norm(s)
        s += 1
      }
      val step = (tableSize >> 1) + (tableSize >> 3) + 3
      val mask = tableSize - 1
      var pos = 0
      s = 0
      while (s < norm.length) {
        var i = 0
        while (i < norm(s)) {
          symbol(pos) = s
          do pos = (pos + step) & mask while (pos > highThreshold)
          i += 1
        }
        s += 1
      }
      if (pos != 0) return None // counts don't fill the table = corrupt
      var u = 0
      while (u < tableSize) {
        val sy = symbol(u)
        val nextState = symbolNext(sy); symbolNext(sy) += 1
        val nb = accuracyLog - highBit(nextState)
        if (nb < 0 || nb > accuracyLog) return None
        nbBits(u) = nb
        nextBase(u) = (nextState << nb) - tableSize
        u += 1
      }
      Some(new FseTable(accuracyLog, symbol, nbBits, nextBase))
    }
  }

  /** Parse an FSE table description (§4.1.1): forward little-endian
    * bitstream of normalized counts. Returns (table, bytesConsumed). */
  private def readFseTable(b: Array[Byte], off: Int, end: Int,
                           maxAccuracy: Int, maxSymbol: Int): Option[(FseTable, Int)] = {
    if (off >= end) return None
    var bitPos = 0 // forward, LSB-first
    def peekBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val idx = bitPos + i
        val byteI = off + (idx >> 3)
        val bit = if (byteI >= end) 0 else (b(byteI) >> (idx & 7)) & 1
        v |= bit << i
        i += 1
      }
      v
    }
    val accuracyLog = peekBits(4) + 5; bitPos += 4
    if (accuracyLog > maxAccuracy) return None
    val tableSize = 1 << accuracyLog
    var remaining = tableSize + 1
    var threshold = tableSize
    var nbBits = accuracyLog + 1
    val norm = new Array[Int](maxSymbol + 1)
    var charnum = 0
    var previous0 = false
    while (remaining > 1 && charnum <= maxSymbol) {
      if (previous0) {
        // runs of zero-probability symbols, 2 bits at a time
        var rep = peekBits(2); bitPos += 2
        while (rep == 3) {
          charnum += 3
          if (charnum > maxSymbol + 1) return None
          rep = peekBits(2); bitPos += 2
        }
        charnum += rep
        if (charnum > maxSymbol + 1) return None
      }
      if (remaining > 1 && charnum <= maxSymbol) {
        val max = (2 * threshold - 1) - remaining
        var count = peekBits(nbBits)
        if ((count & (threshold - 1)) < max) {
          count &= threshold - 1
          bitPos += nbBits - 1
        } else {
          if (count >= threshold) count -= max
          bitPos += nbBits
        }
        count -= 1 // real range is -1 .. remaining-1
        remaining -= math.abs(count)
        if (remaining < 1) return None
        norm(charnum) = count
        charnum += 1
        previous0 = count == 0
        while (remaining < threshold) { nbBits -= 1; threshold >>= 1 }
      }
    }
    if (remaining != 1) return None
    val bytes = (bitPos + 7) >> 3
    if (off + bytes > end) return None
    FseTable.fromNorm(norm, accuracyLog).map(t => (t, bytes))
  }

  /** Huffman decode table over a 1<<maxBits window (§4.2). */
  private final class HufTable(val maxBits: Int, val symbol: Array[Int],
                               val numBits: Array[Int])

  /** weights(0..n-1) explicit + implicit last weight → canonical table. */
  private def hufFromWeights(explicit: Array[Int]): Option[HufTable] = {
    var sum = 0L
    var i = 0
    while (i < explicit.length) {
      val w = explicit(i)
      if (w > 11) return None
      if (w > 0) sum += 1L << (w - 1)
      i += 1
    }
    if (sum == 0 || sum >= (1L << 11)) return None
    val maxBits = highBit(sum.toInt) + 1
    val leftover = (1L << maxBits) - sum
    // implicit last weight must complete the tree exactly
    if (leftover <= 0 || (leftover & (leftover - 1)) != 0) return None
    val lastW = highBit(leftover.toInt) + 1
    val weights = explicit :+ lastW
    val size = 1 << maxBits
    val symbol = new Array[Int](size)
    val numBits = new Array[Int](size)
    var cur = 0
    var w = 1
    while (w <= maxBits) {
      var s = 0
      while (s < weights.length) {
        if (weights(s) == w) {
          val nb = maxBits + 1 - w
          val count = 1 << (w - 1)
          if (cur + count > size) return None
          var k = 0
          while (k < count) { symbol(cur + k) = s; numBits(cur + k) = nb; k += 1 }
          cur += count
        }
        s += 1
      }
      w += 1
    }
    if (cur != size) return None
    Some(new HufTable(maxBits, symbol, numBits))
  }

  /** Parse a Huffman tree description (§4.2.1): direct 4-bit weights or
    * FSE-compressed weights (two interleaved states, accuracy ≤ 6).
    * Returns (table, bytesConsumed). */
  private def readHufTable(b: Array[Byte], off: Int, end: Int): Option[(HufTable, Int)] = {
    if (off >= end) return None
    val hb = u8(b, off)
    if (hb >= 128) {
      val nw = hb - 127
      val packed = (nw + 1) / 2
      if (off + 1 + packed > end) return None
      val weights = new Array[Int](nw)
      var i = 0
      while (i < nw) {
        val byte = u8(b, off + 1 + (i >> 1))
        weights(i) = if ((i & 1) == 0) byte >> 4 else byte & 0x0f
        i += 1
      }
      hufFromWeights(weights).map(t => (t, 1 + packed))
    } else {
      // FSE-compressed weights: hb = compressed size
      val cEnd = off + 1 + hb
      if (cEnd > end) return None
      readFseTable(b, off + 1, cEnd, 6, 255).flatMap { case (ft, used) =>
        val bits = new RBits(b, off + 1 + used, hb - used)
        if (!bits.ok) return None
        var s1 = bits.read(ft.accuracyLog)
        var s2 = bits.read(ft.accuracyLog)
        if (bits.avail < 0) return None
        val out = scala.collection.mutable.ArrayBuffer.empty[Int]
        var toggle = 0
        var done = false
        while (!done) {
          if (out.size > 254) return None // > 255 weights = corrupt
          val st = if (toggle == 0) s1 else s2
          out += ft.symbol(st)
          val nb = ft.nbBits(st)
          if (bits.avail < nb) {
            out += ft.symbol(if (toggle == 0) s2 else s1)
            done = true
          } else {
            val ns = ft.nextBase(st) + bits.read(nb)
            if (toggle == 0) s1 = ns else s2 = ns
            toggle ^= 1
          }
        }
        hufFromWeights(out.toArray).map(t => (t, 1 + hb))
      }
    }
  }

  /** Decode one Huffman-coded stream of exactly `regen` symbols; the
    * stream must be consumed exactly (§4.2.2). */
  private def hufDecodeStream(t: HufTable, b: Array[Byte], off: Int, len: Int,
                              regen: Int, out: OutBuf): Boolean = {
    val bits = new RBits(b, off, len)
    if (!bits.ok) return false
    var n = 0
    while (n < regen) {
      val idx = bits.peek(t.maxBits)
      val nb = t.numBits(idx)
      if (nb == 0 || nb > bits.avail) return false
      bits.skip(nb)
      out.writeByte(t.symbol(idx))
      n += 1
    }
    bits.avail == 0
  }

  // Sequence code tables (§3.1.1.4.2.1): baselines and extra bits.
  private val LLBase = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13,
    14, 15, 16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024,
    2048, 4096, 8192, 16384, 32768, 65536)
  private val LLExtra = Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)
  private val MLBase = Array(3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
    16, 17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33,
    34, 35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027,
    2051, 4099, 8195, 16387, 32771, 65539)
  private val MLExtra = Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2,
    3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)

  // Predefined FSE distributions (§3.1.1.4.2.2).
  private val LLDefaultNorm = Array(4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2,
    1, 1, 1, 2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1)
  private val MLDefaultNorm = Array(1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1, -1, -1)
  private val OFDefaultNorm = Array(1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1)

  private lazy val LLDefaultTable = FseTable.fromNorm(LLDefaultNorm, 6).get
  private lazy val MLDefaultTable = FseTable.fromNorm(MLDefaultNorm, 6).get
  private lazy val OFDefaultTable = FseTable.fromNorm(OFDefaultNorm, 5).get

  /** Per-frame decoder state carried across blocks (§3.1.1.3.2.2,
    * §3.1.1.4.2.4): treeless Huffman reuse, FSE repeat mode, and the
    * three repeat offsets. */
  private final class FrameCtx {
    var huf: HufTable = null
    var llT: FseTable = null
    var ofT: FseTable = null
    var mlT: FseTable = null
    var rep1: Long = 1L
    var rep2: Long = 4L
    var rep3: Long = 8L
  }

  /** Decode the literals section of a Compressed block; returns
    * (literals, bytesConsumed) or None. */
  private def decodeLiterals(b: Array[Byte], off: Int, end: Int,
                             ctx: FrameCtx): Option[(Array[Byte], Int)] = {
    if (off >= end) return None
    val b0 = u8(b, off)
    val typ = b0 & 3
    val sizeFormat = (b0 >> 2) & 3
    if (typ <= 1) {
      // Raw (0) / RLE (1)
      val (regen, hdrLen) = sizeFormat match {
        case 0 | 2 => (b0 >> 3, 1)
        case 1 =>
          if (off + 2 > end) return None
          ((leN(b, off, 2) >> 4).toInt, 2)
        case _ =>
          if (off + 3 > end) return None
          ((leN(b, off, 3) >> 4).toInt, 3)
      }
      if (regen > MaxOut) return None
      if (typ == 0) {
        if (off + hdrLen + regen > end) return None
        val lit = java.util.Arrays.copyOfRange(b, off + hdrLen, off + hdrLen + regen)
        Some((lit, hdrLen + regen))
      } else {
        if (off + hdrLen + 1 > end) return None
        val lit = new Array[Byte](regen)
        java.util.Arrays.fill(lit, b(off + hdrLen))
        Some((lit, hdrLen + 1))
      }
    } else {
      // Compressed (2) / Treeless (3)
      val (regen, comp, hdrLen, oneStream) = sizeFormat match {
        case 0 =>
          if (off + 3 > end) return None
          val v = leN(b, off, 3)
          (((v >> 4) & 0x3ff).toInt, ((v >> 14) & 0x3ff).toInt, 3, true)
        case 1 =>
          if (off + 3 > end) return None
          val v = leN(b, off, 3)
          (((v >> 4) & 0x3ff).toInt, ((v >> 14) & 0x3ff).toInt, 3, false)
        case 2 =>
          if (off + 4 > end) return None
          val v = leN(b, off, 4)
          (((v >> 4) & 0x3fff).toInt, ((v >> 18) & 0x3fff).toInt, 4, false)
        case _ =>
          if (off + 5 > end) return None
          val v = leN(b, off, 5)
          (((v >> 4) & 0x3ffff).toInt, ((v >> 22) & 0x3ffff).toInt, 5, false)
      }
      if (regen > MaxOut) return None
      var p = off + hdrLen
      val cEnd = p + comp
      if (cEnd > end) return None
      val huf: HufTable =
        if (typ == 2) {
          val r = readHufTable(b, p, cEnd) match {
            case Some((t, used)) => p += used; t
            case None => return None
          }
          ctx.huf = r
          r
        } else {
          if (ctx.huf == null) return None // treeless with no prior table
          ctx.huf
        }
      val out = new OutBuf(regen)
      if (oneStream) {
        if (!hufDecodeStream(huf, b, p, cEnd - p, regen, out)) return None
      } else {
        if (p + 6 > cEnd) return None
        val s1 = leN(b, p, 2).toInt
        val s2 = leN(b, p + 2, 2).toInt
        val s3 = leN(b, p + 4, 2).toInt
        p += 6
        val s4 = cEnd - p - s1 - s2 - s3
        if (s4 <= 0) return None
        val r13 = (regen + 3) / 4
        val r4 = regen - 3 * r13
        if (r4 < 0) return None
        var q = p
        val sizes = Array(s1, s2, s3, s4)
        val regens = Array(r13, r13, r13, r4)
        var k = 0
        while (k < 4) {
          if (!hufDecodeStream(huf, b, q, sizes(k), regens(k), out)) return None
          q += sizes(k)
          k += 1
        }
      }
      val lit = out.toArray
      if (lit.length != regen) None else Some((lit, hdrLen + comp))
    }
  }

  /** Read one sequence-family table per its 2-bit mode (§3.1.1.4.2).
    * Returns (table, bytesConsumed) and updates the ctx repeat slot via
    * the setter. */
  private def seqTable(mode: Int, b: Array[Byte], off: Int, end: Int,
                       default: FseTable, maxAcc: Int, maxSym: Int,
                       prev: FseTable): Option[(FseTable, Int)] = mode match {
    case 0 => Some((default, 0))
    case 1 =>
      if (off >= end) return None
      val sym = u8(b, off)
      if (sym > maxSym) None else Some((FseTable.rle(sym), 1))
    case 2 => readFseTable(b, off, end, maxAcc, maxSym)
    case _ => if (prev == null) None else Some((prev, 0))
  }

  /** Decode one Compressed block into `out` (§3.1.1.3–4). */
  private def decodeCompressedBlock(b: Array[Byte], off: Int, size: Int,
                                    ctx: FrameCtx, out: OutBuf): Boolean = {
    val end = off + size
    val lits = decodeLiterals(b, off, end, ctx) match {
      case Some(x) => x
      case None => return false
    }
    val (literals, litUsed) = lits
    var p = off + litUsed
    if (p >= end) return false
    // sequences header
    val b0 = u8(b, p)
    var nbSeq = 0
    if (b0 < 128) { nbSeq = b0; p += 1 }
    else if (b0 < 255) {
      if (p + 2 > end) return false
      nbSeq = ((b0 - 128) << 8) + u8(b, p + 1); p += 2
    } else {
      if (p + 3 > end) return false
      nbSeq = u8(b, p + 1) + (u8(b, p + 2) << 8) + 0x7f00; p += 3
    }
    if (nbSeq == 0) {
      if (p != end) return false // trailing garbage after literals-only
      out.write(literals, 0, literals.length)
      return out.n <= MaxOut
    }
    if (p >= end) return false
    val modes = u8(b, p); p += 1
    if ((modes & 3) != 0) return false // reserved bits
    val llMode = (modes >> 6) & 3
    val ofMode = (modes >> 4) & 3
    val mlMode = (modes >> 2) & 3
    val llT = seqTable(llMode, b, p, end, LLDefaultTable, 9, 35, ctx.llT) match {
      case Some((t, used)) => p += used; t
      case None => return false
    }
    val ofT = seqTable(ofMode, b, p, end, OFDefaultTable, 8, 31, ctx.ofT) match {
      case Some((t, used)) => p += used; t
      case None => return false
    }
    val mlT = seqTable(mlMode, b, p, end, MLDefaultTable, 9, 52, ctx.mlT) match {
      case Some((t, used)) => p += used; t
      case None => return false
    }
    ctx.llT = llT; ctx.ofT = ofT; ctx.mlT = mlT
    val bits = new RBits(b, p, end - p)
    if (!bits.ok) return false
    var llS = bits.read(llT.accuracyLog)
    var ofS = bits.read(ofT.accuracyLog)
    var mlS = bits.read(mlT.accuracyLog)
    if (bits.avail < 0) return false
    var litPos = 0
    var i = 0
    while (i < nbSeq) {
      // symbols decode in order OF, ML, LL (§3.1.1.4.3)
      val ofCode = ofT.symbol(ofS)
      if (ofCode > 31) return false
      val ofValue = (1L << ofCode) + bits.readLong(ofCode)
      val mlCode = mlT.symbol(mlS)
      val ml = MLBase(mlCode) + bits.read(MLExtra(mlCode))
      val llCode = llT.symbol(llS)
      val ll = LLBase(llCode) + bits.read(LLExtra(llCode))
      if (bits.avail < 0) return false
      // repeat-offset resolution (§3.1.1.5)
      var offset = 0L
      if (ofValue > 3) {
        offset = ofValue - 3
        ctx.rep3 = ctx.rep2; ctx.rep2 = ctx.rep1; ctx.rep1 = offset
      } else {
        val idx = ofValue + (if (ll == 0) 1 else 0)
        idx match {
          case 1 => offset = ctx.rep1
          case 2 =>
            offset = ctx.rep2; ctx.rep2 = ctx.rep1; ctx.rep1 = offset
          case 3 =>
            offset = ctx.rep3; ctx.rep3 = ctx.rep2; ctx.rep2 = ctx.rep1
            ctx.rep1 = offset
          case _ =>
            offset = ctx.rep1 - 1
            if (offset <= 0) return false
            ctx.rep3 = ctx.rep2; ctx.rep2 = ctx.rep1; ctx.rep1 = offset
        }
      }
      // state updates for all but the last sequence: LL, ML, OF order
      if (i != nbSeq - 1) {
        llS = llT.nextBase(llS) + bits.read(llT.nbBits(llS))
        mlS = mlT.nextBase(mlS) + bits.read(mlT.nbBits(mlS))
        ofS = ofT.nextBase(ofS) + bits.read(ofT.nbBits(ofS))
        if (bits.avail < 0) return false
      }
      // execute: literals copy then match copy (byte-wise — overlapping
      // matches must see bytes written earlier in the same copy)
      if (litPos + ll > literals.length) return false
      out.write(literals, litPos, ll)
      litPos += ll
      if (offset > out.n) return false // reaches before frame start
      if (out.n + ml > MaxOut) return false
      out.ensure(ml)
      val a = out.a
      val src = out.n - offset.toInt
      var k = 0
      while (k < ml) { a(out.n) = a(src + k); out.n += 1; k += 1 }
      i += 1
    }
    if (bits.avail != 0) return false // desynced bitstream
    if (litPos > literals.length) return false
    out.write(literals, litPos, literals.length - litPos)
    out.n <= MaxOut
  }

  /** Growable output buffer with random access — overlapping match
    * copies must read bytes written earlier in the same copy. */
  private final class OutBuf(initial: Int) {
    var a: Array[Byte] = new Array[Byte](math.max(initial, 64))
    var n: Int = 0
    def ensure(extra: Int): Unit =
      if (n + extra > a.length) {
        var c = a.length.toLong * 2
        while (c < n + extra) c *= 2
        a = java.util.Arrays.copyOf(a, math.min(c, MaxOut.toLong * 2).toInt)
      }
    def write(src: Array[Byte], off: Int, len: Int): Unit = {
      ensure(len); System.arraycopy(src, off, a, n, len); n += len
    }
    def writeByte(v: Int): Unit = { ensure(1); a(n) = v.toByte; n += 1 }
    def toArray: Array[Byte] = java.util.Arrays.copyOf(a, n)
  }

  // XXH64 (public domain algorithm; zstd content checksum = low 32 bits)
  private val P1 = 0x9e3779b185ebca87L
  private val P2 = 0xc2b2ae3d27d4eb4fL
  private val P3 = 0x165667b19e3779f9L
  private val P4 = 0x85ebca77c2b2ae63L
  private val P5 = 0x27d4eb2f165667c5L

  def xxh64(b: Array[Byte], seed: Long = 0L): Long = {
    val len = b.length
    def le64(i: Int): Long = {
      var v = 0L; var k = 0
      while (k < 8) { v |= (b(i + k) & 0xffL) << (8 * k); k += 1 }
      v
    }
    def le32(i: Int): Long = leN(b, i, 4)
    def rotl(v: Long, n: Int): Long = java.lang.Long.rotateLeft(v, n)
    var p = 0
    var h =
      if (len >= 32) {
        var a1 = seed + P1 + P2; var a2 = seed + P2; var a3 = seed
        var a4 = seed - P1
        while (p + 32 <= len) {
          a1 = rotl(a1 + le64(p) * P2, 31) * P1
          a2 = rotl(a2 + le64(p + 8) * P2, 31) * P1
          a3 = rotl(a3 + le64(p + 16) * P2, 31) * P1
          a4 = rotl(a4 + le64(p + 24) * P2, 31) * P1
          p += 32
        }
        var x = rotl(a1, 1) + rotl(a2, 7) + rotl(a3, 12) + rotl(a4, 18)
        def merge(acc: Long): Unit = {
          x ^= rotl(acc * P2, 31) * P1
          x = x * P1 + P4
        }
        merge(a1); merge(a2); merge(a3); merge(a4)
        x
      } else seed + P5
    h += len
    while (p + 8 <= len) {
      h = rotl(h ^ (rotl(le64(p) * P2, 31) * P1), 27) * P1 + P4
      p += 8
    }
    if (p + 4 <= len) {
      h = rotl(h ^ (le32(p) * P1), 23) * P2 + P3
      p += 4
    }
    while (p < len) {
      h = rotl(h ^ ((b(p) & 0xffL) * P5), 11) * P1
      p += 1
    }
    h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^= h >>> 32
    h
  }

  /** Fully decode a zstd frame: Raw, RLE, and Compressed blocks.
    * None on malformed structure, dictionary frames, content-size
    * mismatch, or checksum mismatch. Never throws on hostile input. */
  /** Decode one frame starting at `start`; returns (content, end). */
  private def extractFrame(b: Array[Byte], start: Int): Option[(Array[Byte], Int)] =
    walk(b, start).flatMap { case (meta, blocks) =>
      if (meta.dictId != 0) return None
      if (meta.contentSize > MaxOut) return None
      val ctx = new FrameCtx
      val out = new OutBuf(math.max(meta.contentSize.toInt, 64))
      blocks.foreach { case (typ, off, size) =>
        typ match {
          case 0 =>
            if (out.n + size > MaxOut) return None
            out.write(b, off, size)
          case 1 =>
            if (out.n + size > MaxOut) return None
            val v = b(off)
            var i = 0
            while (i < size) { out.writeByte(v); i += 1 }
          case _ =>
            if (!decodeCompressedBlock(b, off, size, ctx, out)) return None
        }
      }
      val r = out.toArray
      if (meta.contentSize >= 0 && meta.contentSize != r.length) None
      else {
        val lastBlock = blocks.last
        var end = lastBlock._2 + (if (lastBlock._1 == 1) 1 else lastBlock._3)
        // verify content checksum when the frame carries one
        val fhd = u8(b, start + 4)
        if ((fhd & 0x04) != 0) {
          if (end + 4 > b.length) return None
          val want = leN(b, end, 4)
          if ((xxh64(r) & 0xffffffffL) != want) return None
          end += 4
        }
        Some((r, end))
      }
    }

  def extract(b: Array[Byte]): Option[Array[Byte]] =
    try {
      // a real .zst is a SEQUENCE of frames (pzstd, cat'd archives):
      // regular frames concatenate, skippable frames are skipped,
      // anything else rejects the payload
      val out = new java.io.ByteArrayOutputStream()
      var p = 0
      var frames = 0
      while (p < b.length) {
        if (isSkippable(b, p)) {
          val size = leN(b, p + 4, 4)
          if (p + 8L + size > b.length) return None
          p += 8 + size.toInt
        } else {
          extractFrame(b, p) match {
            case Some((content, end)) =>
              if (out.size() + content.length > MaxOut) return None
              out.write(content, 0, content.length)
              frames += 1
              p = end
            case None => return None
          }
        }
      }
      if (frames == 0) None else Some(out.toByteArray)
    } catch { case _: IndexOutOfBoundsException | _: NegativeArraySizeException => None }
}
