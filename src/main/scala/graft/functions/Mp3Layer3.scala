package graft.functions

/** MPEG-1 Layer III SAMPLE decode + a minimal CBR encoder for
  * round-trip gating — the MP3 twin of [[VorbisCodec]] (same honest
  * scope: no reference MP3 codec exists in this container, so the gate
  * is own-encoder round-trip matrices, algorithmic spec laws, and
  * never-throw fuzz; see the conformance notes below).
  *
  * What is spec-exact here (ISO/IEC 11172-3 + 13818-3, verifiable
  * without a reference implementation because it is STRUCTURE or
  * FORMULA): the frame/side-info bit layout for MPEG-1 AND MPEG-2/2.5
  * LSF (§2.4.1.7 in both specs — 2-granule vs 1-granule frames, 9- vs
  * 8-bit back-pointers), the bit reservoir, scalefactor coding incl.
  * scfsi sharing and the LSF scalefac_compress partitioning algorithm
  * (13818-3 §2.4.3.2 — its group counts provably cover 21/36 bands for
  * all 512 values), big-value REGION boundaries and the linbits/ESC
  * mechanism, the count1 Huffman table B (codes are the one's
  * complement of the quadruple — algorithmic), the requantization
  * formula (§2.4.3.4), short-block reordering, MS stereo (±/√2), the 8
  * alias-reduction butterflies, the 36/12-point IMDCT (cosine basis
  * reused from [[VorbisCodec.imdct]]), and the formula block windows.
  *
  * What is VENDORED DATA, and the honesty line it is held to
  * (the [[PslData]]/[[BrotliData]] precedent — see [[Mp3Huffman]] for
  * the full statement): Table B.7 big-value tables 1-3, 5-10 and 12
  * plus count1 table A ship, each gated by Kraft-completeness,
  * prefix-freeness, dims, per-pair round trips, and whole-stream
  * fixtures; tables 11/13/15/16-31 did not meet the attestation bar
  * and REFUSE until [[Mp3Huffman.register]]ed with a verified copy
  * (17-23/25-31 then resolve by the shipped shared-code rule). LSF
  * band widths ship for 22.05 kHz (sum-law-gated); other LSF rates
  * refuse when a granule actually needs band boundaries.
  *
  * What is NOT shipped, and why:
  *  - The 512-tap synthesis-window prototype (Table B.3) is data; the
  *    32-band polyphase stage here is a perfect-reconstruction
  *    64-point MDCT bank of the same band structure (sine window,
  *    TDAC-exact) instead of the spec's near-PR windowed FIR. For the
  *    own-encoder corpus this is exact by construction; an external
  *    stream decodes with a mildly different — PR rather than near-PR
  *    — reconstruction filter (fine for dedup-grade fingerprints; the
  *    env-gated mpg123 interop arm is the deploy cross-check).
  *  - Intensity stereo and mixed blocks return None (our encoder never
  *    emits them); MS, plain stereo, dual, mono are real.
  *  - Scalefactor-band boundaries and pretab are small vendored tables
  *    (they self-check: every width table sums to 576/192); both codec
  *    sides share them, so round-trips cannot mask a swap at deploy.
  *
  * Reference behavior being re-expressed: the reference pipeline
  * (ETL_Airflow) treats audio as opaque bytes; sample-level decode is
  * builder's-brief scope (perceptual dedup over a 100 TB crawl corpus),
  * not reference parity. Hostile input NEVER throws — every public
  * entry returns Option.
  */
object Mp3Layer3 {

  // ------------------------------------------------ MSB-first bit IO
  // (MPEG audio packs MSB-first; Vorbis's LSB-first reader does not fit)

  final class BitReader(val b: Array[Byte], startBit: Long, endBit: Long) {
    var pos: Long = startBit
    def remaining: Long = endBit - pos
    def readBit(): Int = {
      if (pos >= endBit) throw new IndexOutOfBoundsException("bits")
      val v = (b((pos >> 3).toInt) >> (7 - (pos & 7)).toInt) & 1
      pos += 1
      v
    }
    def read(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
  }

  final class BitWriter {
    private var buf = new Array[Byte](64)
    private var bits = 0L
    def bitLength: Long = bits
    def writeBit(v: Int): Unit = {
      val byteAt = (bits >> 3).toInt
      if (byteAt >= buf.length) buf = java.util.Arrays.copyOf(buf, buf.length * 2)
      if ((v & 1) != 0)
        buf(byteAt) = (buf(byteAt) | (1 << (7 - (bits & 7)).toInt)).toByte
      bits += 1
    }
    def write(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { writeBit((v >> i) & 1); i -= 1 }
    }
    def bytes: Array[Byte] =
      java.util.Arrays.copyOf(buf, ((bits + 7) / 8).toInt)
  }

  // --------------------------------------------------------- tables

  /** Long-block scalefactor-band WIDTHS per MPEG1 sample rate (22
    * bands; Table B.8 data, vendored — each sums to 576, the self-check
    * the specs build in). Swap in a verified copy at deploy time along
    * with B.7; both codec sides read this one table, so our round-trip
    * fixtures stay green across a swap. */
  val SfbLong: Map[Int, Array[Int]] = Map(
    44100 -> Array(4, 4, 4, 4, 4, 4, 6, 6, 8, 8, 10, 12, 16, 20, 24, 28,
      34, 42, 50, 54, 76, 158),
    48000 -> Array(4, 4, 4, 4, 4, 4, 6, 6, 6, 8, 10, 12, 16, 18, 22, 28,
      34, 40, 46, 54, 54, 192),
    32000 -> Array(4, 4, 4, 4, 4, 4, 6, 6, 8, 10, 12, 16, 20, 24, 30, 38,
      46, 56, 68, 84, 102, 26))

  /** Short-block widths (13 bands per window; each sums to 192). */
  val SfbShort: Map[Int, Array[Int]] = Map(
    44100 -> Array(4, 4, 4, 4, 6, 8, 10, 12, 14, 18, 22, 30, 56),
    48000 -> Array(4, 4, 4, 4, 6, 6, 10, 12, 14, 16, 20, 26, 66),
    32000 -> Array(4, 4, 4, 4, 6, 8, 12, 16, 20, 26, 34, 42, 12))

  /** preflag's extra scalefactor per long band (Table B.6, vendored;
    * only read when a stream sets preflag). */
  val Pretab: Array[Int] =
    Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3, 2, 0)

  /** scalefac_compress → (slen1, slen2) bit widths (§2.4.2.7). */
  val Slen1: Array[Int] = Array(0, 0, 0, 0, 3, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4)
  val Slen2: Array[Int] = Array(0, 1, 2, 3, 0, 1, 2, 3, 1, 2, 3, 1, 2, 3, 2, 3)

  /** Alias-reduction coefficients: cs_i = 1/√(1+c_i²), ca_i = c_i·cs_i
    * from the published c_i constants (§2.4.3.3.2). The butterfly pair
    * (cs, ±ca) is a rotation (cs²+ca²=1), so the encoder applies the
    * exact transpose — round-trips are exact for ANY c values, which is
    * why they are safe to carry as constants here. */
  private val AliasC =
    Array(-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037)
  val AliasCs: Array[Double] = AliasC.map(c => 1.0 / math.sqrt(1.0 + c * c))
  val AliasCa: Array[Double] = AliasC.map(c => c / math.sqrt(1.0 + c * c))

  private val BitratesV1L3 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val SampleRatesV1 = Array(44100, 48000, 32000)

  // ------------------------------------------------------- side info

  /** One granule's side info (§2.4.1.7; 59 bits each). */
  final case class Gr(part23Length: Int, bigValues: Int, globalGain: Int,
                      scalefacCompress: Int, windowSwitching: Boolean,
                      blockType: Int, mixedBlock: Boolean,
                      tableSelect: Array[Int], subblockGain: Array[Int],
                      region0: Int, region1: Int, preflag: Int,
                      scalefacScale: Int, count1Select: Int)

  final case class SideInfo(mainDataBegin: Int, scfsi: Array[Array[Int]],
                            grs: Array[Array[Gr]]) // grs(granule)(channel)

  def readSideInfo(br: BitReader, channels: Int): SideInfo = {
    val mainDataBegin = br.read(9)
    br.read(if (channels == 1) 5 else 3) // private bits
    val scfsi = Array.fill(channels)(Array.fill(4)(br.readBit()))
    val grs = Array.fill(2) {
      Array.fill(channels) {
        val p23 = br.read(12)
        val bv = br.read(9)
        val gg = br.read(8)
        val sfc = br.read(4)
        val wsf = br.readBit() == 1
        if (wsf) {
          val bt = br.read(2)
          val mixed = br.readBit() == 1
          val ts = Array(br.read(5), br.read(5), 0)
          val sbg = Array(br.read(3), br.read(3), br.read(3))
          Gr(p23, bv, gg, sfc, wsf, bt, mixed, ts, sbg, 0, 0,
            br.readBit(), br.readBit(), br.readBit())
        } else {
          val ts = Array(br.read(5), br.read(5), br.read(5))
          val r0 = br.read(4)
          val r1 = br.read(3)
          Gr(p23, bv, gg, sfc, wsf, 0, mixedBlock = false, ts,
            Array(0, 0, 0), r0, r1, br.readBit(), br.readBit(), br.readBit())
        }
      }
    }
    SideInfo(mainDataBegin, scfsi, grs)
  }

  def writeSideInfo(bw: BitWriter, si: SideInfo, channels: Int): Unit = {
    bw.write(si.mainDataBegin, 9)
    bw.write(0, if (channels == 1) 5 else 3)
    for (c <- 0 until channels; i <- 0 until 4) bw.writeBit(si.scfsi(c)(i))
    for (g <- 0 until 2; c <- 0 until channels) {
      val gr = si.grs(g)(c)
      bw.write(gr.part23Length, 12)
      bw.write(gr.bigValues, 9)
      bw.write(gr.globalGain, 8)
      bw.write(gr.scalefacCompress, 4)
      bw.writeBit(if (gr.windowSwitching) 1 else 0)
      if (gr.windowSwitching) {
        bw.write(gr.blockType, 2)
        bw.writeBit(if (gr.mixedBlock) 1 else 0)
        bw.write(gr.tableSelect(0), 5); bw.write(gr.tableSelect(1), 5)
        bw.write(gr.subblockGain(0), 3); bw.write(gr.subblockGain(1), 3)
        bw.write(gr.subblockGain(2), 3)
      } else {
        bw.write(gr.tableSelect(0), 5); bw.write(gr.tableSelect(1), 5)
        bw.write(gr.tableSelect(2), 5)
        bw.write(gr.region0, 4); bw.write(gr.region1, 3)
      }
      bw.writeBit(gr.preflag); bw.writeBit(gr.scalefacScale)
      bw.writeBit(gr.count1Select)
    }
  }

  // ----------------------------------------------------- scalefactors

  /** Long-block scalefactors: 21 transmitted (band 21 has none).
    * Returns the array + consumed-bit count; honors scfsi sharing from
    * granule 0 (groups 0-5, 6-10, 11-15, 16-20). */
  def readScalefacLong(br: BitReader, gr: Gr, scfsi: Array[Int],
                       granule: Int, prev: Array[Int]): Array[Int] = {
    val s1 = Slen1(gr.scalefacCompress); val s2 = Slen2(gr.scalefacCompress)
    val sf = new Array[Int](22)
    val groups = Array((0, 6, s1), (6, 11, s1), (11, 16, s2), (16, 21, s2))
    for (((from, until, slen), gi) <- groups.zipWithIndex) {
      val share = granule == 1 && scfsi(gi) == 1
      var b = from
      while (b < until) {
        sf(b) = if (share) prev(b) else if (slen == 0) 0 else br.read(slen)
        b += 1
      }
    }
    sf
  }

  /** Short-block scalefactors: 12 bands × 3 windows (band 12 none);
    * scfsi does not apply to short blocks (§2.4.2.7). */
  def readScalefacShort(br: BitReader, gr: Gr): Array[Array[Int]] = {
    val s1 = Slen1(gr.scalefacCompress); val s2 = Slen2(gr.scalefacCompress)
    val sf = Array.fill(13)(new Array[Int](3))
    for (b <- 0 until 12; w <- 0 until 3) {
      val slen = if (b < 6) s1 else s2
      sf(b)(w) = if (slen == 0) 0 else br.read(slen)
    }
    sf
  }

  // ------------------------------------------------- Huffman (Table B.7)

  /** Big-value Huffman registry — Table B.7 codeword data, vendored
    * the [[PslData]]/[[BrotliData]] way with the strongest self-checks
    * the data admits: every table must be a COMPLETE prefix code
    * (Kraft sum exactly 1 — a single wrong length breaks it), the
    * decode-tree build rejects any duplicated or prefix-shadowed
    * codeword, dims must match the spec's (xlen, ylen), and the spec
    * suite round-trips every (x, y) pair of every table through
    * encode→decode plus whole-stream fixtures per table.
    *
    * VENDORING HONESTY (the line this registry draws): tables 1, 2, 3,
    * 5, 6, 7, 8, 9, 10 and 12 are shipped — every entry attested by two
    * independent recalls of the public table data agreeing exactly,
    * and the structural laws above all green. Tables 11, 13, 15 and
    * the shared-code ESC tables 16/24 did NOT meet that bar (recalled
    * copies violated prefix-freeness, and repairing them would mean
    * inventing codeword data — the silent-garbage failure this object
    * exists to refuse), so streams selecting them return None and
    * [[register]] is the deploy seam: load a verified copy (e.g. from
    * the dist10 reference tables) and the ESC resolution for ids
    * 17-23/25-31 (same codes as 16/24, per-id linbits — that mapping
    * IS shipped, it is structure) activates with it. The env-gated
    * mpg123 arm of InteropSmokeSpec is the deploy cross-check. */
  object Mp3Huffman {

    /** One big-value table: codeword data plus a bit-serial decode
      * tree. `data` is "len:code" hex pairs, row-major over (x, y).
      * Construction FAILS (require) unless the code is Kraft-complete
      * and prefix-free — vendored data cannot load half-wrong. */
    final class BvTable(val id: Int, val xlen: Int, val ylen: Int,
                        val linbits: Int, data: String) {
      val lens = new Array[Int](xlen * ylen)
      val codes = new Array[Int](xlen * ylen)
      locally {
        val parts = data.split(',')
        require(parts.length == xlen * ylen, s"table $id dims")
        var i = 0
        while (i < parts.length) {
          val c = parts(i).split(':')
          lens(i) = Integer.parseInt(c(0), 16)
          codes(i) = Integer.parseInt(c(1), 16)
          require(lens(i) >= 1 && lens(i) <= 19 &&
            codes(i) >= 0 && codes(i) < (1 << lens(i)), s"table $id entry $i")
          i += 1
        }
        var kraft = 0L
        lens.foreach(l => kraft += (1L << (32 - l)))
        require(kraft == (1L << 32), s"table $id kraft incomplete")
      }
      // decode tree: node k has children tree(2k), tree(2k+1);
      // value > 0 = child node index, < 0 = ~symbolIndex, 0 = unset
      private val tree: Array[Int] = {
        val t = new Array[Int](4 * xlen * ylen)
        var nextNode = 1
        var si = 0
        while (si < lens.length) {
          var node = 0
          var bit = lens(si) - 1
          while (bit >= 0) {
            val b = (codes(si) >> bit) & 1
            val at = 2 * node + b
            if (bit == 0) {
              require(t(at) == 0, s"table $id code collision at sym $si")
              t(at) = ~si
            } else {
              if (t(at) == 0) { t(at) = nextNode; nextNode += 1 }
              require(t(at) > 0, s"table $id prefix collision at sym $si")
              node = t(at)
            }
            bit -= 1
          }
          si += 1
        }
        t
      }
      /** Decode one symbol index (x·ylen + y); the reader's own bounds
        * checks stop hostile streams. */
      def decodeSym(br: BitReader): Int = {
        var node = 0
        while (true) {
          val v = tree(2 * node + br.readBit())
          if (v < 0) return ~v
          if (v == 0) throw new IndexOutOfBoundsException("bad code")
          node = v
        }
        -1 // unreachable
      }
      def encodeSym(bw: BitWriter, x: Int, y: Int): Unit =
        bw.write(codes(x * ylen + y), lens(x * ylen + y))
    }

    // Table B.7 data (ISO/IEC 11172-3). "len:code" hex, row-major.
    private def bv(id: Int, xl: Int, yl: Int, lin: Int, d: String) =
      id -> new BvTable(id, xl, yl, lin, d)

    val shipped: Map[Int, BvTable] = Map(
      bv(1, 2, 2, 0, "1:1,3:1,2:1,3:0"),
      bv(2, 3, 3, 0, "1:1,3:2,6:1,3:3,3:1,5:1,5:3,5:2,6:0"),
      bv(3, 3, 3, 0, "2:3,2:2,6:1,3:1,2:1,5:1,5:3,5:2,6:0"),
      bv(5, 4, 4, 0, "1:1,3:2,6:6,7:5,3:3,3:1,6:4,7:4,6:7,6:5,7:7,8:1," +
        "7:6,6:1,7:1,8:0"),
      bv(6, 4, 4, 0, "3:7,3:3,5:5,7:1,3:6,2:2,4:3,5:2,4:5,4:4,5:4,6:1," +
        "6:3,5:3,6:2,7:0"),
      bv(7, 6, 6, 0, "1:1,3:2,6:a,8:13,8:10,9:a,3:3,4:3,6:7,7:a,7:5,8:3," +
        "6:b,5:4,7:d,8:11,8:8,9:4,7:c,7:b,8:12,9:f,9:b,9:2,7:7,7:6,8:9," +
        "9:e,9:3,a:1,8:6,8:4,9:5,a:3,a:2,a:0"),
      bv(8, 6, 6, 0, "2:3,3:4,6:6,8:12,8:c,9:5,3:5,2:1,4:2,8:10,8:9,8:3," +
        "6:7,4:3,6:5,8:e,8:7,9:3,8:13,8:11,8:f,9:d,9:a,a:4,8:d,7:5,8:8," +
        "9:b,a:5,a:1,9:c,8:4,9:4,9:1,b:1,b:0"),
      bv(9, 6, 6, 0, "3:7,3:5,5:9,6:e,8:f,9:7,3:6,3:4,4:5,5:5,6:6,8:7," +
        "4:7,4:6,5:8,6:8,7:8,8:5,6:f,5:6,6:9,7:a,7:5,8:1,7:b,6:7,7:9," +
        "7:6,8:4,9:1,8:e,7:4,8:6,8:2,9:6,9:0"),
      bv(10, 8, 8, 0, "1:1,3:2,6:a,8:17,9:23,9:1e,9:c,a:11,3:3,4:3,6:8," +
        "7:c,8:12,9:15,8:c,8:7,6:b,6:9,7:f,8:15,9:20,a:28,9:13,9:6,7:e," +
        "7:d,8:16,9:22,a:2e,a:17,9:12,a:7,8:14,8:13,9:21,a:2f,a:1b,a:16," +
        "a:9,a:3,9:1f,9:16,a:29,a:1a,b:15,b:14,a:5,b:3,8:e,8:d,9:a,a:b," +
        "a:10,a:6,b:5,b:1,9:9,8:8,9:7,a:8,a:4,b:4,b:2,b:0"),
      bv(12, 8, 8, 0, "4:9,3:6,5:10,7:21,8:29,9:27,9:26,9:1a,3:7,3:5," +
        "4:6,5:9,7:17,7:10,8:1a,8:b,5:11,4:7,5:b,6:e,7:15,8:1e,7:a,8:7," +
        "6:11,5:a,6:f,6:c,7:12,8:1c,8:e,9:b,7:20,6:d,7:16,7:13,8:12," +
        "8:10,8:9,9:5,8:28,7:11,8:1f,8:1d,8:11,9:d,8:4,9:2,8:1b,7:c," +
        "7:b,8:f,8:a,9:7,9:4,9:1,9:1b,8:c,8:8,9:c,9:a,9:6,9:3,9:0"))

    /** count1 table A (count1table_select = 0): 16 quadruple patterns,
      * explicit codes — table B's complement coding stays in
      * [[readCount1B]]. Pattern bit 3 = v … bit 0 = y. */
    val count1A: BvTable = new BvTable(32, 16, 1, 0,
      "1:1,4:5,4:4,5:5,4:6,6:5,5:4,6:4,4:7,5:3,5:6,6:0,5:7,6:2,6:3,6:1")

    /** Deploy-time registration (verified copies of 11/13/15/16/24…);
      * also the seam the spec suite uses to exercise the linbits/ESC
      * path with a synthetic table. */
    @volatile private var registered: Map[Int, BvTable] = Map.empty
    def register(t: BvTable): Unit = synchronized {
      registered = registered + (t.id -> t)
    }
    private[functions] def clearRegistered(): Unit = synchronized {
      registered = Map.empty
    }

    /** Serialize one table in the attested-file format
      * ([[graft.tools.Mp3Attest]]): a `table id xlen ylen linbits`
      * line followed by the row-major `len:code` hex pairs. */
    def formatTable(t: BvTable): String = {
      val data = (0 until t.xlen * t.ylen).map(i =>
        f"${t.lens(i)}%x:${t.codes(i)}%x").mkString(",")
      s"table ${t.id} ${t.xlen} ${t.ylen} ${t.linbits}\n" +
        data.grouped(72).mkString("\n")
    }

    /** Parse a candidate/attested table file: `# comment` and blank
      * lines ignored; each `table id xlen ylen linbits` header is
      * followed by its comma-separated `len:code` pairs until the next
      * header. CONSTRUCTION runs the Kraft/prefix-free gates — a
      * malformed candidate throws here, before anything registers. */
    def parseTables(text: String): Seq[BvTable] = {
      val out = scala.collection.mutable.ArrayBuffer[BvTable]()
      var header: Option[(Int, Int, Int, Int)] = None
      val data = new StringBuilder
      def flush(): Unit = header.foreach { case (id, xl, yl, lin) =>
        out += new BvTable(id, xl, yl, lin, data.toString)
        header = None
        data.clear()
      }
      text.linesIterator.map(_.trim).foreach { line =>
        if (line.isEmpty || line.startsWith("#")) ()
        else if (line.startsWith("table ")) {
          flush()
          val p = line.split("\\s+")
          require(p.length == 5, s"bad table header: $line")
          header = Some((p(1).toInt, p(2).toInt, p(3).toInt, p(4).toInt))
        } else {
          // data lines concatenate verbatim: the writer's 72-char wrap
          // may split mid-pair, and rejoining without a separator
          // restores the original string exactly
          require(header.isDefined, s"data before any table header")
          data.append(line)
        }
      }
      flush()
      out.toSeq
    }

    /** The deploy seam, file-level: parse an ATTESTED table file (the
      * [[graft.tools.Mp3Attest]] output) and register every table.
      * Returns the number registered. */
    def loadAttested(text: String): Int = {
      val ts = parseTables(text)
      ts.foreach(register)
      ts.size
    }

    /** linbits for the shared-code ESC families (spec structure):
      * 16-23 share table 16's codes, 24-31 share table 24's. */
    private val Linbits16 = Array(1, 2, 3, 4, 6, 8, 10, 13)
    private val Linbits24 = Array(4, 5, 6, 7, 8, 9, 11, 13)

    /** Resolve a side-info table_select id to a decode table; None =
      * out of vendored scope (honest refusal upstream). id 0 is the
      * empty table handled by the caller; 4/14 are spec-invalid. */
    def resolve(id: Int): Option[BvTable] = {
      val reg = registered
      def shared(base: Int, lin: Int): Option[BvTable] =
        (shipped.get(base) orElse reg.get(base)).map(t =>
          if (t.linbits == lin) t
          else new BvTable(id, t.xlen, t.ylen, lin,
            (0 until t.xlen * t.ylen).map(i =>
              f"${t.lens(i)}%x:${t.codes(i)}%x").mkString(",")))
      if (id <= 0 || id == 4 || id == 14 || id > 31) None
      else if (id >= 24) shared(24, Linbits24(id - 24))
      else if (id >= 16) shared(16, Linbits16(id - 16))
      else shipped.get(id) orElse reg.get(id)
    }

    def supported(id: Int): Boolean = id == 0 || resolve(id).isDefined
  }

  /** count1 table B (count1table_select = 1): the 4-bit code is the
    * one's complement of the (v,w,x,y) presence bits, each nonzero
    * value followed by a sign bit (0 = positive). Fully algorithmic. */
  def readCount1B(br: BitReader): Array[Int] = {
    val code = br.read(4)
    val out = new Array[Int](4)
    var i = 0
    while (i < 4) {
      val present = ((code >> (3 - i)) & 1) == 0 // complement coding
      if (present) out(i) = if (br.readBit() == 1) -1 else 1
      i += 1
    }
    out
  }

  def writeCount1B(bw: BitWriter, q: Array[Int]): Unit = {
    var code = 0
    var i = 0
    while (i < 4) {
      if (q(i) != 0) code |= 1 << (3 - i)
      i += 1
    }
    bw.write(~code & 0xf, 4)
    i = 0
    while (i < 4) {
      if (q(i) != 0) bw.writeBit(if (q(i) < 0) 1 else 0)
      i += 1
    }
  }

  // ---------------------------------------------------- requantize

  /** §2.4.3.4: xr = sign·|is|^(4/3) · 2^((gg−210−8·sbGain)/4) ·
    * 2^(−(1+sfScale)·0.5·(sf + preflag·pretab)). `preflag` is passed
    * explicitly because LSF streams derive it from scalefac_compress
    * rather than a side-info bit. */
  def requantAmp(gr: Gr, sf: Int, pretab: Int, window: Int,
                 preflag: Int): Double = {
    val gain = gr.globalGain - 210 -
      (if (gr.blockType == 2) 8 * gr.subblockGain(window) else 0)
    val sfTotal = sf + preflag * pretab
    math.pow(2.0, 0.25 * gain) *
      math.pow(2.0, -(1 + gr.scalefacScale) * 0.5 * sfTotal)
  }

  // ------------------------------------------------ LSF (MPEG-2/2.5)

  /** MPEG-2/2.5 LSF long-block scalefactor-band widths (ISO 13818-3
    * Table B.2). VENDORED under the same honesty line as the Huffman
    * registry. Each row self-checks (long sums to 576, short to 192)
    * — but the sum law alone cannot distinguish adjacent rows (the
    * round-13 slip shipped the 24 kHz row under the 22.05 kHz key and
    * both summed green), so the EXTERNAL gate is the env-gated mpg123
    * interop arm: a non-silent fixture per vendored rate,
    * cross-correlated against the reference decoder's PCM. Rates not
    * vendored here (11025, 12000) refuse when a granule actually
    * needs band boundaries (silence granules decode at any rate —
    * p23 = 0 reads no tables). 16 kHz shares the 22.05 kHz long row
    * per the spec (libmad aliases sfb_16000_long). */
  val SfbLongLsf: Map[Int, Array[Int]] = {
    val l22 = Array(6, 6, 6, 6, 6, 6, 8, 10, 12, 14, 16, 20, 24, 28, 32,
      38, 46, 52, 60, 68, 58, 54)
    Map(
      22050 -> l22,
      24000 -> Array(6, 6, 6, 6, 6, 6, 8, 10, 12, 14, 16, 18, 22, 26, 32,
        38, 46, 54, 62, 70, 76, 36),
      16000 -> l22,
      // MPEG-2.5, 8 kHz: the distinctive wide-then-degenerate row
      // (five trailing 2-line bands above the 3.4 kHz voice ceiling)
      8000 -> Array(12, 12, 12, 12, 12, 12, 16, 20, 24, 28, 32, 40, 48,
        56, 64, 76, 90, 2, 2, 2, 2, 2))
  }

  val SfbShortLsf: Map[Int, Array[Int]] = Map(
    22050 -> Array(4, 4, 4, 6, 6, 8, 10, 14, 18, 26, 32, 42, 18),
    24000 -> Array(4, 4, 4, 6, 8, 10, 12, 14, 18, 24, 32, 44, 12),
    16000 -> Array(4, 4, 4, 6, 8, 10, 12, 14, 18, 24, 30, 40, 18),
    8000 -> Array(8, 8, 8, 12, 16, 20, 24, 28, 36, 2, 2, 2, 26))

  locally {
    SfbLongLsf.values.foreach(w => require(w.length == 22 && w.sum == 576))
    SfbShortLsf.values.foreach(w => require(w.length == 13 && w.sum == 192))
  }

  /** LSF scalefactor layout (ISO 13818-3 §2.4.3.2, no-intensity
    * branch): scalefac_compress (9 bits) → 4 group bit-widths, 4 group
    * sfb counts, and the derived preflag. Counts per block shape sum
    * to the transmitted scalefactor total (21 long / 36 short) — the
    * self-check the partitioning admits. Mixed blocks refuse upstream. */
  def lsfScalefacLayout(sfc: Int, short: Boolean)
      : (Array[Int], Array[Int], Int) = {
    val (slen, block) =
      if (sfc < 400)
        (Array((sfc >> 4) / 5, (sfc >> 4) % 5, (sfc & 15) >> 2, sfc & 3), 0)
      else if (sfc < 500) {
        val s = sfc - 400
        (Array((s >> 2) / 5, (s >> 2) % 5, s & 3, 0), 1)
      } else {
        val s = sfc - 500
        (Array(s / 3, s % 3, 0, 0), 2)
      }
    val nr = (block, short) match {
      case (0, false) => Array(6, 5, 5, 5)
      case (0, true)  => Array(9, 9, 9, 9)
      case (1, false) => Array(6, 5, 7, 3)
      case (1, true)  => Array(9, 9, 12, 6)
      case (2, false) => Array(11, 10, 0, 0)
      case _          => Array(18, 18, 0, 0) // (2, short)
    }
    (slen, nr, if (block == 2) 1 else 0)
  }

  /** Read LSF long-block scalefactors → (sf(22), preflag). */
  def readScalefacLsfLong(br: BitReader, sfc: Int): (Array[Int], Int) = {
    val (slen, nr, preflag) = lsfScalefacLayout(sfc, short = false)
    val sf = new Array[Int](22)
    var b = 0
    var g = 0
    while (g < 4) {
      var i = 0
      while (i < nr(g)) {
        sf(b) = if (slen(g) == 0) 0 else br.read(slen(g))
        b += 1; i += 1
      }
      g += 1
    }
    (sf, preflag)
  }

  /** Read LSF short-block scalefactors → (sf(13)(3), preflag); the 36
    * values arrive band-major, partitioned by the group counts. */
  def readScalefacLsfShort(br: BitReader, sfc: Int)
      : (Array[Array[Int]], Int) = {
    val (slen, nr, preflag) = lsfScalefacLayout(sfc, short = true)
    val sf = Array.fill(13)(new Array[Int](3))
    var at = 0
    var g = 0
    while (g < 4) {
      var i = 0
      while (i < nr(g)) {
        sf(at / 3)(at % 3) = if (slen(g) == 0) 0 else br.read(slen(g))
        at += 1; i += 1
      }
      g += 1
    }
    (sf, preflag)
  }

  /** LSF side info (ISO 13818-3 §2.4.1.7): 8-bit main_data_begin, no
    * scfsi, ONE granule, 9-bit scalefac_compress, no preflag bit —
    * 9 bytes mono / 17 stereo. */
  def readSideInfoLsf(br: BitReader, channels: Int): SideInfo = {
    val mainDataBegin = br.read(8)
    br.read(if (channels == 1) 1 else 2) // private bits
    val grs = Array.fill(1) {
      Array.fill(channels) {
        val p23 = br.read(12)
        val bv = br.read(9)
        val gg = br.read(8)
        val sfc = br.read(9)
        val wsf = br.readBit() == 1
        if (wsf) {
          val bt = br.read(2)
          val mixed = br.readBit() == 1
          val ts = Array(br.read(5), br.read(5), 0)
          val sbg = Array(br.read(3), br.read(3), br.read(3))
          Gr(p23, bv, gg, sfc, wsf, bt, mixed, ts, sbg, 0, 0,
            preflag = 0, br.readBit(), br.readBit())
        } else {
          val ts = Array(br.read(5), br.read(5), br.read(5))
          val r0 = br.read(4)
          val r1 = br.read(3)
          Gr(p23, bv, gg, sfc, wsf, 0, mixedBlock = false, ts,
            Array(0, 0, 0), r0, r1, preflag = 0, br.readBit(), br.readBit())
        }
      }
    }
    SideInfo(mainDataBegin, Array.fill(channels)(Array.fill(4)(0)), grs)
  }

  def writeSideInfoLsf(bw: BitWriter, si: SideInfo, channels: Int): Unit = {
    bw.write(si.mainDataBegin, 8)
    bw.write(0, if (channels == 1) 1 else 2)
    for (c <- 0 until channels) {
      val gr = si.grs(0)(c)
      bw.write(gr.part23Length, 12)
      bw.write(gr.bigValues, 9)
      bw.write(gr.globalGain, 8)
      bw.write(gr.scalefacCompress, 9)
      bw.writeBit(if (gr.windowSwitching) 1 else 0)
      if (gr.windowSwitching) {
        bw.write(gr.blockType, 2)
        bw.writeBit(if (gr.mixedBlock) 1 else 0)
        bw.write(gr.tableSelect(0), 5); bw.write(gr.tableSelect(1), 5)
        bw.write(gr.subblockGain(0), 3); bw.write(gr.subblockGain(1), 3)
        bw.write(gr.subblockGain(2), 3)
      } else {
        bw.write(gr.tableSelect(0), 5); bw.write(gr.tableSelect(1), 5)
        bw.write(gr.tableSelect(2), 5)
        bw.write(gr.region0, 4); bw.write(gr.region1, 3)
      }
      bw.writeBit(gr.scalefacScale)
      bw.writeBit(gr.count1Select)
    }
  }

  // --------------------------------------------- spectra per granule

  /** Decode one granule/channel's 576 requantized lines. Returns None
    * for out-of-scope streams (unvendored Huffman table, mixed blocks,
    * LSF rates without attested band tables). `br` must sit at the
    * granule's main-data start; on success it is left exactly
    * part2_3_length bits later (ancillary discipline). `lsf` selects
    * the MPEG-2/2.5 scalefactor algorithm and band tables. */
  def decodeGranule(br: BitReader, gr: Gr, sampleRate: Int,
                    scfsi: Array[Int], granule: Int,
                    prevSf: Array[Int], lsf: Boolean = false)
      : Option[(Array[Double], Array[Int])] = {
    val startBit = br.pos
    val endBit = startBit + gr.part23Length
    if (gr.part23Length == 0) {
      // an empty granule is silence: no scalefactor or Huffman bits are
      // read, so it decodes at ANY sample rate (a claim of spectral
      // lines with a zero bit budget is hostile, though)
      if (gr.bigValues != 0) return None
      return Some((new Array[Double](576), new Array[Int](22)))
    }
    if (gr.mixedBlock) return None
    if (gr.windowSwitching && gr.blockType == 0) return None
    val short = gr.blockType == 2
    val widthsL = (if (lsf) SfbLongLsf else SfbLong)
      .getOrElse(sampleRate, return None)
    val widthsS = (if (lsf) SfbShortLsf else SfbShort)
      .getOrElse(sampleRate, return None)
    // scalefactors (LSF derives preflag from scalefac_compress)
    var preflag = gr.preflag
    val sfLong =
      if (short) new Array[Int](22)
      else if (lsf) {
        val (sf, pf) = readScalefacLsfLong(br, gr.scalefacCompress)
        preflag = pf
        sf
      } else readScalefacLong(br, gr, scfsi, granule, prevSf)
    val sfShort =
      if (!short) null
      else if (lsf) {
        val (sf, pf) = readScalefacLsfShort(br, gr.scalefacCompress)
        preflag = pf
        sf
      } else readScalefacShort(br, gr)
    // ---- big-value region: table per region, ESC linbits, sign bits
    val bigLines = 2 * gr.bigValues
    if (bigLines > 576) return None
    val is = new Array[Int](576)
    if (bigLines > 0) {
      val ts = gr.tableSelect
      val used = if (gr.windowSwitching) ts.take(2) else ts
      if (!used.forall(Mp3Huffman.supported)) return None
      // region boundaries in LINES (§2.4.2.7): under window switching
      // region0 is the first 36 lines and region1 the rest; otherwise
      // region0/region1 count scalefactor bands
      val (r0End, r1End) =
        if (gr.windowSwitching) (math.min(36, bigLines), bigLines)
        else {
          val idx = new Array[Int](23)
          var b = 0
          while (b < 22) { idx(b + 1) = idx(b) + widthsL(b); b += 1 }
          val a = idx(math.min(22, gr.region0 + 1))
          val c = idx(math.min(22, gr.region0 + gr.region1 + 2))
          (math.min(a, bigLines), math.min(c, bigLines))
        }
      var line = 0
      while (line < bigLines) {
        val tid =
          if (line < r0End) ts(0) else if (line < r1End) ts(1) else ts(2)
        if (tid == 0) {
          is(line) = 0; is(line + 1) = 0
        } else {
          val tab = Mp3Huffman.resolve(tid).getOrElse(return None)
          val sym = try tab.decodeSym(br) catch {
            case _: IndexOutOfBoundsException => return None
          }
          var x = sym / tab.ylen
          var y = sym % tab.ylen
          // §2.4.3.4.6: value 15 escapes via linbits, then sign
          if (x == 15 && tab.linbits > 0) x += br.read(tab.linbits)
          if (x != 0 && br.readBit() == 1) x = -x
          if (y == 15 && tab.linbits > 0) y += br.read(tab.linbits)
          if (y != 0 && br.readBit() == 1) y = -y
          is(line) = x; is(line + 1) = y
        }
        line += 2
        if (br.pos > endBit) return None
      }
    }
    // ---- count1 region: quadruples until bits or lines run out
    var line = bigLines
    var c1stop = false
    while (!c1stop && br.pos < endBit && line + 4 <= 576) {
      // a quadruple whose code crosses the boundary is not decoded
      val mark = br.pos
      var q: Array[Int] = null
      try {
        if (gr.count1Select == 1) q = readCount1B(br)
        else {
          val pat = Mp3Huffman.count1A.decodeSym(br)
          val out = new Array[Int](4)
          var i = 0
          while (i < 4) {
            if (((pat >> (3 - i)) & 1) == 1)
              out(i) = if (br.readBit() == 1) -1 else 1
            i += 1
          }
          q = out
        }
      } catch {
        // stuffing bits shorter than any codeword end the region
        case _: IndexOutOfBoundsException => br.pos = mark; c1stop = true
      }
      if (q != null) {
        if (br.pos > endBit) { br.pos = mark; c1stop = true }
        else {
          var i = 0
          while (i < 4) { is(line + i) = q(i); i += 1 }
          line += 4
        }
      }
    }
    if (br.pos > endBit) return None
    br.pos = endBit
    // requantize
    val xr = new Array[Double](576)
    if (!short) {
      var b = 0; var at = 0
      while (b < 22) {
        val amp = requantAmp(gr, if (b < 21) sfLong(b) else 0, Pretab(b), 0,
          preflag)
        var i = 0
        while (i < widthsL(b)) {
          val v = is(at)
          if (v != 0)
            xr(at) = math.signum(v.toDouble) *
              math.pow(math.abs(v.toDouble), 4.0 / 3.0) * amp
          at += 1; i += 1
        }
        b += 1
      }
    } else {
      // decoded order: (band, window, line) → reorder to
      // xr[18·(f/6)·... ] = per-window line f at 3f+w grouping below
      var at = 0
      var b = 0
      var bandStart = 0 // per-window line index
      while (b < 13) {
        val w = widthsS(b)
        var win = 0
        while (win < 3) {
          val amp = requantAmp(gr, if (b < 12) sfShort(b)(win) else 0, 0, win,
            preflag)
          var i = 0
          while (i < w) {
            val v = is(at)
            val f = bandStart + i // per-window frequency line
            val target = 18 * (f / 6) + 6 * win + (f % 6)
            if (v != 0)
              xr(target) = math.signum(v.toDouble) *
                math.pow(math.abs(v.toDouble), 4.0 / 3.0) * amp
            at += 1; i += 1
          }
          win += 1
        }
        bandStart += w
        b += 1
      }
    }
    Some((xr, sfLong))
  }

  // -------------------------------------------------- alias butterflies

  /** Forward (decoder-side) alias reduction across long-block subband
    * boundaries (§2.4.3.3.2). `inverse` applies the transpose — the
    * encoder's pre-distortion, exact because each butterfly is a
    * rotation. */
  def aliasReduce(xr: Array[Double], inverse: Boolean): Unit = {
    var k = 1
    while (k < 32) {
      var i = 0
      while (i < 8) {
        val a = xr(18 * k - 1 - i)
        val b = xr(18 * k + i)
        val cs = AliasCs(i); val ca = AliasCa(i)
        if (!inverse) {
          xr(18 * k - 1 - i) = a * cs - b * ca
          xr(18 * k + i) = b * cs + a * ca
        } else {
          xr(18 * k - 1 - i) = a * cs + b * ca
          xr(18 * k + i) = b * cs - a * ca
        }
        i += 1
      }
      k += 1
    }
  }

  // ------------------------------------------------ block windows

  /** Formula windows (§2.4.3.4.10.3): 0 long, 1 start, 2 short (12-tap,
    * applied per sub-window), 3 stop. */
  def blockWindow(blockType: Int): Array[Double] = blockType match {
    case 0 => Array.tabulate(36)(i => math.sin(math.Pi / 36 * (i + 0.5)))
    case 1 => Array.tabulate(36)(i =>
      if (i < 18) math.sin(math.Pi / 36 * (i + 0.5))
      else if (i < 24) 1.0
      else if (i < 30) math.sin(math.Pi / 12 * (i - 18 + 0.5))
      else 0.0)
    case 3 => Array.tabulate(36)(i =>
      if (i < 6) 0.0
      else if (i < 12) math.sin(math.Pi / 12 * (i - 6 + 0.5))
      else if (i < 18) 1.0
      else math.sin(math.Pi / 36 * (i + 0.5)))
    case _ => Array.tabulate(12)(i => math.sin(math.Pi / 12 * (i + 0.5)))
  }

  /** 18 spectral lines of one subband → 36 windowed time samples
    * (IMDCT36 for long/start/stop; 3 overlapped IMDCT12 for short). */
  def subbandSynth(lines: Array[Double], blockType: Int): Array[Double] = {
    if (blockType != 2) {
      val y = VorbisCodec.imdct(lines, 36)
      val w = blockWindow(blockType)
      val out = new Array[Double](36)
      var i = 0
      while (i < 36) { out(i) = y(i) * w(i); i += 1 }
      out
    } else {
      val w = blockWindow(2)
      val out = new Array[Double](36)
      var win = 0
      while (win < 3) {
        val coeffs = new Array[Double](6)
        var j = 0
        while (j < 6) { coeffs(j) = lines(6 * win + j); j += 1 }
        val y = VorbisCodec.imdct(coeffs, 12)
        var i = 0
        while (i < 12) { out(6 + 6 * win + i) += y(i) * w(i); i += 1 }
        win += 1
      }
      out
    }
  }

  /** Encoder inverse of [[subbandSynth]]: 36 windowed time samples →
    * 18 lines. Exact under TDAC when consecutive windows obey the
    * long/start/short/stop sequencing rules. */
  def subbandAnalyze(time: Array[Double], blockType: Int): Array[Double] = {
    if (blockType != 2) {
      val w = blockWindow(blockType)
      val z = new Array[Double](36)
      var i = 0
      while (i < 36) { z(i) = time(i) * w(i); i += 1 }
      VorbisCodec.mdctForward(z, 36)
    } else {
      val w = blockWindow(2)
      val lines = new Array[Double](18)
      var win = 0
      while (win < 3) {
        val z = new Array[Double](12)
        var i = 0
        while (i < 12) { z(i) = time(6 + 6 * win + i) * w(i); i += 1 }
        val c = VorbisCodec.mdctForward(z, 12)
        var j = 0
        while (j < 6) { lines(6 * win + j) = c(j); j += 1 }
        win += 1
      }
      lines
    }
  }

  // ---------------------------------------- 32-band polyphase (PR bank)

  private val PolyWin: Array[Double] =
    Array.tabulate(64)(i => math.sin(math.Pi / 64 * (i + 0.5)))

  /** One synthesis step: 32 subband values (one per band, after
    * frequency inversion) → 32 PCM samples, fed by the 32-sample
    * overlap tail of the previous step. PR 64-point MDCT bank — see
    * the object doc for why this replaces the Table B.3 prototype. */
  final class PolySynth {
    private val tail = new Array[Double](32)
    def step(s: Array[Double], out: Array[Double], at: Int): Unit = {
      val y = VorbisCodec.imdct(s, 64)
      var i = 0
      while (i < 32) {
        out(at + i) = y(i) * PolyWin(i) + tail(i)
        tail(i) = y(32 + i) * PolyWin(32 + i)
        i += 1
      }
    }
  }

  /** Matching analysis: 64 windowed PCM samples (32 new + 32 kept) →
    * 32 subband values. */
  final class PolyAnalysis {
    private val prev = new Array[Double](32)
    def step(pcm: Array[Double], at: Int): Array[Double] = {
      val z = new Array[Double](64)
      var i = 0
      while (i < 32) {
        z(i) = prev(i) * PolyWin(i)
        val v = if (at + i < pcm.length) pcm(at + i) else 0.0
        z(32 + i) = v * PolyWin(32 + i)
        prev(i) = v
        i += 1
      }
      VorbisCodec.mdctForward(z, 64)
    }
  }

  // ------------------------------------------------------- frame walk

  private final case class Frame(headerAt: Int, kbps: Int, sampleRate: Int,
                                 channels: Int, mode: Int, modeExt: Int,
                                 sideStart: Int, mainStart: Int, end: Int,
                                 lsf: Boolean)

  /** MPEG-2/2.5 Layer III bitrates (kbps) and sample rates. */
  private val BitratesV2L3 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
  private val SampleRatesV2 = Array(22050, 24000, 16000)
  private val SampleRatesV25 = Array(11025, 12000, 8000)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff

  /** Decode a complete MPEG1 Layer III stream to interleaved PCM
    * doubles. Skips a leading ID3v2 tag and a Xing/Info first frame.
    * Returns None on: non-V1L3 frames, intensity stereo, mixed blocks,
    * unshipped Huffman tables, CRC-region truncation, or hostile sizes
    * (total samples × channels gated like [[VorbisCodec.decodePcmF]]).
    * Output begins at the first fully-reconstructed sample (the
    * decoder's structural delay of 576 samples is trimmed). */
  def decodePcmF(b: Array[Byte]): Option[(Int, Int, Array[Double])] =
    try {
      if (b.length > (1 << 26)) return None
      var p = 0
      if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
        val size = ((u8(b, 6) & 0x7f) << 21) | ((u8(b, 7) & 0x7f) << 14) |
          ((u8(b, 8) & 0x7f) << 7) | (u8(b, 9) & 0x7f)
        if (10L + size > b.length.toLong) return None
        p = 10 + size
      }
      val frames = scala.collection.mutable.ArrayBuffer[Frame]()
      var sr0 = -1; var ch0 = -1; var lsf0 = false; var first = true
      while (p + 4 <= b.length && u8(b, p) == 0xff &&
        (u8(b, p + 1) & 0xe0) == 0xe0) {
        val verBits = (u8(b, p + 1) >> 3) & 3 // 3=MPEG1 2=MPEG2 0=MPEG2.5
        val layer = (u8(b, p + 1) >> 1) & 3
        if (layer != 1 || verBits == 1) return None // Layer III only
        val lsf = verBits != 3
        val crc = (u8(b, p + 1) & 1) == 0
        val brIdx = (u8(b, p + 2) >> 4) & 15
        val srIdx = (u8(b, p + 2) >> 2) & 3
        val padding = (u8(b, p + 2) >> 1) & 1
        if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None
        val mode = (u8(b, p + 3) >> 6) & 3
        val modeExt = (u8(b, p + 3) >> 4) & 3
        val channels = if (mode == 3) 1 else 2
        val kbps = if (lsf) BitratesV2L3(brIdx) else BitratesV1L3(brIdx)
        val sr =
          if (verBits == 3) SampleRatesV1(srIdx)
          else if (verBits == 2) SampleRatesV2(srIdx)
          else SampleRatesV25(srIdx)
        if (first) { sr0 = sr; ch0 = channels; lsf0 = lsf; first = false }
        else if (sr != sr0 || channels != ch0 || lsf != lsf0) return None
        val frameSize =
          (if (lsf) 72000 else 144000) * kbps / sr + padding
        if (frameSize <= 4 || p + frameSize > b.length) {
          p = b.length // truncated final frame: decode what we have
        } else {
          val sideStart = p + 4 + (if (crc) 2 else 0)
          val sideLen =
            if (lsf) { if (channels == 1) 9 else 17 }
            else { if (channels == 1) 17 else 32 }
          val mainStart = sideStart + sideLen
          if (mainStart > p + frameSize) return None
          frames += Frame(p, kbps, sr, channels, mode, modeExt,
            sideStart, mainStart, p + frameSize, lsf)
          if (frames.length > (1 << 18)) return None
          p += frameSize
        }
      }
      if (frames.isEmpty) return None
      val sr = sr0; val channels = ch0
      // drop a Xing/Info header frame (its side info is zeroed and its
      // "audio" is the seek table)
      val audioFrames = frames.toVector.zipWithIndex.dropWhile {
        case (f, i) =>
          i == 0 && {
            val t = f.mainStart
            t + 4 <= b.length &&
              ((b(t) == 'X' && b(t + 1) == 'i' && b(t + 2) == 'n' && b(t + 3) == 'g') ||
               (b(t) == 'I' && b(t + 1) == 'n' && b(t + 2) == 'f' && b(t + 3) == 'o'))
          }
      }.map(_._1)
      if (audioFrames.isEmpty) return None
      val grPerFrame = if (lsf0) 1 else 2
      val frameSamples = 576 * grPerFrame
      if (audioFrames.length.toLong * frameSamples >
        (1L << 26) / channels) return None
      // ---- bit-reservoir assembly: all main-data bytes, with per-frame
      // start offsets into the concatenation
      var totalMain = 0
      audioFrames.foreach(f => totalMain += f.end - f.mainStart)
      val main = new Array[Byte](totalMain)
      val regionStart = new Array[Int](audioFrames.length)
      var mp = 0
      for ((f, i) <- audioFrames.zipWithIndex) {
        regionStart(i) = mp
        System.arraycopy(b, f.mainStart, main, mp, f.end - f.mainStart)
        mp += f.end - f.mainStart
      }
      // ---- per-frame granule decode → synthesis
      val nOutMax = audioFrames.length * frameSamples
      val out = Array.fill(channels)(new Array[Double](nOutMax + 1216))
      val overlap = Array.fill(channels, 32)(new Array[Double](18))
      val poly = Array.fill(channels)(new PolySynth)
      var outAt = 0
      for ((f, fi) <- audioFrames.zipWithIndex) {
        val sbr = new BitReader(b, f.sideStart.toLong * 8,
          f.mainStart.toLong * 8)
        val si =
          if (f.lsf) readSideInfoLsf(sbr, channels)
          else readSideInfo(sbr, channels)
        val start = regionStart(fi) - si.mainDataBegin
        if (start < 0) {
          // reservoir underflow (stream cut before its back-pointer):
          // spec decoders mute this frame; so do we
          outAt += frameSamples
        } else {
          val br = new BitReader(main, start.toLong * 8, main.length.toLong * 8)
          val prevSf = Array.fill(channels)(new Array[Int](22))
          var g = 0
          var bad = false
          while (g < grPerFrame && !bad) {
            val spectra = Array.ofDim[Double](channels, 576)
            val grs = new Array[Gr](channels)
            var c = 0
            while (c < channels && !bad) {
              val gr = si.grs(g)(c)
              grs(c) = gr
              decodeGranule(br, gr, sr, si.scfsi(c), g, prevSf(c),
                f.lsf) match {
                case Some((xr, sfl)) =>
                  spectra(c) = xr
                  if (g == 0) prevSf(c) = sfl
                case None => bad = true
              }
              c += 1
            }
            if (!bad) {
              // stereo processing
              if (channels == 2 && f.mode == 1) {
                if ((f.modeExt & 1) != 0) return None // intensity: see doc
                if ((f.modeExt & 2) != 0) {
                  val s2 = math.sqrt(2.0)
                  var i = 0
                  while (i < 576) {
                    val m = spectra(0)(i); val s = spectra(1)(i)
                    spectra(0)(i) = (m + s) / s2
                    spectra(1)(i) = (m - s) / s2
                    i += 1
                  }
                }
              }
              var cc = 0
              while (cc < channels) {
                val xr = spectra(cc)
                val bt = grs(cc).blockType
                if (bt != 2) aliasReduce(xr, inverse = false)
                // per-subband IMDCT + overlap, then frequency inversion
                val steps = Array.ofDim[Double](18, 32)
                var k = 0
                while (k < 32) {
                  val lines = new Array[Double](18)
                  var j = 0
                  while (j < 18) { lines(j) = xr(18 * k + j); j += 1 }
                  val t36 = subbandSynth(lines, bt)
                  val ov = overlap(cc)(k)
                  var i = 0
                  while (i < 18) {
                    steps(i)(k) = t36(i) + ov(i)
                    ov(i) = t36(18 + i)
                    i += 1
                  }
                  k += 1
                }
                // frequency inversion: odd subbands, odd time steps
                var t = 0
                while (t < 18) {
                  if (t % 2 == 1) {
                    var kk = 1
                    while (kk < 32) { steps(t)(kk) = -steps(t)(kk); kk += 2 }
                  }
                  poly(cc).step(steps(t), out(cc), outAt + 32 * t)
                  t += 1
                }
                cc += 1
              }
              outAt += 576
            } else return None
            g += 1
          }
        }
      }
      // trim the structural delay: one granule (the encoder shifts the
      // signal by exactly 18 subband steps — see writeMp3Pcm)
      val skip = 576
      val n = math.max(0, outAt - skip)
      val frames0 = new Array[Double](n * channels)
      var i = 0
      while (i < n) {
        var c = 0
        while (c < channels) {
          frames0(i * channels + c) = out(c)(skip + i)
          c += 1
        }
        i += 1
      }
      Some((sr, channels, frames0))
    } catch {
      case _: IndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }

  final case class Mp3Audio(sampleRate: Int, channels: Int,
                            samples: Array[Int])

  def decodePcm(b: Array[Byte]): Option[Mp3Audio] =
    decodePcmF(b).map { case (sr, ch, fl) =>
      Mp3Audio(sr, ch, fl.map(v => math.rint(v).toInt))
    }

  // ========================================================= encoder

  /** Encoder knobs, rotated per corpus document the way
    * [[VorbisCodec.VorbisOpts]] are: block cadence (0 = all long,
    * k ≥ 3 = every k-th granule short, with spec start/stop
    * transitions), MS stereo, scfsi sharing, scalefac_scale, CRC
    * emission, and bit-reservoir use. */
  final case class Mp3Opts(shortEvery: Int = 0, msStereo: Boolean = false,
                           shareScf: Boolean = false, scalefacScale: Int = 0,
                           crc: Boolean = false, reservoir: Boolean = false)

  /** The count1-grid contract (the MP3 twin of the Vorbis ±4096/64
    * grid): representable signals have, per scalefactor band, spectral
    * lines in {−A_b, 0, +A_b} where A_b is on the per-band geometric
    * grid. [[gridSpectra]] builds such spectra deterministically from a
    * seed; [[synthesizePcm]] turns them into the PCM the round-trip
    * compares against. */
  val GlobalGain = 210 + 32 // 2^8 = 256 base amplitude (int16 headroom)

  /** Per-band amplitude for scalefactor step `sf` under the default
    * scalefac_scale = 0 grid (ratio √2 per step). */
  def gridAmp(sf: Int, scalefacScale: Int = 0): Double =
    math.pow(2.0, 0.25 * (GlobalGain - 210)) *
      math.pow(2.0, -(1 + scalefacScale) * 0.5 * sf)

  /** Deterministic on-grid spectra: for granule g, channel c, long
    * band b, a sign pattern over the band's first lines and a
    * scalefactor step derived from the seed. Returns (sf, lines) per
    * band — `lines(i)` ∈ {−1,0,1}. */
  def gridSpectra(seed: Long, granule: Int, channel: Int,
                  sampleRate: Int, sfShift: Int = 0,
                  scalefacScale: Int = 0): (Array[Int], Array[Int]) = {
    val widths = SfbLong(sampleRate)
    val sf = new Array[Int](22)
    val is = new Array[Int](576)
    // base ranges keep sf + shift inside the slen field widths (≤15 for
    // bands < 11, ≤7 beyond) with amplitude ≥ 4 even on the coarser
    // scalefac_scale = 1 grid; the per-GRANULE shift is what encodes a
    // document's identity into its relative window energies (the
    // profile-uniqueness device the corpus neardup oracle relies on)
    val mod1 = if (scalefacScale == 0) 8 else 4
    var b = 0
    var at = 0
    while (b < 21) {
      val h = seed * 1103515245L + b * 2654435761L + granule * 97L +
        channel * 31L
      sf(b) = math.floorMod(h >> 8, if (b < 11) mod1 else 2).toInt + sfShift
      val nLines = 1 + math.floorMod(h >> 16, math.min(4, widths(b))).toInt
      var i = 0
      while (i < nLines) {
        val s = math.floorMod(h >> (20 + i), 3).toInt - 1
        is(at + i) = s
        i += 1
      }
      at += widths(b)
      b += 1
    }
    (sf, is)
  }

  /** PCM from per-granule on-grid spectra via the DECODER's synthesis
    * chain (alias → IMDCT/overlap → inversion → polyphase) — the
    * ground truth the round-trip asserts against and the signal the
    * corpus fixtures store as WAV twins. `spectraOf(g)(c)` gives the
    * requantized doubles for granule g. */
  def synthesizePcm(nGranules: Int, channels: Int,
                    spectraOf: (Int, Int) => Array[Double],
                    blockTypeOf: Int => Int): Array[Array[Double]] = {
    val overlap = Array.fill(channels, 32)(new Array[Double](18))
    val poly = Array.fill(channels)(new PolySynth)
    val out = Array.fill(channels)(new Array[Double](nGranules * 576))
    var g = 0
    while (g < nGranules) {
      val bt = blockTypeOf(g)
      var c = 0
      while (c < channels) {
        val xr = spectraOf(g, c).clone()
        if (bt != 2) aliasReduce(xr, inverse = false)
        val steps = Array.ofDim[Double](18, 32)
        var k = 0
        while (k < 32) {
          val lines = new Array[Double](18)
          var j = 0
          while (j < 18) { lines(j) = xr(18 * k + j); j += 1 }
          val t36 = subbandSynth(lines, bt)
          val ov = overlap(c)(k)
          var i = 0
          while (i < 18) {
            steps(i)(k) = t36(i) + ov(i)
            ov(i) = t36(18 + i)
            i += 1
          }
          k += 1
        }
        var t = 0
        while (t < 18) {
          if (t % 2 == 1) {
            var kk = 1
            while (kk < 32) { steps(t)(kk) = -steps(t)(kk); kk += 2 }
          }
          poly(c).step(steps(t), out(c), 576 * g + 32 * t)
          t += 1
        }
        c += 1
      }
      g += 1
    }
    out
  }

  /** Block type per granule index under the cadence option, honoring
    * the spec sequencing rule (short must sit between start and stop). */
  def blockTypeAt(g: Int, shortEvery: Int): Int =
    if (shortEvery < 3) 0
    else if (g % shortEvery == 0) 2
    else if ((g + 1) % shortEvery == 0) 1 // next is short → start
    else if (g % shortEvery == 1) 3 // previous was short → stop
    else 0

  /** Encode PCM into a CBR MPEG1 Layer III stream. The PCM must be
    * on the count1 grid (built by [[synthesizePcm]] over [[gridSpectra]]
    * or any spectra with per-band lines in {−A_b, 0, A_b}); arbitrary
    * PCM encodes lossily (lines clip to ±1 on the grid) — the fixture
    * writer contract, same as the Vorbis ±4096 bound. */
  def writeMp3Pcm(sampleRate: Int, channels: Int,
                  pcm: Array[Array[Double]],
                  opts: Mp3Opts = Mp3Opts(),
                  btOf: Option[Int => Int] = None): Array[Byte] = {
    require(channels >= 1 && channels <= 2, "mono or stereo")
    require(SfbLong.contains(sampleRate), s"bad sample rate $sampleRate")
    require(pcm.length == channels && pcm.nonEmpty, "pcm shape")
    val nSamples = pcm(0).length
    // granule plan: one warmup granule of silence in front (granule
    // MDCT lookback) + enough granules to cover the signal + one
    // lookahead; frames hold 2 granules
    val nGranules = (nSamples + 575) / 576 + 3
    val nFrames = (nGranules + 1) / 2
    val widths = SfbLong(sampleRate)
    val widthsS = SfbShort(sampleRate)
    // ---- analysis: polyphase then per-subband MDCT
    val ana = Array.fill(channels)(new PolyAnalysis)
    val nSteps = nFrames * 2 * 18
    val sub = Array.ofDim[Double](channels, nSteps, 32)
    for (c <- 0 until channels; t <- 0 until nSteps) {
      // encoder timeline: the analysis block t covers x[32(t−1),
      // 32(t+1)) — a built-in one-step delay — so a 544-sample pre-pad
      // (17 steps) makes the total shift exactly 18 subband steps = one
      // granule. The bitstream's granule g then carries the signal's
      // granule g−1 spectra, and the decoder's 576-sample skip lands
      // its output sample 0 on pcm sample 0.
      val at = 32 * t - 544
      val padded = new Array[Double](32)
      var i = 0
      while (i < 32) {
        val idx = at + i
        padded(i) = if (idx >= 0 && idx < nSamples) pcm(c)(idx) else 0.0
        i += 1
      }
      val s = anaStep(ana(c), padded)
      // invert frequency inversion (self-inverse)
      if (t % 2 == 1) {
        var kk = 1
        while (kk < 32) { s(kk) = -s(kk); kk += 2 }
      }
      sub(c)(t) = s
    }
    // ---- per-granule spectra: windowed subband MDCT + inverse alias
    val spectra = Array.ofDim[Double](nGranules, channels, 576)
    val btFn = btOf.getOrElse((g: Int) => blockTypeAt(g, opts.shortEvery))
    val blockTypes = Array.tabulate(nGranules)(btFn)
    for (g <- 0 until nGranules; c <- 0 until channels) {
      val xr = spectra(g)(c)
      var k = 0
      while (k < 32) {
        val time = new Array[Double](36)
        var i = 0
        while (i < 36) {
          val t = 18 * g + i
          time(i) = if (t < nSteps) sub(c)(t)(k) else 0.0
          i += 1
        }
        val lines = subbandAnalyze(time, blockTypes(g))
        var j = 0
        while (j < 18) { xr(18 * k + j) = lines(j); j += 1 }
        k += 1
      }
      if (blockTypes(g) != 2) aliasReduce(xr, inverse = true)
    }
    // ---- optional MS: transform spectra pairs
    if (channels == 2 && opts.msStereo) {
      val s2 = math.sqrt(2.0)
      for (g <- 0 until nGranules; i <- 0 until 576) {
        val l = spectra(g)(0)(i); val r = spectra(g)(1)(i)
        spectra(g)(0)(i) = (l + r) / s2
        spectra(g)(1)(i) = (l - r) / s2
      }
    }
    // ---- quantize each granule/channel to the count1 grid and pack
    // main data (scalefactors + count1 quadruples)
    val mainData = Array.ofDim[Array[Byte]](nFrames)
    val sideInfos = new Array[SideInfo](nFrames)
    for (f <- 0 until nFrames) {
      val bw = new BitWriter
      val grs = Array.ofDim[Gr](2, channels)
      val scfsi = Array.fill(channels)(Array.fill(4)(0))
      val sfGr = Array.ofDim[Int](2, channels, 22)
      for (g <- 0 until 2; c <- 0 until channels) {
        val gi = 2 * f + g
        val bt = if (gi < nGranules) blockTypes(gi) else 0
        val xr = if (gi < nGranules) spectra(gi)(c) else new Array[Double](576)
        val startBit = bw.bitLength
        if (bt != 2) {
          // per-band scalefactor + ±1 quantization (clipping documented)
          val sf = sfGr(g)(c)
          val is = new Array[Int](576)
          var at = 0
          var b = 0
          while (b < 22) {
            var peak = 0.0
            var i = 0
            while (i < widths(b)) {
              peak = math.max(peak, math.abs(xr(at + i))); i += 1
            }
            val sfb =
              if (b >= 21 || peak <= 1e-9) 0
              else {
                val raw = math.round(
                  -2.0 / (1 + opts.scalefacScale) *
                    (math.log(peak / math.pow(2.0, 0.25 * (GlobalGain - 210))) /
                      math.log(2.0))).toInt
                math.max(0, math.min(if (b < 11) 15 else 7, raw))
              }
            sf(b) = sfb
            val amp = gridAmp(sfb, opts.scalefacScale)
            i = 0
            while (i < widths(b)) {
              val q = math.rint(xr(at + i) / amp).toInt
              is(at + i) = math.max(-1, math.min(1, q))
              i += 1
            }
            at += widths(b)
            b += 1
          }
          // scfsi is only legal when BOTH granules are long blocks
          val share = opts.shareScf && g == 1 && bt == 0 &&
            grs(0)(c) != null && !grs(0)(c).windowSwitching &&
            java.util.Arrays.equals(sf, sfGr(0)(c))
          if (share) { var i = 0; while (i < 4) { scfsi(c)(i) = 1; i += 1 } }
          // scalefactor bits
          val s1 = 4; val s2v = 3 // scalefac_compress = 15
          if (!share) {
            var b2 = 0
            while (b2 < 21) {
              bw.write(sf(b2), if (b2 < 11) s1 else s2v); b2 += 1
            }
          }
          // count1 quadruples through the last nonzero line
          var last = 575
          while (last >= 0 && is(last) == 0) last -= 1
          val quads = (last + 4) / 4 // covers line index `last`
          var qn = 0
          while (qn < quads) {
            writeCount1B(bw, Array(is(4 * qn), is(4 * qn + 1),
              is(4 * qn + 2), is(4 * qn + 3)))
            qn += 1
          }
          grs(g)(c) = Gr((bw.bitLength - startBit).toInt, 0, GlobalGain, 15,
            windowSwitching = bt != 0, blockType = bt, mixedBlock = false,
            Array(0, 0, 0), Array(0, 0, 0), 0, 0, 0, opts.scalefacScale, 1)
        } else {
          // short blocks: per-(band, window) scalefactors; the decoded
          // line order is (band, window, line)
          val sfS = Array.fill(13)(new Array[Int](3))
          val is = new Array[Int](576)
          // xr layout is 18k+6w+j (encoder produced it that way via
          // subbandAnalyze); walk bands to quantize per (band, window)
          var decPos = 0
          var bandStart = 0
          var b = 0
          while (b < 13) {
            val wd = widthsS(b)
            var win = 0
            while (win < 3) {
              var peak = 0.0
              var i = 0
              while (i < wd) {
                val fLine = bandStart + i
                peak = math.max(peak,
                  math.abs(xr(18 * (fLine / 6) + 6 * win + (fLine % 6))))
                i += 1
              }
              val sfb =
                if (b >= 12 || peak <= 1e-9) 0
                else {
                  val raw = math.round(
                    -2.0 / (1 + opts.scalefacScale) *
                      (math.log(peak /
                        math.pow(2.0, 0.25 * (GlobalGain - 210))) /
                        math.log(2.0))).toInt
                  math.max(0, math.min(if (b < 6) 15 else 7, raw))
                }
              if (b < 12) sfS(b)(win) = sfb
              val amp = gridAmp(sfb, opts.scalefacScale)
              i = 0
              while (i < wd) {
                val fLine = bandStart + i
                val v = xr(18 * (fLine / 6) + 6 * win + (fLine % 6))
                val q = math.rint(v / amp).toInt
                is(decPos) = math.max(-1, math.min(1, q))
                decPos += 1; i += 1
              }
              win += 1
            }
            bandStart += wd
            b += 1
          }
          for (b2 <- 0 until 12; w2 <- 0 until 3)
            bw.write(sfS(b2)(w2), if (b2 < 6) 4 else 3)
          var last = 575
          while (last >= 0 && is(last) == 0) last -= 1
          val quads = (last + 4) / 4
          var qn = 0
          while (qn < quads) {
            writeCount1B(bw, Array(is(4 * qn), is(4 * qn + 1),
              is(4 * qn + 2), is(4 * qn + 3)))
            qn += 1
          }
          grs(g)(c) = Gr((bw.bitLength - startBit).toInt, 0, GlobalGain, 15,
            windowSwitching = true, blockType = 2, mixedBlock = false,
            Array(0, 0, 0), Array(0, 0, 0), 0, 0, 0, opts.scalefacScale, 1)
        }
      }
      mainData(f) = bw.bytes
      sideInfos(f) = SideInfo(0, scfsi, grs)
    }
    assembleFramesV1(sampleRate, channels, mainData, sideInfos, opts)
  }

  /** CBR bitrate selection + MPEG-1 frame assembly (with optional
    * reservoir: main data may start up to 511 bytes back). Shared by
    * the PCM encoder and the big-value/stream fixture writers. */
  private def assembleFramesV1(sampleRate: Int, channels: Int,
                               mainData: Array[Array[Byte]],
                               sideInfos: Array[SideInfo],
                               opts: Mp3Opts): Array[Byte] = {
    val nFrames = mainData.length
    val sideLen = if (channels == 1) 17 else 32
    val headerLen = 4 + (if (opts.crc) 2 else 0)
    val need = mainData.map(_.length)
    val brIdx = (1 to 14).find { bi =>
      val cap = 144000 * BitratesV1L3(bi) / sampleRate - headerLen - sideLen
      if (cap <= 0) false
      else if (!opts.reservoir) need.forall(_ <= cap)
      else {
        // reservoir feasibility: greedy placement; fill clamps at 511
        // (the 9-bit back-pointer) — clamping wastes region bytes as
        // ancillary zeros, exactly what real encoders do
        var fill = 0 // unconsumed bytes from previous regions
        var ok = true
        for (l <- need if ok) {
          if (l > fill + cap) ok = false
          else fill = math.min(511, fill + cap - l)
        }
        ok
      }
    }.getOrElse(throw new IllegalArgumentException(
      "fixture main data exceeds 320 kbps CBR"))
    val kbps = BitratesV1L3(brIdx)
    val frameSize = 144000 * kbps / sampleRate
    val cap = frameSize - headerLen - sideLen
    val out = new java.io.ByteArrayOutputStream(nFrames * frameSize)
    // main-data regions as ONE flat buffer (frame f's region is bytes
    // [f·cap, (f+1)·cap)): frame f's main data starts `fill` bytes back
    // — sequential placement never overlaps because each frame's data
    // ends inside its own region
    val flat = new Array[Byte](nFrames * cap)
    var fill = 0
    for (f <- 0 until nFrames) {
      val md = mainData(f)
      sideInfos(f) = sideInfos(f).copy(mainDataBegin = fill)
      System.arraycopy(md, 0, flat, f * cap - fill, md.length)
      fill = math.min(511, fill + cap - md.length)
    }
    // emit frames
    for (f <- 0 until nFrames) {
      val hdr = new Array[Byte](4)
      hdr(0) = 0xff.toByte
      hdr(1) = (0xfa | (if (opts.crc) 0 else 1)).toByte
      val srIdx = SampleRatesV1.indexOf(sampleRate)
      hdr(2) = ((brIdx << 4) | (srIdx << 2)).toByte
      val mode = if (channels == 1) 3 else if (opts.msStereo) 1 else 0
      val modeExt = if (opts.msStereo) 2 else 0
      hdr(3) = ((mode << 6) | (modeExt << 4)).toByte
      val sbw = new BitWriter
      writeSideInfo(sbw, sideInfos(f), channels)
      val side = sbw.bytes
      require(side.length == sideLen, s"side info ${side.length} != $sideLen")
      out.write(hdr, 0, 4)
      if (opts.crc) {
        // CRC-16 (x^16+x^15+x^2+1, init 0xffff) over header bytes 2-3 +
        // side info (§2.4.3.1)
        var crc = 0xffff
        def feed(byte: Int): Unit = {
          var bit = 7
          while (bit >= 0) {
            val inBit = (byte >> bit) & 1
            val top = (crc >> 15) & 1
            crc = ((crc << 1) & 0xffff)
            if ((top ^ inBit) == 1) crc ^= 0x8005
            bit -= 1
          }
        }
        feed(hdr(2) & 0xff); feed(hdr(3) & 0xff)
        side.foreach(s => feed(s & 0xff))
        out.write((crc >> 8) & 0xff); out.write(crc & 0xff)
      }
      out.write(side, 0, side.length)
      out.write(flat, f * cap, cap)
    }
    out.toByteArray
  }

  private def anaStep(a: PolyAnalysis, pcm: Array[Double]): Array[Double] =
    a.step(pcm, 0)

  /** Deterministic on-grid SHORT-block spectra (xr layout 18k+6w+j):
    * per (band, window) a scalefactor step and ±1 lines. */
  def gridSpectraShort(seed: Long, granule: Int, channel: Int,
                       sampleRate: Int, scalefacScale: Int,
                       ampScale: Double, sfShift: Int = 0): Array[Double] = {
    val widths = SfbShort(sampleRate)
    val xr = new Array[Double](576)
    val mod1 = if (scalefacScale == 0) 6 else 4
    var bandStart = 0
    var b = 0
    while (b < 12) {
      var win = 0
      while (win < 3) {
        val h = seed * 1103515245L + b * 2654435761L + win * 40503L +
          granule * 97L + channel * 31L
        val sf = math.floorMod(h >> 8, if (b < 6) mod1 else 2).toInt + sfShift
        val amp = gridAmp(sf, scalefacScale) * ampScale
        val nLines = 1 + math.floorMod(h >> 16, math.min(3, widths(b))).toInt
        var i = 0
        while (i < nLines) {
          val s = math.floorMod(h >> (20 + i), 3).toInt - 1
          if (s != 0) {
            val f = bandStart + i
            xr(18 * (f / 6) + 6 * win + (f % 6)) = s * amp
          }
          i += 1
        }
        win += 1
      }
      bandStart += widths(b)
      b += 1
    }
    xr
  }

  /** End-to-end fixture: deterministic on-grid spectra from `seed` →
    * PCM (returned, the round-trip ground truth) + the encoded MP3.
    * Content lives in interior granules only (first and last two are
    * silent — the TDAC boundary discipline that keeps the analysis
    * exactly on-grid); sample count = nGranules·576. The encoder's
    * granule timeline is the fixture's shifted by one (the 576-sample
    * pre-pad), so the cadence passed down is shifted to keep analysis
    * windows aligned with the synthesis that produced the PCM. */
  def writeMp3Fixture(sampleRate: Int, channels: Int, nGranules: Int,
                      seed: Long, opts: Mp3Opts = Mp3Opts())
      : (Array[Array[Double]], Array[Byte]) = {
    require(nGranules >= 4 && nGranules <= 256, "granule count")
    val bts = Array.tabulate(nGranules)(g => blockTypeAt(g, opts.shortEvery))
    val spectra = Array.ofDim[Double](nGranules, channels, 576)
    val widths = SfbLong(sampleRate)
    // MS fixtures: channel spectra are scaled by 1/√2 with ch1 = ch0,
    // so the encoder's MID = √2·l lands exactly on the grid and SIDE
    // is zero — what must be on-grid is what gets QUANTIZED (mid/side),
    // not the channels themselves; works on both scalefac_scale grids
    val ms = opts.msStereo && channels == 2
    val ampScale = if (ms) 1.0 / math.sqrt(2.0) else 1.0
    for (g <- 1 until nGranules - 2; c <- 0 until channels) {
      // per-granule amplitude shift from the seed's nibbles: relative
      // window energies then encode the document identity, which is
      // what keeps normalized energy profiles distinct across a corpus
      val shift = (((seed >>> (4 * (g % 12))) & 0xf) %
        (if (opts.scalefacScale == 0) 6 else 3)).toInt
      if (bts(g) != 2) {
        // long, start, and stop blocks all use the long scalefactor
        // layout and the 36-window MDCT — all three carry content
        // (a short-cadence fixture would otherwise have a single
        // content granule and a window-shape-determined profile)
        val (sf, is) = gridSpectra(seed, g, c, sampleRate, shift,
          opts.scalefacScale)
        var at = 0
        var b = 0
        while (b < 21) {
          val amp = gridAmp(sf(b), opts.scalefacScale) * ampScale
          var i = 0
          while (i < widths(b)) {
            if (is(at + i) != 0) spectra(g)(c)(at + i) = is(at + i) * amp
            i += 1
          }
          at += widths(b)
          b += 1
        }
      } else {
        spectra(g)(c) = gridSpectraShort(seed, g, c, sampleRate,
          opts.scalefacScale, ampScale, shift)
      }
    }
    if (ms)
      for (g <- 0 until nGranules; i <- 0 until 576)
        spectra(g)(1)(i) = spectra(g)(0)(i)
    val pcm = synthesizePcm(nGranules, channels,
      (g, c) => spectra(g)(c), g => bts(g))
    val mp3 = writeMp3Pcm(sampleRate, channels, pcm, opts,
      btOf = Some(g => if (g == 0) 0 else blockTypeAt(g - 1, opts.shortEvery)))
    (pcm, mp3)
  }

  // --------------------------------- big-value / LSF stream fixtures

  /** BIG-VALUE fixture: an MPEG-1 stream whose spectra are integer
    * magnitudes Huffman-coded through the VENDORED Table B.7 tables —
    * the stream-level gate on the registry (regions, codes, sign
    * bits). `tids` picks the table for each of the three long-block
    * regions (region0 = sfb 0-8, region1 = 9-16, region2 = 17-20);
    * magnitudes are seeded within each region's table range. Returns
    * (expected PCM including the leading structural-delay granule,
    * stream) — decodePcmF output must equal pcm.drop(576·channels
    * worth). */
  def writeMp3BigFixture(sampleRate: Int, channels: Int, nGranules: Int,
                         seed: Long, tids: (Int, Int, Int),
                         crc: Boolean = false, reservoir: Boolean = false)
      : (Array[Array[Double]], Array[Byte]) = {
    require(nGranules >= 4 && nGranules <= 64, "granule count")
    val widths = SfbLong(sampleRate)
    val idx = widths.scanLeft(0)(_ + _) // 23 entries
    val region0Count = 8
    val region1Count = 7
    val r0End = idx(region0Count + 1)
    val r1End = idx(region0Count + region1Count + 2)
    val bigLines = idx(21) // all content bands; even at every rate
    def tableAt(line: Int): Int =
      if (line < r0End) tids._1 else if (line < r1End) tids._2 else tids._3
    // deterministic integer spectra + scalefactors
    val sf = Array.ofDim[Int](nGranules, channels, 22)
    val mag = Array.ofDim[Int](nGranules, channels, 576)
    for (g <- 1 until nGranules - 2; c <- 0 until channels) {
      var b = 0
      var at = 0
      while (b < 21) {
        val h = seed * 6364136223846793005L + b * 2654435761L +
          g * 1013904223L + c * 31L
        sf(g)(c)(b) = math.floorMod(h >> 8, if (b < 11) 8 else 2).toInt
        val tab = Mp3Huffman.resolve(tableAt(at))
        // ESC tables (linbits > 0, 16-wide): let magnitudes run past
        // 15 so the escape field itself carries nonzero excess — the
        // attestation harness needs the linbits READ path externally
        // cross-checked, not just the codeword data
        val vmax = tab.map { t =>
          val m = math.min(t.xlen, t.ylen) - 1
          if (t.linbits > 0 && m >= 15) 15 + math.min(7, (1 << t.linbits) - 1)
          else m
        }.getOrElse(0)
        val nLines = 1 + math.floorMod(h >> 16, math.min(4, widths(b))).toInt
        var i = 0
        while (i < nLines && vmax > 0) {
          val m = math.floorMod(h >> (18 + 3 * i), vmax + 1).toInt
          mag(g)(c)(at + i) =
            if (math.floorMod(h >> (40 + i), 2) == 0) m else -m
          i += 1
        }
        at += widths(b)
        b += 1
      }
    }
    // expected PCM via the decoder's own requant formula + synthesis
    val spectra = Array.ofDim[Double](nGranules, channels, 576)
    for (g <- 0 until nGranules; c <- 0 until channels) {
      var b = 0
      var at = 0
      while (b < 21) {
        val amp = gridAmp(sf(g)(c)(b))
        var i = 0
        while (i < widths(b)) {
          val m = mag(g)(c)(at)
          if (m != 0)
            spectra(g)(c)(at) = math.signum(m.toDouble) *
              math.pow(math.abs(m.toDouble), 4.0 / 3.0) * amp
          i += 1; at += 1
        }
        b += 1
      }
    }
    // decode-aligned ground truth: the decoder trims the structural
    // delay of one granule, so drop it here too — decodePcmF output
    // equals this array sample-for-sample
    val pcm = synthesizePcm(nGranules, channels,
      (g, c) => spectra(g)(c), _ => 0).map(_.drop(576))
    // pack frames: scalefactors (sfc = 15 layout) + Huffman big values
    val nFrames = (nGranules + 1) / 2
    val mainData = new Array[Array[Byte]](nFrames)
    val sideInfos = new Array[SideInfo](nFrames)
    for (f <- 0 until nFrames) {
      val bw = new BitWriter
      val grs = Array.ofDim[Gr](2, channels)
      for (g <- 0 until 2; c <- 0 until channels) {
        val gi = 2 * f + g
        val startBit = bw.bitLength
        val sfG = if (gi < nGranules) sf(gi)(c) else new Array[Int](22)
        val magG = if (gi < nGranules) mag(gi)(c) else new Array[Int](576)
        var b = 0
        while (b < 21) {
          bw.write(sfG(b), if (b < 11) 4 else 3)
          b += 1
        }
        var line = 0
        while (line < bigLines) {
          val tid = tableAt(line)
          if (tid != 0) {
            val tab = Mp3Huffman.resolve(tid).get
            val x = magG(line); val y = magG(line + 1)
            val xa = math.abs(x); val ya = math.abs(y)
            // §2.4.3.4.6 field order mirrors the decoder: code,
            // x-linbits, x-sign, y-linbits, y-sign (escape at 15)
            val xs = if (tab.linbits > 0 && xa >= 15) 15 else xa
            val ys = if (tab.linbits > 0 && ya >= 15) 15 else ya
            tab.encodeSym(bw, xs, ys)
            if (xs == 15 && tab.linbits > 0) bw.write(xa - 15, tab.linbits)
            if (x != 0) bw.writeBit(if (x < 0) 1 else 0)
            if (ys == 15 && tab.linbits > 0) bw.write(ya - 15, tab.linbits)
            if (y != 0) bw.writeBit(if (y < 0) 1 else 0)
          }
          line += 2
        }
        grs(g)(c) = Gr((bw.bitLength - startBit).toInt, bigLines / 2,
          GlobalGain, 15, windowSwitching = false, blockType = 0,
          mixedBlock = false, Array(tids._1, tids._2, tids._3),
          Array(0, 0, 0), region0Count, region1Count, 0, 0, 1)
      }
      mainData(f) = bw.bytes
      sideInfos(f) = SideInfo(0, Array.fill(channels)(Array.fill(4)(0)), grs)
    }
    val mp3 = assembleFramesV1(sampleRate, channels, mainData, sideInfos,
      Mp3Opts(crc = crc, reservoir = reservoir))
    (pcm, mp3)
  }

  /** LSF (MPEG-2/2.5) fixture: 1-granule frames, the LSF scalefactor
    * algorithm (scalefac_compress = 399 → slen {4,4,3,3} over sfb
    * groups {6,5,5,5}), count1 TABLE A quadruples — the stream-level
    * gate on the whole LSF read path plus the count1 A codes. Content
    * is on the ±1 count1 grid over the vendored band table for
    * `sampleRate` (22050/24000/16000 → MPEG-2; 8000 → MPEG-2.5).
    * Returns (expected PCM, stream). */
  def writeMp3LsfFixture(channels: Int, nGranules: Int, seed: Long,
                         sampleRate: Int = 22050)
      : (Array[Array[Double]], Array[Byte]) = {
    require(nGranules >= 4 && nGranules <= 128, "granule count")
    val v25 = SampleRatesV25.contains(sampleRate)
    require(v25 || SampleRatesV2.contains(sampleRate), "LSF rate")
    val widths = SfbLongLsf(sampleRate)
    // deterministic on-grid spectra (±1 per line, per-band sf)
    val sf = Array.ofDim[Int](nGranules, channels, 22)
    val lines = Array.ofDim[Int](nGranules, channels, 576)
    for (g <- 1 until nGranules - 2; c <- 0 until channels) {
      var b = 0
      var at = 0
      while (b < 21) {
        val h = seed * 1103515245L + b * 2654435761L + g * 97L + c * 31L
        sf(g)(c)(b) = math.floorMod(h >> 8, if (b < 11) 8 else 2).toInt
        val nLines = 1 + math.floorMod(h >> 16, math.min(4, widths(b))).toInt
        var i = 0
        while (i < nLines) {
          lines(g)(c)(at + i) = math.floorMod(h >> (20 + i), 3).toInt - 1
          i += 1
        }
        at += widths(b)
        b += 1
      }
    }
    val spectra = Array.ofDim[Double](nGranules, channels, 576)
    for (g <- 0 until nGranules; c <- 0 until channels) {
      var b = 0
      var at = 0
      while (b < 21) {
        val amp = gridAmp(sf(g)(c)(b))
        var i = 0
        while (i < widths(b)) {
          if (lines(g)(c)(at) != 0)
            spectra(g)(c)(at) = lines(g)(c)(at) * amp
          i += 1; at += 1
        }
        b += 1
      }
    }
    // decode-aligned (structural delay dropped), as in the big fixture
    val pcm = synthesizePcm(nGranules, channels,
      (g, c) => spectra(g)(c), _ => 0).map(_.drop(576))
    // pack: per frame ONE granule; scalefactors via the LSF layout,
    // then count1 table A quadruples through the last nonzero line
    val sfc = 399 // slen {4,4,3,3}, nr {6,5,5,5}, preflag 0
    val (slen, nr, _) = lsfScalefacLayout(sfc, short = false)
    val mainData = new Array[Array[Byte]](nGranules)
    val sideInfos = new Array[SideInfo](nGranules)
    for (g <- 0 until nGranules) {
      val bw = new BitWriter
      val grs = Array.ofDim[Gr](1, channels)
      for (c <- 0 until channels) {
        val startBit = bw.bitLength
        var b = 0
        var grp = 0
        var inGrp = 0
        while (b < 21) {
          bw.write(sf(g)(c)(b), slen(grp))
          inGrp += 1
          if (inGrp == nr(grp)) { grp += 1; inGrp = 0 }
          b += 1
        }
        val ls = lines(g)(c)
        var last = 575
        while (last >= 0 && ls(last) == 0) last -= 1
        val quads = (last + 4) / 4
        var qn = 0
        while (qn < quads) {
          var pat = 0
          var i = 0
          while (i < 4) {
            if (ls(4 * qn + i) != 0) pat |= 1 << (3 - i)
            i += 1
          }
          Mp3Huffman.count1A.encodeSym(bw, pat, 0)
          i = 0
          while (i < 4) {
            if (ls(4 * qn + i) != 0)
              bw.writeBit(if (ls(4 * qn + i) < 0) 1 else 0)
            i += 1
          }
          qn += 1
        }
        grs(0)(c) = Gr((bw.bitLength - startBit).toInt, 0, GlobalGain, sfc,
          windowSwitching = false, blockType = 0, mixedBlock = false,
          Array(0, 0, 0), Array(0, 0, 0), 0, 0, 0, 0, 0)
      }
      mainData(g) = bw.bytes
      sideInfos(g) = SideInfo(0, Array.fill(channels)(Array.fill(4)(0)), grs)
    }
    // CBR selection from the LSF bitrate table; no reservoir, no CRC
    val sideLen = if (channels == 1) 9 else 17
    val need = mainData.map(_.length)
    val brIdx = (1 to 14).find { bi =>
      val cap = 72000 * BitratesV2L3(bi) / sampleRate - 4 - sideLen
      cap > 0 && need.forall(_ <= cap)
    }.getOrElse(throw new IllegalArgumentException(
      "LSF fixture main data exceeds 160 kbps CBR"))
    val kbps = BitratesV2L3(brIdx)
    val frameSize = 72000 * kbps / sampleRate
    val cap = frameSize - 4 - sideLen
    val out = new java.io.ByteArrayOutputStream(nGranules * frameSize)
    for (g <- 0 until nGranules) {
      val hdr = new Array[Byte](4)
      val srIdx =
        if (v25) SampleRatesV25.indexOf(sampleRate)
        else SampleRatesV2.indexOf(sampleRate)
      hdr(0) = 0xff.toByte
      // Layer III, no CRC; version bits 10 (MPEG-2) or 00 (MPEG-2.5)
      hdr(1) = (if (v25) 0xe3 else 0xf3).toByte
      hdr(2) = ((brIdx << 4) | (srIdx << 2)).toByte
      hdr(3) = (if (channels == 1) 3 << 6 else 0).toByte
      val sbw = new BitWriter
      writeSideInfoLsf(sbw, sideInfos(g), channels)
      val side = sbw.bytes
      require(side.length == sideLen, s"LSF side ${side.length} != $sideLen")
      out.write(hdr, 0, 4)
      out.write(side, 0, side.length)
      val region = new Array[Byte](cap)
      System.arraycopy(mainData(g), 0, region, 0, mainData(g).length)
      out.write(region, 0, cap)
    }
    (pcm, out.toByteArray)
  }
}
