package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Mp3Layer3._

/** Round-13 MP3 gates: the vendored Table B.7 big-value Huffman
  * registry (structural laws + per-pair and whole-stream round trips
  * through every shipped table), count1 table A, the linbits/ESC
  * decode path via the deploy-registration seam, and the MPEG-2 LSF
  * layer (scalefactor algorithm laws, side-info byte math, stream
  * round trip at 22.05 kHz). */
class Round13Mp3Spec extends AnyFunSuite {

  private val shippedIds = Seq(1, 2, 3, 5, 6, 7, 8, 9, 10, 12)

  test("registry: shipped tables load (Kraft-complete, prefix-free) " +
    "with spec dims") {
    val dims = Map(1 -> 2, 2 -> 3, 3 -> 3, 5 -> 4, 6 -> 4, 7 -> 6, 8 -> 6,
      9 -> 6, 10 -> 8, 12 -> 8)
    for (id <- shippedIds) {
      val t = Mp3Huffman.resolve(id).getOrElse(fail(s"table $id missing"))
      assert(t.xlen == dims(id) && t.ylen == dims(id), s"table $id dims")
      assert(t.linbits == 0, s"tables <16 carry no linbits")
    }
    // construction itself enforces Kraft completeness and rejects
    // duplicate/prefix-shadowed codes; a corrupted copy must throw
    intercept[IllegalArgumentException] {
      new Mp3Huffman.BvTable(99, 2, 2, 0, "1:1,3:1,2:1,3:1") // dup code
    }
    intercept[IllegalArgumentException] {
      new Mp3Huffman.BvTable(99, 2, 2, 0, "1:1,3:1,2:1,4:0") // kraft hole
    }
  }

  test("registry: unvendored ids refuse; invalid ids refuse") {
    for (id <- Seq(4, 11, 13, 14, 15) ++ (16 to 31))
      assert(Mp3Huffman.resolve(id).isEmpty, s"id $id must refuse")
    assert(!Mp3Huffman.supported(13) && Mp3Huffman.supported(0))
  }

  test("every (x,y) of every shipped table round-trips encode→decode") {
    for (id <- shippedIds) {
      val t = Mp3Huffman.resolve(id).get
      for (x <- 0 until t.xlen; y <- 0 until t.ylen) {
        val bw = new BitWriter
        t.encodeSym(bw, x, y)
        val br = new BitReader(bw.bytes, 0, bw.bitLength)
        val sym = t.decodeSym(br)
        assert(sym / t.ylen == x && sym % t.ylen == y,
          s"table $id ($x,$y) decoded to ${sym / t.ylen},${sym % t.ylen}")
        assert(br.pos == bw.bitLength, s"table $id ($x,$y) length drift")
      }
    }
    // count1 table A: all 16 patterns
    val a = Mp3Huffman.count1A
    for (pat <- 0 until 16) {
      val bw = new BitWriter
      a.encodeSym(bw, pat, 0)
      val br = new BitReader(bw.bytes, 0, bw.bitLength)
      assert(a.decodeSym(br) == pat)
    }
  }

  test("monotone-descent structure: verified tables are inversion-free; " +
    "table 10 carries exactly its three attested inversions") {
    def inversions(t: Mp3Huffman.BvTable): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      def lc(x: Int, y: Int) = (t.lens(x * t.ylen + y), t.codes(x * t.ylen + y))
      for (x <- 0 until t.xlen; y1 <- 0 until t.ylen; y2 <- y1 + 1 until t.ylen) {
        val (l1, c1) = lc(x, y1); val (l2, c2) = lc(x, y2)
        if (l1 == l2 && c1 <= c2) out += s"row $x:$y1:$y2"
      }
      for (y <- 0 until t.ylen; x1 <- 0 until t.xlen; x2 <- x1 + 1 until t.xlen) {
        val (l1, c1) = lc(x1, y); val (l2, c2) = lc(x2, y)
        if (l1 == l2 && c1 <= c2) out += s"col $y:$x1:$x2"
      }
      out.toSeq
    }
    for (id <- Seq(1, 2, 3, 5, 6, 7, 8, 9, 12))
      assert(inversions(Mp3Huffman.resolve(id).get).isEmpty, s"table $id")
    // table 10's three same-length code inversions are in the recalled
    // public data itself (both recall paths agree); pin them so any
    // future "fix" that silently rewrites the table trips this spec
    assert(inversions(Mp3Huffman.resolve(10).get).sorted ==
      Seq("col 6:0:2", "col 6:0:3", "row 6:3:4"))
  }

  test("big-value stream round trip through EVERY shipped table") {
    for (id <- shippedIds) {
      val (pcm, mp3) = writeMp3BigFixture(44100, 1, 6, 7L * id + 3,
        (id, id, id))
      val (sr, ch, fl) = decodePcmF(mp3)
        .getOrElse(fail(s"table $id stream refused"))
      assert(sr == 44100 && ch == 1)
      assert(fl.length == pcm(0).length, s"table $id length")
      var i = 0
      while (i < fl.length) {
        assert(math.abs(fl(i) - pcm(0)(i)) < 1e-6,
          s"table $id sample $i: ${fl(i)} vs ${pcm(0)(i)}")
        i += 1
      }
    }
  }

  test("mixed region tables, stereo, other rates, CRC, reservoir") {
    for (((srr, ch, tids, crcF, res), k) <- Seq(
      (48000, 2, (1, 7, 12), false, false),
      (32000, 1, (2, 9, 10), true, false),
      (44100, 2, (5, 6, 8), false, true),
      (48000, 1, (10, 3, 0), true, true)).zipWithIndex) {
      val (pcm, mp3) = writeMp3BigFixture(srr, ch, 8, 1000L + k, tids,
        crc = crcF, reservoir = res)
      val (sr2, ch2, fl) = decodePcmF(mp3).getOrElse(fail(s"arm $k refused"))
      assert(sr2 == srr && ch2 == ch)
      for (c <- 0 until ch; i <- 0 until fl.length / ch)
        assert(math.abs(fl(i * ch + c) - pcm(c)(i)) < 1e-6,
          s"arm $k ch$c sample $i")
    }
  }

  test("linbits/ESC path through the deploy-registration seam") {
    // synthetic Kraft-complete 16x16 table: 256 symbols, all 8 bits —
    // the shape tables 16-23 have once registered at deploy
    val data = (0 until 256).map(i => f"8:$i%x").mkString(",")
    Mp3Huffman.register(new Mp3Huffman.BvTable(16, 16, 16, 1, data))
    try {
      // id 16 registered → 17-23 resolve by the shared-code rule
      assert(Mp3Huffman.resolve(16).exists(_.linbits == 1))
      assert(Mp3Huffman.resolve(19).exists(_.linbits == 4))
      assert(Mp3Huffman.resolve(23).exists(_.linbits == 13))
      assert(Mp3Huffman.resolve(24).isEmpty) // 24-family still absent
      // granule-level ESC decode: one pair (15,2) under table 19 —
      // x escapes with 4 linbits (+9 → 24), then sign bits
      val bw = new BitWriter
      var b = 0
      while (b < 21) { bw.write(0, if (b < 11) 4 else 3); b += 1 } // sf
      val t19 = Mp3Huffman.resolve(19).get
      t19.encodeSym(bw, 15, 2)
      bw.write(9, 4) // x linbits
      bw.writeBit(1) // x negative
      bw.writeBit(0) // y positive
      val gr = Gr(bw.bitLength.toInt, 1, GlobalGain, 15,
        windowSwitching = false, blockType = 0, mixedBlock = false,
        Array(19, 0, 0), Array(0, 0, 0), 8, 7, 0, 0, 1)
      val br = new BitReader(bw.bytes, 0, bw.bitLength)
      val (xr, _) = decodeGranule(br, gr, 44100, Array.fill(4)(0), 0,
        new Array[Int](22)).getOrElse(fail("ESC granule refused"))
      val amp = gridAmp(0)
      assert(math.abs(xr(0) + math.pow(24.0, 4.0 / 3.0) * amp) < 1e-9)
      assert(math.abs(xr(1) - math.pow(2.0, 4.0 / 3.0) * amp) < 1e-9)
      assert(xr.drop(2).forall(_ == 0.0))
    } finally Mp3Huffman.clearRegistered()
    assert(Mp3Huffman.resolve(16).isEmpty) // seam cleans up
  }

  test("LSF scalefactor layout laws: group counts cover the band space " +
    "for every scalefac_compress") {
    for (sfc <- 0 until 512) {
      val (slenL, nrL, pfL) = lsfScalefacLayout(sfc, short = false)
      val (slenS, nrS, pfS) = lsfScalefacLayout(sfc, short = true)
      assert(nrL.sum == 21 && nrS.sum == 36, s"sfc $sfc coverage")
      assert(slenL.forall(s => s >= 0 && s <= 4), s"sfc $sfc slen")
      assert(slenS.forall(s => s >= 0 && s <= 4))
      assert(pfL == (if (sfc >= 500) 1 else 0) && pfS == pfL)
    }
  }

  test("LSF side-info byte math: 9 bytes mono, 17 stereo; reader is " +
    "the writer's inverse") {
    for (ch <- 1 to 2) {
      val grs = Array.fill(1)(Array.tabulate(ch)(c =>
        Gr(1000 + c, 37, 200, 399, windowSwitching = false, 0,
          mixedBlock = false, Array(7, 9, 12), Array(0, 0, 0), 8, 5,
          0, 1, 0)))
      val si = SideInfo(123, Array.fill(ch)(Array.fill(4)(0)), grs)
      val bw = new BitWriter
      writeSideInfoLsf(bw, si, ch)
      assert(bw.bytes.length == (if (ch == 1) 9 else 17))
      val br = new BitReader(bw.bytes, 0, bw.bitLength)
      val back = readSideInfoLsf(br, ch)
      assert(back.mainDataBegin == 123)
      for (c <- 0 until ch) {
        val g0 = grs(0)(c); val g1 = back.grs(0)(c)
        assert(g1.part23Length == g0.part23Length &&
          g1.bigValues == g0.bigValues &&
          g1.globalGain == g0.globalGain &&
          g1.scalefacCompress == g0.scalefacCompress &&
          g1.tableSelect.toSeq == g0.tableSelect.toSeq &&
          g1.region0 == g0.region0 && g1.region1 == g0.region1 &&
          g1.scalefacScale == g0.scalefacScale &&
          g1.count1Select == g0.count1Select)
      }
    }
  }

  test("LSF (MPEG-2) stream round trip at 22.05 kHz, mono and stereo") {
    for ((ch, nG, seed) <- Seq((1, 8, 11L), (2, 6, 29L))) {
      val (pcm, mp3) = writeMp3LsfFixture(ch, nG, seed)
      val (sr, ch2, fl) = decodePcmF(mp3).getOrElse(fail("LSF refused"))
      assert(sr == 22050 && ch2 == ch)
      assert(fl.length == pcm(0).length * ch)
      for (c <- 0 until ch; i <- 0 until fl.length / ch)
        assert(math.abs(fl(i * ch + c) - pcm(c)(i)) < 1e-6,
          s"LSF ch$c sample $i: ${fl(i * ch + c)} vs ${pcm(c)(i)}")
    }
  }

  test("hostile input never throws: bit flips over a big-value stream") {
    val (_, mp3) = writeMp3BigFixture(44100, 1, 6, 42L, (7, 10, 12))
    val rnd = new scala.util.Random(13)
    for (_ <- 0 until 300) {
      val m = mp3.clone()
      val at = rnd.nextInt(m.length)
      m(at) = (m(at) ^ (1 << rnd.nextInt(8))).toByte
      decodePcm(m) // Option either way, must not throw
    }
    for (cut <- Seq(0, 1, 4, 17, mp3.length / 2, mp3.length - 1))
      decodePcm(java.util.Arrays.copyOf(mp3, cut))
  }

  test("a stream selecting an UNVENDORED table refuses whole, not garbage") {
    val (_, mp3) = writeMp3BigFixture(44100, 1, 6, 5L, (1, 1, 1))
    // rewrite side info: tableSelect 1 → 13 everywhere (same 5-bit
    // field); decode must now refuse rather than misread
    val b = mp3.clone()
    val br = new BitReader(b, 0, b.length.toLong * 8)
    // frame 0: header 4 bytes, mono side info at byte 4
    val sbr = new BitReader(b, 4L * 8, (4L + 17) * 8)
    val si = readSideInfo(sbr, 1)
    assert(si.grs(0)(0).tableSelect(0) == 1)
    val bw = new BitWriter
    writeSideInfo(bw, SideInfo(si.mainDataBegin, si.scfsi,
      si.grs.map(_.map(g => g.copy(tableSelect = Array(13, 13, 13))))), 1)
    System.arraycopy(bw.bytes, 0, b, 4, 17)
    assert(decodePcmF(b).isEmpty)
  }
}
