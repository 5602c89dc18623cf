package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Mp3Layer3._

/** Round-14 MP3 coverage: the round-13 advice found the 22.05 kHz LSF
  * long band table was actually the 24 kHz row (both sum to 576 — the
  * sum law cannot tell adjacent rows apart). These tests pin the
  * CONTENT of the attested rows exactly, extend LSF decode to
  * 16 kHz (MPEG-2) and 8 kHz (MPEG-2.5), and round-trip the ESC
  * (linbits) encode path the attestation harness relies on. */
class Round14Mp3Spec extends AnyFunSuite {

  test("LSF long band tables pin EXACT content, not just the sum law " +
    "(round-13 advice: the 22.05 row was the 24 kHz row)") {
    // ISO 13818-3 Table B.2; cross-checked against libmad sfb_22050_long
    // and mpg123 bandInfo by the round-13 advice finding
    assert(SfbLongLsf(22050).toSeq == Seq(6, 6, 6, 6, 6, 6, 8, 10, 12,
      14, 16, 20, 24, 28, 32, 38, 46, 52, 60, 68, 58, 54))
    assert(SfbLongLsf(24000).toSeq == Seq(6, 6, 6, 6, 6, 6, 8, 10, 12,
      14, 16, 18, 22, 26, 32, 38, 46, 54, 62, 70, 76, 36))
    // 16 kHz shares the 22.05 kHz long row (libmad aliases them)
    assert(SfbLongLsf(16000).toSeq == SfbLongLsf(22050).toSeq)
    // the 8 kHz row's five trailing 2-line bands are its signature
    assert(SfbLongLsf(8000).takeRight(5).toSeq == Seq(2, 2, 2, 2, 2))
    assert(SfbShortLsf(22050).toSeq == Seq(4, 4, 4, 6, 6, 8, 10, 14, 18,
      26, 32, 42, 18))
    // sum laws for every vendored row (construction re-checks too)
    SfbLongLsf.values.foreach(w => assert(w.length == 22 && w.sum == 576))
    SfbShortLsf.values.foreach(w => assert(w.length == 13 && w.sum == 192))
  }

  test("LSF stream round trip at 16 kHz and 24 kHz (MPEG-2)") {
    for ((sr, ch, nG, seed) <- Seq((16000, 1, 8, 31L), (16000, 2, 6, 47L),
      (24000, 1, 8, 53L))) {
      val (pcm, mp3) = writeMp3LsfFixture(ch, nG, seed, sr)
      val (sr2, ch2, fl) = decodePcmF(mp3).getOrElse(
        fail(s"LSF $sr refused"))
      assert(sr2 == sr && ch2 == ch)
      assert(fl.length == pcm(0).length * ch)
      for (c <- 0 until ch; i <- 0 until fl.length / ch)
        assert(math.abs(fl(i * ch + c) - pcm(c)(i)) < 1e-6,
          s"$sr ch$c sample $i: ${fl(i * ch + c)} vs ${pcm(c)(i)}")
    }
  }

  test("LSF stream round trip at 8 kHz (MPEG-2.5, version bits 00)") {
    for ((ch, nG, seed) <- Seq((1, 8, 61L), (2, 6, 71L))) {
      val (pcm, mp3) = writeMp3LsfFixture(ch, nG, seed, 8000)
      // header sanity: 11-bit sync, version bits 00, Layer III
      assert((mp3(0) & 0xff) == 0xff && (mp3(1) & 0xff) == 0xe3)
      val (sr2, ch2, fl) = decodePcmF(mp3).getOrElse(fail("2.5 refused"))
      assert(sr2 == 8000 && ch2 == ch)
      assert(fl.length == pcm(0).length * ch)
      for (c <- 0 until ch; i <- 0 until fl.length / ch)
        assert(math.abs(fl(i * ch + c) - pcm(c)(i)) < 1e-6,
          s"8k ch$c sample $i")
    }
  }

  test("unvendored LSF rates still refuse when a granule needs bands " +
    "(11025/12000 not vendored)") {
    // take a valid 8 kHz MPEG-2.5 stream and flip frame 0's srIdx
    // 2 → 0 (11025): the walk either sees inconsistent frame rates or
    // a non-silent granule needs the unvendored 11025 band table —
    // either way the contract is None, never garbage
    val (_, mp3) = writeMp3LsfFixture(1, 8, 61L, 8000)
    val b = mp3.clone()
    b(2) = (b(2) & ~0x0c).toByte
    assert(decodePcmF(b).isEmpty)
  }

  test("hostile input never throws: bit flips over an 8 kHz LSF stream") {
    val (_, mp3) = writeMp3LsfFixture(1, 6, 19L, 8000)
    val rnd = new scala.util.Random(41)
    for (_ <- 0 until 200) {
      val m = mp3.clone()
      val at = rnd.nextInt(m.length)
      m(at) = (m(at) ^ (1 << rnd.nextInt(8))).toByte
      decodePcm(m) // Option either way, must not throw
    }
    for (cut <- Seq(0, 3, 9, mp3.length / 2, mp3.length - 1))
      decodePcm(java.util.Arrays.copyOf(mp3, cut))
  }

  test("ESC encode path: big-value fixture with a registered 24-family " +
    "table carries nonzero linbits excess and round-trips") {
    // synthetic Kraft-complete 16x16 table (256 symbols, all 8 bits),
    // registered as id 24 (linbits 4); ids 25-31 resolve by the
    // shared-code rule. NOT spec data — this gates the encoder/decoder
    // MECHANICS the attestation harness reuses for real candidates.
    val data = (0 until 256).map(i => f"8:$i%x").mkString(",")
    Mp3Huffman.register(new Mp3Huffman.BvTable(24, 16, 16, 4, data))
    try {
      val (pcm, mp3) = writeMp3BigFixture(44100, 1, 6, 17L, (24, 26, 24))
      val (sr, ch, fl) = decodePcmF(mp3).getOrElse(fail("ESC refused"))
      assert(sr == 44100 && ch == 1)
      assert(fl.length == pcm(0).length)
      var i = 0
      while (i < fl.length) {
        assert(math.abs(fl(i) - pcm(0)(i)) < 1e-6, s"ESC sample $i")
        i += 1
      }
    } finally Mp3Huffman.clearRegistered()
    assert(Mp3Huffman.resolve(24).isEmpty)
  }
}
