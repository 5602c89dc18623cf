package graft.functions

import graft.functions.VorbisCodec._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 regression pins for the round-11 advice items: the Vorbis
  * unused-floor silence law and channel-aware allocation gate, the
  * PDF xref-stream /Encrypt scoping, and the MP3 Xing offset under a
  * CRC-protected first frame. */
class Round12AdviceSpec extends AnyFunSuite {

  test("coupled channel with unused floor renders SILENCE, partner intact") {
    // stereo, coupled, identical channels; channel 1's floor is marked
    // unused in every packet — the spec (§4.3) renders that channel
    // silent even though coupling propagation decodes residue for it
    val n = 500
    val g: (Int, Int) => Int = (f, _) => if (f % 2 == 0) 256 else -256
    val ogg = writeVorbisPcm(8000, 2, n, g,
      VorbisOpts(coupling = true, unusedFloorCh = 1))
    val (_, ch, fl) = decodePcmF(ogg).getOrElse(fail("decode failed"))
    assert(ch == 2)
    var i = 0
    while (i < n) {
      assert(fl(2 * i + 1) == 0.0, s"ch1 sample $i not silent: ${fl(2 * i + 1)}")
      assert(math.abs(fl(2 * i) - g(i, 0)) < 8.0,
        s"ch0 sample $i drifted: ${fl(2 * i)}")
      i += 1
    }
    // and the same stream with both floors present round-trips both
    val ok = writeVorbisPcm(8000, 2, n, g, VorbisOpts(coupling = true))
    val (_, _, fl2) = decodePcmF(ok).get
    assert((0 until n).forall(i => math.abs(fl2(2 * i + 1) - g(i, 1)) < 8.0))
  }

  test("allocation gate bounds channels × samples, not samples per channel") {
    // 8-channel stream with 33k audio packets: totalN ≈ 8.45M is inside
    // the old per-channel bound (2^26) but the allocation would be
    // channels × totalN doubles ≈ 541 MB — the channel-aware gate must
    // reject it up front, cheaply
    val base = writeVorbisPcm(8000, 8, 200, (f, c) => ((f + c) % 3 - 1) * 64,
      VorbisOpts(residueType = 1))
    val (packets, _) = depacketize(base).get
    assert(packets.length >= 4)
    val serial = 0x764f
    val head = Seq(OggCodec.page(serial, 0, 0L, 0x02, packets(0)),
      OggCodec.page(serial, 1, 0L, 0x00, packets(1)),
      OggCodec.page(serial, 2, 0L, 0x00, packets(2)))
    val nAudio = 33000
    val pageLen = OggCodec.page(serial, 3, 1000L, 0, packets(3)).length
    val out = new java.io.ByteArrayOutputStream(
      head.map(_.length).sum + nAudio * pageLen)
    head.foreach(h => out.write(h, 0, h.length))
    var i = 0
    while (i < nAudio) {
      val flags = if (i == nAudio - 1) 0x04 else 0x00
      val pg = OggCodec.page(serial, 3 + i, 1000L, flags, packets(3))
      out.write(pg, 0, pg.length)
      i += 1
    }
    val big = out.toByteArray
    val t0 = System.nanoTime()
    assert(decodePcmF(big).isEmpty)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(ms < 5000, s"gate took ${ms}ms — did it allocate?")
    // a small 8-channel stream still decodes fine
    val (_, ch, fl) = decodePcmF(base).get
    assert(ch == 8 && fl.length == 200 * 8)
    assert((0 until 200 * 8).forall(i =>
      math.abs(fl(i) - ((i / 8 + i % 8) % 3 - 1) * 64) < 8.0))
  }

  test("xref-stream PDF whose page TEXT mentions /Encrypt is NOT encrypted") {
    val pdf = PdfCodec.writePdfObjStm("1.5", Seq("see /Encrypt spec"))
    val m = PdfCodec.meta(pdf).getOrElse(fail("meta failed"))
    assert(!m.encrypted, "page content flipped the census flag")
    assert(m.nPages == 1)
  }

  test("xref-stream dict carrying /Encrypt IS censused encrypted") {
    val pdf = PdfCodec.writePdfObjStm("1.5", Seq("hello"))
    val iso = java.nio.charset.StandardCharsets.ISO_8859_1
    val s = new String(pdf, iso)
    // splice /Encrypt into the xref stream's own dictionary (after its
    // /Type /XRef key; nothing before the dict moves, so startxref and
    // every xref offset stay valid)
    val at = s.indexOf("/Type /XRef")
    assert(at >= 0)
    val spliced = (s.substring(0, at + 11) + " /Encrypt 99 0 R" +
      s.substring(at + 11)).getBytes(iso)
    val m = PdfCodec.meta(spliced).getOrElse(fail("meta failed"))
    assert(m.encrypted)
    // classic-trailer docs unaffected either way
    assert(PdfCodec.meta(PdfCodec.writePdf("1.4", 2, encrypted = true)).get.encrypted)
    assert(!PdfCodec.meta(PdfCodec.writePdf("1.4", 2, encrypted = false)).get.encrypted)
  }

  test("Xing tag found behind the 2-byte CRC of a protected frame") {
    import Mp3Codec._
    val clean = writeMp3Xing(0, mono = false, frames = 1234)
    // flip the protection bit (0xfb → 0xfa: CRC present) and insert the
    // 16-bit CRC between header and side info
    val prot = clean.take(4).toArray ++ Array[Byte](0, 0) ++ clean.drop(4)
    prot(1) = 0xfa.toByte
    val m = meta(prot).getOrElse(fail("meta failed"))
    assert(m.frames == 1234L, s"Xing missed: frames=${m.frames}")
    assert(m.vbr)
    assert(m.durationMs == 1234L * 1152 * 1000 / 44100)
    // unprotected frame still reads at the unshifted offset
    val m2 = meta(clean).get
    assert(m2.frames == 1234L && m2.vbr)
  }
}
