package graft

import graft.functions.Mp3Codec
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 operator laws, starting with the MP3 duration census:
  * Xing/Info frame counts, the CBR size estimate, channel-mode
  * parsing, and the hostile-input never-throw law. */
class Round11OpsSpec extends AnyFunSuite {

  test("Xing frame count drives duration; Info marks CBR") {
    val xing = Mp3Codec.writeMp3Xing(1, mono = false, frames = 480)
    val m = Mp3Codec.meta(xing).get
    assert(m.sampleRate == 48000 && m.channels == 2)
    assert(m.frames == 480 && m.vbr)
    assert(m.durationMs == 480L * 1152 * 1000 / 48000) // 11520 ms
    val info = Mp3Codec.writeMp3Xing(0, mono = true, frames = 77, info = true)
    val mi = Mp3Codec.meta(info).get
    assert(mi.channels == 1 && mi.frames == 77 && !mi.vbr)
    assert(mi.durationMs == 77L * 1152 * 1000 / 44100)
  }

  test("CBR estimate recovers the exact written frame count") {
    for (br <- 1 to 14; sr <- 0 to 2; mono <- Seq(true, false)) {
      val b = Mp3Codec.writeMp3Cbr(br, sr, mono, nFrames = 9)
      val m = Mp3Codec.meta(b).get
      assert(m.frames == 9, s"br=$br sr=$sr mono=$mono")
      assert(!m.vbr)
      assert(m.channels == (if (mono) 1 else 2))
      assert(m.durationMs == 9L * 1152 * 1000 / m.sampleRate)
    }
  }

  test("CBR estimate floors partial trailing frames; ID3 span excluded") {
    val b = Mp3Codec.writeMp3Cbr(9, 0, mono = false, nFrames = 3)
    val truncated = b.take(b.length - 1) // last frame now partial
    assert(Mp3Codec.meta(truncated).get.frames == 2)
    // an ID3 tag in front must not count toward the audio byte span
    val tagged = Mp3Codec.writeId3(Seq(Mp3Codec.Id3Frame("TIT2", "t")),
      padding = 5000) ++ b
    val m = Mp3Codec.meta(tagged).get
    assert(m.frames == 3 && m.id3Size > 5000)
  }

  test("non-V1L3 and hostile inputs keep -1 sentinels, never throw") {
    // stub header fixture (96-byte body): tiny span, frames is a small
    // non-negative estimate, channels parse
    val stub = Mp3Codec.writeMp3Header(9, 0, 0)
    val m = Mp3Codec.meta(stub).get
    assert(m.channels == 2 && m.frames >= 0)
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 300) {
      val junk = Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte)
      Mp3Codec.meta(junk) // must not throw
    }
    val x = Mp3Codec.writeMp3Xing(2, mono = false, frames = 10)
    for (i <- x.indices) {
      val c = x.clone(); c(i) = (c(i) ^ 0x40).toByte
      Mp3Codec.meta(c) // must not throw
    }
  }
}
