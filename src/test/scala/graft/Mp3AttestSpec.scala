package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Mp3Layer3.Mp3Huffman
import graft.tools.Mp3Attest

/** Gates on the MP3 big-value attestation harness (round-14 verdict
  * item 2). Hermetic arms exercise the full mechanics with injected
  * decoders; the env-gated arm runs the REAL differential against
  * mpg123 where present (positive: a shipped table's own data
  * attests; negative: a structurally-valid-but-wrong synthetic table
  * is rejected by the reference decoder's output). */
class Mp3AttestSpec extends AnyFunSuite {

  private def synthetic(id: Int, linbits: Int): Mp3Huffman.BvTable = {
    // Kraft-complete 16x16: all 256 symbols at 8 bits — structurally
    // flawless, yet NOT the spec's codes
    val data = (0 until 256).map(i => f"8:$i%x").mkString(",")
    new Mp3Huffman.BvTable(id, 16, 16, linbits, data)
  }

  test("format/parse round trip, wrapping and comments included") {
    val t = synthetic(24, 4)
    val text = "# a comment\n\n" + Mp3Huffman.formatTable(t) +
      "\n\n# trailing\n"
    val back = Mp3Huffman.parseTables(text)
    assert(back.length == 1)
    val b = back.head
    assert(b.id == 24 && b.xlen == 16 && b.ylen == 16 && b.linbits == 4)
    assert(b.lens.toSeq == t.lens.toSeq && b.codes.toSeq == t.codes.toSeq)
  }

  test("parse enforces the construction gates: an under-full candidate " +
    "throws before anything registers") {
    // 2x2 with all lens 2 is Kraft-INcomplete (4 * 2^-2 = 1... actually
    // complete); use 3 entries' worth of space missing: lens {2,2,2,3}
    val bad = "table 11 2 2 0\n2:0,2:1,2:2,3:6"
    intercept[IllegalArgumentException] {
      Mp3Huffman.parseTables(bad)
    }
    assert(Mp3Huffman.resolve(11).isEmpty)
  }

  test("hermetic positive: our own decoder attests a registered " +
    "candidate (mechanics only — not an external attestation)") {
    try {
      val t = synthetic(24, 4)
      val got = Mp3Attest.attest(t,
        bytes => Mp3Layer3.decodePcmF(bytes))
      assert(got.exists(_ >= 0.999), s"self-attest failed: $got")
    } finally Mp3Huffman.clearRegistered()
  }

  test("hermetic negative: a decoder that returns uncorrelated samples " +
    "rejects the candidate") {
    try {
      val t = synthetic(24, 4)
      val rnd = new scala.util.Random(7)
      val got = Mp3Attest.attest(t, _ =>
        Some((44100, 1, Array.fill(8 * 576)(rnd.nextGaussian()))))
      assert(got.isLeft, "uncorrelated PCM must not attest")
      val got2 = Mp3Attest.attest(t, _ => None)
      assert(got2.isLeft, "decoder rejection must not attest")
    } finally Mp3Huffman.clearRegistered()
  }

  test("loadAttested registers tables and the ESC family activates") {
    try {
      val text = Mp3Huffman.formatTable(synthetic(24, 4))
      assert(Mp3Huffman.loadAttested(text) == 1)
      assert(Mp3Huffman.resolve(24).exists(_.linbits == 4))
      // 25-31 share the 24 codes with their own linbits
      assert(Mp3Huffman.resolve(28).exists(_.linbits == 8))
      assert(Mp3Huffman.resolve(13).isEmpty) // unrelated ids still refuse
    } finally Mp3Huffman.clearRegistered()
  }

  test("mpg123 differential: shipped-table data attests, wrong data is " +
    "REJECTED by the reference decoder") {
    val cmd = sys.env.get("GRAFT_MPG123_CMD")
    assume(cmd.isDefined, "set GRAFT_MPG123_CMD to run")
    val ref = Mp3Attest.referenceDecode(cmd.get) _
    try {
      // positive: table 7's own (shipped, spec) data posed as candidate
      val t7 = Mp3Huffman.resolve(7).get
      val again = Mp3Huffman.parseTables(Mp3Huffman.formatTable(t7)).head
      assert(Mp3Attest.attest(again, ref).isRight,
        "spec data must attest against the reference decoder")
      // negative: the synthetic 16x16 under ESC id 24 — structurally
      // valid, but the reference decoder's PCM cannot correlate
      assert(Mp3Attest.attest(synthetic(24, 4), ref).isLeft,
        "wrong codes must fail differential attestation")
    } finally Mp3Huffman.clearRegistered()
  }
}
