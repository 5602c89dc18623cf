package graft

import graft.functions.{Vp8lCodec, WebpCodec}
import graft.functions.WebpCodec.AnmfSpec
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 animated-WebP frame walk + compositor: offsets in 2-pixel
  * units, alpha blending, dispose-to-background, and the
  * hostile-container rejects (out-of-bounds rects, truncated
  * sub-chunks). */
class Round12WebpSpec extends AnyFunSuite {

  private def solid(w: Int, h: Int, argb: Int): Array[Byte] = {
    val payload = Vp8lCodec.encode(w, h, Array.fill(w * h)(argb))
    val padded = if (payload.length % 2 == 1) payload :+ 0.toByte else payload
    "VP8L".getBytes("US-ASCII") ++
      Array((payload.length & 0xff).toByte,
        ((payload.length >> 8) & 0xff).toByte,
        ((payload.length >> 16) & 0xff).toByte,
        ((payload.length >> 24) & 0xff).toByte) ++ padded
  }

  test("frame walk returns rects, durations, and both flag bits") {
    val anim = WebpCodec.writeAnimatedFrames(16, 8, 2, 0xff102030L, Seq(
      AnmfSpec(0, 0, 16, 8, 100, noBlend = true, disposeBg = false,
        solid(16, 8, 0xff0000ff)),
      AnmfSpec(4, 2, 6, 4, 50, noBlend = false, disposeBg = true,
        solid(6, 4, 0x80ff0000))))
    val (cw, ch, bg, frames) = WebpCodec.animFrames(anim).get
    assert(cw == 16 && ch == 8)
    assert(bg == 0xff102030) // stream bytes 30 20 10 ff = B,G,R,A
    assert(frames.length == 2)
    assert(frames(0).x == 0 && frames(0).w == 16 && frames(0).noBlend)
    assert(!frames(0).disposeBg && frames(0).durationMs == 100)
    assert(frames(1).x == 4 && frames(1).y == 2 && frames(1).w == 6)
    assert(!frames(1).noBlend && frames(1).disposeBg)
    assert(frames.forall(_.kind == "VP8L"))
  }

  test("compositor: overwrite, src-over blend, dispose-to-background") {
    val base = 0xff404040
    val anim = WebpCodec.writeAnimatedFrames(8, 8, 0, 0xff0000ffL, Seq(
      AnmfSpec(0, 0, 8, 8, 10, noBlend = true, disposeBg = false,
        solid(8, 8, base)),
      // half-alpha white patch at (2,2): blends toward white
      AnmfSpec(2, 2, 2, 2, 10, noBlend = false, disposeBg = true,
        solid(2, 2, 0x80ffffff)),
      // full-canvas final frame
      AnmfSpec(0, 0, 8, 8, 10, noBlend = true, disposeBg = false,
        solid(8, 8, 0xff101010))))
    val snaps = WebpCodec.compositeFrames(anim).get
    assert(snaps.length == 3)
    // snapshot 0: uniform base
    assert(snaps(0)._2.forall(_ == base))
    // snapshot 1: blended patch at (2,2); src-over of 0x80ffffff over
    // 0xff404040: a=255, c = (255·128 + 64·255·127/255)/255
    val blended = snaps(1)._2(2 * 8 + 2)
    val expC = math.rint((255.0 * 128 + 64.0 * 255 * 127 / 255) / 255).toInt
    assert(blended == (0xff000000 | (expC << 16) | (expC << 8) | expC),
      f"got $blended%08x want ${0xff000000 | (expC << 16) | (expC << 8) | expC}%08x")
    assert(snaps(1)._2(0) == base) // outside the rect untouched
    // snapshot 2 overwrote everything (including the disposed rect)
    assert(snaps(2)._2.forall(_ == 0xff101010))
    // the dispose actually happened between snapshots: re-run with the
    // final frame a small corner rect so the disposed area shows
    val anim2 = WebpCodec.writeAnimatedFrames(8, 8, 0, 0xff0000ffL, Seq(
      AnmfSpec(0, 0, 8, 8, 10, noBlend = true, disposeBg = false,
        solid(8, 8, base)),
      AnmfSpec(2, 2, 2, 2, 10, noBlend = true, disposeBg = true,
        solid(2, 2, 0xffffffff)),
      AnmfSpec(0, 0, 2, 2, 10, noBlend = true, disposeBg = false,
        solid(2, 2, 0xff101010))))
    val snaps2 = WebpCodec.compositeFrames(anim2).get
    // background 0xff0000ff = opaque blue in ARGB
    assert(snaps2(2)._2(2 * 8 + 2) == 0xff0000ff, "disposed rect shows bg")
    assert(snaps2(2)._2(7 * 8 + 7) == base, "untouched area keeps frame 0")
  }

  test("blending same-color pixels is integer-exact at any alpha") {
    for (a <- Seq(0, 1, 64, 128, 200, 254, 255); g <- Seq(8, 100, 248)) {
      val src = (a << 24) | (g << 16) | (g << 8) | g
      val dst = 0xff000000 | (g << 16) | (g << 8) | g
      val out = WebpCodec.blendSrcOver(src, dst)
      assert(out == dst, f"a=$a g=$g: $out%08x")
    }
  }

  test("hostile containers reject: out-of-bounds rect, truncated chunk") {
    val ok = WebpCodec.writeAnimatedFrames(8, 8, 0, 0L, Seq(
      AnmfSpec(0, 0, 8, 8, 10, noBlend = true, disposeBg = false,
        solid(8, 8, 0xff000000))))
    assert(WebpCodec.compositeFrames(ok).isDefined)
    // rect past the canvas: width 8 at x=2
    val oob = WebpCodec.writeAnimatedFrames(16, 8, 0, 0L, Seq(
      AnmfSpec(0, 0, 16, 8, 10, noBlend = true, disposeBg = false,
        solid(16, 8, 0xff000000)))).clone()
    // patch the VP8X canvas down to 8 wide so the frame overflows
    val vp8xAt = 12 + 8
    oob(vp8xAt + 4) = 7 // canvasW-1
    assert(WebpCodec.animFrames(oob).isEmpty)
    // truncations and bit flips never throw
    val rnd = new scala.util.Random(5)
    for (cut <- 0 to ok.length by 7) WebpCodec.compositeFrames(ok.take(cut))
    for (_ <- 0 until 300) {
      val c = ok.clone()
      val at = rnd.nextInt(c.length)
      c(at) = (c(at) ^ (1 << rnd.nextInt(8))).toByte
      WebpCodec.compositeFrames(c)
      WebpCodec.animFrames(c)
    }
  }

  test("frame-size mismatch between ANMF rect and payload rejects") {
    val anim = WebpCodec.writeAnimatedFrames(8, 8, 0, 0L, Seq(
      AnmfSpec(0, 0, 4, 4, 10, noBlend = true, disposeBg = false,
        solid(8, 8, 0xff000000)))) // payload is 8×8, rect says 4×4
    assert(WebpCodec.compositeFrames(anim).isEmpty)
  }
}
