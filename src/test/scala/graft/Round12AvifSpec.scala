package graft

import graft.functions.IsoBmff
import org.scalatest.funsuite.AnyFunSuite

/** AVIF/HEIF census laws: ispe/pixi/iinf round-trip through the
  * full-box walk, MP4 census does not claim AVIFs and vice versa,
  * hostile inputs never throw. */
class Round12AvifSpec extends AnyFunSuite {

  test("writeAvif round-trips through avifCensus") {
    for ((brand, w, h, d, n) <- Seq(("avif", 320L, 200L, 8, 1),
      ("heic", 4096L, 2160L, 10, 4), ("avis", 17L, 9999L, 12, 2))) {
      val m = IsoBmff.avifCensus(
        IsoBmff.writeAvif(brand, w, h, d, n)).getOrElse(fail(brand))
      assert(m.brand == brand && m.width == w && m.height == h)
      assert(m.depth == d && m.nItems == n)
    }
  }

  test("census layers do not cross-claim") {
    val avif = IsoBmff.writeAvif("avif", 100, 50, 8, 1)
    assert(IsoBmff.census(avif).isEmpty) // no moov/mvhd
    val mp4 = IsoBmff.writeMp4("isom", 1000, 5000, 2, mvhdV1 = false)
    assert(IsoBmff.avifCensus(mp4).isEmpty) // no meta/ispe
  }

  test("hostile inputs never throw") {
    val ok = IsoBmff.writeAvif("avif", 64, 64, 10, 3)
    val rnd = new scala.util.Random(4)
    for (cut <- 0 to ok.length) IsoBmff.avifCensus(ok.take(cut))
    for (_ <- 0 until 500) {
      val c = ok.clone()
      c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
      IsoBmff.avifCensus(c)
    }
    for (_ <- 0 until 200)
      IsoBmff.avifCensus(Array.fill(rnd.nextInt(100))(rnd.nextInt(256).toByte))
  }
}
