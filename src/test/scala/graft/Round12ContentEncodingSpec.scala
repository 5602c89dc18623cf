package graft

import graft.ops.Archives
import org.scalatest.funsuite.AnyFunSuite

/** HTTP Content-Encoding dispatch laws: all four codings round-trip,
  * the raw-deflate server quirk falls back, unknown/hostile → None. */
class Round12ContentEncodingSpec extends AnyFunSuite {

  private val payload =
    ("the quick brown fox " * 50).getBytes("UTF-8")

  private def gzip(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(b); gz.close()
    bos.toByteArray
  }

  private def deflate(b: Array[Byte], raw: Boolean): Array[Byte] = {
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, raw)
    d.setInput(b); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
    d.end()
    out.toByteArray
  }

  test("identity, gzip, zlib-deflate, RAW-deflate, and br all decode") {
    def dec(e: String, b: Array[Byte]) =
      Archives.decodeContentEncoding(e, b)
    assert(dec("identity", payload).exists(_.sameElements(payload)))
    assert(dec("", payload).exists(_.sameElements(payload)))
    assert(dec("gzip", gzip(payload)).exists(_.sameElements(payload)))
    assert(dec("x-gzip", gzip(payload)).exists(_.sameElements(payload)))
    assert(dec("deflate", deflate(payload, raw = false))
      .exists(_.sameElements(payload)))
    // the server quirk: raw deflate sent under the deflate token
    assert(dec("deflate", deflate(payload, raw = true))
      .exists(_.sameElements(payload)))
    val f = graft.functions.BrotliCliFixtures.all.head
    assert(dec("br", f.stream).exists(_.length == f.outLen))
  }

  test("unknown codings and hostile payloads refuse, never throw") {
    def dec(e: String, b: Array[Byte]) =
      Archives.decodeContentEncoding(e, b)
    assert(dec("zstd", payload).isEmpty) // not a web coding we ship
    assert(dec("compress", payload).isEmpty)
    assert(dec("gzip", payload).isEmpty) // not gzip bytes
    assert(dec("br", gzip(payload)).isEmpty)
    val g = gzip(payload)
    for (cut <- 0 to g.length by 3) dec("gzip", g.take(cut))
    val z = deflate(payload, raw = false)
    for (cut <- 0 to z.length by 3) dec("deflate", z.take(cut))
    val rnd = new scala.util.Random(6)
    for (_ <- 0 until 300) {
      val junk = Array.fill(rnd.nextInt(100))(rnd.nextInt(256).toByte)
      dec("gzip", junk); dec("deflate", junk); dec("br", junk)
    }
  }
}
