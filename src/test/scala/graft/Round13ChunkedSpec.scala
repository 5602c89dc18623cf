package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Archives

/** Round-13 HTTP `Transfer-Encoding: chunked` gates (RFC 9112 §7.1):
  * raw-capture WARCs store bodies exactly as sent, so dechunking is
  * the step BEFORE Content-Encoding in the crawl decode path. */
class Round13ChunkedSpec extends AnyFunSuite {

  private def iso(s: String) =
    s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)

  test("writer round trip across sizes, hex cases, extensions, trailers") {
    val rnd = new scala.util.Random(5)
    for (n <- Seq(0, 1, 100, 777, 778, 10000, 100000); seed <- Seq(0L, 1L)) {
      val body = Array.fill(n)(rnd.nextInt(256).toByte)
      val framed = Archives.chunkFrame(body, seed)
      val back = Archives.dechunk(framed)
        .getOrElse(fail(s"n=$n seed=$seed refused"))
      assert(java.util.Arrays.equals(back, body), s"n=$n seed=$seed")
    }
  }

  test("hand-written arms: uppercase hex, extension, trailer, empty body") {
    assert(Archives.dechunk(iso("3\r\nabc\r\n0\r\n\r\n"))
      .map(new String(_, "UTF-8")).contains("abc"))
    assert(Archives.dechunk(iso("A\r\n0123456789\r\n0\r\n\r\n"))
      .map(_.length).contains(10))
    assert(Archives.dechunk(iso("a;name=val\r\n0123456789\r\n0\r\n\r\n"))
      .map(_.length).contains(10))
    assert(Archives.dechunk(iso("0\r\n\r\n")).exists(_.isEmpty))
    // trailer fields after the last chunk are consumed and dropped
    assert(Archives.dechunk(iso("2\r\nhi\r\n0\r\nX-T: 1\r\nY: 2\r\n\r\n"))
      .map(new String(_, "UTF-8")).contains("hi"))
    // truncated capture AFTER a complete 0-chunk line is tolerated
    assert(Archives.dechunk(iso("2\r\nhi\r\n0\r\n"))
      .map(new String(_, "UTF-8")).contains("hi"))
  }

  test("hostile chunked input refuses, never throws") {
    val bad = Seq(
      "",                        // no size line
      "zz\r\nab\r\n0\r\n\r\n",   // non-hex size
      "\r\nab\r\n0\r\n\r\n",     // empty size
      "5\r\nab\r\n0\r\n\r\n",    // chunk longer than data
      "2\r\nabX0\r\n\r\n",       // missing chunk CRLF
      "2\r\nab\r\n",             // truncated before last chunk
      "ffffffff\r\n",            // hostile size (> 7 hex digits)
      "2;" + "e" * 2000 + "\r\nab\r\n0\r\n\r\n") // hostile long line
    bad.foreach { s =>
      assert(Archives.dechunk(iso(s)).isEmpty, s"must refuse: ${s.take(20)}")
    }
    // random flips over a valid framing never throw
    val framed = Archives.chunkFrame(Array.tabulate(5000)(_.toByte), 3L)
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 300) {
      val m = framed.clone()
      m(rnd.nextInt(m.length)) =
        (m(rnd.nextInt(m.length)) ^ (1 << rnd.nextInt(8))).toByte
      Archives.dechunk(m) // Option either way
    }
  }

  test("sha1-base32 payload digest matches the reference coding") {
    // vectors cross-checked against python hashlib + base64.b32encode
    assert(Archives.sha1Base32(Array.emptyByteArray) ==
      "3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ")
    assert(Archives.sha1Base32("abc".getBytes("UTF-8")) ==
      "VGMT4NSHA2AWVOR6EVYXQUGCNSONBWE5")
    assert(Archives.sha1Base32("the quick brown fox".getBytes("UTF-8")) ==
      "Z3LR7JZDKIY35U4D7LH5YQOE3XGCF3HR")
  }

  test("dechunk precedes Content-Encoding: gzip-inside-chunked decodes") {
    val payload = "the quick brown fox".getBytes("UTF-8")
    val gz = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(payload); g.close()
      bo.toByteArray
    }
    val wire = Archives.chunkFrame(gz, 1L)
    val out = Archives.dechunk(wire)
      .flatMap(Archives.decodeContentEncoding("gzip", _))
    assert(out.map(new String(_, "UTF-8")).contains("the quick brown fox"))
  }
}
