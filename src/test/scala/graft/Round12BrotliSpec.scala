package graft.functions


import org.scalatest.funsuite.AnyFunSuite

/** Brotli decoder conformance: every reference-encoder stream decodes
  * byte-exact (lengths + md5), the base/extra tables telescope, the
  * dictionary blob is the canonical one, transforms behave, and
  * hostile inputs never throw. */
class Round12BrotliSpec extends AnyFunSuite {

  private def md5(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(b).map("%02x".format(_)).mkString

  test("all reference-encoded fixtures decode byte-exact") {
    for (f <- BrotliCliFixtures.all) {
      val out = BrotliCodec.decode(f.stream).getOrElse(
        fail(s"${f.name}: decode failed"))
      assert(out.length == f.outLen, s"${f.name}: len ${out.length}")
      assert(md5(out) == f.outMd5, s"${f.name}: md5 mismatch")
    }
    info(s"${BrotliCliFixtures.all.length} reference streams byte-exact")
  }

  test("insert/copy/block-length tables telescope (base[i+1]=base[i]+2^extra)") {
    for ((base, extra) <- BrotliCodec.tables; i <- 0 until base.length - 1)
      assert(base(i + 1) == base(i) + (1 << extra(i)), s"at $i")
  }

  test("dictionary blob is the canonical public one") {
    assert(BrotliData.dictionary.length == 122784)
    assert(md5(BrotliData.dictionary) == "96cecd2ee7a666d5aa3627d74735b32a")
    assert(BrotliData.transforms.length == 363)
    assert(BrotliData.prefixSuffix.length == 217)
    assert(BrotliData.contextLookup.length == 2048)
    assert(BrotliData.dictOffsets(4) == 0 &&
      BrotliData.dictOffsets(5) == 4 << 10)
  }

  test("word transforms: identity, omit, uppercase (incl. UTF-8 rule)") {
    def t(w: String, tid: Int): String =
      new String(BrotliCodec.transformWord(w.getBytes("ISO-8859-1"), tid),
        "ISO-8859-1")
    assert(t("word", 0) == "word")
    assert(t("word", 1) == "word ") // identity + " "
    // transform 9 is "" UppercaseFirst "" in the RFC list
    assert(BrotliCodec.transformWord("word".getBytes, 9).head == 'W'.toByte)
  }

  test("fuzz: junk, truncations, and bit flips never throw") {
    val rnd = new scala.util.Random(2)
    val s = BrotliCliFixtures.all(1).stream
    for (cut <- 0 to s.length) BrotliCodec.decode(s.take(cut))
    for (_ <- 0 until 2000) {
      val c = s.clone()
      val at = rnd.nextInt(c.length)
      c(at) = (c(at) ^ (1 << rnd.nextInt(8))).toByte
      BrotliCodec.decode(c)
    }
    for (_ <- 0 until 500)
      BrotliCodec.decode(Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte))
  }
}
