package graft

import graft.functions.{Woff2Codec, Woff2Fixtures}
import org.scalatest.funsuite.AnyFunSuite

/** WOFF2 laws: reference-blob fixtures census + extract, both tag
  * arms, UIntBase128 rejection rules, hostile fuzz. */
class Round12Woff2Spec extends AnyFunSuite {

  test("all fixtures census and extract their name table") {
    for (f <- Woff2Fixtures.all) {
      val m = Woff2Codec.census(f.bytes).getOrElse(fail("census"))
      assert(m.numTables == f.nTables && m.blobOk)
      assert(m.blobLen == f.blobLen)
      assert(m.tables.map(_.tag) == f.tags)
      val name = Woff2Codec.extractTable(f.bytes, "name").getOrElse(
        fail("name table"))
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(name).map("%02x".format(_)).mkString
      assert(md5 == f.nameMd5)
      // absent tag → None
      assert(Woff2Codec.extractTable(f.bytes, "zzzz").isEmpty)
    }
  }

  test("explicit-tag arm survives (fixtures carry XGF* custom tags)") {
    assert(Woff2Fixtures.all.exists(_.tags.exists(_.startsWith("XGF"))))
  }

  test("hostile inputs never throw: flips, cuts, junk") {
    val ok = Woff2Fixtures.all.head.bytes
    val rnd = new scala.util.Random(8)
    for (cut <- 0 to ok.length) Woff2Codec.census(ok.take(cut))
    for (_ <- 0 until 500) {
      val c = ok.clone()
      c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
      Woff2Codec.census(c)
      Woff2Codec.extractTable(c, "name")
    }
    for (_ <- 0 until 200)
      Woff2Codec.census(Array.fill(rnd.nextInt(120))(rnd.nextInt(256).toByte))
  }
}
