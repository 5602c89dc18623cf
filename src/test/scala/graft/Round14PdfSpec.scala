package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Round-14 PDF: supplied-password decryption — ISO 32000-1
  * Algorithms 6/7 (RC4 V1/V2, AESV2) and ISO 32000-2 Algorithm 2.A
  * user+owner branches (AESV3) — plus wrong-password refusal fuzz.
  * The empty-user-password majority path is round-13 scope; these
  * gates cover documents that are actually locked. */
class Round14PdfSpec extends AnyFunSuite {

  private val texts = Seq("locked page alpha", "locked page beta")

  private def allHandlers(user: String): Seq[(String, Array[Byte])] = Seq(
    "rc4-r2" -> PdfCodec.writePdfEncryptedText("1.4", texts, "own3r",
      2, 40, flate = false, userPwd = user),
    "rc4-r3" -> PdfCodec.writePdfEncryptedText("1.4", texts, "own3r",
      3, 128, flate = true, userPwd = user),
    "aesv2" -> PdfCodec.writePdfEncryptedAes("1.6", texts, "own3r",
      v5 = false, flate = false, userPwd = user),
    "aesv3" -> PdfCodec.writePdfEncryptedAes("1.7", texts, "own3r",
      v5 = true, flate = true, userPwd = user))

  test("non-empty user password: empty-password path refuses, the " +
    "supplied list opens — all four handler generations") {
    for ((tag, pdf) <- allHandlers("s3cret!")) {
      assert(PdfCodec.decryptPdf(pdf).isEmpty, s"$tag: empty pwd opened")
      assert(PdfCodec.encryptMeta(pdf).exists(!_.emptyUserPwd),
        s"$tag: census must report locked")
      val got = PdfCodec.extractTextEncrypted(pdf,
        Seq("wrong", "s3cret!", "also-wrong")).getOrElse(
        fail(s"$tag: correct password refused"))
      assert(got == texts, s"$tag: $got")
    }
  }

  test("owner password opens a user-locked document (Algorithm 7 / " +
    "2.A owner branch) — all four handler generations") {
    for ((tag, pdf) <- allHandlers("user-pwd-not-supplied")) {
      val got = PdfCodec.extractTextEncrypted(pdf, Seq("own3r"))
        .getOrElse(fail(s"$tag: owner password refused"))
      assert(got == texts, s"$tag: $got")
    }
  }

  test("empty-user-password docs still open with and without a list " +
    "(back-compat; list path tries empty first)") {
    for ((tag, pdf) <- allHandlers("")) {
      assert(PdfCodec.extractTextEncrypted(pdf).contains(texts), tag)
      assert(PdfCodec.extractTextEncrypted(pdf, Seq("junk")).contains(texts),
        s"$tag: empty-first ordering broken")
    }
  }

  test("wrong-password fuzz: no random candidate ever authenticates") {
    val rnd = new scala.util.Random(1409)
    for ((tag, pdf) <- allHandlers("hunter2")) {
      val candidates = (0 until 25).map(_ =>
        rnd.alphanumeric.take(1 + rnd.nextInt(20)).mkString)
        .filterNot(_ == "hunter2")
      assert(PdfCodec.decryptPdf(pdf, candidates).isEmpty,
        s"$tag: a wrong password authenticated")
    }
  }

  test("forged /U refuses even when the right password is supplied") {
    for ((tag, pdf) <- allHandlers("hunter2")) {
      val s = new String(pdf, java.nio.charset.StandardCharsets.ISO_8859_1)
      val at = s.indexOf("/U <")
      assert(at > 0, tag)
      val b = pdf.clone()
      // flip a hex digit inside the /U entry value
      val h = at + 4
      b(h) = (if (b(h) == '0') '1' else '0').toByte
      assert(PdfCodec.decryptPdf(b, Seq("hunter2", "own3r")).isEmpty,
        s"$tag: forged /U authenticated")
    }
  }

  test("V5 passwords truncate to 127 UTF-8 bytes per Algorithm 2.A") {
    val long = "x" * 200
    val pdf = PdfCodec.writePdfEncryptedAes("1.7", texts, "own3r",
      v5 = true, flate = false, userPwd = long)
    // the 127-byte prefix IS the effective password...
    assert(PdfCodec.extractTextEncrypted(pdf, Seq("x" * 127))
      .contains(texts))
    // ...and the over-long original authenticates identically
    assert(PdfCodec.extractTextEncrypted(pdf, Seq(long)).contains(texts))
    // a 126-byte prefix is a DIFFERENT password
    assert(PdfCodec.decryptPdf(pdf, Seq("x" * 126)).isEmpty)
  }
}
