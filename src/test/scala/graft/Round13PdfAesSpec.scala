package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.PdfCodec._

/** Round-13 encrypted-PDF AES gates: AESV2 (V4/R4, AES-128-CBC with
  * per-object "sAlT" keys) and AESV3 (V5/R6, AES-256 with the SHA-2
  * hardened hash) through the SAME extraction stack as RC4 —
  * empty-user-password auth, in-place stream decrypt (space-filled
  * tails), then the normal text walk. The hardened hash and the CBC
  * framing are implemented once from ISO 32000-1/-2 and exercised
  * symmetrically (writer + reader); the external cross-check is the
  * env-gated poppler arm in InteropSmokeSpec. */
class Round13PdfAesSpec extends AnyFunSuite {

  private val texts = Seq("aes locked page one official",
    "aes locked page two official")

  test("AESV2 (V4/R4): census, auth, and extraction through decrypt") {
    for (flate <- Seq(false, true)) {
      val pdf = writePdfEncryptedAes("1.6", texts, "owner-v4", v5 = false,
        flate = flate)
      val m = encryptMeta(pdf).getOrElse(fail("no encrypt meta"))
      assert(m.v == 4 && m.r == 4 && m.lengthBits == 128 && m.standard)
      assert(m.emptyUserPwd, "empty user password must authenticate")
      // the plaintext must NOT be reachable without decryption
      val raw = new String(pdf, java.nio.charset.StandardCharsets.ISO_8859_1)
      assert(!raw.contains("aes locked page"))
      val pages = extractTextEncrypted(pdf).getOrElse(fail("refused"))
      assert(pages.size == 2)
      assert(pages.zip(texts).forall { case (p, t) => p.contains(t) },
        s"flate=$flate pages=$pages")
    }
  }

  test("AESV3 (V5/R6): census, hardened-hash auth, extraction") {
    for (flate <- Seq(false, true)) {
      val pdf = writePdfEncryptedAes("1.7", texts, "owner-v5", v5 = true,
        flate = flate)
      val m = encryptMeta(pdf).getOrElse(fail("no encrypt meta"))
      assert(m.v == 5 && m.r == 6 && m.lengthBits == 256 && m.standard)
      assert(m.emptyUserPwd)
      val raw = new String(pdf, java.nio.charset.StandardCharsets.ISO_8859_1)
      assert(!raw.contains("aes locked page"))
      val pages = extractTextEncrypted(pdf).getOrElse(fail("refused"))
      assert(pages.size == 2 &&
        pages.zip(texts).forall { case (p, t) => p.contains(t) })
    }
  }

  test("hardened hash (2.B): deterministic, 32 bytes, salt-sensitive") {
    val e = Array.emptyByteArray
    val s1 = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)
    val h1 = hashR6(e, s1, e)
    assert(h1.length == 32)
    assert(java.util.Arrays.equals(h1, hashR6(e, s1, e)))
    assert(!java.util.Arrays.equals(h1,
      hashR6(e, s1.map(b => (b + 1).toByte), e)))
    assert(!java.util.Arrays.equals(h1, hashR6("x".getBytes, s1, e)))
  }

  test("forged /U refuses for both AES generations") {
    for (v5 <- Seq(false, true)) {
      val pdf = writePdfEncryptedAes("1.6", texts, "o", v5 = v5)
      val s = new String(pdf, java.nio.charset.StandardCharsets.ISO_8859_1)
      val uAt = s.lastIndexOf("/U <")
      val forged = pdf.clone()
      // flip one hex digit inside the authenticating half of /U
      forged(uAt + 6) =
        (if (forged(uAt + 6) == '0') '1' else '0').toByte
      assert(encryptMeta(forged).exists(!_.emptyUserPwd), s"v5=$v5 meta")
      assert(decryptPdf(forged).isEmpty, s"v5=$v5 must refuse")
    }
  }

  test("corrupted ciphertext refuses, never yields garbage text") {
    val pdf = writePdfEncryptedAes("1.6", Seq("aes locked single"), "o",
      v5 = false)
    val s = new String(pdf, java.nio.charset.StandardCharsets.ISO_8859_1)
    val ds = s.indexOf("stream\n") + 7
    // truncate the stream to a non-multiple of 16: structural refusal
    val bad = pdf.clone()
    bad(ds + 20) = 0x7 // corrupt a ciphertext byte: padding may survive
    val out = extractTextEncrypted(bad)
    assert(out.forall(_.forall(!_.contains("aes locked"))),
      "corrupted block must not decrypt to the plaintext")
  }

  test("an unknown /CFM refuses") {
    val pdf = writePdfEncryptedAes("1.6", texts, "o", v5 = false)
    val s = new String(pdf, java.nio.charset.StandardCharsets.ISO_8859_1)
    val swapped = s.replace("/CFM /AESV2", "/CFM /AESXX")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(decryptPdf(swapped).isEmpty)
    assert(encryptMeta(swapped).exists(!_.emptyUserPwd))
  }

  test("hostile fuzz: random bit flips over AES documents never throw") {
    val pdf = writePdfEncryptedAes("1.7", texts, "o", v5 = true)
    val rnd = new scala.util.Random(31)
    for (_ <- 0 until 200) {
      val m = pdf.clone()
      m(rnd.nextInt(m.length)) =
        (m(rnd.nextInt(m.length)) ^ (1 << rnd.nextInt(8))).toByte
      extractTextEncrypted(m) // Option either way
      encryptMeta(m)
    }
  }
}
