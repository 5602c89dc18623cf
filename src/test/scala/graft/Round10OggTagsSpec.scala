package graft

import graft.functions.OggCodec

/** VorbisComment / OpusTags laws: round-trip for both codecs, key
  * case folding, UTF-8 values, CRC-gated pages, untagged streams and
  * hostile input rejecting as None. */
class Round10OggTagsSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("tags round-trip for both codecs, keys fold to upper case") {
    for (codec <- Seq("vorbis", "opus")) {
      val tags = Seq("ARTIST" -> "Ann Artist", "title" -> "Tr=ack α",
        "COMMENT" -> "contact a@b.c")
      val ogg = OggCodec.writeOgg(codec, 2, 48000, 2, 100, tags = tags)
      val (vendor, got) = OggCodec.comments(ogg).get
      assert(vendor == "graft")
      assert(got == Seq("ARTIST" -> "Ann Artist", "TITLE" -> "Tr=ack α",
        "COMMENT" -> "contact a@b.c"))
      // meta still parses the tagged stream (extra page counted)
      val m = OggCodec.meta(ogg).get
      assert(m.codec == codec && m.nPages == 4)
    }
  }

  test("untagged streams, truncation, and bit flips reject, never throw") {
    val plain = OggCodec.writeOgg("vorbis", 1, 44100, 1, 50)
    assert(OggCodec.comments(plain).isEmpty, "audio stub is not a comment header")
    val tagged = OggCodec.writeOgg("opus", 1, 48000, 1, 50,
      tags = Seq("ARTIST" -> "x"))
    assert(OggCodec.comments(tagged).isDefined)
    for (cut <- Seq(3, 20, tagged.length / 2))
      OggCodec.comments(tagged.take(cut))
    // the real law: a flip either rejects (CRC) or — when it lands in
    // a page comments() never reads (the audio stub) — leaves the
    // parsed tags EXACTLY intact; silent corruption never happens
    val want = OggCodec.comments(tagged).get
    val rnd = new scala.util.Random(2024)
    var rejected = 0
    for (_ <- 1 to 300) {
      val f = tagged.clone()
      val i = rnd.nextInt(f.length)
      f(i) = (f(i) ^ (1 << rnd.nextInt(8))).toByte
      OggCodec.comments(f) match {
        case None => rejected += 1
        case Some(got) => assert(got == want, s"silent corruption at byte $i")
      }
    }
    assert(rejected >= 200, s"CRC gate too weak: only $rejected/300 rejected")
  }
}
