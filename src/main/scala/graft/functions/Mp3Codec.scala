package graft.functions

/** MP3 header census — ID3v2 tag walk + first MPEG audio frame header:
  * version/layer, bitrate, sample rate, and the tag size. The
  * compressed-audio twin of the [[IsoBmff]]/[[WebpCodec]] censuses
  * (full MPEG audio decode is out of scope the same way VP8 is): what
  * an audio-corpus governance pass needs first is the format mix, the
  * bitrate distribution, and how much of the byte volume is tag
  * metadata rather than audio. Hostile input returns None. */
object Mp3Codec {

  final case class Mp3Meta(version: String, layer: Int, bitrateKbps: Int,
                           sampleRate: Int, id3Size: Int)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff

  // MPEG1 Layer III bitrate table (kbps) and sample rates, ISO 11172-3
  private val BitratesV1L3 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val SampleRatesV1 = Array(44100, 48000, 32000)

  /** Syncsafe 28-bit size used by ID3v2 (4 × 7 bits, high bit clear). */
  private def syncsafe(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 21) | (u8(b, i + 1) << 14) | (u8(b, i + 2) << 7) | u8(b, i + 3)

  def meta(b: Array[Byte]): Option[Mp3Meta] =
    try {
      var p = 0
      var id3 = 0
      if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
        val size = syncsafe(b, 6)
        if (size < 0 || 10L + size > b.length.toLong) return None
        id3 = 10 + size
        p = id3
      }
      if (p + 4 > b.length) return None
      // frame sync: 11 set bits
      if (u8(b, p) != 0xff || (u8(b, p + 1) & 0xe0) != 0xe0) return None
      val versionBits = (u8(b, p + 1) >> 3) & 3
      val layerBits = (u8(b, p + 1) >> 1) & 3
      val version = versionBits match {
        case 3 => "1"; case 2 => "2"; case 0 => "2.5"; case _ => return None
      }
      val layer = layerBits match {
        case 1 => 3; case 2 => 2; case 3 => 1; case _ => return None
      }
      val brIdx = (u8(b, p + 2) >> 4) & 15
      val srIdx = (u8(b, p + 2) >> 2) & 3
      if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None
      // the census scopes exact tables to the dominant MPEG1 Layer III;
      // other version/layer combinations report their identity with the
      // V1L3 table positions marked invalid (-1)
      val (kbps, sr) =
        if (version == "1" && layer == 3)
          (BitratesV1L3(brIdx), SampleRatesV1(srIdx))
        else (-1, -1)
      Some(Mp3Meta(version, layer, kbps, sr, id3))
    } catch {
      case _: IndexOutOfBoundsException => None
    }

  /** Minimal structurally-valid fixture: optional ID3v2 tag (syncsafe
    * size) + one MPEG1 Layer III frame header + stub frame bytes. */
  def writeMp3Header(bitrateIdx: Int, sampleRateIdx: Int,
                     id3Size: Int): Array[Byte] = {
    require(bitrateIdx >= 1 && bitrateIdx <= 14 &&
      sampleRateIdx >= 0 && sampleRateIdx <= 2 && id3Size >= 0, "bad params")
    val out = new java.io.ByteArrayOutputStream()
    if (id3Size > 0) {
      out.write("ID3".getBytes("US-ASCII"))
      out.write(3); out.write(0); out.write(0)
      out.write((id3Size >> 21) & 0x7f); out.write((id3Size >> 14) & 0x7f)
      out.write((id3Size >> 7) & 0x7f); out.write(id3Size & 0x7f)
      out.write(new Array[Byte](id3Size))
    }
    out.write(0xff); out.write(0xfb) // MPEG1, Layer III, no CRC
    out.write((bitrateIdx << 4) | (sampleRateIdx << 2))
    out.write(0)
    out.write(new Array[Byte](96)) // stub frame body
    out.toByteArray
  }
}
