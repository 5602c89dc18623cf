package graft.functions

/** WebP header census — RIFF container walk for the three frame kinds a
  * crawl actually sees: lossy VP8 (frame tag + start code + 14-bit
  * dims), lossless VP8L (signature byte + packed 14-bit dims), and
  * extended VP8X (24-bit canvas dims). Census-only, same layer as
  * [[IsoBmff.census]]: full VP8 sample decode is a video-codec-sized
  * project, but the census is what the corpus-governance queries need
  * first (format mix, resolution distribution, lossy/lossless split).
  * Hostile input returns None — bounds checked before every read. */
object WebpCodec {

  final case class WebpMeta(variant: String, width: Int, height: Int)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le24(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16)
  private def le32(b: Array[Byte], i: Int): Long =
    le16(b, i).toLong | (le16(b, i + 2).toLong << 16)
  private def tag(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  /** Parse the first frame chunk's kind and dimensions. */
  def meta(b: Array[Byte]): Option[WebpMeta] =
    try {
      if (b.length < 20 || tag(b, 0) != "RIFF" || tag(b, 8) != "WEBP")
        return None
      val riffLen = le32(b, 4)
      if (riffLen < 4L || 8L + riffLen > b.length.toLong) return None
      var i = 12
      while (i + 8 <= b.length) {
        val kind = tag(b, i)
        val len = le32(b, i + 4)
        val from = i + 8
        if (len < 0 || from.toLong + len > b.length.toLong) return None
        kind match {
          case "VP8 " =>
            // 3-byte frame tag, then start code 9D 01 2A, then dims
            if (len < 10) return None
            if (u8(b, from + 3) != 0x9d || u8(b, from + 4) != 0x01 ||
                u8(b, from + 5) != 0x2a) return None
            val w = le16(b, from + 6) & 0x3fff
            val h = le16(b, from + 8) & 0x3fff
            return if (w > 0 && h > 0) Some(WebpMeta("lossy", w, h)) else None
          case "VP8L" =>
            if (len < 5 || u8(b, from) != 0x2f) return None
            val bits = le32(b, from + 1)
            val w = (bits & 0x3fff).toInt + 1
            val h = ((bits >> 14) & 0x3fff).toInt + 1
            return Some(WebpMeta("lossless", w, h))
          case "VP8X" =>
            if (len < 10) return None
            val w = le24(b, from + 4) + 1
            val h = le24(b, from + 7) + 1
            return Some(WebpMeta("extended", w, h))
          case _ =>
            i = from + len.toInt + (len.toInt & 1) // chunks are 2-aligned
        }
      }
      None
    } catch {
      case _: IndexOutOfBoundsException => None
    }

  // ------------------------------------------------------------ writers

  private def le16b(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le24b(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte)
  private def le32b(v: Long): Array[Byte] = le16b((v & 0xffff).toInt) ++
    le16b(((v >> 16) & 0xffff).toInt)

  private def riff(chunkKind: String, payload: Array[Byte]): Array[Byte] = {
    val padded = if (payload.length % 2 == 1) payload :+ 0.toByte else payload
    val chunk = chunkKind.getBytes("US-ASCII") ++ le32b(payload.length.toLong) ++ padded
    "RIFF".getBytes("US-ASCII") ++ le32b(4L + chunk.length) ++
      "WEBP".getBytes("US-ASCII") ++ chunk
  }

  /** Minimal structurally-valid headers for each variant (the census
    * fixture source; payloads beyond the header are stub bytes). */
  def writeLossyHeader(w: Int, h: Int): Array[Byte] =
    riff("VP8 ", Array[Byte](0x10, 0, 0, 0x9d.toByte, 0x01, 0x2a) ++
      le16b(w & 0x3fff) ++ le16b(h & 0x3fff) ++ Array.fill(6)(0.toByte))

  def writeLosslessHeader(w: Int, h: Int): Array[Byte] = {
    val bits = ((w - 1) & 0x3fff).toLong | (((h - 1) & 0x3fff).toLong << 14)
    riff("VP8L", Array(0x2f.toByte) ++ le32b(bits) ++ Array.fill(5)(0.toByte))
  }

  def writeExtendedHeader(w: Int, h: Int): Array[Byte] =
    riff("VP8X", Array.fill(4)(0.toByte) ++ le24b(w - 1) ++ le24b(h - 1))
}
