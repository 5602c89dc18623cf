package graft.functions

/** ICO (favicon) container walk — the last common crawl image
  * container without a census: an ICONDIR header indexes 1–N entries,
  * each entry naming its raster dims (0 encodes 256) and pointing at
  * either a BMP fragment or a whole PNG payload. The census reads the
  * directory and sniffs each payload's magic — no raster decode —
  * so it stays metadata-cheap like the other container walks.
  * Hostile-input contract: entry offsets/sizes validated in Long
  * space against the byte length; malformed structure returns None.
  */
object IcoCodec {

  final case class IcoMeta(nEntries: Int, maxW: Int, maxH: Int, nPng: Int)

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def isPng(b: Array[Byte], off: Int): Boolean =
    off + 8 <= b.length && (b(off) & 0xff) == 0x89 && b(off + 1) == 'P' &&
      b(off + 2) == 'N' && b(off + 3) == 'G'

  def census(b: Array[Byte]): Option[IcoMeta] =
    try {
      if (b.length < 6 || u16(b, 0) != 0 || u16(b, 2) != 1) return None
      val n = u16(b, 4)
      if (n == 0 || 6L + 16L * n > b.length.toLong) return None
      var maxW = 0
      var maxH = 0
      var nPng = 0
      var e = 0
      while (e < n) {
        val p = 6 + 16 * e
        val w0 = b(p) & 0xff
        val h0 = b(p + 1) & 0xff
        val w = if (w0 == 0) 256 else w0
        val h = if (h0 == 0) 256 else h0
        val size = u32(b, p + 8)
        val off = u32(b, p + 12)
        if (size < 0 || off < 0 || off + size > b.length.toLong) return None
        if (w > maxW) maxW = w
        if (h > maxH) maxH = h
        if (isPng(b, off.toInt)) nPng += 1
        e += 1
      }
      Some(IcoMeta(n, maxW, maxH, nPng))
    } catch {
      case _: IndexOutOfBoundsException => None
    }

  /** Assemble an ICO from (width, height, payload) entries — payloads
    * are whole PNG files or BMP fragments, verbatim. Width/height 256
    * encode as 0 per the format. */
  def writeIco(entries: Seq[(Int, Int, Array[Byte])]): Array[Byte] = {
    require(entries.nonEmpty && entries.forall { case (w, h, _) =>
      w >= 1 && w <= 256 && h >= 1 && h <= 256
    }, "bad entries")
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    w16(0); w16(1); w16(entries.size)
    var off = 6L + 16L * entries.size
    entries.foreach { case (w, h, payload) =>
      out.write(if (w == 256) 0 else w)
      out.write(if (h == 256) 0 else h)
      out.write(0); out.write(0)
      w16(1); w16(32)
      w32(payload.length.toLong)
      w32(off)
      off += payload.length
    }
    entries.foreach { case (_, _, payload) => out.write(payload, 0, payload.length) }
    out.toByteArray
  }
}
