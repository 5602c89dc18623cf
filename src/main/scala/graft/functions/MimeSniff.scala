package graft.functions

/** Magic-byte MIME sniffing — the crawl-hygiene primitive behind
  * "route by what the bytes ARE, not what the server said". Declared
  * Content-Type headers are wrong often enough (misconfigured
  * servers, re-encoded assets behind stale CDNs, deliberate evasion)
  * that every ingestion pipeline sniffs before dispatching payloads
  * to format-specific decoders; a JPEG fed to an HTML extractor is
  * garbage shingles, an HTML error page fed to the JPEG decoder is a
  * rejected record that should have been text.
  *
  * Dispatch mirrors the container checks of the format censuses in
  * this repo (PNG/JPEG/GIF/BMP/WebP/TIFF/WAV/FLAC/Ogg/MP3/MP4/PDF/
  * gzip/zip) plus the two text fallbacks (markup → text/html,
  * printable → text/plain); anything else is
  * application/octet-stream. Pure, total (never throws), and reads
  * at most the first few dozen bytes — scan-shaped at any corpus
  * size. */
object MimeSniff {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff

  private def startsWith(b: Array[Byte], at: Int, s: String): Boolean = {
    val bytes = s.getBytes("ISO-8859-1")
    at >= 0 && at + bytes.length <= b.length &&
      bytes.indices.forall(i => b(at + i) == bytes(i))
  }

  def sniff(b: Array[Byte]): String = {
    if (b.length >= 8 && u8(b, 0) == 0x89 && startsWith(b, 1, "PNG\r\n") &&
      u8(b, 6) == 0x1a && u8(b, 7) == 0x0a)
      return "image/png"
    if (b.length >= 3 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8 && u8(b, 2) == 0xff)
      return "image/jpeg"
    if (startsWith(b, 0, "GIF87a") || startsWith(b, 0, "GIF89a"))
      return "image/gif"
    if (startsWith(b, 0, "RIFF") && b.length >= 12) {
      if (startsWith(b, 8, "WEBP")) return "image/webp"
      if (startsWith(b, 8, "WAVE")) return "audio/wav"
      if (startsWith(b, 8, "AVI ")) return "video/x-msvideo"
    }
    if (startsWith(b, 0, "BM") && b.length >= 14) return "image/bmp"
    if ((startsWith(b, 0, "II") && b.length >= 4 && u8(b, 2) == 42 && u8(b, 3) == 0) ||
      (startsWith(b, 0, "MM") && b.length >= 4 && u8(b, 2) == 0 && u8(b, 3) == 42))
      return "image/tiff"
    if (startsWith(b, 0, "fLaC")) return "audio/flac"
    if (startsWith(b, 0, "OggS")) return "audio/ogg"
    if (startsWith(b, 0, "ID3") ||
      (b.length >= 2 && u8(b, 0) == 0xff && (u8(b, 1) & 0xe0) == 0xe0))
      return "audio/mpeg"
    if (b.length >= 12 && startsWith(b, 4, "ftyp")) return "video/mp4"
    if (startsWith(b, 0, "%PDF-")) return "application/pdf"
    if (b.length >= 2 && u8(b, 0) == 0x1f && u8(b, 1) == 0x8b)
      return "application/gzip"
    if (startsWith(b, 0, "PK")) return "application/zip"
    // text fallbacks on a bounded prefix
    val n = math.min(b.length, 256)
    var i = 0
    var printable = b.length > 0
    while (i < n && printable) {
      val c = u8(b, i)
      if (c != 9 && c != 10 && c != 13 && (c < 32 || c > 126)) printable = false
      i += 1
    }
    if (printable) {
      val head = new String(b, 0, n, "ISO-8859-1")
      if (head.dropWhile(_.isWhitespace).startsWith("<")) return "text/html"
      return "text/plain"
    }
    "application/octet-stream"
  }
}
