package graft.functions

/** WOFF2 web-font census + table extraction (W3C WOFF File Format
  * 2.0) — the biggest consumer of brotli on the web besides HTTP
  * bodies. Shipped scope: the 48-byte header, the table directory
  * (known-tag indices and the 0x3f explicit-tag arm, UIntBase128
  * lengths with the spec's rejection rules), reference-brotli blob
  * decompression via [[BrotliCodec]], and extraction of UNTRANSFORMED
  * tables (glyf/loca/hmtx transform reconstruction is out of scope —
  * the census reports the transform version so a pipeline can route
  * those; extraction of a transformed table returns None honestly).
  * TTC collections (flavor 'ttcf') are censused but not exploded.
  * The known-tag order is the spec's Table 1 (vendored; fixtures
  * exercise both arms, so a wrong entry cannot pass). Hostile input
  * returns None. */
object Woff2Codec {

  /** Spec Table 1: tag for directory indices 0..62 (63 = explicit). */
  val KnownTags: Array[String] = Array(
    "cmap", "head", "hhea", "hmtx", "maxp", "name", "OS/2", "post",
    "cvt ", "fpgm", "glyf", "loca", "prep", "CFF ", "VORG", "EBDT",
    "EBLC", "gasp", "hdmx", "kern", "LTSH", "PCLT", "VDMX", "vhea",
    "vmtx", "BASE", "GDEF", "GPOS", "GSUB", "EBSC", "JSTF", "MATH",
    "CBDT", "CBLC", "COLR", "CPAL", "SVG ", "sbix", "acnt", "avar",
    "bdat", "bloc", "bsln", "cvar", "fdsc", "feat", "fmtx", "fvar",
    "gvar", "hsty", "just", "lcar", "mort", "morx", "opbd", "prop",
    "trak", "Zapf", "Silf", "Glat", "Gloc", "Feat", "Sill")

  private def u16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def u32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  /** UIntBase128 (spec §5.2): ≤ 5 bytes, no leading 0x80 byte, must
    * not overflow 2^32-1. Returns (value, bytesConsumed) or null. */
  private def uintBase128(b: Array[Byte], at: Int): (Long, Int) = {
    var v = 0L
    var i = 0
    while (i < 5) {
      if (at + i >= b.length) return null
      val byte = b(at + i) & 0xff
      if (i == 0 && byte == 0x80) return null // leading zero forbidden
      if ((v & 0xfe000000L) != 0) return null // would overflow 32 bits
      v = (v << 7) | (byte & 0x7f)
      if ((byte & 0x80) == 0) return (v, i + 1)
      i += 1
    }
    null // 6th byte would follow
  }

  final case class Woff2Table(tag: String, transform: Int,
                              origLength: Long, storedLength: Long)
  final case class Woff2Meta(flavor: String, numTables: Int,
                             totalSfntSize: Long, tables: Seq[Woff2Table],
                             blobOk: Boolean, blobLen: Long)

  private def parse(b: Array[Byte])
      : Option[(Woff2Meta, Array[Byte])] = {
    try {
      if (b.length < 48 || !(b(0) == 'w' && b(1) == 'O' && b(2) == 'F' &&
        b(3) == '2')) return None
      val flavor = new String(b, 4, 4, "ISO-8859-1")
      val numTables = u16(b, 12)
      val totalSfnt = u32(b, 16)
      val compressedSize = u32(b, 20)
      if (numTables <= 0 || numTables > 4096) return None
      var p = 48
      val tables = Seq.newBuilder[Woff2Table]
      var sumStored = 0L
      var i = 0
      while (i < numTables) {
        if (p >= b.length) return None
        val flags = b(p) & 0xff
        p += 1
        val tagIdx = flags & 0x3f
        val preTransform = flags >>> 6
        val tag =
          if (tagIdx == 0x3f) {
            if (p + 4 > b.length) return None
            val t = new String(b, p, 4, "ISO-8859-1")
            p += 4
            t
          } else KnownTags(tagIdx)
        // spec §5.3: for glyf/loca version 3 is the null transform and
        // 0 is transformed; for other tables 0 is null
        val isGlyfLoca = tag == "glyf" || tag == "loca"
        val transformed =
          if (isGlyfLoca) preTransform != 3
          else preTransform != 0
        val orig = uintBase128(b, p) match {
          case null => return None
          case (v, n) => p += n; v
        }
        val stored =
          if (transformed) uintBase128(b, p) match {
            case null => return None
            case (v, n) => p += n; v
          }
          else orig
        if (stored < 0 || sumStored + stored > (1L << 26)) return None
        sumStored += stored
        tables += Woff2Table(tag, preTransform, orig, stored)
        i += 1
      }
      if (p.toLong + compressedSize > b.length.toLong) return None
      val blob = BrotliCodec.decode(
        java.util.Arrays.copyOfRange(b, p, p + compressedSize.toInt))
      val ts = tables.result()
      val ok = blob.exists(_.length.toLong == sumStored)
      Some((Woff2Meta(flavor, numTables, totalSfnt, ts, ok, sumStored),
        blob.orNull))
    } catch {
      case _: IndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
  }

  /** Census: flavor, table inventory with transform versions and
    * lengths, whether the brotli blob decompresses to the directory's
    * exact stored-length sum. */
  def census(b: Array[Byte]): Option[Woff2Meta] = parse(b).map(_._1)

  /** Extract one UNTRANSFORMED table's bytes (directory order gives
    * each table's slice of the decompressed blob). None for transformed
    * tables, absent tags, or a blob that does not decompress. */
  def extractTable(b: Array[Byte], tag: String): Option[Array[Byte]] =
    parse(b).flatMap { case (meta, blob) =>
      if (blob == null || !meta.blobOk) None
      else {
        var off = 0L
        meta.tables.foreach { t =>
          if (t.tag == tag) {
            val isGlyfLoca = t.tag == "glyf" || t.tag == "loca"
            val transformed =
              if (isGlyfLoca) t.transform != 3 else t.transform != 0
            return if (transformed) None
            else Some(java.util.Arrays.copyOfRange(blob, off.toInt,
              (off + t.storedLength).toInt))
          }
          off += t.storedLength
        }
        None
      }
    }
}
