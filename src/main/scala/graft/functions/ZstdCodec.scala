package graft.functions

/** Zstandard FRAME layer (RFC 8878 §3) — the compression wrapper
  * modern data pipelines ship everything in. Two scopes, both
  * entropy-free by design:
  *
  *  - [[census]] parses any zstd frame's header and block structure
  *    (magic, frame-header descriptor, window/single-segment, dict
  *    id, frame content size, block census by type) — works on REAL
  *    compressed frames too, since block headers are plain 3-byte
  *    little-endian records even when block payloads are
  *    FSE/Huffman-coded.
  *  - [[extract]] decodes frames whose blocks are all Raw or RLE
  *    (RFC 8878 §3.1.1.2.2 types 0 and 1) — the shapes
  *    `--no-compress` tooling and small-payload fast paths emit.
  *    Frames containing Compressed blocks return None (entropy
  *    decoding is out of scope the same way VP8 lossy is), routing to
  *    the rejects channel instead of failing the task.
  *
  * [[writeFrame]] emits conformant single-segment frames from
  * raw/RLE parts (validated against the reference `zstd` CLI during
  * development); the fixture queries build on it so the oracle can
  * predict extracted content by formula.
  */
object ZstdCodec {

  final case class ZstdMeta(singleSegment: Boolean, dictId: Long,
                            contentSize: Long, nBlocks: Int, nRaw: Int,
                            nRle: Int, nCompressed: Int)

  private val Magic = Array(0x28, 0xb5, 0x2f, 0xfd).map(_.toByte)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def leN(b: Array[Byte], i: Int, n: Int): Long = {
    var v = 0L
    var k = 0
    while (k < n) { v |= (b(i + k) & 0xffL) << (8 * k); k += 1 }
    v
  }

  /** One raw/RLE part of a frame body. */
  sealed trait Part
  final case class RawPart(data: Array[Byte]) extends Part
  final case class RlePart(byte: Byte, count: Int) extends Part

  /** Write a single-segment zstd frame whose blocks are the given
    * parts verbatim (block sizes are bounded at 1 MiB by parts'
    * construction; RFC caps block size at min(window, 128 KiB) — the
    * fixtures stay far below it). */
  def writeFrame(parts: Seq[Part]): Array[Byte] = {
    require(parts.nonEmpty, "empty frame")
    val contentSize = parts.map {
      case RawPart(d) => d.length.toLong
      case RlePart(_, n) => n.toLong
    }.sum
    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic, 0, 4)
    // frame-header descriptor: single-segment, no checksum, no dict;
    // FCS field size by value (§3.1.1.1.1: flag 0 + single segment →
    // 1 byte, flag 1 → 2 bytes (value-256), flag 2 → 4 bytes)
    if (contentSize < 256) {
      out.write(0x20) // FCS flag 0 | single_segment
      out.write(contentSize.toInt)
    } else if (contentSize < 65536 + 256) {
      out.write(0x60) // FCS flag 1 | single_segment
      val v = contentSize - 256
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
    } else {
      out.write(0xa0) // FCS flag 2 | single_segment
      var v = contentSize
      for (_ <- 0 until 4) { out.write((v & 0xff).toInt); v >>= 8 }
    }
    parts.zipWithIndex.foreach { case (p, i) =>
      val last = if (i == parts.size - 1) 1 else 0
      val (typ, size) = p match {
        case RawPart(d) => (0, d.length)
        case RlePart(_, n) => (1, n)
      }
      val hdr = last | (typ << 1) | (size << 3)
      out.write(hdr & 0xff); out.write((hdr >> 8) & 0xff)
      out.write((hdr >> 16) & 0xff)
      p match {
        case RawPart(d) => out.write(d, 0, d.length)
        case RlePart(b, _) => out.write(b)
      }
    }
    out.toByteArray
  }

  /** Walk block headers, returning (meta, payloadOffsets) — shared by
    * census and extract. None on malformed structure; sizes validated
    * in Long space. */
  private def walk(b: Array[Byte]): Option[(ZstdMeta, Seq[(Int, Int, Int)])] = {
    if (b.length < 6 || !b.take(4).sameElements(Magic)) return None
    val fhd = u8(b, 4)
    val fcsFlag = fhd >> 6
    val singleSegment = (fhd & 0x20) != 0
    val checksum = (fhd & 0x04) != 0
    val didFlag = fhd & 0x03
    var p = 5
    if (!singleSegment) p += 1 // window descriptor
    val didSize = Array(0, 1, 2, 4)(didFlag)
    if (p + didSize > b.length) return None
    val dictId = leN(b, p, didSize)
    p += didSize
    val fcsSize = fcsFlag match {
      case 0 => if (singleSegment) 1 else 0
      case 1 => 2
      case 2 => 4
      case _ => 8
    }
    if (p + fcsSize > b.length) return None
    val contentSize = fcsSize match {
      case 0 => -1L
      case 2 => leN(b, p, 2) + 256
      case n => leN(b, p, n)
    }
    p += fcsSize
    val blocks = Seq.newBuilder[(Int, Int, Int)]
    var nBlocks = 0; var nRaw = 0; var nRle = 0; var nComp = 0
    var last = false
    while (!last) {
      if (p + 3 > b.length) return None
      val hdr = leN(b, p, 3)
      last = (hdr & 1) != 0
      val typ = ((hdr >> 1) & 3).toInt
      val size = (hdr >> 3).toInt
      if (typ == 3) return None // reserved
      val stored = if (typ == 1) 1 else size
      if (p + 3L + stored > b.length) return None
      blocks += ((typ, p + 3, size))
      nBlocks += 1
      typ match {
        case 0 => nRaw += 1
        case 1 => nRle += 1
        case _ => nComp += 1
      }
      p += 3 + stored
    }
    if (checksum && p + 4 > b.length) return None
    Some((ZstdMeta(singleSegment, dictId, contentSize, nBlocks, nRaw,
      nRle, nComp), blocks.result()))
  }

  def census(b: Array[Byte]): Option[ZstdMeta] =
    try walk(b).map(_._1)
    catch { case _: IndexOutOfBoundsException => None }

  /** Decode a frame whose blocks are all Raw/RLE; None if any block
    * is entropy-coded or the content size disagrees with the blocks. */
  def extract(b: Array[Byte]): Option[Array[Byte]] =
    try {
      walk(b).flatMap { case (meta, blocks) =>
        if (meta.nCompressed > 0) return None
        val out = new java.io.ByteArrayOutputStream()
        blocks.foreach { case (typ, off, size) =>
          if (typ == 0) out.write(b, off, size)
          else {
            val v = b(off)
            var i = 0
            while (i < size) { out.write(v); i += 1 }
          }
        }
        val r = out.toByteArray
        if (meta.contentSize >= 0 && meta.contentSize != r.length) None
        else Some(r)
      }
    } catch { case _: IndexOutOfBoundsException => None }
}
