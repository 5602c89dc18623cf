package graft.functions

/** FLAC header census — `fLaC` magic, metadata block walk, and the
  * mandatory STREAMINFO block (sample rate, channels, bits per sample,
  * total samples), per the public FLAC format spec (RFC 9639). The
  * lossless-audio twin of [[Mp3Codec]]'s census: full subframe decode
  * is out of scope the same way MPEG audio synthesis is — what an
  * audio-corpus governance pass needs first is the rate/precision mix
  * for transcode budgeting and whether a VORBIS_COMMENT block (tag
  * metadata, the PII surface) is present. Hostile input returns None. */
object FlacCodec {

  final case class FlacMeta(sampleRate: Int, channels: Int,
                            bitsPerSample: Int, totalSamples: Long,
                            hasTags: Boolean, nBlocks: Int)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff

  def meta(b: Array[Byte]): Option[FlacMeta] =
    try {
      if (b.length < 4 + 4 + 34) return None
      if (b(0) != 'f' || b(1) != 'L' || b(2) != 'a' || b(3) != 'C') return None
      var p = 4
      var streaminfo: Option[(Int, Int, Int, Long)] = None
      var hasTags = false
      var nBlocks = 0
      var last = false
      while (!last) {
        if (p + 4 > b.length) return None
        val head = u8(b, p)
        last = (head & 0x80) != 0
        val btype = head & 0x7f
        val len = (u8(b, p + 1) << 16) | (u8(b, p + 2) << 8) | u8(b, p + 3)
        p += 4
        if (p.toLong + len > b.length.toLong) return None
        if (btype == 0) {
          // STREAMINFO: 34 bytes; rate/channels/bps/total packed after
          // the block- and frame-size ranges (RFC 9639 §8.2)
          if (len < 34) return None
          val sr = (u8(b, p + 10) << 12) | (u8(b, p + 11) << 4) |
            (u8(b, p + 12) >> 4)
          val ch = ((u8(b, p + 12) >> 1) & 7) + 1
          val bps = (((u8(b, p + 12) & 1) << 4) | (u8(b, p + 13) >> 4)) + 1
          val total = ((u8(b, p + 13) & 0xf).toLong << 32) |
            (u8(b, p + 14).toLong << 24) | (u8(b, p + 15).toLong << 16) |
            (u8(b, p + 16).toLong << 8) | u8(b, p + 17).toLong
          if (sr == 0) return None // 0 is invalid for audio streams
          streaminfo = Some((sr, ch, bps, total))
        } else if (btype == 4) hasTags = true
        else if (btype == 127) return None // forbidden value
        nBlocks += 1
        p += len
      }
      streaminfo.map { case (sr, ch, bps, total) =>
        FlacMeta(sr, ch, bps, total, hasTags, nBlocks)
      }
    } catch {
      case _: IndexOutOfBoundsException => None
    }

  /** Structurally-valid fixture: `fLaC` + STREAMINFO (+ optional
    * VORBIS_COMMENT with one tag + PADDING), no audio frames — the
    * census never reads past the metadata chain. */
  def writeFlacHeader(sampleRate: Int, channels: Int, bitsPerSample: Int,
                      totalSamples: Long, tags: Boolean): Array[Byte] = {
    require(sampleRate > 0 && sampleRate < (1 << 20) &&
      channels >= 1 && channels <= 8 &&
      bitsPerSample >= 4 && bitsPerSample <= 32 &&
      totalSamples >= 0 && totalSamples < (1L << 36), "bad params")
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    def block(btype: Int, last: Boolean, body: Array[Byte]): Unit = {
      out.write((if (last) 0x80 else 0) | btype)
      out.write((body.length >> 16) & 0xff)
      out.write((body.length >> 8) & 0xff)
      out.write(body.length & 0xff)
      out.write(body)
    }
    val si = new Array[Byte](34)
    def be16(i: Int, v: Int): Unit = {
      si(i) = (v >> 8).toByte; si(i + 1) = v.toByte
    }
    be16(0, 1024); be16(2, 1024) // min/max block size (fixed-size stream)
    // min/max frame size 0 = unknown (bytes 4..9 stay zero)
    si(10) = (sampleRate >> 12).toByte
    si(11) = ((sampleRate >> 4) & 0xff).toByte
    si(12) = (((sampleRate & 0xf) << 4) | ((channels - 1) << 1) |
      ((bitsPerSample - 1) >> 4)).toByte
    si(13) = ((((bitsPerSample - 1) & 0xf) << 4) |
      ((totalSamples >> 32) & 0xf).toInt).toByte
    si(14) = ((totalSamples >> 24) & 0xff).toByte
    si(15) = ((totalSamples >> 16) & 0xff).toByte
    si(16) = ((totalSamples >> 8) & 0xff).toByte
    si(17) = (totalSamples & 0xff).toByte
    // MD5 of the unencoded audio: zero = unknown (bytes 18..33)
    block(0, last = !tags, si)
    if (tags) {
      // VORBIS_COMMENT: LE vendor-length + vendor + LE tag count + tags
      val vc = new java.io.ByteArrayOutputStream()
      def le32(v: Int): Unit = {
        vc.write(v & 0xff); vc.write((v >> 8) & 0xff)
        vc.write((v >> 16) & 0xff); vc.write((v >> 24) & 0xff)
      }
      val vendor = "graft".getBytes("UTF-8")
      le32(vendor.length); vc.write(vendor)
      val tag = "TITLE=fixture".getBytes("UTF-8")
      le32(1); le32(tag.length); vc.write(tag)
      block(4, last = false, vc.toByteArray)
      block(1, last = true, new Array[Byte](16)) // PADDING
    }
    out.toByteArray
  }
}
