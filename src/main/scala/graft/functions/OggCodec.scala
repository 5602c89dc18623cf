package graft.functions

/** Ogg container census — `OggS` page walk (version-0 page headers,
  * segment tables, granule positions per RFC 3533) plus the embedded
  * codec's identification header on the first (BOS) page: Vorbis
  * (`\x01vorbis`: channels, sample rate) or Opus (`OpusHead`:
  * channels, input sample rate). The streamed-audio twin of
  * [[FlacCodec]]/[[Mp3Codec]]: page count and final granule position
  * (total PCM samples for audio streams) are the volume readout, the
  * codec id the transcode-routing one. Page CRCs are verified with the
  * real Ogg CRC-32 (0x04c11db7, unreflected, zero init — the writer
  * stamps them, so corrupt fixtures fail honestly). Hostile input
  * returns None. */
object OggCodec {

  final case class OggMeta(codec: String, channels: Int, sampleRate: Int,
                           nPages: Int, lastGranule: Long, preSkip: Int) {
    /** Stream duration from the final granule position — the census
      * readout that needs NO packet decode: Vorbis granules count PCM
      * samples at the stream rate; Opus granules are ALWAYS 48 kHz
      * ticks and start after the OpusHead pre-skip. */
    def durationMs: Long = codec match {
      case "opus" => math.max(lastGranule - preSkip, 0L) * 1000L / 48000L
      case _ => if (sampleRate > 0) lastGranule * 1000L / sampleRate else -1L
    }
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong) | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  private def le64(b: Array[Byte], i: Int): Long =
    le32(b, i) | (le32(b, i + 4) << 32)

  /** Ogg's CRC-32: polynomial 0x04c11db7, no reflection, init 0, no
    * final xor — NOT the zlib CRC (which reflects both ends). */
  private val CrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var r = i << 24
      var k = 0
      while (k < 8) {
        r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04c11db7 else r << 1
        k += 1
      }
      t(i) = r
      i += 1
    }
    t
  }

  private def crc(b: Array[Byte], from: Int, until: Int,
                  zeroAt: Int): Int = {
    var r = 0
    var i = from
    while (i < until) {
      val v = if (i >= zeroAt && i < zeroAt + 4) 0 else u8(b, i)
      r = (r << 8) ^ CrcTable(((r >>> 24) ^ v) & 0xff)
      i += 1
    }
    r
  }

  /** CRC gate for one page span, shared with [[VorbisCodec]]'s
    * depacketizer. */
  private[functions] def pageCrcCheck(b: Array[Byte], from: Int,
                                      until: Int): Boolean =
    crc(b, from, until, from + 22) == le32(b, from + 22).toInt

  def meta(b: Array[Byte]): Option[OggMeta] =
    try {
      var p = 0
      var nPages = 0
      var lastGranule = 0L
      var id: Option[(String, Int, Int, Int)] = None
      while (p + 27 <= b.length) {
        if (b(p) != 'O' || b(p + 1) != 'g' || b(p + 2) != 'g' ||
          b(p + 3) != 'S' || u8(b, p + 4) != 0) return None
        val granule = le64(b, p + 6)
        val nSegs = u8(b, p + 26)
        if (p + 27 + nSegs > b.length) return None
        var payloadLen = 0
        var s = 0
        while (s < nSegs) { payloadLen += u8(b, p + 27 + s); s += 1 }
        val dataAt = p + 27 + nSegs
        if (dataAt.toLong + payloadLen > b.length.toLong) return None
        if (crc(b, p, dataAt + payloadLen, p + 22) != le32(b, p + 22).toInt)
          return None
        if (nPages == 0) {
          // BOS payload: the codec identification header
          if (payloadLen >= 30 && u8(b, dataAt) == 1 &&
            new String(b, dataAt + 1, 6, "US-ASCII") == "vorbis") {
            id = Some(("vorbis", u8(b, dataAt + 11),
              le32(b, dataAt + 12).toInt, 0))
          } else if (payloadLen >= 19 &&
            new String(b, dataAt, 8, "US-ASCII") == "OpusHead") {
            // bytes 10-11: pre-skip, in 48 kHz samples
            id = Some(("opus", u8(b, dataAt + 9),
              le32(b, dataAt + 12).toInt,
              u8(b, dataAt + 10) | (u8(b, dataAt + 11) << 8)))
          } else return None
        }
        nPages += 1
        lastGranule = granule
        p = dataAt + payloadLen
      }
      if (p != b.length || nPages == 0) return None
      id.map { case (codec, ch, sr, ps) =>
        OggMeta(codec, ch, sr, nPages, lastGranule, ps)
      }
    } catch {
      case _: IndexOutOfBoundsException => None
    }

  /** VorbisComment / OpusTags extraction: the comment header packet
    * (second packet: `vorbis` or `OpusTags` magic) parsed into
    * (vendor, key=value fields) — where audio PII lives (ARTIST,
    * contact email in COMMENT). Only single-page comment headers are
    * parsed (fixture and typical real files; cover-art-sized headers
    * spanning pages return None and route to rejects). */
  def comments(b: Array[Byte]): Option[(String, Seq[(String, String)])] =
    try {
      // page walk to the second page's payload
      var p = 0
      var pageIdx = 0
      while (p + 27 <= b.length && pageIdx < 2) {
        if (b(p) != 'O' || b(p + 1) != 'g' || b(p + 2) != 'g' ||
          b(p + 3) != 'S' || u8(b, p + 4) != 0) return None
        val nSegs = u8(b, p + 26)
        if (p + 27 + nSegs > b.length) return None
        var payloadLen = 0
        var s = 0
        while (s < nSegs) { payloadLen += u8(b, p + 27 + s); s += 1 }
        val dataAt = p + 27 + nSegs
        if (dataAt.toLong + payloadLen > b.length.toLong) return None
        if (crc(b, p, dataAt + payloadLen, p + 22) != le32(b, p + 22).toInt)
          return None
        if (pageIdx == 1) {
          // comment packet: magic, vendor, field list
          var q = dataAt
          val end = dataAt + payloadLen
          if (q + 8 <= end &&
            new String(b, q, 8, "US-ASCII") == "OpusTags") q += 8
          else if (q + 7 <= end && u8(b, q) == 3 &&
            new String(b, q + 1, 6, "US-ASCII") == "vorbis") q += 7
          else return None
          if (q + 4 > end) return None
          val vlen = le32(b, q).toInt; q += 4
          if (vlen < 0 || q + vlen > end) return None
          val vendor = new String(b, q, vlen, "UTF-8"); q += vlen
          if (q + 4 > end) return None
          val n = le32(b, q).toInt; q += 4
          if (n < 0 || n > 1024) return None
          val fields = scala.collection.mutable.ArrayBuffer[(String, String)]()
          var i = 0
          while (i < n) {
            if (q + 4 > end) return None
            val flen = le32(b, q).toInt; q += 4
            if (flen < 0 || q + flen > end) return None
            val f = new String(b, q, flen, "UTF-8"); q += flen
            val eq = f.indexOf('=')
            if (eq <= 0) return None
            fields += ((f.substring(0, eq).toUpperCase(java.util.Locale.ROOT),
              f.substring(eq + 1)))
            i += 1
          }
          return Some((vendor, fields.toSeq))
        }
        pageIdx += 1
        p = dataAt + payloadLen
      }
      None
    } catch {
      case _: IndexOutOfBoundsException => None
    }

  /** Serialize a comment header packet body. */
  private[functions] def commentPacket(codec: String, vendor: String,
                                       fields: Seq[(String, String)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le32w(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    if (codec == "opus") out.write("OpusTags".getBytes("US-ASCII"))
    else { out.write(3); out.write("vorbis".getBytes("US-ASCII")) }
    val vb = vendor.getBytes("UTF-8")
    le32w(vb.length); out.write(vb, 0, vb.length)
    le32w(fields.size)
    fields.foreach { case (k, v) =>
      val fb = s"$k=$v".getBytes("UTF-8")
      le32w(fb.length); out.write(fb, 0, fb.length)
    }
    if (codec != "opus") out.write(1) // vorbis framing bit
    out.toByteArray
  }

  private[functions] def page(serial: Int, seq: Int, granule: Long,
                              headerType: Int,
                              payload: Array[Byte]): Array[Byte] = {
    require(payload.length < 255 * 255, "fixture payload too large")
    val nSegs = payload.length / 255 + 1
    val out = new Array[Byte](27 + nSegs + payload.length)
    out(0) = 'O'; out(1) = 'g'; out(2) = 'g'; out(3) = 'S'
    out(4) = 0; out(5) = headerType.toByte
    var g = granule
    for (i <- 0 until 8) { out(6 + i) = (g & 0xff).toByte; g >>>= 8 }
    var v = serial
    for (i <- 0 until 4) { out(14 + i) = (v & 0xff).toByte; v >>>= 8 }
    v = seq
    for (i <- 0 until 4) { out(18 + i) = (v & 0xff).toByte; v >>>= 8 }
    out(26) = nSegs.toByte
    var rem = payload.length
    for (s <- 0 until nSegs) {
      out(27 + s) = math.min(rem, 255).toByte; rem -= 255
    }
    System.arraycopy(payload, 0, out, 27 + nSegs, payload.length)
    val c = crc(out, 0, out.length, 22)
    for (i <- 0 until 4) out(22 + i) = ((c >>> (8 * i)) & 0xff).toByte
    out
  }

  /** Structurally-valid fixture stream: a BOS page carrying the codec
    * identification header (Vorbis or Opus), `nAudioPages` stub audio
    * pages with monotone granules ending at `totalSamples`, EOS flag on
    * the last. Real CRCs throughout. */
  def writeOgg(codec: String, channels: Int, sampleRate: Int,
               nAudioPages: Int, totalSamples: Long,
               preSkip: Int = 0,
               tags: Seq[(String, String)] = Nil,
               vendor: String = "graft"): Array[Byte] = {
    require(channels >= 1 && channels <= 8 && sampleRate > 0 &&
      nAudioPages >= 1 && totalSamples >= nAudioPages &&
      preSkip >= 0 && preSkip <= 0xffff, "bad params")
    val idHeader = codec match {
      case "vorbis" =>
        val h = new Array[Byte](30)
        h(0) = 1
        System.arraycopy("vorbis".getBytes("US-ASCII"), 0, h, 1, 6)
        // 4-byte version 0, then channels, LE sample rate
        h(11) = channels.toByte
        var v = sampleRate
        for (i <- 0 until 4) { h(12 + i) = (v & 0xff).toByte; v >>>= 8 }
        h(29) = 1 // framing bit
        h
      case "opus" =>
        val h = new Array[Byte](19)
        System.arraycopy("OpusHead".getBytes("US-ASCII"), 0, h, 0, 8)
        h(8) = 1 // version
        h(9) = channels.toByte
        h(10) = (preSkip & 0xff).toByte // pre-skip, 48 kHz samples, LE
        h(11) = ((preSkip >> 8) & 0xff).toByte
        var v = sampleRate // input sample rate (informational)
        for (i <- 0 until 4) { h(12 + i) = (v & 0xff).toByte; v >>>= 8 }
        h
      case other => throw new IllegalArgumentException(s"codec $other")
    }
    val serial = 0x6772 // arbitrary fixed stream serial
    val out = new java.io.ByteArrayOutputStream()
    out.write(page(serial, 0, 0L, 0x02, idHeader)) // BOS
    var seq = 1
    if (tags.nonEmpty) {
      out.write(page(serial, seq, 0L, 0x00,
        commentPacket(codec, vendor, tags)))
      seq += 1
    }
    for (k <- 1 to nAudioPages) {
      val granule = totalSamples * k / nAudioPages
      val flags = if (k == nAudioPages) 0x04 else 0x00 // EOS on last
      out.write(page(serial, seq, granule, flags, Array[Byte](0)))
      seq += 1
    }
    out.toByteArray
  }
}
