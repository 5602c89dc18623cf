package graft.functions

/** MP3 header census — ID3v2 tag walk + first MPEG audio frame header:
  * version/layer, bitrate, sample rate, channel mode, the tag size, and
  * the stream DURATION the way every real tool computes it without
  * decoding: a Xing/Info VBR header's frame count when the first frame
  * carries one, else the CBR estimate `audioBytes / frameSize` (ISO
  * 11172-3 layer-III frame size `144 * bitrate / sampleRate`). The
  * compressed-audio twin of the [[IsoBmff]]/[[WebpCodec]] censuses
  * (full MPEG audio sample decode is out of scope the same way Opus
  * is): what an audio-corpus governance pass needs first is the format
  * mix, the bitrate distribution, the hour volume, and how much of the
  * byte volume is tag metadata. Hostile input returns None. */
object Mp3Codec {

  /** `frames`/`durationMs` are -1 when the stream is not MPEG1 Layer
    * III (the census's exact-table scope) or no estimate is possible;
    * `vbr` is true only when a "Xing" tag was present (an "Info" tag
    * marks a CBR stream that merely carries the frame count). */
  final case class Mp3Meta(version: String, layer: Int, bitrateKbps: Int,
                           sampleRate: Int, id3Size: Int,
                           channels: Int = -1, frames: Long = -1L,
                           durationMs: Long = -1L, vbr: Boolean = false)

  /** Samples per MPEG1 Layer III frame (ISO 11172-3 §2.4.2.1). */
  val SamplesPerFrameV1L3 = 1152

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff

  // MPEG1 Layer III bitrate table (kbps) and sample rates, ISO 11172-3;
  // MPEG-2/2.5 LSF twins from ISO 13818-3
  private val BitratesV1L3 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val SampleRatesV1 = Array(44100, 48000, 32000)
  private val BitratesV2L3 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
  private val SampleRatesV2 = Array(22050, 24000, 16000)
  private val SampleRatesV25 = Array(11025, 12000, 8000)

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
      // exact tables for Layer III in all three MPEG versions (round
      // 13: LSF decodes now, so the census reports it fully); Layer
      // I/II report identity with table positions marked invalid (-1)
      val lsf = versionBits != 3
      val (kbps, sr) =
        if (layer != 3) (-1, -1)
        else if (!lsf) (BitratesV1L3(brIdx), SampleRatesV1(srIdx))
        else (BitratesV2L3(brIdx),
          if (versionBits == 2) SampleRatesV2(srIdx)
          else SampleRatesV25(srIdx))
      // channel mode is version-independent: mode 3 = single channel
      val channels = if (((u8(b, p + 3) >> 6) & 3) == 3) 1 else 2
      var frames = -1L
      var vbr = false
      if (kbps > 0 && sr > 0) {
        // Xing/Info tag sits after the side info (MPEG1: 17 B mono,
        // 32 B stereo; LSF: 9/17); a clear protection bit means a
        // 16-bit CRC sits between header and side info, shifting the
        // tag by 2; flags bit 0 gates the 32-bit frame count
        val crc = if ((u8(b, p + 1) & 1) == 0) 2 else 0
        val sideLen =
          if (lsf) { if (channels == 1) 9 else 17 }
          else { if (channels == 1) 17 else 32 }
        val tagOff = p + 4 + crc + sideLen
        val hasTag = tagOff + 8 <= b.length &&
          ((b(tagOff) == 'X' && b(tagOff + 1) == 'i' &&
            b(tagOff + 2) == 'n' && b(tagOff + 3) == 'g') ||
           (b(tagOff) == 'I' && b(tagOff + 1) == 'n' &&
            b(tagOff + 2) == 'f' && b(tagOff + 3) == 'o'))
        if (hasTag) {
          val flags = (u8(b, tagOff + 4) << 24) | (u8(b, tagOff + 5) << 16) |
            (u8(b, tagOff + 6) << 8) | u8(b, tagOff + 7)
          if ((flags & 1) != 0 && tagOff + 12 <= b.length) {
            frames = ((u8(b, tagOff + 8).toLong << 24) |
              (u8(b, tagOff + 9) << 16) | (u8(b, tagOff + 10) << 8) |
              u8(b, tagOff + 11))
            vbr = b(tagOff) == 'X'
          }
        } else {
          // CBR estimate: whole frames in the post-tag byte span
          val frameSize = (if (lsf) 72000 else 144000) * kbps / sr
          if (frameSize > 0) frames = (b.length - p).toLong / frameSize
        }
      }
      val durationMs =
        if (frames >= 0 && sr > 0)
          frames * (if (lsf) 576L else SamplesPerFrameV1L3) * 1000L / sr
        else -1L
      Some(Mp3Meta(version, layer, kbps, sr, id3, channels, frames,
        durationMs, vbr))
    } catch {
      case _: IndexOutOfBoundsException => None
    }

  // ------------------------------------------------- ID3v2.3 frames
  //
  // The tag body the header census sizes but skips: ID3v2.3 frames are
  // 4-byte id + 4-byte big-endian size (v2.4 uses syncsafe — both
  // accepted on read) + 2 flag bytes + body. Text frames (T***) carry
  // an encoding byte then text; COMM carries encoding + 3-byte
  // language + NUL-terminated description + text. This is where the
  // PII in an audio corpus actually lives (artist names, contact
  // emails in comments, PRIV owner URLs), so the census walks it for
  // real rather than treating the tag as opaque padding.

  final case class Id3Frame(id: String, text: String)

  /** Serialize an ID3v2.3 tag + frames. Text frames use ISO-8859-1
    * (encoding byte 0); COMM gets language "eng" and an empty
    * description. */
  def writeId3(frames: Seq[Id3Frame], padding: Int = 0): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()
    frames.foreach { f =>
      require(f.id.length == 4, s"bad frame id ${f.id}")
      val payload =
        if (f.id == "COMM")
          Array[Byte](0) ++ "eng".getBytes("ISO-8859-1") ++ Array[Byte](0) ++
            f.text.getBytes("ISO-8859-1")
        else if (f.id == "PRIV")
          f.text.getBytes("ISO-8859-1") ++ Array[Byte](0)
        else Array[Byte](0) ++ f.text.getBytes("ISO-8859-1")
      body.write(f.id.getBytes("US-ASCII"))
      val n = payload.length
      body.write((n >> 24) & 0xff); body.write((n >> 16) & 0xff)
      body.write((n >> 8) & 0xff); body.write(n & 0xff)
      body.write(0); body.write(0)
      body.write(payload)
    }
    body.write(new Array[Byte](padding))
    val tag = body.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write("ID3".getBytes("US-ASCII"))
    out.write(3); out.write(0); out.write(0)
    val size = tag.length
    require(size < (1 << 28), "tag too large")
    out.write((size >> 21) & 0x7f); out.write((size >> 14) & 0x7f)
    out.write((size >> 7) & 0x7f); out.write(size & 0x7f)
    out.write(tag)
    out.toByteArray
  }

  /** Walk the ID3v2 tag of an MP3 payload and return its frames
    * (text decoded per frame family). v2.3 plain-BE and v2.4 syncsafe
    * frame sizes are both handled; padding ends the walk; hostile
    * input (truncated frames, sizes past the tag) returns None. */
  def readId3(b: Array[Byte]): Option[Seq[Id3Frame]] =
    try {
      if (b.length < 10 || b(0) != 'I' || b(1) != 'D' || b(2) != '3') return None
      val major = u8(b, 3)
      val tagEnd = 10 + syncsafe(b, 6)
      if (tagEnd > b.length) return None
      val out = Seq.newBuilder[Id3Frame]
      var p = 10
      while (p + 10 <= tagEnd && b(p) != 0) {
        val id = new String(b, p, 4, "US-ASCII")
        if (!id.forall(c => c.isUpper || c.isDigit)) return None
        val size =
          if (major >= 4) syncsafe(b, p + 4)
          else (u8(b, p + 4) << 24) | (u8(b, p + 5) << 16) |
            (u8(b, p + 6) << 8) | u8(b, p + 7)
        if (size < 0 || p + 10 + size > tagEnd) return None
        val body = java.util.Arrays.copyOfRange(b, p + 10, p + 10 + size)
        val text =
          if (id == "COMM" && body.length >= 4) {
            val rest = body.drop(4)
            val nul = rest.indexOf(0: Byte)
            new String(rest.drop(nul + 1), "ISO-8859-1")
          } else if (id == "PRIV") {
            val nul = body.indexOf(0: Byte)
            new String(body, 0, if (nul < 0) body.length else nul, "ISO-8859-1")
          } else if (body.length >= 1 && body(0) == 0)
            new String(body, 1, body.length - 1, "ISO-8859-1")
          else new String(body, "ISO-8859-1")
        out += Id3Frame(id, text)
        p += 10 + size
      }
      Some(out.result())
    } catch {
      case _: IndexOutOfBoundsException => None
      case _: RuntimeException => None
    }

  /** Fixture: a full MP3 payload — real ID3v2.3 tag + one MPEG1
    * Layer III frame header + stub audio bytes. */
  def writeMp3WithId3(frames: Seq[Id3Frame]): Array[Byte] = {
    val tag = writeId3(frames)
    val out = new java.io.ByteArrayOutputStream()
    out.write(tag, 0, tag.length)
    out.write(0xff); out.write(0xfb)
    out.write((9 << 4) | (0 << 2))
    out.write(0)
    out.write(new Array[Byte](96))
    out.toByteArray
  }

  /** Full FRAME WALK — the exact duration path for VBR streams that
    * carry no Xing header (real rips often don't): every frame header
    * is synced and stepped by its OWN bitrate's frame size, so
    * mid-stream bitrate changes count correctly where the single-header
    * CBR estimate in [[meta]] would drift. Returns (frames, durationMs,
    * distinct bitrates seen); stops at the first non-sync byte run
    * (tag padding, truncation). V1L3 scope like the census tables. */
  final case class Mp3Walk(frames: Long, durationMs: Long, nBitrates: Int)

  def frameWalk(b: Array[Byte]): Option[Mp3Walk] =
    try {
      var p = 0
      if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
        val size = syncsafe(b, 6)
        if (size < 0 || 10L + size > b.length.toLong) return None
        p = 10 + size
      }
      var frames = 0L
      var sr0 = -1
      var lsf0 = false
      var sawAny = false
      val rates = scala.collection.mutable.Set[Int]()
      while (p + 4 <= b.length && u8(b, p) == 0xff &&
        (u8(b, p + 1) & 0xe0) == 0xe0) { // Layer III, any MPEG version
        val verBits = (u8(b, p + 1) >> 3) & 3
        val layerBits = (u8(b, p + 1) >> 1) & 3
        if (layerBits != 1 || verBits == 1) return None
        val lsf = verBits != 3 // MPEG-2 / 2.5
        val brIdx = (u8(b, p + 2) >> 4) & 15
        val srIdx = (u8(b, p + 2) >> 2) & 3
        val padding = (u8(b, p + 2) >> 1) & 1
        if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None
        val kbps = if (lsf) BitratesV2L3(brIdx) else BitratesV1L3(brIdx)
        val sr =
          if (verBits == 3) SampleRatesV1(srIdx)
          else if (verBits == 2) SampleRatesV2(srIdx)
          else SampleRatesV25(srIdx)
        if (!sawAny) { sr0 = sr; lsf0 = lsf; sawAny = true }
        else if (sr != sr0 || lsf != lsf0) return None // mixed: out of scope
        rates += kbps
        val frameSize = (if (lsf) 72000 else 144000) * kbps / sr + padding
        if (frameSize <= 4) return None
        frames += 1
        if (frames > (1L << 22)) return None
        p += frameSize
      }
      if (frames == 0) None
      else Some(Mp3Walk(frames,
        frames * (if (lsf0) 576L else SamplesPerFrameV1L3) * 1000L / sr0,
        rates.size))
    } catch {
      case _: IndexOutOfBoundsException => None
    }

  /** Fixture: headerless-VBR stream — `nFrames` whole frames whose
    * bitrate index rotates by `brIdx(f)`, no Xing tag anywhere. */
  def writeMp3Vbr(sampleRateIdx: Int, mono: Boolean, nFrames: Int,
                  brIdx: Int => Int): Array[Byte] = {
    require(sampleRateIdx >= 0 && sampleRateIdx <= 2 && nFrames >= 1,
      "bad params")
    val out = new java.io.ByteArrayOutputStream()
    var f = 0
    while (f < nFrames) {
      val bi = brIdx(f)
      require(bi >= 1 && bi <= 14, s"bad bitrate index $bi")
      val frameSize =
        144000 * BitratesV1L3(bi) / SampleRatesV1(sampleRateIdx)
      out.write(0xff); out.write(0xfb)
      out.write((bi << 4) | (sampleRateIdx << 2))
      out.write(0)
      out.write(new Array[Byte](frameSize - 4))
      f += 1
    }
    out.toByteArray
  }

  /** Fixture: a first MPEG1-L3 frame carrying a Xing (VBR) or Info
    * (CBR) tag with the frame-count field set — the header every
    * VBR-encoded real MP3 carries so players can seek/report duration
    * without a full scan. Bitrate index pinned to 9 (128 kbps). */
  def writeMp3Xing(sampleRateIdx: Int, mono: Boolean, frames: Int,
                   info: Boolean = false): Array[Byte] = {
    require(sampleRateIdx >= 0 && sampleRateIdx <= 2 && frames >= 0, "bad params")
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xfb)
    out.write((9 << 4) | (sampleRateIdx << 2))
    out.write(if (mono) 0xc0 else 0x00)
    out.write(new Array[Byte](if (mono) 17 else 32)) // zero side info
    out.write((if (info) "Info" else "Xing").getBytes("US-ASCII"))
    out.write(0); out.write(0); out.write(0); out.write(1) // flags: FRAMES
    out.write((frames >> 24) & 0xff); out.write((frames >> 16) & 0xff)
    out.write((frames >> 8) & 0xff); out.write(frames & 0xff)
    out.write(new Array[Byte](32)) // stub remainder
    out.toByteArray
  }

  /** Fixture: `nFrames` whole CBR frames (header + zero fill to the
    * ISO frame size `144000 * kbps / sampleRate`), no Xing tag — the
    * shape whose duration only a size estimate can produce. */
  def writeMp3Cbr(bitrateIdx: Int, sampleRateIdx: Int, mono: Boolean,
                  nFrames: Int): Array[Byte] = {
    require(bitrateIdx >= 1 && bitrateIdx <= 14 &&
      sampleRateIdx >= 0 && sampleRateIdx <= 2 && nFrames >= 1, "bad params")
    val frameSize =
      144000 * BitratesV1L3(bitrateIdx) / SampleRatesV1(sampleRateIdx)
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < nFrames) {
      out.write(0xff); out.write(0xfb)
      out.write((bitrateIdx << 4) | (sampleRateIdx << 2))
      out.write(if (mono) 0xc0 else 0x00)
      out.write(new Array[Byte](frameSize - 4))
      i += 1
    }
    out.toByteArray
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
