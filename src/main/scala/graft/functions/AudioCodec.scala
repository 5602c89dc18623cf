package graft.functions

/** Pure-JVM WAV/RIFF codec — the audio half of the real byte-level
  * multimodal decode (companion to [[ImageCodec]]). Parses the RIFF
  * chunk list to the `fmt ` and `data` chunks and reports the stream
  * parameters every audio pipeline keys on (sample rate, channels, bit
  * depth, sample count, duration); writes real PCM WAV containers so
  * distributed queries can synthesize genuine payloads deterministically.
  * Cross-validated both directions against `javax.sound.sampled` in the
  * spec.
  */
object AudioCodec {

  /** Decoded stream parameters. `durationMs` is integer milliseconds,
    * floor((nSamples*1000)/sampleRate) — exact integer arithmetic so the
    * SQL oracle reproduces it bit-for-bit. */
  final case class AudioMeta(format: String, sampleRate: Int, channels: Int,
                             bitsPerSample: Int, nSamples: Long,
                             durationMs: Long)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
    ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  /** Walk the RIFF chunk list for `fmt ` and `data`. Returns None on
    * anything that is not a well-formed PCM WAV — callers route those to
    * a rejects side-channel. The walk treats chunk sizes as UNSIGNED and
    * advances through a Long cursor, so a hostile size field (e.g.
    * 0xFFFFFFF8, which as a signed int would step the cursor by zero or
    * backwards) terminates the loop instead of spinning a task forever. */
  def decode(b: Array[Byte]): Option[AudioMeta] =
    try {
      if (b.length < 44 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
      var i = 12L
      var rate = 0; var ch = 0; var bits = 0; var dataLen = -1L
      while (i + 8 <= b.length) {
        val at = i.toInt
        val id = tag(b, at); val size = le32(b, at + 4).toLong & 0xffffffffL
        id match {
          case "fmt " =>
            if (le16(b, at + 8) != 1) return None // PCM only
            ch = le16(b, at + 10); rate = le32(b, at + 12); bits = le16(b, at + 22)
          case "data" => dataLen = math.min(size, (b.length - i - 8).toLong)
          case _ => ()
        }
        i += 8L + size + (size & 1L) // chunks are word-aligned; always > i
      }
      val block = ch * bits / 8
      if (rate <= 0 || ch <= 0 || bits <= 0 || block <= 0 || dataLen < 0) None
      else {
        val n = dataLen / block
        Some(AudioMeta("wav", rate, ch, bits, n, n * 1000L / rate))
      }
    } catch { case _: IndexOutOfBoundsException => None }

  /** Write a real PCM WAV container: canonical 44-byte header + 16-bit
    * little-endian samples from `sample(i, channel)`. */
  def writeWav(sampleRate: Int, channels: Int, nSamples: Int,
               sample: (Int, Int) => Short): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && nSamples >= 0)
    val bits = 16
    val block = channels * bits / 8
    val dataLen = nSamples * block
    val out = new Array[Byte](44 + dataLen)
    def putTag(i: Int, s: String): Unit =
      System.arraycopy(s.getBytes("US-ASCII"), 0, out, i, 4)
    def putLe16(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >>> 8).toByte
    }
    def putLe32(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >>> 8).toByte
      out(i + 2) = (v >>> 16).toByte; out(i + 3) = (v >>> 24).toByte
    }
    putTag(0, "RIFF"); putLe32(4, 36 + dataLen); putTag(8, "WAVE")
    putTag(12, "fmt "); putLe32(16, 16); putLe16(20, 1)
    putLe16(22, channels); putLe32(24, sampleRate)
    putLe32(28, sampleRate * block); putLe16(32, block); putLe16(34, bits)
    putTag(36, "data"); putLe32(40, dataLen)
    var s = 0
    while (s < nSamples) {
      var c = 0
      while (c < channels) {
        putLe16(44 + s * block + c * 2, sample(s, c).toInt & 0xffff)
        c += 1
      }
      s += 1
    }
    out
  }

  // ------------------------------------------------ sample-level layer

  /** Decoded PCM stream: interleaved frame-major 16-bit samples. */
  final case class AudioSamples(sampleRate: Int, channels: Int,
                                samples: Array[Short])

  /** REAL sample decode for 16-bit PCM WAV: the same hardened RIFF walk
    * as [[decode]], plus the little-endian sample payload itself. */
  def decodeSamples(b: Array[Byte]): Option[AudioSamples] =
    try {
      if (b.length < 44 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
      var i = 12L
      var rate = 0; var ch = 0; var bits = 0
      var dataAt = -1; var dataLen = -1L
      while (i + 8 <= b.length) {
        val at = i.toInt
        val id = tag(b, at); val size = le32(b, at + 4).toLong & 0xffffffffL
        id match {
          case "fmt " =>
            if (le16(b, at + 8) != 1) return None
            ch = le16(b, at + 10); rate = le32(b, at + 12); bits = le16(b, at + 22)
          case "data" =>
            dataAt = at + 8
            dataLen = math.min(size, (b.length - i - 8).toLong)
          case _ => ()
        }
        i += 8L + size + (size & 1L)
      }
      if (rate <= 0 || ch <= 0 || bits != 16 || dataAt < 0 || dataLen < 0)
        return None
      val n = (dataLen / 2L).toInt
      val out = new Array[Short](n)
      var s = 0
      while (s < n) {
        out(s) = le16(b, dataAt + 2 * s).toShort
        s += 1
      }
      Some(AudioSamples(rate, ch, out))
    } catch { case _: IndexOutOfBoundsException => None }

  /** 8-window mean-absolute-amplitude profile in UNIT TIME: window w
    * sums |sample| over the frames in `[w·n/8, (w+1)·n/8)` across ALL
    * channels. Channel-summing makes a mono→stereo re-layout scale the
    * whole profile uniformly (×2), and a uniform gain change scales it
    * too — both erased by [[normalizeProfile]]. */
  def energyProfile8(a: AudioSamples): Array[Long] = {
    val frames = a.samples.length / a.channels
    val e = new Array[Long](8)
    var f = 0
    while (f < frames) {
      val w = (f.toLong * 8 / frames).toInt
      var c = 0
      while (c < a.channels) {
        e(w) += math.abs(a.samples(f * a.channels + c).toLong)
        c += 1
      }
      f += 1
    }
    e
  }

  /** Scale-invariant integer normalization: `p_w = e_w·10⁶ div max(e)`.
    * Exactly invariant under any uniform rational rescale of the profile
    * (floor((k·e)·10⁶ / (k·m)) = floor(e·10⁶ / m)); all-silence → all
    * zeros. */
  def normalizeProfile(e: Array[Long]): Array[Long] = {
    val m = e.max
    if (m == 0L) new Array[Long](8) else e.map(x => x * 1000000L / m)
  }
}
