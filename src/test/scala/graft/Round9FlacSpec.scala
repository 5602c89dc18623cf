package graft

import graft.functions.{AudioCodec, FlacCodec}
import graft.functions.FlacCodec.FlacOpts

/** FLAC sample-layer laws. The codec memory rule: exact round-trip over
  * a MATRIX of option flags × dims FIRST (that is what catches the
  * encoder/decoder desync classes cheaply), then the targeted paths
  * (wasted bits, escape partitions, mid/side parity), the CRC gates,
  * and the never-throw fuzz surface. */
class Round9FlacSpec extends SparkSpec {

  private def pcm(seed: Long, channels: Int, n: Int): Array[Array[Short]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(channels)(Array.fill(n)((rnd.nextInt(65536) - 32768).toShort))
  }

  private def roundTrip(channels: Int, n: Int, opts: FlacOpts,
                        seed: Long): Unit = {
    val src = pcm(seed, channels, n)
    val bytes = FlacCodec.writeFlacPcm(44100, channels, n,
      (s, c) => src(c)(s), opts)
    val dec = FlacCodec.decodePcm(bytes).getOrElse(
      fail(s"decode failed: ch=$channels n=$n opts=$opts"))
    assert(dec.sampleRate == 44100 && dec.channels == channels &&
      dec.bitsPerSample == 16)
    assert(dec.samples.length == n * channels)
    var s = 0
    while (s < n) {
      var c = 0
      while (c < channels) {
        assert(dec.samples(s * channels + c) == src(c)(s).toInt,
          s"sample ($s,$c) ch=$channels n=$n opts=$opts")
        c += 1
      }
      s += 1
    }
  }

  test("FLAC round-trips exactly over the options x dims matrix") {
    // dims cross frame boundaries, 1-sample frames, exact-multiple and
    // ragged-last-frame blocking; subframe selector covers verbatim,
    // constant-fallback, fixed 0-4, LPC 1-2; all four stereo modes
    val dims = Seq(1, 2, 5, 16, 17, 192, 300)
    var seed = 7L
    for (n <- dims; stereoMode <- 0 to 3; subframe <- 0 to 8) {
      val opts = FlacOpts(
        blockSize = Seq(8, n, 192, 3)(subframe % 4),
        stereoMode = stereoMode,
        subframe = subframe,
        partOrder = subframe % 3,
        rice5 = subframe % 2 == 0,
        escape = subframe == 4,
        wasted = subframe % 3 == 0,
        rateInHeader = subframe == 5,
        blockSizeCode16 = subframe == 6)
      roundTrip(2, n, opts, seed)
      if (stereoMode == 0) roundTrip(1, n, opts, seed + 1)
      seed += 2
    }
  }

  test("constant and wasted-bits paths round-trip (silence, DC, even samples)") {
    // all-zero -> constant subframes in every frame
    roundTrip(2, 64, FlacOpts(blockSize = 16, subframe = 1), 0L)
    val bytesSilence = FlacCodec.writeFlacPcm(8000, 1, 40, (_, _) => 0,
      FlacOpts(subframe = 1))
    val silent = FlacCodec.decodePcm(bytesSilence).get
    assert(silent.samples.forall(_ == 0))
    // DC offset constant
    val dc = FlacCodec.writeFlacPcm(8000, 1, 40, (_, _) => -1234,
      FlacOpts(subframe = 1, wasted = true))
    assert(FlacCodec.decodePcm(dc).get.samples.forall(_ == -1234))
    // every sample a multiple of 8 -> 3 wasted bits actually taken
    val src = pcm(99L, 2, 100).map(_.map(v => ((v / 8) * 8).toShort))
    for (sub <- Seq(0, 3, 7); mode <- 0 to 3) {
      val opts = FlacOpts(blockSize = 25, stereoMode = mode, subframe = sub,
        wasted = true, partOrder = 2)
      val b = FlacCodec.writeFlacPcm(8000, 2, 100, (s, c) => src(c)(s), opts)
      val dec = FlacCodec.decodePcm(b).get
      var s = 0
      while (s < 100) {
        assert(dec.samples(2 * s) == src(0)(s).toInt &&
          dec.samples(2 * s + 1) == src(1)(s).toInt)
        s += 1
      }
    }
  }

  test("escape partitions and 5-bit Rice round-trip at full 16-bit range") {
    for (esc <- Seq(true, false); rice5 <- Seq(true, false); p <- 0 to 2) {
      roundTrip(2, 96, FlacOpts(blockSize = 32, stereoMode = 3,
        subframe = 0, partOrder = p, rice5 = rice5, escape = esc), 31L + p)
    }
  }

  test("mid/side parity: odd left+right sums reconstruct exactly") {
    // force odd sums everywhere: left even, right odd
    val n = 50
    val rnd = new scala.util.Random(5L)
    val l = Array.fill(n)(((rnd.nextInt(30000) - 15000) * 2).toShort)
    val r = Array.fill(n)(((rnd.nextInt(30000) - 15000) * 2 + 1).toShort)
    val b = FlacCodec.writeFlacPcm(8000, 2, n,
      (s, c) => if (c == 0) l(s) else r(s),
      FlacOpts(blockSize = 10, stereoMode = 3, subframe = 3))
    val dec = FlacCodec.decodePcm(b).get
    var s = 0
    while (s < n) {
      assert(dec.samples(2 * s) == l(s).toInt &&
        dec.samples(2 * s + 1) == r(s).toInt)
      s += 1
    }
  }

  test("frame CRCs gate: any bit flip in the audio frames is rejected") {
    val src = pcm(42L, 2, 64)
    val good = FlacCodec.writeFlacPcm(8000, 2, 64, (s, c) => src(c)(s),
      FlacOpts(blockSize = 16, stereoMode = 1))
    assert(FlacCodec.decodePcm(good).isDefined)
    // metadata = 4 magic + 4 block header + 34 STREAMINFO
    val framesAt = 42
    val rnd = new scala.util.Random(13L)
    var rejected = 0
    for (_ <- 0 until 200) {
      val i = framesAt + rnd.nextInt(good.length - framesAt)
      val bad = good.clone()
      bad(i) = (bad(i) ^ (1 << rnd.nextInt(8))).toByte
      val d = FlacCodec.decodePcm(bad)
      // CRC-16/CRC-8 detect every single-bit error; nothing may decode
      // to the original stream silently
      d.foreach { dec =>
        val same = (0 until 64).forall(s =>
          dec.samples(2 * s) == src(0)(s).toInt &&
            dec.samples(2 * s + 1) == src(1)(s).toInt)
        assert(!same, "bit flip must not decode to the same stream silently")
      }
      if (d.isEmpty) rejected += 1
    }
    assert(rejected > 150, s"CRCs should reject nearly all flips, got $rejected/200")
  }

  test("hostile input returns None, never throws") {
    val rnd = new scala.util.Random(77L)
    for (_ <- 0 until 300) {
      val junk = Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte)
      assert(FlacCodec.decodePcm(junk).isEmpty)
    }
    // truncations of a valid stream
    val src = pcm(3L, 1, 100)
    val good = FlacCodec.writeFlacPcm(8000, 1, 100, (s, _) => src(0)(s),
      FlacOpts(blockSize = 16))
    for (cut <- 0 until good.length by 3)
      assert(FlacCodec.decodePcm(good.take(cut)).isEmpty)
    // absurd declared length (census fixture has no frames at all)
    val absurd = FlacCodec.writeFlacHeader(8000, 1, 16, (1L << 30), tags = false)
    assert(FlacCodec.decodePcm(absurd).isEmpty)
  }

  test("census layer reads writeFlacPcm streams (meta interop)") {
    val b = FlacCodec.writeFlacPcm(22050, 2, 333, (s, c) => (s * 7 + c).toShort,
      FlacOpts(blockSize = 64, stereoMode = 2))
    val m = FlacCodec.meta(b).get
    assert(m.sampleRate == 22050 && m.channels == 2 &&
      m.bitsPerSample == 16 && m.totalSamples == 333 && !m.hasTags)
  }

  test("audio quality stats see through both containers identically") {
    import spark.implicits._
    val rows = graft.ops.Multimodal.audioQualityQuery(spark, sf)
      .as[(Long, Long, Long, Long, Int)].collect()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.length == nDocs)
    rows.foreach { case (id, n, clipped, silent, peak) =>
      assert(n == 64 && clipped == id % 16 && silent == id % 8 &&
        peak == (if (id % 16 > 0) 32767 else 1000 + (id % 50).toInt),
        s"doc $id (container ${if (id % 2 == 0) "wav" else "flac"})")
    }
  }

  test("flac near-dup: wav original and flac re-master collide on profile") {
    import spark.implicits._
    val rows = graft.ops.Multimodal.audioFlacNearDupQuery(spark, sf)
      .as[(Long, Long, String, String)].collect().sortBy(_._1)
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.length == nDocs)
    assert(rows.forall { case (a, b, ca, cb) =>
      b == a + 1000000000L && ca == "wav" && cb == "flac" })
  }
}
