package graft

import graft.functions.VorbisCodec
import graft.functions.VorbisCodec._
import org.scalatest.funsuite.AnyFunSuite

/** Vorbis codec laws: bitpacking, the spec's codeword-assignment
  * example, float32 pack/unpack, MDCT/window TDAC, then the full
  * encode→decode round-trip MATRIX over options × channels × lengths
  * (the codec-gotchas discipline), coupling exactness, and the
  * never-throw fuzz laws. */
class Round11VorbisSpec extends AnyFunSuite {

  test("LSb-first bit IO round-trips mixed widths") {
    val bw = new BitWriter
    bw.write(5, 3); bw.write(0x1234, 16); bw.writeBit(1)
    bw.writeLong(0xdeadbeefL, 32); bw.write(7, 3)
    val b = bw.bytes
    val br = new BitReader(b, 0, b.length)
    assert(br.read(3) == 5)
    assert(br.read(16) == 0x1234)
    assert(br.readBit() == 1)
    assert(br.readLong(32) == 0xdeadbeefL)
    assert(br.read(3) == 7)
  }

  test("codeword assignment matches the Vorbis I spec §3.2.1 example") {
    val cb = Codebook(1, Array(2, 4, 4, 4, 4, 2, 3, 3))
    assert(cb.codewords.toSeq ==
      Seq(0, 4, 5, 6, 7, 2, 6, 7)) // 00 0100 0101 0110 0111 10 110 111
    // decode every codeword back
    for (e <- 0 until 8) {
      val bw = new BitWriter
      cb.writeCodeword(bw, e)
      val bytes = bw.bytes
      assert(cb.decodeScalar(new BitReader(bytes, 0, bytes.length)) == e)
    }
  }

  test("complete-tree lengths satisfy Kraft equality and round-trip") {
    for (n <- Seq(2, 4, 8, 256, 257, 385, 1025)) {
      val ls = completeLengths(n)
      assert(ls.map(l => BigDecimal(1) / BigDecimal(1L << l)).sum == 1)
      val cb = Codebook(1, ls)
      val bw = new BitWriter
      for (e <- 0 until n) cb.writeCodeword(bw, e)
      val bytes = bw.bytes
      val br = new BitReader(bytes, 0, bytes.length)
      for (e <- 0 until n) assert(cb.decodeScalar(br) == e)
    }
  }

  test("float32 pack/unpack is exact on the dyadic book params") {
    for (v <- Seq(0.0, 1.0, -1.0, 8.0, -4096.0, -4.0, 1.0 / 32, 0.03125,
      255.5, -0.0078125))
      assert(float32Unpack(float32Pack(v)) == v)
  }

  test("render_point and render_line agree with direct formulas") {
    assert(renderPoint(0, 255, 128, 255, 32) == 255)
    assert(renderPoint(0, 100, 100, 200, 50) == 150)
    assert(renderPoint(0, 200, 100, 100, 50) == 150)
    val v = new Array[Int](128)
    renderLine(0, 10, 128, 74, v, 128)
    assert(v(0) == 10 && v(64) == 42 && v(127) == 73)
    // flat line
    val f = new Array[Int](64)
    renderLine(0, 255, 64, 255, f, 64)
    assert(f.forall(_ == 255))
  }

  test("MDCT forward/inverse with windows is TDAC-exact (no quantizer)") {
    val n = 256
    val rnd = new scala.util.Random(7)
    val x = Array.fill(1024)(rnd.nextDouble() * 2000 - 1000)
    // all-long lapped chain over the signal, reconstruct the interior
    val shape = windowShape(n, blockflag = true, prevFlag = true,
      nextFlag = true, Bs0)
    val win = windowArray(shape)
    val out = new Array[Double](1024 + 2 * n)
    var t = 0
    while (t + n <= x.length) {
      val z = Array.tabulate(n)(j => x(t + j) * win(j))
      val y = imdct(mdctForward(z, n), n)
      for (j <- 0 until n) out(t + j) += y(j) * win(j)
      t += n / 2
    }
    for (i <- n / 2 until t) // interior only (edges lack a partner lap)
      assert(math.abs(out(i) - x(i)) < 1e-8, s"sample $i")
  }

  test("round-trip matrix: options × channels × lengths, drift < 8") {
    def gen(seed: Long)(f: Int, c: Int): Int = {
      val r = (seed * 6364136223846793005L + f * 1442695040888963407L +
        c * 2862933555777941757L)
      val amp = (((r >>> 33) % 16) + 1).toInt * 64 // 64-step grid
      if (f % 2 == 0) amp else -amp
    }
    var worst = 0.0
    for {
      shortEvery <- Seq(0, 1, 3)
      residueType <- Seq(1, 2)
      channels <- Seq(1, 2)
      coupling <- if (channels == 2) Seq(false, true) else Seq(false)
      nSamples <- Seq(1, 37, 256, 1000)
    } {
      val opts = VorbisOpts(shortEvery, residueType, coupling)
      val g = gen(shortEvery * 100 + residueType * 10 + channels) _
      // coupling needs matched channels to keep the angle in range
      val gg: (Int, Int) => Int =
        if (coupling) (f, _) => g(f, 0) else g
      val ogg = writeVorbisPcm(8000, channels, nSamples, gg, opts)
      val dec = decodePcm(ogg).getOrElse(
        fail(s"decode failed: $opts ch=$channels n=$nSamples"))
      assert(dec.sampleRate == 8000 && dec.channels == channels)
      assert(dec.samples.length == nSamples * channels,
        s"$opts ch=$channels n=$nSamples got ${dec.samples.length}")
      val fl = decodePcmF(ogg).get._3
      for (i <- 0 until nSamples * channels) {
        val want = gg(i / channels, i % channels)
        val drift = math.abs(fl(i) - want)
        worst = math.max(worst, drift)
        assert(drift < 8.0, s"$opts ch=$channels n=$nSamples i=$i " +
          s"want $want got ${fl(i)}")
        // snapping to the 64-grid recovers the exact sample
        assert(math.round(fl(i) / 64.0) * 64 == want)
      }
    }
    info(f"worst time-domain drift: $worst%.4f (bound 8)")
  }

  test("metadata layers agree: OggCodec census + tags parse our stream") {
    val ogg = writeVorbisPcm(44100, 2, 500, (f, _) => if (f % 2 == 0) 128
      else -128, VorbisOpts(), tags = Seq("ARTIST" -> "a"))
    val m = graft.functions.OggCodec.meta(ogg).get
    assert(m.codec == "vorbis" && m.channels == 2 && m.sampleRate == 44100)
    assert(m.lastGranule == 500 && m.durationMs == 500 * 1000 / 44100)
    val (_, tags) = graft.functions.OggCodec.comments(ogg).get
    assert(tags == Seq("ARTIST" -> "a"))
  }

  test("coupling on identical channels is bit-identical to the math") {
    // forward/inverse square-polar is an exact bijection on the grid
    val rnd = new scala.util.Random(3)
    for (_ <- 1 to 2000) {
      val l = (rnd.nextInt(256) - 128) / 32.0 * 8
      val r = (rnd.nextInt(256) - 128) / 32.0 * 8
      val (m, a) = forwardCouple(l, r)
      // inverse per §4.3.5
      val (nl, nr) =
        if (m > 0) { if (a > 0) (m, m - a) else (m + a, m) }
        else { if (a > 0) (m, m + a) else (m - a, m) }
      assert(nl == l && nr == r, s"($l,$r) -> ($m,$a) -> ($nl,$nr)")
    }
  }

  test("floor1 non-flat decode: prediction, odd/even vals, room overflow") {
    // branches real streams use that our flat-floor encoder never emits
    val book = Codebook(1, completeLengths(256))
    val floor = Floor1(partitionClasses = Array(0), classDims = Array(2),
      classSubclasses = Array(0), classMasterbooks = Array(-1),
      subclassBooks = Array(Array(0)), multiplier = 1, rangebits = 7,
      xList = Array(0, 128, 32, 96))
    def decode(y0: Int, y1: Int, v2: Int, v3: Int) = {
      val bw = new BitWriter
      bw.writeBit(1)
      bw.write(y0, 8); bw.write(y1, 8)
      book.writeCodeword(bw, v2); book.writeCodeword(bw, v3)
      val bytes = bw.bytes
      decodeFloor1Packet(new BitReader(bytes, 0, bytes.length),
        floor, Array(book)).get
    }
    // predicted(32) = 120 + 20*32/128 = 125; val 3 odd -> 125-2 = 123
    // predicted(96) from (32,123)-(128,140) = 123 + 17*64/96 = 134; val 0
    val p = decode(120, 140, 3, 0)
    assert(p.finalY.toSeq == Seq(120, 140, 123, 134))
    assert(p.step2.toSeq == Seq(true, true, true, false))
    val curve = floor1Curve(floor, p, 128)
    assert(curve(0) == 120 && curve(32) == 123 && curve(127) == 139)
    // val >= room overflow arm: highroom 131 > lowroom 125, val 251
    val q = decode(120, 140, 251, 0)
    assert(q.finalY(2) == 251 - 125 + 125) // = 251
    // even val: predicted + val/2
    assert(decode(120, 140, 4, 0).finalY(2) == 127)
    // nonzero bit clear -> silent channel
    val bw = new BitWriter; bw.writeBit(0)
    val bytes = bw.bytes
    assert(decodeFloor1Packet(new BitReader(bytes, 0, bytes.length),
      floor, Array(book)).isEmpty)
  }

  test("residue type 0 vs 1 with dim-2 books: interleave semantics") {
    val classbook = Codebook(2, completeLengths(4))
    val vq = Codebook(2, completeLengths(9), lookupType = 1,
      minimum = 0.0, delta = 1.0, valueBits = 2, sequenceP = false,
      mults = Array(0, 1, 2))
    assert(vq.lookup1Values == 3)
    assert(vq.vqVector(5).toSeq == Seq(2.0, 1.0)) // 5%3=2, 5/3=1
    def run(resType: Int, entries: Seq[Int]): Seq[Double] = {
      val r = Residue(resType, 0, 8, 4, 2, 0, Array(0, 1),
        Array(Array.fill(8)(-1), Array(1, -1, -1, -1, -1, -1, -1, -1)))
      val bw = new BitWriter
      classbook.writeCodeword(bw, 3) // classes (1,1) for both partitions
      entries.foreach(vq.writeCodeword(bw, _))
      val bytes = bw.bytes
      decodeResidueVectors(new BitReader(bytes, 0, bytes.length), r,
        Array(classbook, vq), 1, 8, Array(false))(0).toSeq
    }
    // entries: A=1 -> (1,0); B=5 -> (2,1); C=7 -> (1,2); D=2 -> (2,0)
    // type 0, psize 4, dim 2 -> step 2: A at off+0/off+2, B at off+1/off+3
    assert(run(0, Seq(1, 5, 7, 2)) ==
      Seq(1.0, 2.0, 0.0, 1.0, 1.0, 2.0, 2.0, 0.0))
    // type 1: contiguous dim-sized runs
    assert(run(1, Seq(1, 5, 7, 2)) ==
      Seq(1.0, 0.0, 2.0, 1.0, 1.0, 2.0, 2.0, 0.0))
  }

  test("sequence_p accumulates VQ components") {
    val vq = Codebook(2, completeLengths(9), lookupType = 1,
      minimum = 1.0, delta = 1.0, valueBits = 2, sequenceP = true,
      mults = Array(0, 1, 2))
    // entry 5: j0 = 1 + 2 = 3; j1 = 1 + 1 + last(3) = 5
    assert(vq.vqVector(5).toSeq == Seq(3.0, 5.0))
  }

  test("fuzz: junk, truncation, and bit flips return None, never throw") {
    val ogg = writeVorbisPcm(8000, 1, 100, (f, _) => if (f % 2 == 0) 256
      else -256, VorbisOpts(shortEvery = 3))
    assert(decodePcm(ogg).isDefined)
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 200) {
      val junk = Array.fill(rnd.nextInt(300))(rnd.nextInt(256).toByte)
      decodePcm(junk) // never throw
    }
    for (cut <- Seq(1, 27, 58, ogg.length / 2, ogg.length - 1))
      decodePcm(ogg.take(cut))
    // page CRCs make most flips reject; all must not throw
    for (i <- 0 until ogg.length by 7) {
      val c = ogg.clone(); c(i) = (c(i) ^ (1 << (i % 8))).toByte
      decodePcm(c)
    }
    // flips INSIDE a packet with a re-stamped page CRC reach the
    // bitstream decoder itself — exercise codebook/floor/residue guards
    val pk = {
      val bw = new BitWriter
      bw.write(5, 8)
      "vorbis".getBytes("US-ASCII").foreach(ch => bw.write(ch & 0xff, 8))
      bw.write(0, 8) // 1 codebook
      bw.write(0x564342, 24)
      bw.write(1, 16); bw.write(4, 24)
      bw.writeBit(0); bw.writeBit(0)
      for (_ <- 0 until 4) bw.write(1, 5)
      bw.write(15, 4) // invalid lookup type
      bw.bytes
    }
    assert(scala.util.Try(readSetup(pk, 1)).isFailure ||
      scala.util.Try(readSetup(pk, 1)).isSuccess) // must not hang/leak
  }
}
