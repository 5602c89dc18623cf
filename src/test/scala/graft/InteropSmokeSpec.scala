package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cross-implementation interop smokes — the deployment seam the
  * round-11 verdict asked to put next to [[PostgresSmokeSpec]]: the
  * Vorbis, PDF, and MP3 codecs are gated in-repo by own-encoder round
  * trips + spec laws (no reference decoders in this container); their
  * first deployment should run THESE suites against real tools.
  * Env-var gated so they cancel (not fail) when a tool is absent:
  *
  * {{{
  * GRAFT_OGGDEC_CMD=oggdec GRAFT_PDFTOTEXT_CMD=pdftotext \
  * GRAFT_MPG123_CMD=mpg123 sbt "testOnly graft.InteropSmokeSpec"
  * }}}
  *
  * Two probes are NOT gated because this container can run them:
  *  - the brotli LIVE round trip drives the reference encoder
  *    (brotlicffi) over fresh payloads at test time — a stronger gate
  *    than the frozen [[graft.functions.BrotliCliFixtures]];
  *  - a REAL-WORLD MP3 (an Apache-licensed test asset shipped with
  *    the container's gsutil) pins the census on bytes this repo did
  *    not write, and pins the decoder's honest-refusal contract
  *    (MPEG-2, big-value Huffman → None, never garbage). */
class InteropSmokeSpec extends AnyFunSuite {

  private def run(cmd: Seq[String]): Int =
    new ProcessBuilder(cmd: _*).inheritIO().start().waitFor()

  private def tmp(suffix: String): java.io.File = {
    val f = java.io.File.createTempFile("graft_interop", suffix)
    f.deleteOnExit()
    f
  }

  // ------------------------------------------------- in-container

  test("real-world MP3: census reads it, MPEG-2 sample decode works") {
    val path = java.nio.file.Paths.get("/usr/lib/google-cloud-sdk/" +
      "platform/gsutil/gslib/tests/test_data/test.mp3")
    assume(java.nio.file.Files.exists(path), "gsutil test asset absent")
    val b = java.nio.file.Files.readAllBytes(path)
    val m = graft.functions.Mp3Codec.meta(b).getOrElse(fail("census failed"))
    // MPEG-2 Layer III mono, 64 kbps CBR at 22.05 kHz
    assert(m.version == "2" && m.layer == 3 && m.channels == 1)
    assert(m.id3Size == 32 && m.bitrateKbps == 64 && m.sampleRate == 22050)
    // independent frame walk agrees with the census estimate
    val walk = graft.functions.Mp3Codec.frameWalk(b)
      .getOrElse(fail("frame walk failed"))
    assert(walk.frames == 45 && m.frames == 45)
    assert(walk.durationMs == 45L * 576 * 1000 / 22050)
    // LSF sample decode (round 13): this asset turns out to be pure
    // digital silence — every granule has part2_3_length = 0 (verified
    // by independent side-info walk) — so its decode proves the LSF
    // frame/side-info/granule path on real bytes, while the Huffman
    // tables are proven by the own-encoder fixtures in Round13Mp3Spec
    val audio = graft.functions.Mp3Layer3.decodePcm(b)
      .getOrElse(fail("MPEG-2 decode refused"))
    assert(audio.sampleRate == 22050 && audio.channels == 1)
    // 45 frames x 576 samples, minus the 576-sample structural delay
    assert(audio.samples.length == 45 * 576 - 576, s"${audio.samples.length}")
    assert(audio.samples.forall(_ == 0), "silence asset must decode silent")
    // tag walk survives real bytes
    graft.functions.Mp3Codec.readId3(b)
  }

  test("brotli LIVE reference round-trip (fresh payloads, all qualities)") {
    val pkg = new java.io.File("/root/miniconda/pkgs")
    val cffi = Option(pkg.listFiles())
      .flatMap(_.find(_.getName.startsWith("brotlicffi-")))
      .map(d => d.getAbsolutePath + "/lib/python3.13/site-packages")
    assume(cffi.isDefined, "brotlicffi not present")
    val rnd = new scala.util.Random(42)
    val payloads: Seq[Array[Byte]] = Seq(
      ("The people of the time said this work is free and open. " * 9)
        .getBytes("UTF-8"),
      Array.tabulate(5000)(i => ((i * 31 + (i >> 5)) & 0xff).toByte),
      Array.fill(2000)(rnd.nextInt(256).toByte),
      ("日本語のテキストと русский текст. " * 30).getBytes("UTF-8"))
    for ((p, pi) <- payloads.zipWithIndex; q <- Seq(2, 7, 11)) {
      val in = tmp(".bin"); val outF = tmp(".br")
      java.nio.file.Files.write(in.toPath, p)
      // the cffi build is cpython-3.13-specific: pin the interpreter it
      // shipped with rather than whatever python3 is on the fork's PATH
      val py = Seq("/root/miniconda/bin/python3", "python3")
        .find(p => p == "python3" || new java.io.File(p).exists()).get
      val code = {
        val pb = new ProcessBuilder(py, "-c",
          s"import brotlicffi,sys;" +
            s"open('${outF.getAbsolutePath}','wb').write(" +
            s"brotlicffi.compress(open('${in.getAbsolutePath}','rb')" +
            s".read(), quality=$q))")
        pb.environment().put("PYTHONPATH", cffi.get)
        pb.inheritIO().start().waitFor()
      }
      assert(code == 0, s"reference encoder failed p$pi q$q")
      val stream = java.nio.file.Files.readAllBytes(outF.toPath)
      val dec = graft.functions.BrotliCodec.decode(stream)
        .getOrElse(fail(s"decode failed p$pi q$q (${stream.length} B)"))
      assert(java.util.Arrays.equals(dec, p), s"mismatch p$pi q$q")
    }
  }

  test("brotli STORED-mode writer: the reference decoder accepts it") {
    val pkg = new java.io.File("/root/miniconda/pkgs")
    val cffi = Option(pkg.listFiles())
      .flatMap(_.find(_.getName.startsWith("brotlicffi-")))
      .map(d => d.getAbsolutePath + "/lib/python3.13/site-packages")
    assume(cffi.isDefined, "brotlicffi not present")
    val rnd = new scala.util.Random(19)
    for (n <- Seq(0, 1, 1000, 65537)) {
      val payload = Array.fill(n)(rnd.nextInt(256).toByte)
      val stream = graft.functions.BrotliCodec.encodeStored(payload)
      val in = tmp(".br"); val outF = tmp(".bin")
      java.nio.file.Files.write(in.toPath, stream)
      val py = Seq("/root/miniconda/bin/python3", "python3")
        .find(p => p == "python3" || new java.io.File(p).exists()).get
      val pb = new ProcessBuilder(py, "-c",
        s"import brotlicffi;" +
          s"open('${outF.getAbsolutePath}','wb').write(" +
          s"brotlicffi.decompress(open('${in.getAbsolutePath}','rb')" +
          s".read()))")
      pb.environment().put("PYTHONPATH", cffi.get)
      assert(pb.inheritIO().start().waitFor() == 0,
        s"reference decoder rejected our stored stream (n=$n)")
      val back = java.nio.file.Files.readAllBytes(outF.toPath)
      assert(java.util.Arrays.equals(back, payload), s"n=$n mismatch")
    }
  }

  // ------------------------------------------------- deploy-gated

  test("libvorbis interop: oggdec decodes our encoder's stream") {
    val cmd = sys.env.get("GRAFT_OGGDEC_CMD")
    assume(cmd.isDefined, "set GRAFT_OGGDEC_CMD to run")
    import graft.functions.VorbisCodec
    val n = 2000
    val gen: (Int, Int) => Int = (f, _) => ((f % 64) - 32) * 64
    val ogg = VorbisCodec.writeVorbisPcm(8000, 1, n, gen)
    val in = tmp(".ogg"); val out = tmp(".wav")
    java.nio.file.Files.write(in.toPath, ogg)
    assert(run(Seq(cmd.get, "-o", out.getAbsolutePath,
      in.getAbsolutePath)) == 0)
    val wav = graft.functions.AudioCodec.decodeSamples(
      java.nio.file.Files.readAllBytes(out.toPath)).getOrElse(
      fail("oggdec output unreadable"))
    assert(wav.sampleRate == 8000 && wav.channels == 1)
    for (i <- 0 until n)
      assert(math.abs(wav.samples(i) - gen(i, 0)) <= 32,
        s"sample $i: ${wav.samples(i)} vs ${gen(i, 0)}")
  }

  test("poppler interop: pdftotext reads our writers' documents") {
    val cmd = sys.env.get("GRAFT_PDFTOTEXT_CMD")
    assume(cmd.isDefined, "set GRAFT_PDFTOTEXT_CMD to run")
    import graft.functions.PdfCodec
    val texts = Seq("alpha bravo charlie", "delta echo")
    for ((pdf, tag) <- Seq(
      PdfCodec.writePdfWithText("1.4", texts) -> "plain",
      PdfCodec.writePdfObjStm("1.6", texts) -> "objstm",
      PdfCodec.writePdfEncryptedText("1.4", texts, "owner") -> "rc4",
      PdfCodec.writePdfEncryptedAes("1.6", texts, "owner",
        v5 = false) -> "aesv2",
      PdfCodec.writePdfEncryptedAes("1.7", texts, "owner",
        v5 = true) -> "aesv3")) {
      val in = tmp(".pdf"); val out = tmp(".txt")
      java.nio.file.Files.write(in.toPath, pdf)
      assert(run(Seq(cmd.get, in.getAbsolutePath,
        out.getAbsolutePath)) == 0, s"pdftotext failed on $tag")
      val got = new String(java.nio.file.Files.readAllBytes(out.toPath),
        "UTF-8")
      texts.foreach(t => assert(got.contains(t), s"$tag missing '$t'"))
    }
  }

  test("mpg123 interop: a reference decoder accepts our MP3 encoder") {
    val cmd = sys.env.get("GRAFT_MPG123_CMD")
    assume(cmd.isDefined, "set GRAFT_MPG123_CMD to run")
    import graft.functions.Mp3Layer3
    // arm 1: the count1-grid encoder; arm 2 (round 13): a BIG-VALUE
    // stream through the vendored Table B.7 tables — at deployment
    // this is THE external check that the vendored codeword DATA
    // (attested in-container only by structural laws + own-encoder
    // round trips) matches the spec: a reference decoder reproducing
    // the expected PCM cannot happen with swapped or wrong codes
    // LSF arms (round 14): non-silent fixtures at every vendored LSF
    // rate — the EXTERNAL check on the band-width tables themselves.
    // The round-13 advice proved the sum law cannot tell adjacent
    // Table B.2 rows apart (the 24 kHz row shipped under the 22.05
    // key and every own-encoder round trip stayed green); a reference
    // decoder reproducing the expected PCM can only happen with the
    // true band boundaries, because requantization walks them.
    val arms = Seq(
      "count1-grid" -> Mp3Layer3.writeMp3Fixture(44100, 1, 8, 77L,
        Mp3Layer3.Mp3Opts(reservoir = true)),
      "big-value" -> Mp3Layer3.writeMp3BigFixture(44100, 1, 8, 99L,
        (7, 10, 12))) ++
      Seq(22050, 24000, 16000, 8000).map(sr =>
        s"lsf-$sr" -> Mp3Layer3.writeMp3LsfFixture(1, 8, 83L, sr))
    for ((tag, (pcm, mp3)) <- arms) {
      val in = tmp(".mp3"); val out = tmp(".wav")
      java.nio.file.Files.write(in.toPath, mp3)
      assert(run(Seq(cmd.get, "-q", "-w", out.getAbsolutePath,
        in.getAbsolutePath)) == 0, s"$tag: mpg123 rejected the stream")
      val wav = graft.functions.AudioCodec.decodeSamples(
        java.nio.file.Files.readAllBytes(out.toPath)).getOrElse(
        fail(s"$tag: mpg123 output unreadable"))
      // alignment differs by the decoder's own delay convention: gate
      // on normalized cross-correlation peak instead of exact samples
      val ref = pcm(0)
      val dec = wav.samples.map(_.toDouble)
      var best = 0.0
      for (lag <- -2000 to 2000) {
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < ref.length) {
          val j = i + lag
          if (j >= 0 && j < dec.length) {
            dot += ref(i) * dec(j); na += ref(i) * ref(i)
            nb += dec(j) * dec(j)
          }
          i += 1
        }
        if (na > 0 && nb > 0) best = math.max(best, dot / math.sqrt(na * nb))
      }
      assert(best > 0.98, f"$tag: cross-correlation peak $best%.4f")
    }
  }
}
