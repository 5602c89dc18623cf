package graft

import graft.functions.ZstdCodec

/** Entropy-layer zstd laws (RFC 8878 Compressed blocks). The strongest
  * gate is the reference-CLI interop matrix: every frame the real
  * `zstd` binary produces across payload shapes × levels × checksum
  * settings must decode byte-exactly — that exercises Huffman literals
  * (1/4-stream, FSE-compressed weights, treeless reuse), all four
  * sequence table modes, repeat offsets, and multi-block match
  * windows. Then the never-throw fuzz surface over compressed frames,
  * and XXH64 vectors. */
class Round10ZstdSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val zstdBin = new java.io.File("/root/miniconda/bin/zstd")

  private def cliCompress(payload: Array[Byte], args: Seq[String]): Array[Byte] = {
    import scala.sys.process._
    val dir = java.nio.file.Files.createTempDirectory("graft_zstd10")
    val in = dir.resolve("in.bin")
    val out = dir.resolve("out.zst")
    java.nio.file.Files.write(in, payload)
    val cmd = Seq(zstdBin.getPath, "-q", "-f") ++ args ++
      Seq(in.toString, "-o", out.toString)
    assert(cmd.! == 0, s"zstd CLI failed: $cmd")
    java.nio.file.Files.readAllBytes(out)
  }

  private def payloads: Seq[(String, Array[Byte])] = {
    val rnd = new scala.util.Random(1007)
    Seq(
      "empty" -> Array.emptyByteArray,
      "one" -> Array('x'.toByte),
      "tiny" -> "hello zstd".getBytes,
      "rle" -> Array.fill(5000)('A'.toByte),
      "repetitive" -> ("the quick brown fox jumps over the lazy dog. " * 800).getBytes,
      "formula" -> (0 until 4000).map(i => s"entry $i of document ${i % 97}\n").mkString.getBytes,
      "random" -> Array.fill(20000)(rnd.nextInt(256).toByte),
      "mixed" -> (("header " * 100).getBytes ++ Array.fill(3000)(rnd.nextInt(256).toByte)
        ++ ("trailer " * 500).getBytes),
      "skewed" -> Array.fill(30000)(if (rnd.nextInt(10) < 8) 'e'.toByte else rnd.nextInt(256).toByte),
      // > 128 KiB forces multiple blocks: treeless literals, repeat FSE
      // tables, and matches reaching into earlier blocks
      "large" -> (0 until 40000).map(i => s"log line ${i % 1013} level=${i % 7} ok\n").mkString.getBytes
    )
  }

  test("every reference-CLI frame decodes byte-exactly (levels x checksum)") {
    assume(zstdBin.canExecute, "reference zstd not installed")
    for ((name, p) <- payloads;
         level <- Seq("-1", "-3", "-9", "-19");
         check <- Seq(Nil, Seq("--no-check"))) {
      val frame = cliCompress(p, level +: check)
      val got = ZstdCodec.extract(frame)
      assert(got.isDefined, s"$name $level ${check.mkString} did not decode")
      assert(java.util.Arrays.equals(got.get, p),
        s"$name $level ${check.mkString} decoded wrong bytes")
      val m = ZstdCodec.census(frame).get
      assert(m.nBlocks >= 1)
    }
  }

  test("long-window and single-thread CLI variants decode") {
    assume(zstdBin.canExecute, "reference zstd not installed")
    val p = (0 until 60000).map(i => s"row ${i % 499} v=${i % 31}\n").mkString.getBytes
    for (args <- Seq(Seq("--long=20"), Seq("-T1"), Seq("--single-thread"), Seq("-5", "--long=21"))) {
      val frame = cliCompress(p, args)
      val got = ZstdCodec.extract(frame)
      assert(got.isDefined, s"args $args did not decode")
      assert(java.util.Arrays.equals(got.get, p), s"args $args wrong bytes")
    }
  }

  test("corrupted checksum is rejected, --no-check twin decodes") {
    assume(zstdBin.canExecute, "reference zstd not installed")
    val p = ("checksum me " * 400).getBytes
    val frame = cliCompress(p, Seq("-3")) // CLI default carries XXH64
    // flip one bit in the trailing 4-byte checksum
    val f = frame.clone()
    f(f.length - 1) = (f(f.length - 1) ^ 1).toByte
    assert(ZstdCodec.extract(f).isEmpty, "checksum flip must reject")
    assert(ZstdCodec.extract(frame).isDefined)
  }

  test("compressed-frame fuzz never throws: junk and bit flips") {
    assume(zstdBin.canExecute, "reference zstd not installed")
    val p = (0 until 2000).map(i => s"fuzz seed ${i % 53}\n").mkString.getBytes
    val frame = cliCompress(p, Seq("-3"))
    val rnd = new scala.util.Random(977)
    for (_ <- 1 to 1500) {
      val f = frame.clone()
      val i = rnd.nextInt(f.length)
      f(i) = (f(i) ^ (1 << rnd.nextInt(8))).toByte
      ZstdCodec.extract(f) // Option, never throws
      ZstdCodec.census(f)
    }
    for (_ <- 1 to 500) {
      val junk = Array.fill(rnd.nextInt(300))(rnd.nextInt(256).toByte)
      ZstdCodec.extract(junk)
      // adversarial: valid magic + junk body
      val evil = Array[Byte](0x28, 0xb5.toByte, 0x2f, 0xfd.toByte) ++ junk
      ZstdCodec.extract(evil)
    }
  }

  test("compressed-frame encoder round-trips over the option x size matrix") {
    import ZstdCodec._
    val text = "abcdefgh ijklmnop qrstuvwx yz0123456789 the quick brown fox "
    def lit(n: Int): Array[Byte] =
      Iterator.continually(text).flatten.take(n).map(_.toByte).toArray
    for (mode <- Seq(Lit1Stream, Lit4Stream, LitRaw);
         n <- Seq(4, 10, 61, 200, 1000);
         check <- Seq(false, true)) {
      val l = lit(n)
      val blocks = Seq(
        CompBlock(l, Seq(Seqn(ll = n, ml = 7, offset = math.min(5, n - 1)))),
        CompBlock(lit(math.max(n / 2, 4)), Seq(Seqn(ll = 3, ml = 11, repCode = 1))))
      val (frame, content) = writeCompressedFrame(blocks, check)
      val got = ZstdCodec.extract(frame)
      assert(got.isDefined, s"$mode n=$n check=$check did not decode")
      assert(java.util.Arrays.equals(got.get, content), s"$mode n=$n check=$check bytes")
    }
    // RLE literals, literals-only block, treeless reuse, overlap copy
    val uni = Array.fill(40)('z'.toByte)
    val (f1, c1) = writeCompressedFrame(Seq(
      CompBlock(lit(100), Seq(Seqn(ll = 100, ml = 23, offset = 9))), // overlap: ml > offset
      CompBlock(uni, Seq(Seqn(ll = 40, ml = 5, repCode = 1)), LitRle),
      CompBlock(lit(50), Nil, LitTreeless),
      CompBlock(lit(30), Nil)))
    assert(java.util.Arrays.equals(ZstdCodec.extract(f1).get, c1))
    // 4-stream large literal crossing the sf2 format boundary
    val (f2, c2) = writeCompressedFrame(Seq(
      CompBlock(lit(5000), Seq(Seqn(ll = 5000, ml = 100, offset = 61)), Lit4Stream),
      CompBlock(lit(8), Nil)), checksum = true)
    assert(java.util.Arrays.equals(ZstdCodec.extract(f2).get, c2))
    // two sequences sharing codes, extra bits differ (ll 16/17 = code 16,
    // ml 43/45 = code 36, offsets 12/15 -> ofValue 15/18, code 3/4? keep same code: 13/14 -> 16/17 code 4)
    val (f3, c3) = writeCompressedFrame(Seq(
      CompBlock(lit(60), Seq(
        Seqn(ll = 16, ml = 43, offset = 13),
        Seqn(ll = 17, ml = 45, offset = 14)))))
    assert(java.util.Arrays.equals(ZstdCodec.extract(f3).get, c3))
  }

  test("reference zstd decodes our compressed frames byte-exactly") {
    assume(zstdBin.canExecute, "reference zstd not installed")
    import ZstdCodec._
    import scala.sys.process._
    val text = "interop payload 0123456789 abcdefghij "
    def lit(n: Int): Array[Byte] =
      Iterator.continually(text).flatten.take(n).map(_.toByte).toArray
    val cases = Seq(
      "one-stream" -> writeCompressedFrame(Seq(
        CompBlock(lit(80), Seq(Seqn(ll = 80, ml = 19, offset = 7))))),
      "four-stream+checksum" -> writeCompressedFrame(Seq(
        CompBlock(lit(600), Seq(Seqn(ll = 600, ml = 64, offset = 38))),
        CompBlock(lit(90), Seq(Seqn(ll = 90, ml = 8, repCode = 1)))), checksum = true),
      "treeless+rle+litonly" -> writeCompressedFrame(Seq(
        CompBlock(lit(120), Seq(Seqn(ll = 120, ml = 30, offset = 11))),
        CompBlock(lit(70), Nil, LitTreeless),
        CompBlock(Array.fill(33)('q'.toByte), Nil, LitRle),
        CompBlock(lit(44), Nil, LitRaw))))
    val dir = java.nio.file.Files.createTempDirectory("graft_zstd10e")
    cases.foreach { case (name, (frame, content)) =>
      val fz = dir.resolve(s"$name.zst")
      val fout = dir.resolve(s"$name.out")
      java.nio.file.Files.write(fz, frame)
      assert(Seq(zstdBin.getPath, "-d", "-f", fz.toString, "-o",
        fout.toString).! == 0, s"reference decoder rejected $name")
      val ref = java.nio.file.Files.readAllBytes(fout)
      assert(java.util.Arrays.equals(ref, content), s"$name reference bytes differ")
      assert(java.util.Arrays.equals(ZstdCodec.extract(frame).get, content))
    }
  }

  test("multi-frame payloads: concatenation, skippable frames, garbage tails") {
    assume(zstdBin.canExecute, "reference zstd not installed")
    val p1 = ("first frame " * 100).getBytes
    val p2 = ("second frame " * 80).getBytes
    val f1 = cliCompress(p1, Seq("-3"))
    val f2 = cliCompress(p2, Seq("-5"))
    // cat'd frames decode to cat'd contents (pzstd / archive shape)
    assert(java.util.Arrays.equals(ZstdCodec.extract(f1 ++ f2).get, p1 ++ p2))
    // skippable frame between them is skipped
    val skip = Array[Byte](0x52, 0x2a, 0x4d, 0x18, 5, 0, 0, 0, 1, 2, 3, 4, 5)
    assert(java.util.Arrays.equals(
      ZstdCodec.extract(f1 ++ skip ++ f2).get, p1 ++ p2))
    assert(java.util.Arrays.equals(
      ZstdCodec.extract(skip ++ f1).get, p1))
    // trailing garbage rejects instead of silently truncating
    assert(ZstdCodec.extract(f1 ++ "garbage".getBytes).isEmpty)
    // a skippable frame alone has no content
    assert(ZstdCodec.extract(skip).isEmpty)
    // truncated skippable length rejects
    assert(ZstdCodec.extract(skip.take(9)).isEmpty)
  }

  test("xxh64 matches published test vectors") {
    // Public XXH64 reference vectors (seed 0)
    assert(ZstdCodec.xxh64(Array.emptyByteArray) == 0xef46db3751d8e999L)
    assert(ZstdCodec.xxh64("a".getBytes) == 0xd24ec4f1a98c6e5bL)
    assert(ZstdCodec.xxh64("abc".getBytes) == 0x44bc2cf5ad770999L)
    assert(ZstdCodec.xxh64("as simple as that".getBytes("US-ASCII")) != 0L)
    // 32+ byte path
    val long = ("0123456789abcdef" * 8).getBytes
    assert(ZstdCodec.xxh64(long) == ZstdCodec.xxh64(long.clone()))
  }
}
