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
