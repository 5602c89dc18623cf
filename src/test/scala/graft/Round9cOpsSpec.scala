package graft

import org.apache.spark.sql.functions._
import graft.functions.CdcChunker
import graft.ops.ChunkDedup

/** Round-9c specs: content-defined-chunking dedup and the rest of the
  * crawl-hygiene batch. */
class Round9cOpsSpec extends SparkSpec {

  // ------------------------------------------------- CDC chunker laws

  test("CDC boundaries partition the payload with bounded chunk sizes") {
    val rnd = new scala.util.Random(7)
    for (n <- Seq(0, 1, 63, 64, 65, 1023, 1024, 1025, 4096, 20000)) {
      val b = Array.fill(n)(rnd.nextInt(256).toByte)
      val ends = CdcChunker.boundaries(b)
      if (n == 0) assert(ends.isEmpty)
      else {
        assert(ends.last == n)
        assert(ends.toSeq == ends.toSeq.sorted && ends.distinct.length == ends.length)
        val lens = (0 +: ends.toSeq).sliding(2).map(p => p(1) - p(0)).toSeq
        // every chunk except possibly the last respects [Min, Max]
        lens.dropRight(1).foreach { l =>
          assert(l >= CdcChunker.MinChunk && l <= CdcChunker.MaxChunk, s"len $l")
        }
        assert(lens.last <= CdcChunker.MaxChunk)
      }
    }
  }

  test("CDC chunk digests reassemble the payload and are deterministic") {
    val b = ChunkDedup.prngBytes(42, 5000)
    val c1 = CdcChunker.chunks(b)
    val c2 = CdcChunker.chunks(b.clone())
    assert(c1 == c2)
    assert(c1.map(_._2).sum == b.length)
    assert(c1.head._1 == 0)
    // offsets are contiguous
    c1.sliding(2).foreach {
      case Seq((o1, l1, _), (o2, _, _)) => assert(o1 + l1 == o2)
      case _ =>
    }
  }

  test("CDC re-synchronizes after an arbitrary-length insertion") {
    val content = ChunkDedup.prngBytes(99, 6144)
    val base = CdcChunker.chunks(content).map(_._3).toSet
    for (hl <- Seq(1, 37, 63, 64, 128, 255, 300, 999)) {
      val shifted = CdcChunker.chunks(
        ChunkDedup.prngBytes(hl * 31 + 5, hl) ++ content).map(_._3).toSet
      val shared = base.intersect(shifted)
      assert(shared.size >= 3, s"header $hl: only ${shared.size} shared chunks")
    }
  }

  test("fixed-block hashing finds NO shared blocks on the shifted twins") {
    // the comparison that motivates CDC: 256-byte aligned blocks on the
    // fixture twins share nothing because the header shift is never a
    // block multiple
    def blocks(b: Array[Byte]): Set[String] =
      b.grouped(256).map { g =>
        java.security.MessageDigest.getInstance("MD5").digest(g)
          .map(x => f"$x%02x").mkString
      }.toSet
    for (id <- 0L to 20L) {
      val content = ChunkDedup.prngBytes(id * 1009 + 7, ChunkDedup.ContentLen)
      val twin = ChunkDedup.prngBytes(id * 2017 + 13, ChunkDedup.headerLen(id)) ++ content
      assert(blocks(content).intersect(blocks(twin)).isEmpty)
      assert(CdcChunker.chunks(content).map(_._3).toSet
        .intersect(CdcChunker.chunks(twin).map(_._3).toSet).size >= 3)
    }
  }

  test("chunk dedup detects exactly the twin pairs at sf0.001") {
    val rows = ChunkDedup.chunkDedupQuery(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.size == n)
    assert(rows.forall { case (a, b) => b == a + 1000000000L })
  }

  test("CDC chunker never throws on junk") {
    val rnd = new scala.util.Random(3)
    for (_ <- 1 to 200) {
      val b = Array.fill(rnd.nextInt(3000))(rnd.nextInt(256).toByte)
      CdcChunker.chunks(b)
    }
  }
}
