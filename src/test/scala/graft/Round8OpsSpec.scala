package graft

import org.apache.spark.sql.functions._
import graft.functions.ImageCodec

/** Round-8 specs. Starts with regression tests for the round-7 advice
  * findings: hostile image payloads must return None (never spin or
  * throw in an executor task), and empty-table layout audits must
  * return empty frames, not IllegalArgumentException. */
class Round8OpsSpec extends SparkSpec {

  // --- corrupt-payload hardening (advice: ImageCodec chunk walks) ---

  /** A structurally-valid truecolor PNG whose second chunk's length
    * field is overwritten with `len` (big-endian). */
  private def withBadChunkLen(len: Int): Array[Byte] = {
    val png = ImageCodec.writePng(4, 4, 10, 20, 30)
    val at = 8 + 12 + 13 // after IHDR: start of IDAT chunk
    val bad = png.clone()
    bad(at) = (len >>> 24).toByte; bad(at + 1) = (len >>> 16).toByte
    bad(at + 2) = (len >>> 8).toByte; bad(at + 3) = len.toByte
    bad
  }

  test("negative chunk length returns None instead of looping") {
    // len = -12 makes `p += 12 + len` a no-op: the old walk spun forever
    val bad = withBadChunkLen(-12)
    assert(ImageCodec.decodePixels(bad).isEmpty)
    assert(ImageCodec.stripAncillary(bad).isEmpty)
    // pngChunkTypes stops the walk (IHDR was already consumed)
    assert(ImageCodec.pngChunkTypes(bad) == Seq("IHDR"))
  }

  test("overlong chunk length returns None instead of overrunning") {
    val bad = withBadChunkLen(Int.MaxValue - 4)
    assert(ImageCodec.decodePixels(bad).isEmpty)
    assert(ImageCodec.stripAncillary(bad).isEmpty)
    assert(ImageCodec.pngChunkTypes(bad) == Seq("IHDR"))
  }

  test("huge-dimension headers return None instead of overflowing allocation") {
    // PNG IHDR with w = h = 2^30: h*(1+3w) overflows Int
    val png = ImageCodec.writePng(4, 4, 1, 2, 3)
    val bad = png.clone()
    def putBe32(i: Int, v: Int): Unit = {
      bad(i) = (v >>> 24).toByte; bad(i + 1) = (v >>> 16).toByte
      bad(i + 2) = (v >>> 8).toByte; bad(i + 3) = v.toByte
    }
    putBe32(16, 1 << 30); putBe32(20, 1 << 30)
    assert(ImageCodec.decodePixels(bad).isEmpty)

    // BMP with dims whose product overflows past the bounds check
    val bmp = ImageCodec.writeBmp(4, 4, 1, 2, 3)
    val badBmp = bmp.clone()
    def putLe32(i: Int, v: Int): Unit = {
      badBmp(i) = v.toByte; badBmp(i + 1) = (v >>> 8).toByte
      badBmp(i + 2) = (v >>> 16).toByte; badBmp(i + 3) = (v >>> 24).toByte
    }
    putLe32(18, 1 << 20); putLe32(22, 1 << 20)
    assert(ImageCodec.decodePixels(badBmp).isEmpty)
  }

  test("valid payloads still decode after the hardening") {
    val png = ImageCodec.writePngPixels(8, 6, (x, y) => (x * 40) << 16 | (y * 40))
    val p = ImageCodec.decodePixels(png).get
    assert(p.width == 8 && p.height == 6)
    assert(ImageCodec.stripAncillary(
      ImageCodec.withTextChunk(png, "Author", "x")).isDefined)
  }

  // --- empty-table layout audit (advice: Layout.rowGroups) ---

  test("rowGroups on an empty table returns an empty frame") {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    import spark.implicits._
    spark.createDataset(Seq.empty[(Long, String)]).toDF("id", "v")
      .where(lit(false)).coalesce(1).write.mode("overwrite").parquet(dir)
    // whatever file count an empty write produces (0 or a footer-only
    // file), the audit must not throw and must report zero data rows
    val rg = graft.ops.Layout.rowGroups(spark, dir)
    assert(rg.agg(coalesce(sum(col("num_rows")), lit(0L))).collect()(0).getLong(0) == 0L)
  }
}
