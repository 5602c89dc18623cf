package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Pure-JVM AVI/RIFF video container codec — the video third of the real
  * byte-level multimodal decode ([[ImageCodec]], [[AudioCodec]]). Parses
  * the `hdrl/avih` main header (frame timing, frame count, dimensions)
  * and walks the `movi` list to yield the ACTUAL per-frame payloads —
  * so frame sampling operates on real container structure, not on
  * fixed-size byte slices. The writer emits a minimal but structurally
  * valid MJPG-flavored AVI (hdrl with avih + one video strl, movi with
  * one `00dc` chunk per frame), which this parser and the spec's
  * structural checks both consume. Frame payloads are opaque to the
  * container — the queries use real PNGs from [[ImageCodec]] so the
  * frames themselves are byte-decodable too (a two-level real decode:
  * container walk, then image header parse per frame).
  */
object VideoCodec {

  /** avih-level container metadata. */
  final case class VideoMeta(format: String, width: Int, height: Int,
                             usPerFrame: Int, nFrames: Int)

  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
    ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  private def isAvi(b: Array[Byte]): Boolean =
    b.length >= 24 && tag(b, 0) == "RIFF" && tag(b, 8) == "AVI "

  /** Parse the `avih` main header out of the `hdrl` list. Chunk sizes
    * are treated as UNSIGNED through a Long cursor so a hostile size
    * field cannot step the walk by zero or backwards (infinite loop). */
  def decodeMeta(b: Array[Byte]): Option[VideoMeta] =
    try {
      if (!isAvi(b)) return None
      var i = 12L
      while (i + 8 <= b.length) {
        val at = i.toInt
        val id = tag(b, at); val size = le32(b, at + 4).toLong & 0xffffffffL
        if (id == "LIST" && i + 12 <= b.length && tag(b, at + 8) == "hdrl") {
          // first subchunk must be avih (56 bytes of fields); bounds
          // BEFORE the tag read, so a truncated hdrl is a None, not a throw
          val a = at + 12
          if (a + 64 > b.length || tag(b, a) != "avih") return None
          val usPerFrame = le32(b, a + 8)
          val nFrames = le32(b, a + 24)
          val width = le32(b, a + 40)
          val height = le32(b, a + 44)
          return if (width > 0 && height > 0 && usPerFrame > 0)
            Some(VideoMeta("avi", width, height, usPerFrame, nFrames))
          else None
        }
        i += 8L + size + (size & 1L)
      }
      None
    } catch { case _: IndexOutOfBoundsException => None }

  /** Walk the `movi` list and return the raw payload of every video
    * frame chunk (`00dc`/`00db`), in stream order. Same unsigned-size
    * discipline as [[decodeMeta]]. */
  def frames(b: Array[Byte]): Seq[Array[Byte]] =
    try {
      if (!isAvi(b)) return Seq.empty
      val out = ArrayBuffer.empty[Array[Byte]]
      var i = 12L
      while (i + 8 <= b.length) {
        val at = i.toInt
        val id = tag(b, at); val size = le32(b, at + 4).toLong & 0xffffffffL
        if (id == "LIST" && i + 12 <= b.length && tag(b, at + 8) == "movi") {
          var j = at + 12L
          val end = math.min(i + 8L + size, b.length.toLong)
          while (j + 8 <= end) {
            val jat = j.toInt
            val cid = tag(b, jat); val csize = le32(b, jat + 4).toLong & 0xffffffffL
            if ((cid == "00dc" || cid == "00db") && j + 8 + csize <= end)
              out += java.util.Arrays.copyOfRange(b, jat + 8, (j + 8 + csize).toInt)
            j += 8L + csize + (csize & 1L)
          }
        }
        i += 8L + size + (size & 1L)
      }
      out.toSeq
    } catch { case _: IndexOutOfBoundsException => Seq.empty }

  /** Write a minimal structurally-valid AVI: RIFF(AVI ) { LIST(hdrl){
    * avih, LIST(strl){ strh(vids/MJPG), strf(BITMAPINFOHEADER) } },
    * LIST(movi){ 00dc per frame } }. */
  def writeAvi(width: Int, height: Int, usPerFrame: Int,
               framePayloads: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && usPerFrame > 0)
    val out = new java.io.ByteArrayOutputStream()
    def le32b(v: Int): Array[Byte] =
      Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val pad = if ((data.length & 1) == 1) Array(0.toByte) else Array.empty[Byte]
      id.getBytes("US-ASCII") ++ le32b(data.length) ++ data ++ pad
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes("US-ASCII") ++ body)

    val n = framePayloads.length
    val avih = le32b(usPerFrame) ++ le32b(0) ++ le32b(0) ++ le32b(0) ++
      le32b(n) ++ le32b(0) ++ le32b(1) ++ le32b(0) ++
      le32b(width) ++ le32b(height) ++ Array.fill(16)(0.toByte)
    val strh = "vids".getBytes("US-ASCII") ++ "MJPG".getBytes("US-ASCII") ++
      le32b(0) ++ le32b(0) ++ le32b(0) ++
      le32b(usPerFrame) /*scale*/ ++ le32b(1000000) /*rate*/ ++
      le32b(0) ++ le32b(n) ++ le32b(0) ++ le32b(-1) ++ le32b(0) ++
      Array.fill(8)(0.toByte)
    val strf = le32b(40) ++ le32b(width) ++ le32b(height) ++
      Array[Byte](1, 0, 24, 0) ++ "MJPG".getBytes("US-ASCII") ++
      le32b(width * height * 3) ++ Array.fill(16)(0.toByte)
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi",
      framePayloads.map(f => chunk("00dc", f)).foldLeft(Array.empty[Byte])(_ ++ _))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    out.write("RIFF".getBytes("US-ASCII")); out.write(le32b(body.length))
    out.write(body)
    out.toByteArray
  }
}
