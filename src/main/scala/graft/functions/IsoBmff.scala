package graft.functions

/** ISO-BMFF (MP4) box walk — header-only census for the dominant real
  * video container, extending the [[ImageCodec.decode]] /
  * [[JpegCodec.samplingOf]] pattern to video: brand, movie duration,
  * and track count come out of `ftyp`/`moov`/`mvhd`/`trak` without
  * touching a single sample payload, so a corpus census over mixed
  * crawl media stays metadata-cheap even when the files are huge.
  *
  * Hostile-input contract (the Archives/ImageCodec discipline): sizes
  * are validated in Long space, size==0 (to-end) and size==1 (64-bit
  * largesize) boxes are handled, and any malformed structure returns
  * None instead of escaping an exception into the task.
  */
object IsoBmff {

  final case class Mp4Meta(brand: String, timescale: Long, duration: Long,
                           nTracks: Int) {
    def durationMs: Long =
      if (timescale <= 0) 0L else duration * 1000L / timescale
  }

  private def u32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def u64(b: Array[Byte], i: Int): Long =
    (u32(b, i) << 32) | u32(b, i + 4)
  private def fourcc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  /** Walk the boxes in [from, to) invoking f(type, payloadStart,
    * payloadEnd); returns false on malformed structure. */
  private def walk(b: Array[Byte], from: Long, to: Long)
                  (f: (String, Long, Long) => Unit): Boolean = {
    var p = from
    while (p < to) {
      if (p + 8 > to) return false
      val size0 = u32(b, p.toInt)
      val typ = fourcc(b, p.toInt + 4)
      var payload = p + 8
      val end: Long =
        if (size0 == 0L) to // box extends to the end of the enclosing box
        else if (size0 == 1L) { // 64-bit largesize follows the type
          if (p + 16 > to) return false
          payload = p + 16
          p + u64(b, p.toInt + 8)
        } else p + size0
      if (end < payload || end > to) return false
      f(typ, payload, end)
      p = end
    }
    true
  }

  /** Header-only census of an MP4: None for non-BMFF/corrupt input. */
  def census(b: Array[Byte]): Option[Mp4Meta] =
    try {
      if (b.length < 12 || fourcc(b, 4) != "ftyp") return None
      var brand: String = null
      var timescale = 0L
      var duration = 0L
      var nTracks = 0
      var sawMvhd = false
      val ok = walk(b, 0L, b.length.toLong) { (typ, from, to) =>
        typ match {
          case "ftyp" =>
            if (to - from >= 4) brand = fourcc(b, from.toInt)
          case "moov" =>
            walk(b, from, to) { (child, cFrom, cTo) =>
              child match {
                case "mvhd" if cTo - cFrom >= 4 =>
                  val version = b(cFrom.toInt) & 0xff
                  if (version == 0 && cTo - cFrom >= 20) {
                    timescale = u32(b, cFrom.toInt + 12)
                    duration = u32(b, cFrom.toInt + 16)
                    sawMvhd = true
                  } else if (version == 1 && cTo - cFrom >= 32) {
                    timescale = u32(b, cFrom.toInt + 20)
                    duration = u64(b, cFrom.toInt + 24)
                    sawMvhd = true
                  }
                case "trak" => nTracks += 1
                case _ => ()
              }
            }
          case _ => ()
        }
      }
      if (ok && brand != null && sawMvhd)
        Some(Mp4Meta(brand, timescale, duration, nTracks))
      else None
    } catch {
      case _: IndexOutOfBoundsException => None
    }

  // ----------------------------------------------- AVIF / HEIF census

  /** AVIF/HEIF image census: brand, pixel dimensions from the first
    * `ispe` property, bit depth from `pixi`, and the `iinf` item count
    * — the fastest-growing image container, read through the same box
    * walk as MP4 (the `meta` box and its `ispe`/`pixi`/`iinf` children
    * are FULL boxes: 4 version/flags bytes before content). Header
    * only; AV1 payload decode is out of scope (a video-codec-sized
    * project, the [[WebpCodec]] VP8X stance). Hostile input → None. */
  final case class AvifMeta(brand: String, width: Long, height: Long,
                            depth: Int, nItems: Int)

  def avifCensus(b: Array[Byte]): Option[AvifMeta] =
    try {
      if (b.length < 12 || fourcc(b, 4) != "ftyp") return None
      var brand: String = null
      var width = -1L
      var height = -1L
      var depth = -1
      var nItems = -1
      val ok = walk(b, 0L, b.length.toLong) { (typ, from, to) =>
        typ match {
          case "ftyp" =>
            if (to - from >= 4) brand = fourcc(b, from.toInt)
          case "meta" if to - from >= 4 =>
            // FullBox: skip version/flags
            walk(b, from + 4, to) { (child, cFrom, cTo) =>
              child match {
                case "iinf" if cTo - cFrom >= 6 =>
                  val v = b(cFrom.toInt) & 0xff
                  nItems =
                    if (v == 0) ((b(cFrom.toInt + 4) & 0xff) << 8) |
                      (b(cFrom.toInt + 5) & 0xff)
                    else if (cTo - cFrom >= 8) u32(b, cFrom.toInt + 4).toInt
                    else -1
                case "iprp" =>
                  walk(b, cFrom, cTo) { (p2, pFrom, pTo) =>
                    if (p2 == "ipco") {
                      walk(b, pFrom, pTo) { (prop, qFrom, qTo) =>
                        prop match {
                          case "ispe" if width < 0 && qTo - qFrom >= 12 =>
                            width = u32(b, qFrom.toInt + 4)
                            height = u32(b, qFrom.toInt + 8)
                          case "pixi" if depth < 0 && qTo - qFrom >= 6 =>
                            depth = b(qFrom.toInt + 5) & 0xff
                          case _ => ()
                        }
                      }
                    }
                  }
                case _ => ()
              }
            }
          case _ => ()
        }
      }
      if (ok && brand != null && width > 0 && height > 0)
        Some(AvifMeta(brand, width, height, depth, nItems))
      else None
    } catch {
      case _: IndexOutOfBoundsException => None
    }

  private def fullBox(typ: String, payload: Array[Byte]): Array[Byte] =
    box(typ, Array[Byte](0, 0, 0, 0) ++ payload)

  /** Minimal structurally-valid AVIF/HEIF: ftyp + meta(hdlr pict, iinf
    * with `nItems` infe entries, iprp/ipco with ispe + pixi). */
  def writeAvif(brand: String, width: Long, height: Long, depth: Int,
                nItems: Int): Array[Byte] = {
    require(width >= 1 && height >= 1 && depth >= 1 && depth <= 16 &&
      nItems >= 1 && nItems <= 999 && brand.length == 4, "bad avif shape")
    val ftyp = box("ftyp", brand.getBytes("US-ASCII") ++ be32(0L) ++
      brand.getBytes("US-ASCII") ++ "mif1".getBytes("US-ASCII"))
    val hdlr = fullBox("hdlr", be32(0L) ++ "pict".getBytes("US-ASCII") ++
      new Array[Byte](12) ++ Array[Byte](0))
    val infes = (1 to nItems).map { i =>
      fullBox("infe", Array[Byte](0, i.toByte, 0, 0) ++
        "av01".getBytes("US-ASCII") ++ Array[Byte](0))
    }
    val iinf = fullBox("iinf",
      Array[Byte]((nItems >> 8).toByte, (nItems & 0xff).toByte) ++
        infes.flatten.toArray)
    val ispe = fullBox("ispe", be32(width) ++ be32(height))
    val pixi = fullBox("pixi", Array[Byte](1, depth.toByte))
    val ipco = box("ipco", ispe ++ pixi)
    val iprp = box("iprp", ipco)
    val meta = fullBox("meta", hdlr ++ iinf ++ iprp)
    ftyp ++ meta
  }

  // --------------------------------------------------- per-track walk

  final case class TrackMeta(handler: String, timescale: Long,
                             duration: Long, nSamples: Long,
                             totalBytes: Long, maxSample: Long) {
    def durationMs: Long =
      if (timescale <= 0) 0L else duration * 1000L / timescale
  }

  /** Per-track census: walk moov → trak → mdia → (mdhd, hdlr, minf →
    * stbl → stsz) and report the numbers a video-corpus governance
    * pass sizes tracks by — handler type, media duration, sample
    * count, and sample byte mass — all from the index boxes, never
    * touching mdat. None on non-BMFF / malformed structure; a trak
    * missing its index boxes contributes a row with zeros rather than
    * poisoning the file (real crawls carry such stubs). */
  def tracks(b: Array[Byte]): Option[Seq[TrackMeta]] =
    try {
      if (b.length < 12 || fourcc(b, 4) != "ftyp") return None
      val out = Seq.newBuilder[TrackMeta]
      var structOk = true
      val ok = walk(b, 0L, b.length.toLong) { (typ, from, to) =>
        if (typ == "moov") {
          structOk &&= walk(b, from, to) { (child, cFrom, cTo) =>
            if (child == "trak") {
              var handler = ""
              var ts = 0L
              var dur = 0L
              var n = 0L
              var total = 0L
              var mx = 0L
              structOk &&= walk(b, cFrom, cTo) { (t2, f2, t2o) =>
                if (t2 == "mdia") {
                  structOk &&= walk(b, f2, t2o) { (t3, f3, t3o) =>
                    t3 match {
                      case "mdhd" if t3o - f3 >= 24 =>
                        val v = b(f3.toInt) & 0xff
                        if (v == 0) {
                          ts = u32(b, f3.toInt + 12)
                          dur = u32(b, f3.toInt + 16)
                        } else if (v == 1 && t3o - f3 >= 32) {
                          ts = u32(b, f3.toInt + 20)
                          dur = u64(b, f3.toInt + 24)
                        }
                      case "hdlr" if t3o - f3 >= 12 =>
                        handler = fourcc(b, f3.toInt + 8)
                      case "minf" =>
                        structOk &&= walk(b, f3, t3o) { (t4, f4, t4o) =>
                          if (t4 == "stbl") {
                            structOk &&= walk(b, f4, t4o) { (t5, f5, t5o) =>
                              if (t5 == "stsz" && t5o - f5 >= 12) {
                                val fixed = u32(b, f5.toInt + 4)
                                n = u32(b, f5.toInt + 8)
                                if (fixed != 0L) {
                                  total = fixed * n; mx = if (n > 0) fixed else 0L
                                } else if (t5o - f5 >= 12 + 4 * n) {
                                  var j = 0
                                  while (j < n) {
                                    val sz = u32(b, f5.toInt + 12 + 4 * j)
                                    total += sz
                                    if (sz > mx) mx = sz
                                    j += 1
                                  }
                                } else structOk = false
                              }
                            }
                          }
                        }
                      case _ => ()
                    }
                  }
                }
              }
              out += TrackMeta(handler, ts, dur, n, total, mx)
            }
          }
        }
      }
      if (ok && structOk) Some(out.result()) else None
    } catch {
      case _: IndexOutOfBoundsException => None
    }

  // ------------------------------------------------------------- writer

  private def be32(v: Long): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
  private def box(typ: String, payload: Array[Byte]): Array[Byte] =
    be32(payload.length + 8L) ++ typ.getBytes("US-ASCII") ++ payload

  /** Formula-built minimal MP4: ftyp with the given major brand, moov
    * with a version-0 or version-1 mvhd and `nTracks` stub trak boxes,
    * and an empty mdat — structurally valid for any box walker. */
  def writeMp4(brand: String, timescale: Long, duration: Long,
               nTracks: Int, mvhdV1: Boolean): Array[Byte] = {
    val ftyp = box("ftyp",
      brand.getBytes("US-ASCII") ++ be32(0L) ++ "isom".getBytes("US-ASCII"))
    val mvhd =
      if (!mvhdV1) {
        // version 0: 100-byte payload (times/timescale/duration u32)
        val p = new Array[Byte](100)
        System.arraycopy(be32(timescale), 0, p, 12, 4)
        System.arraycopy(be32(duration), 0, p, 16, 4)
        p(96) = 0; p(97) = 0; p(98) = 0; p(99) = 2 // next_track_ID
        p(0) = 0 // version
        box("mvhd", p)
      } else {
        // version 1: 112-byte payload (times/duration u64)
        val p = new Array[Byte](112)
        p(0) = 1
        System.arraycopy(be32(timescale), 0, p, 20, 4)
        System.arraycopy(be32(duration >>> 32), 0, p, 24, 4)
        System.arraycopy(be32(duration & 0xffffffffL), 0, p, 28, 4)
        box("mvhd", p)
      }
    val traks = (1 to nTracks).map(_ => box("trak", Array.empty[Byte]))
      .foldLeft(Array.empty[Byte])(_ ++ _)
    val moov = box("moov", mvhd ++ traks)
    val mdat = box("mdat", Array.empty[Byte])
    ftyp ++ moov ++ mdat
  }

  final case class TrackSpec(handler: String, timescale: Long,
                             duration: Long, sampleSizes: Seq[Long])

  /** Formula-built MP4 with REAL per-track index boxes: each trak
    * carries mdia → mdhd (v0), hdlr (handler type), minf → stbl →
    * stsz (per-sample size table) + stts (one run of equal deltas) —
    * everything [[tracks]] walks, structurally valid for any BMFF
    * parser. */
  def writeMp4Tracks(brand: String, timescale: Long, duration: Long,
                     specs: Seq[TrackSpec]): Array[Byte] = {
    val ftyp = box("ftyp",
      brand.getBytes("US-ASCII") ++ be32(0L) ++ "isom".getBytes("US-ASCII"))
    val mvhd = {
      val p = new Array[Byte](100)
      System.arraycopy(be32(timescale), 0, p, 12, 4)
      System.arraycopy(be32(duration), 0, p, 16, 4)
      p(99) = (specs.size + 1).toByte
      box("mvhd", p)
    }
    val traks = specs.map { t =>
      val mdhd = {
        val p = new Array[Byte](24)
        System.arraycopy(be32(t.timescale), 0, p, 12, 4)
        System.arraycopy(be32(t.duration), 0, p, 16, 4)
        p(20) = 0x55; p(21) = (0xc4 - 256).toByte // language "und"
        box("mdhd", p)
      }
      val hdlr = box("hdlr",
        new Array[Byte](8) ++ t.handler.getBytes("US-ASCII") ++
          new Array[Byte](12) ++ Array[Byte](0))
      val stsz = box("stsz",
        new Array[Byte](4) ++ be32(0L) ++ be32(t.sampleSizes.size.toLong) ++
          t.sampleSizes.flatMap(be32(_)).toArray)
      val stts = box("stts",
        new Array[Byte](4) ++ be32(1L) ++
          be32(t.sampleSizes.size.toLong) ++
          be32(if (t.sampleSizes.isEmpty) 0L
            else t.duration / math.max(1L, t.sampleSizes.size.toLong)))
      val stbl = box("stbl", stsz ++ stts)
      val minf = box("minf", stbl)
      val mdia = box("mdia", mdhd ++ hdlr ++ minf)
      box("trak", mdia)
    }.foldLeft(Array.empty[Byte])(_ ++ _)
    val moov = box("moov", mvhd ++ traks)
    ftyp ++ moov ++ box("mdat", Array.empty[Byte])
  }
}
