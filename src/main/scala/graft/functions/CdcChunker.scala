package graft.functions

/** Content-defined chunking (CDC) with a Gear rolling hash — the
  * boundary detector behind binary-level dedup of raw crawl payloads.
  *
  * Fixed-block hashing (split every N bytes, hash each block) is
  * defeated by a single inserted byte: every block boundary after the
  * insertion shifts, so two payloads that share 99% of their bytes at
  * different offsets hash to disjoint block sets. CDC instead cuts
  * where the CONTENT says to cut — a rolling hash over the trailing
  * [[GearWindow]] bytes fires a boundary when its low [[MaskBits]]
  * bits are zero — so after any insertion the chunker re-synchronizes
  * at the next content-determined boundary and the shared region
  * yields byte-identical chunks in both payloads.
  *
  * Determinism and locality: the gear table is a fixed SplitMix64
  * expansion of a constant seed, the hash state depends only on the
  * trailing window, and each payload is chunked independently — the
  * chunker is a pure function of the bytes, embarrassingly parallel
  * across a 100 TB corpus, and identical across JVMs (no
  * `Array.hashCode`, no object identity anywhere).
  *
  * Re-synchronization guarantee (the property the dedup op relies
  * on): once both payloads have advanced ≥ [[GearWindow]] bytes past
  * their current chunk starts inside a shared region, the cut
  * predicate depends only on shared content, so the next natural
  * boundary lands at the SAME content position in both — any shared
  * region longer than `2·MaxChunk + GearWindow` therefore contains at
  * least one complete chunk common to both payloads.
  */
object CdcChunker {

  /** Minimum chunk length — cuts are suppressed below it (keeps tiny
    * chunks from flooding the index). */
  val MinChunk = 64

  /** Forced-cut ceiling — bounds worst-case chunk size so executor
    * memory per chunk is capped even on pathological content. */
  val MaxChunk = 1024

  /** Boundary fires when the low `MaskBits` bits of the gear hash are
    * zero → expected chunk length ≈ MinChunk + 2^MaskBits. */
  val MaskBits = 8

  /** Effective sliding-window length of the gear hash: each step
    * shifts one bit, so a byte influences the state for 64 steps. */
  val GearWindow = 64

  private val Mask = (1L << MaskBits) - 1

  /** 256-entry gear table: SplitMix64 stream from a fixed seed. */
  private val Gear: Array[Long] = {
    var x = 0x9e3779b97f4a7c15L
    Array.fill(256) {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
  }

  /** Chunk end offsets (exclusive, ascending, last == b.length; empty
    * input → no chunks). Pure and allocation-light: one pass, one
    * output builder. */
  def boundaries(b: Array[Byte]): Array[Int] = {
    val out = Array.newBuilder[Int]
    var start = 0
    var h = 0L
    var i = 0
    while (i < b.length) {
      h = (h << 1) + Gear(b(i) & 0xff)
      val len = i - start + 1
      if ((len >= MinChunk && (h & Mask) == 0L) || len >= MaxChunk) {
        out += i + 1
        start = i + 1
        h = 0L
      }
      i += 1
    }
    if (start < b.length) out += b.length
    out.result()
  }

  /** (offset, length, md5-hex) per chunk — the 128-bit digest is the
    * dedup join key, so cross-payload chunk equality needs no byte
    * comparison and no bytes in the shuffle. */
  def chunks(b: Array[Byte]): Seq[(Int, Int, String)] = {
    val ends = boundaries(b)
    val md = java.security.MessageDigest.getInstance("MD5")
    var start = 0
    ends.toSeq.map { e =>
      md.reset()
      md.update(b, start, e - start)
      val hex = md.digest().map(x => f"$x%02x").mkString
      val r = (start, e - start, hex)
      start = e
      r
    }
  }
}
