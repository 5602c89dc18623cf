package graft

import graft.functions.Vp8Codec
import graft.functions.Vp8Codec.Yuv

/** VP8 lossy keyframe laws. The strongest gates are libwebp interop in
  * BOTH directions (via a python/ctypes driver over the system
  * libwebp.so — the reference codec available in this container):
  * every frame the reference encoder produces across content shapes ×
  * qualities must decode YUV-plane-exact (that covers segmentation,
  * all intra modes incl. the ten B_PRED submodes, token prob updates,
  * multi-strength normal loop filtering), and every frame OUR encoder
  * emits must decode identically through the reference. Plus the
  * self round-trip matrix and the never-throw fuzz surface. */
class Round10Vp8Spec extends org.scalatest.funsuite.AnyFunSuite {

  private val libwebp = new java.io.File("/usr/lib/x86_64-linux-gnu/libwebp.so.7")
  private def python3: Option[String] = {
    import scala.sys.process._
    scala.util.Try(Seq("python3", "-c", "import ctypes").! == 0)
      .toOption.filter(identity).map(_ => "python3")
  }

  private val PyDriver =
    """import ctypes, sys, os, struct, math
      |lib = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libwebp.so.7")
      |lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
      |lib.WebPDecodeYUV.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
      |    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
      |    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
      |    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
      |    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
      |lib.WebPEncodeRGB.restype = ctypes.c_size_t
      |lib.WebPEncodeRGB.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
      |    ctypes.c_int, ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
      |def dec(data):
      |    w=ctypes.c_int();h=ctypes.c_int()
      |    up=ctypes.POINTER(ctypes.c_uint8)();vp=ctypes.POINTER(ctypes.c_uint8)()
      |    s=ctypes.c_int();us=ctypes.c_int()
      |    y=lib.WebPDecodeYUV(data,len(data),ctypes.byref(w),ctypes.byref(h),
      |        ctypes.byref(up),ctypes.byref(vp),ctypes.byref(s),ctypes.byref(us))
      |    if not y: return None
      |    W,H,S,US=w.value,h.value,s.value,us.value
      |    cw,ch=(W+1)//2,(H+1)//2
      |    yb=b"".join(bytes(y[r*S:r*S+W]) for r in range(H))
      |    ub=b"".join(bytes(up[r*US:r*US+cw]) for r in range(ch))
      |    vb=b"".join(bytes(vp[r*US:r*US+cw]) for r in range(ch))
      |    return W,H,yb,ub,vb
      |def read_dump(p):
      |    d=open(p,'rb').read()
      |    w,h=struct.unpack('<ii',d[:8])
      |    cw,ch=(w+1)//2,(h+1)//2
      |    return w,h,d[8:8+w*h],d[8+w*h:8+w*h+cw*ch],d[8+w*h+cw*ch:]
      |d=sys.argv[2]
      |if sys.argv[1]=='gen':
      |    cases=[('flat',32,32,75,lambda c,r:(120,130,140)),
      |           ('blocks',64,48,75,lambda c,r:((c//16*40)%256,(r//16*60)%256,90)),
      |           ('grad',48,32,75,lambda c,r:((c*5)%256,(r*7)%256,(c+r)%256)),
      |           ('busy',80,56,50,lambda c,r:((c*c+r)%256,(c^r)*3%256,(r*r-c)%256)),
      |           ('busyq95',33,29,95,lambda c,r:((c*13+r*7)%256,(c*3^r)%256,(255-c*r)%256)),
      |           ('photo',128,96,75,lambda c,r:(int(128+90*math.sin(c/9)*math.cos(r/11))%256,
      |               int(110+70*math.sin((c+r)/13))%256,int(140+80*math.cos(c*r/700))%256)),
      |           ('tiny',8,8,60,lambda c,r:(c*30%256,r*30%256,128)),
      |           ('tall',16,128,40,lambda c,r:((r*3)%256,(c*9+r)%256,77))]
      |    for name,w,h,q,px in cases:
      |        rgb=bytes(v for r in range(h) for c in range(w) for v in px(c,r))
      |        out=ctypes.POINTER(ctypes.c_uint8)()
      |        n=lib.WebPEncodeRGB(rgb,w,h,3*w,float(q),ctypes.byref(out))
      |        assert n>0
      |        open(os.path.join(d,name+'.webp'),'wb').write(bytes(out[i] for i in range(n)))
      |    print('GEN OK')
      |elif sys.argv[1]=='check':
      |    bad=0
      |    for f in sorted(os.listdir(d)):
      |        if not f.endswith('.webp'): continue
      |        dump=os.path.join(d,f+'.ours.yuv')
      |        if not os.path.exists(dump): print('MISSING',f); bad+=1; continue
      |        ref=dec(open(os.path.join(d,f),'rb').read())
      |        if ref is None: print('REJECT',f); bad+=1; continue
      |        W,H,ry,ru,rv=ref
      |        w,h,oy,ou,ov=read_dump(dump)
      |        if (W,H)!=(w,h) or ry!=oy or ru!=ou or rv!=ov:
      |            print('DIFF',f); bad+=1
      |        else: print('EXACT',f)
      |    print('BAD',bad)
      |""".stripMargin

  private def dumpYuv(path: java.nio.file.Path, y: Yuv): Unit = {
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff); out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff) }
    le32(y.width); le32(y.height)
    out.write(y.y, 0, y.y.length)
    out.write(y.u, 0, y.u.length)
    out.write(y.v, 0, y.v.length)
    java.nio.file.Files.write(path, out.toByteArray)
  }

  private def mkYuv(w: Int, h: Int, kind: Int): Yuv = {
    val cw = (w + 1) / 2; val ch = (h + 1) / 2
    val y = Array.tabulate(w * h) { i =>
      val c = i % w; val r = i / w
      (kind match {
        case 0 => 128
        case 1 => 40 + ((c / 16) * 13 + (r / 16) * 29) % 180
        case 2 => (c * 5 + r * 3) % 256
        case _ => ((c * c + r * r) / 7 + (c ^ r)) % 256
      }).toByte
    }
    val u = Array.tabulate(cw * ch)(i => ((90 + (i % cw) * 2 + i / cw) % 256).toByte)
    val v = Array.tabulate(cw * ch)(i => ((170 - (i % cw) + (i / cw) * 2) % 256).toByte)
    Yuv(w, h, y, u, v)
  }

  test("every reference-libwebp lossy frame decodes YUV-plane-exact") {
    import scala.sys.process._
    assume(libwebp.canRead && python3.isDefined, "libwebp/python3 not available")
    val dir = java.nio.file.Files.createTempDirectory("vp8spec_real")
    val py = dir.resolve("drv.py")
    java.nio.file.Files.writeString(py, PyDriver)
    assert(Seq("python3", py.toString, "gen", dir.toString).!!.contains("GEN OK"))
    java.nio.file.Files.list(dir).toArray.map(_.toString)
      .filter(_.endsWith(".webp")).foreach { f =>
        val b = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f))
        val dec = Vp8Codec.decodeWebp(b)
        assert(dec.isDefined, s"$f did not decode")
        dumpYuv(java.nio.file.Paths.get(f + ".ours.yuv"), dec.get)
      }
    val out = Seq("python3", py.toString, "check", dir.toString).!!
    assert(out.contains("BAD 0"), s"reference disagreement:\n$out")
    assert("EXACT".r.findAllIn(out).size == 8)
  }

  test("our encoder's frames decode identically through the reference") {
    import scala.sys.process._
    assume(libwebp.canRead && python3.isDefined, "libwebp/python3 not available")
    val dir = java.nio.file.Files.createTempDirectory("vp8spec_ours")
    val py = dir.resolve("drv.py")
    java.nio.file.Files.writeString(py, PyDriver)
    for (kind <- 0 to 3; (w, h) <- Seq((32, 32), (48, 16), (33, 17), (16, 48))) {
      val src = mkYuv(w, h, kind)
      val webp = Vp8Codec.encodeWebp(src, qi = 16 + kind * 24)
      val name = dir.resolve(s"k${kind}_${w}x$h.webp")
      java.nio.file.Files.write(name, webp)
      val dec = Vp8Codec.decodeWebp(webp)
      assert(dec.isDefined, s"self-decode failed k$kind ${w}x$h")
      dumpYuv(java.nio.file.Paths.get(name.toString + ".ours.yuv"), dec.get)
    }
    val out = Seq("python3", py.toString, "check", dir.toString).!!
    assert(out.contains("BAD 0"), s"reference disagreement on our frames:\n$out")
  }

  test("self round-trip: decode(encode) stays within quantizer error") {
    for (kind <- 0 to 3; qi <- Seq(4, 40, 100)) {
      val src = mkYuv(48, 32, kind)
      val dec = Vp8Codec.decodeWebp(Vp8Codec.encodeWebp(src, qi))
      assert(dec.isDefined)
      val d = dec.get
      assert(d.width == 48 && d.height == 32)
      // quantizer-bounded reconstruction error on luma
      val maxErr = (0 until 48 * 32).map(i =>
        math.abs((d.y(i) & 0xff) - (src.y(i) & 0xff))).max
      val bound = graft.functions.Vp8Tables.AcQLookup(qi) * 3 + 8
      assert(maxErr <= bound, s"kind $kind qi $qi: maxErr $maxErr > $bound")
    }
  }

  test("inter frames, truncation, and bit flips reject or decode, never throw") {
    val webp = Vp8Codec.encodeWebp(mkYuv(32, 32, 2), qi = 30)
    // non-key frame tag (bit0 = 1) must reject
    val frameAt = 20 // RIFF(12) + 'VP8 '+size(8)
    val nonKey = webp.clone()
    nonKey(frameAt) = (nonKey(frameAt) | 1).toByte
    assert(Vp8Codec.decodeWebp(nonKey).isEmpty, "inter frame must reject")
    // truncations
    for (cut <- Seq(5, 15, 25, webp.length / 2, webp.length - 3))
      Vp8Codec.decodeWebp(webp.take(cut))
    // fuzz
    val rnd = new scala.util.Random(31337)
    for (_ <- 1 to 600) {
      val f = webp.clone()
      val i = rnd.nextInt(f.length)
      f(i) = (f(i) ^ (1 << rnd.nextInt(8))).toByte
      Vp8Codec.decodeWebp(f)
    }
    for (_ <- 1 to 200)
      Vp8Codec.decodeWebp(Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte))
  }

  test("VP8X extended containers decode: the frame chunk is found past metadata") {
    val src = mkYuv(32, 16, 1)
    val frame = Vp8Codec.encodeFrame(src, qi = 24)
    // wrap as RIFF/WEBP with a VP8X chunk (canvas dims) + junk EXIF
    // chunk BEFORE the VP8 chunk — the shape real extended files have
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff); out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff) }
    def chunk(tagS: String, body: Array[Byte]): Unit = {
      out.write(tagS.getBytes("US-ASCII")); le32(body.length)
      out.write(body, 0, body.length)
      if ((body.length & 1) == 1) out.write(0)
    }
    val vp8x = Array[Byte](0x0c, 0, 0, 0, // flags: EXIF bit-ish
      31, 0, 0, // canvas w-1 (24-bit LE)
      15, 0, 0) // canvas h-1
    val exif = "Exif  fakemeta".getBytes("ISO-8859-1")
    val inner = new java.io.ByteArrayOutputStream()
    chunk("VP8X", vp8x); chunk("EXIF", exif); chunk("VP8 ", frame)
    val chunks = out.toByteArray
    val riff = new java.io.ByteArrayOutputStream()
    riff.write("RIFF".getBytes("US-ASCII"))
    val payload = 4 + chunks.length
    riff.write(payload & 0xff); riff.write((payload >> 8) & 0xff)
    riff.write((payload >> 16) & 0xff); riff.write((payload >> 24) & 0xff)
    riff.write("WEBP".getBytes("US-ASCII")); riff.write(chunks, 0, chunks.length)
    val webp = riff.toByteArray
    // the bare-container decode and the extended-container decode agree
    val bare = Vp8Codec.decodeWebp(Vp8Codec.wrapWebp(frame)).get
    val ext = Vp8Codec.decodeWebp(webp)
    assert(ext.isDefined, "extended container must decode")
    assert(java.util.Arrays.equals(ext.get.y, bare.y))
    // the ImageCodec dispatch route works too
    assert(graft.functions.ImageCodec.decodePixels(webp).exists(_.format == "webp-vp8"))
    // census sees it as extended
    assert(graft.functions.WebpCodec.meta(webp).exists(_.variant == "extended"))
  }

  test("toRgb produces a stable raster for perceptual use") {
    val d = Vp8Codec.decodeWebp(Vp8Codec.encodeWebp(mkYuv(16, 16, 1), 20)).get
    val rgb = Vp8Codec.toRgb(d)
    assert(rgb.length == 256)
    assert(rgb.forall(p => (p & 0xff000000) == 0))
  }
}
