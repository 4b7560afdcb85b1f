package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Vp8lCodec
import graft.llm.Vp8lCodec.Options

/** VP8L codec ground truth. VP8L is LOSSLESS, so every round-trip
  * asserts exact pixel equality. There is no JDK WebP codec, so the
  * hand-derivable layers are pinned directly: the 120-entry distance
  * table against the spec's hex anchors, the color-cache hash, and
  * the length/distance prefix-code ranges. */
class Vp8lCodecSpec extends AnyFunSuite {

  private val pix = (x: Int, y: Int) =>
    ((x * 7 + y * 13) % 256, (x * 3 + y * 5 + 17) % 256,
     (x + y * 2 + 101) % 256)

  private def rt(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int),
                 opts: Options = Options()): Unit = {
    val bytes = Vp8lCodec.encode(w, h, px, opts)
    val (gw, gh, out) = Vp8lCodec.decode(bytes)
    assert((gw, gh) === ((w, h)), s"dims $opts")
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      val o = (y * w + x) * 3
      assert(out(o) == (r % 256).toFloat && out(o + 1) == (g % 256).toFloat &&
        out(o + 2) == (b % 256).toFloat, s"($x,$y) $opts")
    }
  }

  test("round-trip: plain literals across shapes, incl. 1x1 and single-row") {
    for ((w, h) <- Seq((13, 9), (1, 1), (40, 1), (1, 17), (16, 16)))
      rt(w, h, pix, Options(useLz77 = false))
  }

  test("round-trip: LZ77 backrefs (runs, vertical, long-distance) and color cache") {
    // horizontal runs -> distance 1; repeated rows -> distance w;
    // period-73 texture -> the 8w+9 candidate exceeds the plane table
    val runs = (x: Int, y: Int) =>
      ((x / 7) * 31 % 256, (y / 3) * 53 % 256, 77)
    rt(24, 18, runs)
    rt(24, 18, runs, Options(cacheBits = 4))
    rt(24, 18, pix, Options(cacheBits = 8))
    // few distinct colors -> heavy cache hits
    val few = (x: Int, y: Int) => {
      val i = (x + y) % 3
      (Seq(10, 200, 45)(i), Seq(99, 1, 160)(i), Seq(7, 250, 33)(i))
    }
    rt(19, 11, few, Options(cacheBits = 2))
    rt(19, 11, few, Options(cacheBits = 11, useLz77 = false))
  }

  test("round-trip: each transform alone, then stacked") {
    rt(13, 9, pix, Options(subtractGreen = true))
    for (m <- 0 until 14) // every predictor mode appears in some block
      rt(21, 13, pix, Options(predictorMode = m))
    rt(17, 10, pix, Options(colorMults = Some((0x40, 0x20, 0x10))))
    rt(17, 10, pix, Options(colorMults = Some((0xFF, 0x80, 0xC3)))) // negative int8
    // stacked: subtract-green + predictor + color transform
    rt(19, 12, pix, Options(subtractGreen = true, predictorMode = 5,
      colorMults = Some((0x30, 0x15, 0x08))))
  }

  test("round-trip: color indexing with sub-byte bundling at 1/2/4 bits") {
    for (nPal <- Seq(2, 4, 13, 64)) {
      val palette = (0 until nPal).map(i =>
        ((i * 37 + 11) % 256, (i * 73 + 5) % 256, (i * 151 + 97) % 256))
      // row 0 leads with the palette colors (the fixture contract);
      // everything draws from the palette
      val px = (x: Int, y: Int) =>
        if (y == 0 && x < nPal) palette(x)
        else palette((x * 3 + y * 7) % nPal)
      rt(math.max(nPal, 15), 8, px, Options(paletteSize = nPal))
    }
  }

  test("round-trip: two meta prefix-code groups (left/right split)") {
    // statistically different halves so the two code sets differ
    val split = (x: Int, y: Int) =>
      if (x < 16) ((x + y) % 4, (x * y) % 4, 3)
      else ((x * 31 + y * 7) % 256, (x * 13 + y * 3) % 256, (x + y) % 256)
    rt(32, 12, split, Options(metaGroups = 2))
    rt(32, 12, split, Options(metaGroups = 2, cacheBits = 5))
  }

  test("round-trip: code-length repeats on and off produce identical pixels") {
    val bytesOn = Vp8lCodec.encode(15, 9, pix, Options(useRepeats = true))
    val bytesOff = Vp8lCodec.encode(15, 9, pix, Options(useRepeats = false))
    assert(Vp8lCodec.decode(bytesOn)._3.toSeq ==
      Vp8lCodec.decode(bytesOff)._3.toSeq)
  }

  test("hand-worked layers: distance table anchors, cache hash, prefix ranges") {
    // spec hex anchors: dist_code = (dy << 4) | (8 - dx)
    def hex(i: Int): Int = {
      val (dx, dy) = Vp8lCodec.DistTable(i)
      (dy << 4) | (8 - dx)
    }
    val expectedHead = Seq(0x18, 0x07, 0x17, 0x19, 0x28, 0x06, 0x27, 0x29,
      0x16, 0x1a, 0x26, 0x2a, 0x38, 0x05)
    assert((0 until 14).map(hex) == expectedHead)
    assert(hex(96) == 0x00, "entry 97 must be (8,0)") // 0-indexed 96
    assert(hex(118) == 0x60 && hex(119) == 0x70, "tail (8,6)(8,7)")
    assert(Vp8lCodec.DistTable.length == 120)
    assert(Vp8lCodec.DistTable.distinct.length == 120)
    // color-cache hash: identity used by both sides
    val m = Vp8lCodec.getClass.getDeclaredMethods
      .find(_.getName.endsWith("cacheHash")).get
    m.setAccessible(true)
    def h(argb: Int, bits: Int) = m.invoke(Vp8lCodec,
      Integer.valueOf(argb), Integer.valueOf(bits)).asInstanceOf[Int]
    assert(h(0xFF000000, 4) == ((0x1e35a7bd * 0xFF000000).toInt >>> 28))
    assert((0 to 10).forall(i => h(i * 1000 + 7, 6) < 64 &&
      h(i * 1000 + 7, 6) >= 0))
    // prefix code ranges: code<4 -> code+1; code 4 starts at 5
    val pd = Vp8lCodec.getClass.getDeclaredMethods
      .find(_.getName.endsWith("prefixEncode")).get
    pd.setAccessible(true)
    def pe(v: Int) = pd.invoke(Vp8lCodec, Integer.valueOf(v))
      .asInstanceOf[(Int, Int, Int)]
    assert(pe(1) == ((0, 0, 0)) && pe(4) == ((3, 0, 0)))
    assert(pe(5) == ((4, 1, 0)) && pe(6) == ((4, 1, 1)))
    assert(pe(7) == ((5, 1, 0)) && pe(9) == ((6, 2, 0)))
    assert(pe(4096)._1 == 23, "max LZ77 length uses the last length code")
  }

  test("refusals: lossy VP8, truncation, oversize dims, junk") {
    val lossy = graft.llm.ImageFixtures.webp(64, 48, "lossy")
    val ex = intercept[IllegalArgumentException] {
      Vp8lCodec.decode(lossy)
    }
    assert(ex.getMessage.contains("lossy"), ex.getMessage)
    intercept[IllegalArgumentException] {
      Vp8lCodec.decode("RIFFxxxxWAVE".getBytes("US-ASCII"))
    }
    val good = Vp8lCodec.encode(9, 7, pix)
    intercept[IllegalArgumentException] {
      Vp8lCodec.decode(good.take(good.length - 4))
    }
    // 14-bit dims maxed out: 16384 x 16384 = 268M px, over the cap
    val big = good.clone()
    // payload starts at byte 20 (RIFF+WEBP+VP8L headers); dims live in
    // the 28 bits after the signature byte
    big(21) = 0xFF.toByte; big(22) = 0xFF.toByte; big(23) = 0xFF.toByte
    big(24) = (big(24) | 0x0F).toByte
    val ex2 = intercept[IllegalArgumentException] { Vp8lCodec.decode(big) }
    assert(ex2.getMessage.contains("too large") ||
      ex2.getMessage.contains("truncated"), ex2.getMessage)
  }

  test("dispatch: the image decode path sniffs lossless WebP") {
    val bytes = Vp8lCodec.encode(12, 8, pix, Options(cacheBits = 3))
    val via = graft.llm.Multimodal.BmpWavDecoder.decode(bytes, "image")
    assert(via.toSeq == Vp8lCodec.decode(bytes)._3.toSeq)
    // ImageMeta's header read agrees with the full decode on dims
    val (w, h, _) = Vp8lCodec.decode(bytes)
    assert((w, h) == ((12, 8)))
  }
}
