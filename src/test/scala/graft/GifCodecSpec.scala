package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.GifCodec
import graft.llm.GifCodec.FrameSpec

/** GIF codec ground truth: GIF is LOSSLESS, so round-trips assert
  * exact equality and the ImageIO cross-checks compare decoder output
  * bit-for-bit — no tolerance games. */
class GifCodecSpec extends AnyFunSuite {

  private val pal16 = (0 until 16).map(i =>
    ((i * 11) % 256, (i * 29 + 3) % 256, (i * 53 + 7) % 256))

  private def planeOf(w: Int, h: Int, palette: Seq[(Int, Int, Int)],
                      idx: (Int, Int) => Int): Array[Float] = {
    val out = new Array[Float](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = palette(idx(x, y))
      val o = (y * w + x) * 3
      out(o) = r.toFloat; out(o + 1) = g.toFloat; out(o + 2) = b.toFloat
    }
    out
  }

  test("round-trip: palette formula survives LZW exactly, plain and interlaced") {
    val idx = (x: Int, y: Int) => (x * 3 + y * 7) % 16
    for ((w, h) <- Seq((13, 9), (8, 8), (1, 1), (16, 11), (40, 3));
         il <- Seq(false, true)) {
      val bytes = GifCodec.encode(w, h, pal16,
        Seq(FrameSpec(0, 0, w, h, idx)), interlace = il)
      val (gw, gh, out) = GifCodec.decode(bytes)
      assert((gw, gh) === ((w, h)), s"$w x $h il=$il dims")
      assert(out.toSeq == planeOf(w, h, pal16, idx).toSeq,
        s"$w x $h il=$il plane")
    }
  }

  test("ImageIO decodes OUR stream identically (lossless cross-check)") {
    val idx = (x: Int, y: Int) => (x + y * 5) % 16
    val w = 23; val h = 17
    for (il <- Seq(false, true)) {
      val bytes = GifCodec.encode(w, h, pal16,
        Seq(FrameSpec(0, 0, w, h, idx)), interlace = il)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null && img.getWidth == w && img.getHeight == h,
        s"ImageIO rejected our stream (il=$il)")
      val mine = GifCodec.decode(bytes)._3
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        val o = (y * w + x) * 3
        assert(mine(o) == ((rgb >> 16) & 0xFF).toFloat &&
               mine(o + 1) == ((rgb >> 8) & 0xFF).toFloat &&
               mine(o + 2) == (rgb & 0xFF).toFloat, s"($x,$y) il=$il")
      }
    }
  }

  test("we decode ImageIO's GIF stream identically (independent encoder)") {
    val w = 31; val h = 19
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
    val rnd = new scala.util.Random(99)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (rnd.nextInt(256) << 16) | (rnd.nextInt(256) << 8) |
        rnd.nextInt(256))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", bos))
    val bytes = bos.toByteArray
    val (gw, gh, mine) = GifCodec.decode(bytes)
    assert((gw, gh) === ((w, h)))
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = back.getRGB(x, y)
      val o = (y * w + x) * 3
      assert(mine(o) == ((rgb >> 16) & 0xFF).toFloat &&
             mine(o + 1) == ((rgb >> 8) & 0xFF).toFloat &&
             mine(o + 2) == (rgb & 0xFF).toFloat, s"($x,$y)")
    }
  }

  test("dictionary growth to 12 bits and the 4095-clear: big random frame round-trips exactly") {
    val rnd = new scala.util.Random(12345)
    val w = 300; val h = 220 // 66k pixels >> 4095 dict entries
    val cells = Array.fill(h, w)(rnd.nextInt(16))
    val idx = (x: Int, y: Int) => cells(y)(x)
    val bytes = GifCodec.encode(w, h, pal16, Seq(FrameSpec(0, 0, w, h, idx)))
    val (gw, gh, out) = GifCodec.decode(bytes)
    assert((gw, gh) === ((w, h)))
    assert(out.toSeq == planeOf(w, h, pal16, idx).toSeq)
    // and the independent decoder agrees the stream is well-formed
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(img != null && img.getWidth == w)
    val mineAt = (x: Int, y: Int) => (out((y * w + x) * 3).toInt << 16) |
      (out((y * w + x) * 3 + 1).toInt << 8) | out((y * w + x) * 3 + 2).toInt
    for (_ <- 1 to 200) {
      val x = rnd.nextInt(w); val y = rnd.nextInt(h)
      assert((img.getRGB(x, y) & 0xFFFFFF) == mineAt(x, y), s"($x,$y)")
    }
  }

  test("animation: partial rects composite over the canvas; transparency shows through; disposal 2 restores") {
    // 6x4 canvas, bg = palette 0. Frame 1 fills with idx 1; frame 2 is
    // a 2x2 rect at (1,1) of idx 2 with transparent hole idx 3; frame 3
    // follows a disposal-2 frame so frame 2's rect is restored to bg.
    val pal = Seq((10, 20, 30), (100, 0, 0), (0, 100, 0), (0, 0, 100))
    val f1 = FrameSpec(0, 0, 6, 4, (_, _) => 1)
    val f2 = FrameSpec(1, 1, 2, 2,
      (x, y) => if (x == 0 && y == 0) 3 else 2, transparentIndex = 3,
      disposal = 2)
    val f3 = FrameSpec(4, 0, 1, 1, (_, _) => 3)
    val bytes = GifCodec.encode(6, 4, pal, Seq(f1, f2, f3))
    val (w, h, frames) = GifCodec.decodeFramesWithDims(bytes)
    assert((w, h) == ((6, 4)) && frames.length == 3)
    def px(f: Array[Float], x: Int, y: Int) =
      (f((y * 6 + x) * 3).toInt, f((y * 6 + x) * 3 + 1).toInt,
       f((y * 6 + x) * 3 + 2).toInt)
    assert(px(frames(0), 0, 0) == ((100, 0, 0)))
    // frame 2: (1,1) is the transparent hole -> frame 1 shows through
    assert(px(frames(1), 1, 1) == ((100, 0, 0)))
    assert(px(frames(1), 2, 1) == ((0, 100, 0)))
    assert(px(frames(1), 2, 2) == ((0, 100, 0)))
    // frame 3: frame 2's rect was disposal-2 restored to BACKGROUND
    assert(px(frames(2), 2, 1) == ((10, 20, 30)))
    assert(px(frames(2), 2, 2) == ((10, 20, 30)))
    assert(px(frames(2), 4, 0) == ((0, 0, 100))) // the new frame drew
    assert(px(frames(2), 0, 0) == ((100, 0, 0))) // outside both rects
    // disposal 3 restores the PRE-DRAW canvas — frame 1's pixels come
    // back under frame 2's rect (disposal 2 would restore BACKGROUND
    // there instead: the two must be distinguishable or the snapshot
    // path isn't real)
    val d3 = GifCodec.encode(6, 4, pal, Seq(f1,
      FrameSpec(1, 1, 2, 2, (_, _) => 2, disposal = 3), f3))
    val (_, _, fr3) = GifCodec.decodeFramesWithDims(d3)
    def px3(f: Array[Float], x: Int, y: Int) =
      (f((y * 6 + x) * 3).toInt, f((y * 6 + x) * 3 + 1).toInt,
       f((y * 6 + x) * 3 + 2).toInt)
    assert(px3(fr3(1), 1, 1) == ((0, 100, 0)), "frame 2 drew its rect")
    assert(px3(fr3(2), 1, 1) == ((100, 0, 0)),
      "restore-previous must bring frame 1 back, not background")
    assert(px3(fr3(2), 2, 2) == ((100, 0, 0)))
    assert(px3(fr3(2), 4, 0) == ((0, 0, 100))) // frame 3's own pixel
    // disposal 3 on the FIRST frame restores the background canvas
    // (the pre-draw state of frame 1 IS the background fill)
    val d3first = GifCodec.encode(6, 4, pal, Seq(
      FrameSpec(0, 0, 6, 4, (_, _) => 1, disposal = 3), f3))
    val (_, _, frFirst) = GifCodec.decodeFramesWithDims(d3first)
    assert(px3(frFirst(1), 1, 1) == ((10, 20, 30)),
      "restoring past frame 1 yields the background canvas")
    assert(px3(frFirst(1), 4, 0) == ((0, 0, 100)))
  }

  test("dispatch: the image decode path sniffs GIF; refusals are loud") {
    val idx = (x: Int, y: Int) => (x + y) % 16
    val bytes = GifCodec.encode(9, 7, pal16, Seq(FrameSpec(0, 0, 9, 7, idx)))
    val via = graft.llm.Multimodal.BmpWavDecoder.decode(bytes, "image")
    assert(via.toSeq == GifCodec.decode(bytes)._3.toSeq)
    intercept[IllegalArgumentException] {
      GifCodec.decode("GIF89a then garbage".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] {
      GifCodec.decode(bytes.take(bytes.length - 2)) // no trailer
    }
    intercept[IllegalArgumentException] {
      GifCodec.decode(graft.llm.ImageFixtures.bmp(2, 2, (_, _) => (1, 2, 3)))
    }
  }
}
