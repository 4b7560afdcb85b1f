package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.ApngCodec
import graft.llm.ApngCodec.FrameSpec

/** APNG: compositing across blend/dispose semantics, the RGBA frame
  * raster path, container validity (the JDK's PNG reader must still
  * accept the fixture and see frame 0 as the default image). */
class ApngCodecSpec extends AnyFunSuite {

  private val base = (x: Int, y: Int) =>
    ((x * 7 + y * 13) % 256, (x * 3 + y * 5 + 17) % 256, (x + y * 2 + 101) % 256)
  private val red = (_: Int, _: Int) => (200, 10, 20)
  private val blue = (_: Int, _: Int) => (5, 15, 220)

  private def rgbaAt(c: Array[Float], w: Int, x: Int, y: Int) =
    (c((y * w + x) * 4).toInt, c((y * w + x) * 4 + 1).toInt,
     c((y * w + x) * 4 + 2).toInt, c((y * w + x) * 4 + 3).toInt)

  test("SOURCE frames with dispose none/background/previous composite per spec") {
    val apng = ApngCodec.encode(Seq(
      FrameSpec(16, 10, 0, 0, base),                          // f0
      FrameSpec(4, 3, 2, 1, red, dispose = 1, blend = 0),     // f1: bg-dispose
      FrameSpec(5, 4, 8, 5, blue, dispose = 2, blend = 0),    // f2: prev-dispose
      FrameSpec(2, 2, 0, 0, red, dispose = 0, blend = 0)))    // f3
    assert(ApngCodec.isApng(apng))
    val (w, h, frames) = ApngCodec.decodeFrames(apng)
    assert(w == 16 && h == 10 && frames.size == 4)
    def b(x: Int, y: Int) =
      (base(x, y)._1, base(x, y)._2, base(x, y)._3, 255)
    // f0: the base everywhere
    assert(rgbaAt(frames(0), 16, 5, 5) == b(5, 5))
    // f1: red on [2,6)x[1,4), base elsewhere
    assert(rgbaAt(frames(1), 16, 3, 2) == ((200, 10, 20, 255)))
    assert(rgbaAt(frames(1), 16, 9, 6) == b(9, 6))
    // f2: f1's rect was background-disposed (transparent), blue rect drawn
    assert(rgbaAt(frames(2), 16, 3, 2) == ((0, 0, 0, 0)))
    assert(rgbaAt(frames(2), 16, 9, 6) == ((5, 15, 220, 255)))
    assert(rgbaAt(frames(2), 16, 14, 9) == b(14, 9))
    // f3: f2's blue rect reverted (previous-dispose), red 2x2 at origin
    assert(rgbaAt(frames(3), 16, 9, 6) == b(9, 6))
    assert(rgbaAt(frames(3), 16, 0, 0) == ((200, 10, 20, 255)))
    assert(rgbaAt(frames(3), 16, 3, 2) == ((0, 0, 0, 0))) // still disposed
  }

  test("OVER blend matches the non-premultiplied Porter-Duff reference") {
    val apng = ApngCodec.encode(Seq(
      FrameSpec(6, 4, 0, 0, base),
      FrameSpec(6, 4, 0, 0, red, alpha = (x, y) => (x * 40 + y * 30) % 256,
        blend = 1)))
    val (_, _, frames) = ApngCodec.decodeFrames(apng)
    for (y <- 0 until 4; x <- 0 until 6) {
      val fa = ((x * 40 + y * 30) % 256) / 255.0
      val (r0, g0, b0) = base(x, y)
      val want: (Double, Double, Double, Double) =
        if (fa == 0.0) (r0, g0, b0, 255.0)
        else if (fa == 1.0) (200.0, 10.0, 20.0, 255.0)
        else
          // background is opaque, so the output alpha is 1 and the
          // color is the plain lerp
          (200 * fa + r0 * (1 - fa), 10 * fa + g0 * (1 - fa),
           20 * fa + b0 * (1 - fa), 255.0)
      val o = (y * 6 + x) * 4
      val gotF = (frames(1)(o).toDouble, frames(1)(o + 1).toDouble,
        frames(1)(o + 2).toDouble, frames(1)(o + 3).toDouble)
      assert(math.abs(gotF._1 - want._1) < 1e-3 &&
        math.abs(gotF._2 - want._2) < 1e-3 &&
        math.abs(gotF._3 - want._3) < 1e-3 &&
        math.abs(gotF._4 - want._4) < 1e-3,
        s"($x,$y): $gotF vs $want")
    }
  }

  test("the fixture is a valid PNG: ImageIO reads frame 0 as the default image") {
    val apng = ApngCodec.encode(Seq(
      FrameSpec(9, 6, 0, 0, base),
      FrameSpec(3, 2, 1, 1, red)))
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(apng))
    assert(img != null && img.getWidth == 9 && img.getHeight == 6)
    for (y <- 0 until 6; x <- 0 until 9) {
      val (r, g, b) = base(x, y)
      assert((img.getRGB(x, y) & 0xFFFFFF) == ((r << 16) | (g << 8) | b),
        s"($x,$y)")
    }
  }

  test("sniff and refusals") {
    assert(!ApngCodec.isApng(graft.llm.ImageFixtures.png(4, 4)))
    val apng = ApngCodec.encode(Seq(FrameSpec(4, 4, 0, 0, base)))
    // declare 2 frames but carry 1
    val broken = apng.clone()
    var i = 8
    while (new String(broken, i + 4, 4, "US-ASCII") != "acTL") {
      i += 12 + ((broken(i) & 0xFF) << 24 | (broken(i + 1) & 0xFF) << 16 |
        (broken(i + 2) & 0xFF) << 8 | (broken(i + 3) & 0xFF))
    }
    broken(i + 11) = 2
    intercept[IllegalArgumentException] { ApngCodec.decodeFrames(broken) }
  }
}
