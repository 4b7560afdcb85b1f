package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{IcoCodec, ImageFixtures}
import graft.llm.IcoCodec.{DibEntry, PngEntry}

/** ICO container: DIB entries across the bpp matrix (alpha byte vs
  * AND mask), embedded-PNG entries riding the JDK-cross-validated
  * PNG decoder, best-entry selection, and loud refusals. The JDK has
  * no ICO reader, so the DIB layer is pinned by fixture round-trips
  * (the BMP bottom-up/padding conventions the DIB shares are already
  * JDK-validated via the BMP specs). */
class IcoCodecSpec extends AnyFunSuite {

  private val rgb = (x: Int, y: Int) =>
    ((x * 7 + y * 13) % 256, (x * 3 + y * 5 + 17) % 256, (x + y * 2 + 101) % 256)
  private val alpha = (x: Int, y: Int) => if ((x + y) % 3 == 0) 0 else 255

  private def at(px: Array[Float], w: Int, x: Int, y: Int): (Int, Int, Int, Int) =
    (px((y * w + x) * 4).toInt, px((y * w + x) * 4 + 1).toInt,
     px((y * w + x) * 4 + 2).toInt, px((y * w + x) * 4 + 3).toInt)

  test("32-bpp DIB: BGRA order, real alpha byte, bottom-up rows") {
    val a32 = (x: Int, y: Int) => (x * 29 + y * 41) % 256
    val ico = IcoCodec.encode(Seq(DibEntry(13, 9, 32, rgb = rgb, alpha = a32)))
    assert(IcoCodec.isIco(ico))
    val (w, h, px) = IcoCodec.decode(ico)
    assert(w == 13 && h == 9 && px.length == 13 * 9 * 4)
    for (y <- 0 until 9; x <- 0 until 13) {
      val (r, g, b) = rgb(x, y)
      assert(at(px, 13, x, y) === ((r, g, b, a32(x, y))), s"($x,$y)")
    }
  }

  test("24-bpp DIB: AND mask drives alpha; row padding to 32 bits") {
    // width 13 -> xor stride 40 (13*3=39 pad 1), and stride 4
    val ico = IcoCodec.encode(Seq(DibEntry(13, 7, 24, rgb = rgb, alpha = alpha)))
    val (w, h, px) = IcoCodec.decode(ico)
    assert(w == 13 && h == 7)
    for (y <- 0 until 7; x <- 0 until 13) {
      val (r, g, b) = rgb(x, y)
      assert(at(px, 13, x, y) === ((r, g, b, alpha(x, y))), s"($x,$y)")
    }
  }

  test("8/4/1-bpp palette DIBs expand BGRA palette entries") {
    val pal = (0 until 16).map(i =>
      ((i * 37 + 11) % 256, (i * 73 + 5) % 256, (i * 151 + 97) % 256))
    for (bits <- Seq(8, 4, 1)) {
      val n = math.min(pal.size, 1 << bits)
      val idx = (x: Int, y: Int) => (x * 3 + y * 7) % n
      val ico = IcoCodec.encode(Seq(DibEntry(11, 6, bits,
        palette = pal.take(n), idx = idx, alpha = alpha)))
      val (w, h, px) = IcoCodec.decode(ico)
      assert(w == 11 && h == 6, s"bits=$bits")
      for (y <- 0 until 6; x <- 0 until 11) {
        val (r, g, b) = pal(idx(x, y))
        assert(at(px, 11, x, y) === ((r, g, b, alpha(x, y))),
          s"bits=$bits ($x,$y)")
      }
    }
  }

  test("embedded PNG entries decode through the PNG path, lifted to RGBA") {
    val png = ImageFixtures.pngFull(10, 8, rgb)
    val ico = IcoCodec.encode(Seq(PngEntry(png, 10, 8)))
    val (w, h, px) = IcoCodec.decode(ico)
    assert(w == 10 && h == 8 && px.length == 10 * 8 * 4)
    for (y <- 0 until 8; x <- 0 until 10) {
      val (r, g, b) = rgb(x, y)
      assert(at(px, 10, x, y) === ((r, g, b, 255)), s"($x,$y)")
    }
    // gray+alpha PNG: the PNG decoder's RGB contract replicates gray
    // and drops alpha, so the ICO lift pads a constant 255
    val ga = ImageFixtures.pngGray(6, 5, (x, y) => (x * 11 + y) % 256,
      withAlpha = true)
    val (gw, gh, gpx) = IcoCodec.decode(IcoCodec.encode(Seq(PngEntry(ga, 6, 5))))
    assert(gw == 6 && gh == 5)
    for (y <- 0 until 5; x <- 0 until 6) {
      val g = (x * 11 + y) % 256
      assert(at(gpx, 6, x, y) === ((g, g, g, 255)), s"($x,$y)")
    }
  }

  test("best-entry selection: largest area, then deepest bit-count") {
    val small = DibEntry(8, 8, 32, rgb = (_, _) => (1, 2, 3))
    val big = DibEntry(16, 16, 24, rgb = (_, _) => (9, 8, 7))
    val shallow = DibEntry(16, 16, 8,
      palette = Seq((5, 5, 5)), idx = (_, _) => 0)
    val ico = IcoCodec.encode(Seq(small, shallow, big))
    val (w, h, px) = IcoCodec.decode(ico)
    assert(w == 16 && h == 16)
    assert(at(px, 16, 0, 0) === ((9, 8, 7, 255))) // 24-bpp beats 8-bpp at same area
    assert(IcoCodec.decodeAll(ico).map { case (w, h, p) => (w, h, p.length) } ===
      Seq((8, 8, 256), (16, 16, 1024), (16, 16, 1024)))
  }

  test("256-entry convention: directory byte 0 means 256") {
    val ico = IcoCodec.encode(Seq(DibEntry(256, 256, 32,
      rgb = (x, y) => (x % 256, y % 256, 0))))
    assert((ico(6) & 0xFF) == 0 && (ico(7) & 0xFF) == 0)
    val (w, h, px) = IcoCodec.decode(ico)
    assert(w == 256 && h == 256)
    assert(at(px, 256, 255, 254) === ((255, 254, 0, 255)))
  }

  test("refusals: compressed DIB, truncated entries, bad magic") {
    assert(!IcoCodec.isIco("GIF89a".getBytes("US-ASCII")))
    val ico = IcoCodec.encode(Seq(DibEntry(4, 4, 24, rgb = rgb)))
    // patch biCompression (entry offset 22 = 6 + 16 dir + 16 into DIB)
    val broken = ico.clone()
    broken(6 + 16 + 16) = 1
    intercept[IllegalArgumentException] { IcoCodec.decode(broken) }
    val truncated = java.util.Arrays.copyOf(ico, 30)
    intercept[IllegalArgumentException] { IcoCodec.decode(truncated) }
  }
}
