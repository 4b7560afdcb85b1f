package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.TgaCodec
import graft.llm.TgaCodec.Options

/** TGA: round-trips across type x RLE x row-order, BGR[A] channel
  * order, palette map expansion (alpha-bearing maps widen to RGBA),
  * ID-field skip, header-consistency sniff, refusals. */
class TgaCodecSpec extends AnyFunSuite {

  private val rgb = (x: Int, y: Int) =>
    ((x * 7 + y * 13) % 256, (x * 3 + y * 5 + 17) % 256, (x + y * 2 + 101) % 256)
  private val runs = (x: Int, y: Int) =>
    ((x / 9) * 31 % 256, (y / 4) * 53 % 256, 77)
  private val g8 = (x: Int, y: Int) => (x * 11 + y * 17 + 3) % 256
  private val a8 = (x: Int, y: Int) => (x * 29 + y * 41) % 256

  private def check(bytes: Array[Byte], w: Int, h: Int, chans: Int,
                    want: (Int, Int, Int) => Int, clue: String): Unit = {
    assert(TgaCodec.isTga(bytes), clue)
    val (dw, dh, px) = TgaCodec.decode(bytes)
    assert(dw == w && dh == h && px.length == w * h * chans, clue)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until chans)
      assert(px((y * w + x) * chans + c) == want(x, y, c), s"$clue ($x,$y,$c)")
  }

  test("truecolor 24/32-bit across RLE x row-order, with an ID field") {
    for (rle <- Seq(false, true); topDown <- Seq(false, true)) {
      val o = Options(rle = rle, topDown = topDown, idField = "graft")
      check(TgaCodec.encodeRgb(21, 13, rgb, opts = o), 21, 13, 3,
        (x, y, c) => Seq(rgb(x, y)._1, rgb(x, y)._2, rgb(x, y)._3)(c),
        s"rgb24 rle=$rle td=$topDown")
      check(TgaCodec.encodeRgb(21, 13, rgb, alpha = a8, opts = o), 21, 13, 4,
        (x, y, c) => if (c == 3) a8(x, y)
          else Seq(rgb(x, y)._1, rgb(x, y)._2, rgb(x, y)._3)(c),
        s"rgba32 rle=$rle td=$topDown")
    }
    // runs compress well and must round-trip through maximal packets
    check(TgaCodec.encodeRgb(40, 24, runs, opts = Options(rle = true)),
      40, 24, 3, (x, y, c) => Seq(runs(x, y)._1, runs(x, y)._2,
        runs(x, y)._3)(c), "rgb24 rle runs")
  }

  test("grayscale and palettes; alpha-bearing maps widen to RGBA") {
    check(TgaCodec.encodeGray(17, 9, g8, Options(rle = true)), 17, 9, 1,
      (x, y, _) => g8(x, y), "gray8 rle")
    val pal24 = (0 until 7).map(i => ((i * 37 + 11) % 256,
      (i * 73 + 5) % 256, (i * 151 + 97) % 256, 255))
    val idx = (x: Int, y: Int) => (x * 3 + y * 7) % 7
    check(TgaCodec.encodePalette(14, 8, pal24, idx), 14, 8, 3,
      (x, y, c) => Seq(pal24(idx(x, y))._1, pal24(idx(x, y))._2,
        pal24(idx(x, y))._3)(c), "pal24")
    val pal32 = pal24.map { case (r, g, b, _) => (r, g, b, (r + g) % 256) }
    check(TgaCodec.encodePalette(14, 8, pal32, idx, mapBits = 32,
        Options(rle = true)), 14, 8, 4,
      (x, y, c) => Seq(pal32(idx(x, y))._1, pal32(idx(x, y))._2,
        pal32(idx(x, y))._3, pal32(idx(x, y))._4)(c), "pal32 rle")
  }

  test("sniff and refusals") {
    assert(!TgaCodec.isTga("GIF89a......".getBytes("US-ASCII")))
    assert(!TgaCodec.isTga(Array.fill[Byte](18)(0x7F)))
    val ok = TgaCodec.encodeRgb(4, 4, rgb)
    // 16-bpp refuses via the sniff (depth outside {8,24,32})
    val b16 = ok.clone(); b16(16) = 16
    assert(!TgaCodec.isTga(b16))
    intercept[IllegalArgumentException] { TgaCodec.decode(b16) }
    // right-to-left refuses in decode
    val rl = ok.clone(); rl(17) = 0x10
    intercept[IllegalArgumentException] { TgaCodec.decode(rl) }
    // truncated RLE stream refuses
    val rle = TgaCodec.encodeRgb(8, 8, rgb, opts = Options(rle = true))
    intercept[IllegalArgumentException] {
      TgaCodec.decode(java.util.Arrays.copyOf(rle, rle.length - 4))
    }
    // truncated color map refuses loudly (IllegalArgumentException,
    // not an array bounds error): cut a palette fixture mid-map
    val pal = (0 until 16).map(i => (i * 16, 255 - i * 16, i, 255))
    val palTga = TgaCodec.encodePalette(4, 4, pal,
      (x, y) => (x + y) % 16)
    intercept[IllegalArgumentException] {
      TgaCodec.decode(java.util.Arrays.copyOf(palTga, 18 + 8))
    }
  }
}
