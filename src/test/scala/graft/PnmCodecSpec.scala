package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.PnmCodec

/** Netpbm P1-P6: ASCII/binary round-trips at 8- and 16-bit maxvals,
  * comment and packed-digit tolerance, raw-sample contract. */
class PnmCodecSpec extends AnyFunSuite {

  private val rgb = (x: Int, y: Int) =>
    ((x * 7 + y * 13) % 256, (x * 3 + y * 5 + 17) % 256, (x + y * 2 + 101) % 256)
  private val g8 = (x: Int, y: Int) => (x * 11 + y * 17 + 3) % 256
  private val g16 = (x: Int, y: Int) => (x * 2021 + y * 977 + 11) % 65536
  private val bit = (x: Int, y: Int) => (x * x + y * 3) % 2

  private def check(bytes: Array[Byte], w: Int, h: Int, chans: Int,
                    want: (Int, Int, Int) => Int, clue: String): Unit = {
    assert(PnmCodec.isPnm(bytes), clue)
    val (dw, dh, px) = PnmCodec.decode(bytes)
    assert(dw == w && dh == h && px.length == w * h * chans, clue)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until chans)
      assert(px((y * w + x) * chans + c) == want(x, y, c),
        s"$clue ($x,$y,$c)")
  }

  test("P2/P5 graymaps at 8- and 16-bit maxvals, with header comments") {
    for (binary <- Seq(true, false)) {
      check(PnmCodec.encodeGray(17, 9, g8, binary = binary,
        comment = Some("gray8")), 17, 9, 1, (x, y, _) => g8(x, y),
        s"gray8 bin=$binary")
      check(PnmCodec.encodeGray(12, 7, g16, maxval = 65535,
        binary = binary), 12, 7, 1, (x, y, _) => g16(x, y),
        s"gray16 bin=$binary")
    }
  }

  test("P3/P6 pixmaps, 8- and 16-bit") {
    for (binary <- Seq(true, false)) {
      check(PnmCodec.encodeRgb(13, 8, rgb, binary = binary), 13, 8, 3,
        (x, y, c) => Seq(rgb(x, y)._1, rgb(x, y)._2, rgb(x, y)._3)(c),
        s"rgb bin=$binary")
      val p16 = (x: Int, y: Int) =>
        (g16(x, y), (g16(x, y) + 7) % 65536, x * 999 + y)
      check(PnmCodec.encodeRgb(6, 5, p16, maxval = 65535, binary = binary),
        6, 5, 3, (x, y, c) => Seq(p16(x, y)._1, p16(x, y)._2, p16(x, y)._3)(c),
        s"rgb16 bin=$binary")
    }
  }

  test("P1/P4 bitmaps: MSB packing and packed ASCII digits") {
    for (binary <- Seq(true, false))
      check(PnmCodec.encodeGray(19, 11, bit, maxval = 1, binary = binary),
        19, 11, 1, (x, y, _) => bit(x, y), s"bitmap bin=$binary")
    // P1 with digits packed without separators (the spec allows it)
    val packed = ("P1\n# packed\n5 2\n" + "10101\n01010\n").getBytes("US-ASCII")
    check(packed, 5, 2, 1, (x, y, _) => (x + y + 1) % 2, "packed P1")
  }

  test("refusals: truncated rasters, bad magic, oversized samples") {
    assert(!PnmCodec.isPnm("P7 weird".getBytes("US-ASCII")))
    val ok = PnmCodec.encodeGray(8, 8, g8)
    intercept[IllegalArgumentException] {
      PnmCodec.decode(java.util.Arrays.copyOf(ok, ok.length - 5))
    }
    intercept[IllegalArgumentException] { // sample above maxval in ASCII
      PnmCodec.decode("P2\n2 1\n10\n5 11\n".getBytes("US-ASCII"))
    }
  }
}
