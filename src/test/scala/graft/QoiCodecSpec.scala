package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.QoiCodec

/** QOI: op-diverse round-trips (RUN/INDEX/DIFF/LUMA/literal,
  * wraparound deltas, alpha switches), header/end-marker checks. */
class QoiCodecSpec extends AnyFunSuite {

  private def check(w: Int, h: Int, pix: (Int, Int) => (Int, Int, Int),
                    alpha: (Int, Int) => Int, clue: String): Unit = {
    val bytes = QoiCodec.encode(w, h, pix, alpha)
    assert(QoiCodec.isQoi(bytes), clue)
    val chans = if (alpha == null) 3 else 4
    val (dw, dh, px) = QoiCodec.decode(bytes)
    assert(dw == w && dh == h && px.length == w * h * chans, clue)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = pix(x, y)
      val d = (y * w + x) * chans
      assert(px(d) == (r & 0xFF) && px(d + 1) == (g & 0xFF) &&
        px(d + 2) == (b & 0xFF), s"$clue ($x,$y)")
      if (chans == 4) assert(px(d + 3) == (alpha(x, y) & 0xFF),
        s"$clue alpha ($x,$y)")
    }
  }

  test("smooth gradients ride DIFF/LUMA; noise forces literals; runs compress") {
    check(23, 17, (x, y) => (x + y, x + y + 1, x + y), null, "gradient")
    check(23, 17, (x, y) => ((x * 149 + y * 211) % 256,
      (x * 83 + y * 59) % 256, (x * 7 + y * 131) % 256), null, "noise")
    check(40, 24, (x, y) => ((x / 9) * 31 % 256, (y / 4) * 53 % 256, 77),
      null, "runs")
    // a small repeating palette exercises INDEX hits
    check(31, 9, (x, y) => { val i = (x + y * 3) % 4
      (i * 61 % 256, i * 97 % 256, i * 193 % 256) }, null, "index")
    // wraparound deltas (255 -> 0 crossings ride DIFF with wrap)
    check(16, 4, (x, y) => ((254 + x) % 256, (255 + x) % 256, (x + y) % 256),
      null, "wrap")
  }

  test("RGBA: alpha switches force literal RGBA ops; runs still apply") {
    check(19, 11, (x, y) => ((x * 7 + y * 13) % 256,
      (x * 3 + y * 5 + 17) % 256, (x + y * 2 + 101) % 256),
      (x, y) => if ((x + y) % 5 == 0) 128 else 255, "rgba")
    // run > 62 pixels of one value exercises run splitting
    check(130, 1, (_, _) => (9, 9, 9), (_, _) => 200, "long run")
  }

  test("header and end-marker refusals") {
    assert(!QoiCodec.isQoi("nope".getBytes("US-ASCII")))
    val ok = QoiCodec.encode(4, 4, (x, y) => (x, y, 7))
    intercept[IllegalArgumentException] {
      QoiCodec.decode(java.util.Arrays.copyOf(ok, ok.length - 3))
    }
    val bad = ok.clone()
    bad(bad.length - 1) = 0 // corrupt the end marker
    intercept[IllegalArgumentException] { QoiCodec.decode(bad) }
  }
}
