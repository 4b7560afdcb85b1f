package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.JpegCodec

/** JPEG codec ground truth: round-trip error bounds against the
  * original plane, and BOTH cross-directions against the JDK's
  * independent ImageIO codec (encode-mine/decode-theirs and
  * encode-theirs/decode-mine) — tolerances, not equality, because
  * T.81 allows ±1-level IDCT variance between conforming decoders and
  * ImageIO subsamples chroma. */
class JpegCodecSpec extends AnyFunSuite {

  // a smooth plane: quantization error stays near the DC/low-AC terms
  private val smooth = (x: Int, y: Int) =>
    (96 + x * 2 + y, 80 + x + y * 2, 120 + x - y / 2)

  private def maxErr(a: Array[Float], b: Array[Float]): Float = {
    require(a.length == b.length, s"length ${a.length} vs ${b.length}")
    a.zip(b).map { case (x, y) => math.abs(x - y) }.max
  }

  private def planeOf(w: Int, h: Int,
                      pix: (Int, Int) => (Int, Int, Int)): Array[Float] = {
    val out = new Array[Float](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = pix(x, y)
      val o = (y * w + x) * 3
      out(o) = (r & 0xFF).toFloat
      out(o + 1) = (g & 0xFF).toFloat
      out(o + 2) = (b & 0xFF).toFloat
    }
    out
  }

  test("round-trip: smooth plane survives q95 within a tight bound (incl. non-multiple-of-8 dims)") {
    for ((w, h) <- Seq((24, 16), (17, 13), (8, 8), (1, 1), (9, 1))) {
      val bytes = JpegCodec.encode(w, h, smooth, quality = 95)
      val (gw, gh, out) = JpegCodec.decode(bytes)
      assert((gw, gh) === ((w, h)))
      val err = maxErr(out, planeOf(w, h, smooth))
      assert(err <= 6.0f, s"${w}x$h max error $err")
    }
  }

  test("round-trip with restart markers matches the restart-free decode exactly") {
    val plain = JpegCodec.decode(JpegCodec.encode(24, 24, smooth, 90))._3
    val rst = JpegCodec.decode(
      JpegCodec.encode(24, 24, smooth, 90, restartInterval = 2))._3
    assert(plain.toSeq == rst.toSeq)
  }

  test("cross-check A: ImageIO decodes OUR stream to within IDCT variance") {
    val w = 24; val h = 16
    val bytes = JpegCodec.encode(w, h, smooth, quality = 95)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO rejected our stream")
    assert(img.getWidth == w && img.getHeight == h)
    val theirs = new Array[Float](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      val o = (y * w + x) * 3
      theirs(o) = ((rgb >> 16) & 0xFF).toFloat
      theirs(o + 1) = ((rgb >> 8) & 0xFF).toFloat
      theirs(o + 2) = (rgb & 0xFF).toFloat
    }
    val mine = JpegCodec.decode(bytes)._3
    val err = maxErr(mine, theirs)
    assert(err <= 2.0f, s"decoder disagreement $err > IDCT variance")
  }

  test("cross-check B: we decode ImageIO's stream (chroma-subsampled, standard tables)") {
    val w = 32; val h = 24
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = smooth(x, y)
      img.setRGB(x, y, ((r & 0xFF) << 16) | ((g & 0xFF) << 8) | (b & 0xFF))
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val bytes = bos.toByteArray
    val (gw, gh, mine) = JpegCodec.decode(bytes)
    assert((gw, gh) === ((w, h)))
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    val theirs = new Array[Float](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = back.getRGB(x, y)
      val o = (y * w + x) * 3
      theirs(o) = ((rgb >> 16) & 0xFF).toFloat
      theirs(o + 1) = ((rgb >> 8) & 0xFF).toFloat
      theirs(o + 2) = (rgb & 0xFF).toFloat
    }
    // ImageIO upsamples chroma with interpolation, we replicate — on a
    // smooth plane the split stays small
    val err = maxErr(mine, theirs)
    assert(err <= 12.0f, s"vs ImageIO decode of ImageIO stream: $err")
    // and against the ORIGINAL plane (both codecs' loss combined)
    val errOrig = maxErr(mine, planeOf(w, h, smooth))
    assert(errOrig <= 16.0f, s"vs original plane: $errOrig")
  }

  test("grayscale (1-component) JPEG decodes; gray replicates across RGB") {
    val w = 17; val h = 11
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      // write the RASTER sample directly: setRGB on TYPE_BYTE_GRAY
      // color-converts through sRGB gamma and would skew the stored
      // plane away from the formula
      img.getRaster.setSample(x, y, 0, 60 + x * 4 + y * 3)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val bytes = bos.toByteArray
    val (gw, gh, mine) = JpegCodec.decode(bytes)
    assert((gw, gh) === ((w, h)))
    for (i <- 0 until w * h) { // replication contract
      assert(mine(i * 3) == mine(i * 3 + 1) && mine(i * 3) == mine(i * 3 + 2))
    }
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    val theirs = new Array[Float](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      val g = back.getRaster.getSample(x, y, 0).toFloat // raw gray sample
      theirs(o) = g; theirs(o + 1) = g; theirs(o + 2) = g
    }
    assert(maxErr(mine, theirs) <= 2.0f)
    // and against the original plane: smooth gradient, tight bound
    val orig = planeOf(w, h, (x, y) => {
      val g = 60 + x * 4 + y * 3; (g, g, g)
    })
    assert(maxErr(mine, orig) <= 6.0f)
  }

  test("refusals: progressive, truncated, not-a-JPEG, 12-bit") {
    val good = JpegCodec.encode(16, 16, smooth, 90)
    // patch SOF0 (FFC0) -> SOF2 (FFC2): progressive must refuse
    val prog = good.clone()
    val sof = prog.indices.find(i => (prog(i) & 0xFF) == 0xFF &&
      i + 1 < prog.length && (prog(i + 1) & 0xFF) == 0xC0).get
    prog(sof + 1) = 0xC2.toByte
    val e = intercept[IllegalArgumentException] { JpegCodec.decode(prog) }
    assert(e.getMessage.contains("progressive"))
    // 12-bit precision: patch the SOF precision byte
    val deep = good.clone()
    deep(sof + 4) = 12.toByte
    intercept[IllegalArgumentException] { JpegCodec.decode(deep) }
    // truncated entropy stream
    intercept[IllegalArgumentException] {
      JpegCodec.decode(good.take(20))
    }
    intercept[IllegalArgumentException] {
      JpegCodec.decode("definitely not a jpeg".getBytes("UTF-8"))
    }
  }

  test("property: seeded-random planes — our decoder agrees with ImageIO on our stream within IDCT variance") {
    // arbitrary (not smooth) content, deterministic seeds: validates
    // Huffman/zigzag/DCT against the independent JDK codec on inputs
    // with full-range coefficients, where a table or scan bug cannot
    // hide behind smoothness
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(seed * 7919)
      val w = 1 + rnd.nextInt(40); val h = 1 + rnd.nextInt(40)
      val px = Array.fill(h, w)((rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256)))
      val bytes = JpegCodec.encode(w, h, (x, y) => px(y)(x),
        quality = 50 + rnd.nextInt(48))
      val (gw, gh, mine) = JpegCodec.decode(bytes)
      assert((gw, gh) === ((w, h)), s"seed $seed dims")
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null && img.getWidth == w && img.getHeight == h,
        s"seed $seed: ImageIO rejected the stream")
      val theirs = new Array[Float](w * h * 3)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        val o = (y * w + x) * 3
        theirs(o) = ((rgb >> 16) & 0xFF).toFloat
        theirs(o + 1) = ((rgb >> 8) & 0xFF).toFloat
        theirs(o + 2) = (rgb & 0xFF).toFloat
      }
      val err = maxErr(mine, theirs)
      assert(err <= 2.0f, s"seed $seed (${w}x$h): decoder disagreement $err")
    }
  }

  test("sharp (sawtooth) plane still decodes and bounds its error by the quant step") {
    val sharp = (x: Int, y: Int) =>
      ((x * 7 + y * 13) % 256, (x * 3 + y * 5 + 17) % 256,
       (x + y * 2 + 101) % 256)
    val w = 16; val h = 16
    val bytes = JpegCodec.encode(w, h, sharp, quality = 97)
    val (gw, gh, out) = JpegCodec.decode(bytes)
    assert((gw, gh) === ((w, h)))
    // sawtooth wrap puts a 255->0 cliff inside blocks: the error bound
    // is loose but must stay FAR from garbage (a Huffman/zigzag bug
    // produces errors ~128+)
    val err = maxErr(out, planeOf(w, h, sharp))
    assert(err <= 96.0f, s"sharp-plane error $err looks structural")
  }
}
