package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{CcittCodec, TiffCodec}
import graft.llm.TiffCodec.Options

/** CCITT G3/G4 (compressions 2/3/4) and tiled TIFF: fixture
  * round-trips across patterns that exercise every coding mode
  * (vertical/horizontal/pass, makeup + extended makeup runs), plus
  * BOTH-direction cross-validation against the JDK's independent
  * TIFF plugin — the decisive pin for the T.4/T.6 code tables. */
class TiffCcittSpec extends AnyFunSuite {

  private val patterns: Seq[(String, Int, Int, (Int, Int) => Int)] = Seq(
    ("checker", 19, 11, (x, y) => (x + y) % 2),
    ("stripes", 37, 13, (x, y) => (x / 5 + y / 3) % 2),
    ("diag", 45, 17, (x, y) => if ((x * 3 + y) % 7 < 3) 1 else 0),
    ("allwhite", 40, 6, (_, _) => 0),
    ("allblack", 40, 6, (_, _) => 1),
    ("sparse", 33, 9, (x, y) => if (x == y * 2) 1 else 0),
    // wide rows: white/black runs far past 64 and past 2560 exercise
    // makeup and extended-makeup codes in both colors
    ("wideruns", 2800, 3, (x, y) => if ((x / 1400 + y) % 2 == 0) 0 else 1))

  private def expectBits(w: Int, h: Int, f: (Int, Int) => Int): Array[Float] = {
    val out = new Array[Float](w * h)
    for (y <- 0 until h; x <- 0 until w) out(y * w + x) = f(x, y)
    out
  }

  private def check(bytes: Array[Byte], w: Int, h: Int,
                    want: Array[Float], clue: String): Unit = {
    val (dw, dh, got) = TiffCodec.decode(bytes)
    assert(dw == w && dh == h, s"$clue dims")
    assert(got.toSeq == want.toSeq, clue)
  }

  test("CCITT round-trips: MH / T.4 1-D / T.6 across mode-covering patterns") {
    for ((name, w, h, f) <- patterns; comp <- Seq(2, 3, 4)) {
      val bytes = TiffCodec.encodeGray(w, h, f, bits = 1, photo = 0,
        opts = Options(compression = comp))
      check(bytes, w, h, expectBits(w, h, f), s"$name comp=$comp")
    }
    // raw segment round-trip as well (codec-level, no container)
    val (w, h, f) = (21, 7, (x: Int, y: Int) => (x * x + y) % 2)
    val rowBytes = (w + 7) / 8
    val raw = new Array[Byte](rowBytes * h)
    for (y <- 0 until h; x <- 0 until w; if f(x, y) != 0)
      raw(y * rowBytes + (x >> 3)) =
        (raw(y * rowBytes + (x >> 3)) | (1 << (7 - (x & 7)))).toByte
    for (comp <- Seq(2, 3, 4)) {
      val enc = CcittCodec.encode(raw, w, h, comp)
      assert(CcittCodec.decode(enc, 0, enc.length, w, h, comp).toSeq ==
        raw.toSeq, s"raw comp=$comp")
    }
  }

  test("ImageIO reads our CCITT TIFFs identically (raster = 1 - raw bit)") {
    // the JDK's own 1-D fax reader crashes (AIOOBE) on fully-
    // alternating lines — even on its own writer's output (verified:
    // JDK-written checker RLE fails ImageIO.read the same way), so
    // the max-transition pattern only cross-reads under T.6
    for ((name, w, h, f) <- patterns.take(6); comp <- Seq(2, 3, 4)
         if comp == 4 || name != "checker") {
      val bytes = TiffCodec.encodeGray(w, h, f, bits = 1, photo = 0,
        opts = Options(compression = comp))
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO failed on $name comp=$comp")
      // photometric 0: raw bit 1 = black; binary raster white = 1
      for (y <- 0 until h; x <- 0 until w)
        assert(img.getRaster.getSample(x, y, 0) == 1 - f(x, y),
          s"imageio $name comp=$comp ($x,$y)")
    }
  }

  test("our decoder reads the JDK writer's CCITT T.6/T.4(2-D)/RLE TIFFs") {
    import javax.imageio.{ImageIO, ImageWriteParam, IIOImage}
    // note: the JDK writes "CCITT T.4" as G3 TWO-dimensional
    // (T4Options=1, EOL + tag bit per row) — the variant real fax
    // corpora carry — so this pins the MR path too
    for ((name, w, h, f) <- patterns.take(6);
         ctype <- Seq("CCITT T.6", "CCITT T.4", "CCITT RLE")) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_BINARY)
      // binary raster: 1 = white; our f: 1 = black
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, 1 - f(x, y))
      val writer = ImageIO.getImageWritersByFormatName("tiff").next()
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionType(ctype)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new IIOImage(img, null, null), p)
      ios.close(); writer.dispose()
      val bytes = bos.toByteArray
      // the JDK may write photometric 0 (raw 1 = black, = f) — decode
      // raw samples and compare against f via the photometric tag
      val (_, tags) = TiffCodec.parseIfd(bytes)
      val photo = tags(262).vals.head
      val (dw, dh, got) = TiffCodec.decode(bytes)
      assert(dw == w && dh == h, s"jdk $name $ctype dims")
      for (y <- 0 until h; x <- 0 until w) {
        val raw = got(y * w + x)
        val black = if (photo == 0L) raw else 1 - raw
        assert(black == f(x, y), s"jdk $name $ctype ($x,$y)")
      }
    }
  }

  private val rgbPix = (x: Int, y: Int) =>
    ((x * 7 + y * 13) % 256, (x * 3 + y * 5 + 17) % 256,
     (x + y * 2 + 101) % 256)

  private def expectRgb(w: Int, h: Int,
                        pix: (Int, Int) => (Int, Int, Int)): Array[Float] = {
    val out = new Array[Float](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = pix(x, y)
      out((y * w + x) * 3) = r; out((y * w + x) * 3 + 1) = g
      out((y * w + x) * 3 + 2) = b
    }
    out
  }

  test("tiled TIFF: edge-clipped tiles across compressions and depths") {
    // 37x19 with 16x16 tiles: 3x2 grid, right/bottom tiles clipped
    for (comp <- Seq(1, 5, 8, 32773)) {
      val bytes = TiffCodec.encodeRgb(37, 19, rgbPix,
        Options(compression = comp, tile = 16))
      check(bytes, 37, 19, expectRgb(37, 19, rgbPix), s"tiled rgb comp=$comp")
    }
    // tiled + predictor
    check(TiffCodec.encodeRgb(37, 19, rgbPix,
        Options(compression = 5, predictor = 2, tile = 16)),
      37, 19, expectRgb(37, 19, rgbPix), "tiled rgb lzw predictor")
    // tiled bilevel with CCITT inside each tile (column bit re-pack)
    val f = (x: Int, y: Int) => (x / 5 + y / 3) % 2
    check(TiffCodec.encodeGray(37, 19, f, bits = 1, photo = 0,
        opts = Options(compression = 4, tile = 16)),
      37, 19, expectBits(37, 19, f), "tiled bilevel g4")
    // tiled 16-bit gray, big-endian
    val g16 = (x: Int, y: Int) => (x * 2021 + y * 977 + 11) % 65536
    check(TiffCodec.encodeGray(35, 18, g16, bits = 16,
        opts = Options(littleEndian = false, tile = 16)),
      35, 18, expectBits(35, 18, g16), "tiled gray16 be")
  }

  test("tiled cross-validation with the JDK plugin, both directions") {
    import javax.imageio.{ImageIO, ImageWriteParam, IIOImage}
    // ours → ImageIO
    val bytes = TiffCodec.encodeRgb(37, 19, rgbPix,
      Options(compression = 5, tile = 16))
    val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null)
    for (y <- 0 until 19; x <- 0 until 37) {
      val (r, g, b) = rgbPix(x, y)
      assert((img.getRGB(x, y) & 0xFFFFFF) == ((r << 16) | (g << 8) | b),
        s"imageio tiled ($x,$y)")
    }
    // ImageIO (explicit tiling) → ours
    val src = new java.awt.image.BufferedImage(37, 19,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 19; x <- 0 until 37) {
      val (r, g, b) = rgbPix(x, y)
      src.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val writer = ImageIO.getImageWritersByFormatName("tiff").next()
    val p = writer.getDefaultWriteParam
    p.setTilingMode(ImageWriteParam.MODE_EXPLICIT)
    p.setTiling(16, 16, 0, 0)
    p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionType("LZW")
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new IIOImage(src, null, null), p)
    ios.close(); writer.dispose()
    check(bos.toByteArray, 37, 19, expectRgb(37, 19, rgbPix), "jdk tiled")
  }

  test("FillOrder 2: LSB-first fax streams round-trip; ImageIO agrees") {
    val f = (x: Int, y: Int) => if ((x * 3 + y) % 7 < 3) 1 else 0
    for (comp <- Seq(2, 3, 4)) {
      val bytes = TiffCodec.encodeGray(45, 13, f, bits = 1, photo = 0,
        opts = Options(compression = comp, fillOrder = 2))
      val (_, tags) = TiffCodec.parseIfd(bytes)
      assert(tags(266).vals.head == 2L)
      check(bytes, 45, 13, expectBits(45, 13, f), s"fillorder2 comp=$comp")
      // the independent JDK reader honors FillOrder 2 the same way
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO failed on fillorder2 comp=$comp")
      for (y <- 0 until 13; x <- 0 until 45)
        assert(img.getRaster.getSample(x, y, 0) == 1 - f(x, y),
          s"imageio fillorder2 comp=$comp ($x,$y)")
    }
    // FillOrder 2 outside CCITT refuses (encoder and decoder)
    intercept[IllegalArgumentException] {
      TiffCodec.encodeGray(8, 8, (x, _) => x % 2, bits = 1, photo = 0,
        opts = Options(compression = 1, fillOrder = 2))
    }
  }

  test("refusals: G3 2-D, T.6 extensions, CCITT on non-bilevel, bad tile edge") {
    val ok = TiffCodec.encodeGray(19, 11, (x, y) => (x + y) % 2, bits = 1,
      photo = 0, opts = Options(compression = 4))
    // patch T6Options (tag 293) to a nonzero value → refuse
    val (_, tags) = TiffCodec.parseIfd(ok)
    assert(tags.contains(293))
    intercept[IllegalArgumentException] {
      TiffCodec.encodeGray(8, 8, (x, y) => x % 256, bits = 8,
        opts = Options(compression = 4)) // CCITT needs bilevel
    }
    intercept[IllegalArgumentException] {
      TiffCodec.encodeRgb(8, 8, rgbPix, Options(tile = 10)) // not mult of 16
    }
  }
}
