package graft

import graft.llm.{Exif, JpegCodec, TiffCodec}

/** EXIF orientation: tag parse out of JPEG APP1 (both embedded byte
  * orders) and bare TIFF, the 8-way display remap cross-validated
  * against `AffineTransformOp` (the JDK's independent affine pixel
  * engine), and graceful identity on absent/malformed metadata. */
class ExifSpec extends SparkSpec {

  private val rgb = (x: Int, y: Int) =>
    ((x * 7 + y * 13) % 256, (x * 3 + y * 5 + 17) % 256, (x + y * 2 + 101) % 256)

  test("orientation parses from APP1 in both byte orders and from TIFF tag 274") {
    val jpeg = JpegCodec.encode(16, 8, rgb)
    assert(Exif.orientation(jpeg) == 1) // no EXIF → identity
    for (o <- 1 to 8; le <- Seq(true, false)) {
      val tagged = Exif.withExifOrientation(jpeg, o, littleEndian = le)
      assert(JpegCodec.isJpeg(tagged))
      assert(Exif.orientation(tagged) == o, s"o=$o le=$le")
    }
    val tif = TiffCodec.encodeGray(5, 4, (x, y) => x + y,
      opts = TiffCodec.Options(orientation = 6))
    assert(Exif.orientation(tif) == 6)
    assert(Exif.orientation(TiffCodec.encodeGray(5, 4, (x, y) => x + y)) == 1)
    assert(Exif.orientation("not an image".getBytes("UTF-8")) == 1)
    assert(Exif.orientation(null) == 1)
    // out-of-range tag value degrades to identity
    val bad = TiffCodec.encodeGray(5, 4, (x, y) => x + y,
      opts = TiffCodec.Options(orientation = 6))
    // patch the SHORT 6 → 9 wherever tag 274's inline value sits
    var i = 10
    while (!((bad(i) & 0xFF) == 18 && (bad(i + 1) & 0xFF) == 1 &&
             (bad(i + 8) & 0xFF) == 6)) i += 12
    bad(i + 8) = 9
    assert(Exif.orientation(bad) == 1)
  }

  test("APP1 injection leaves the JPEG decodable with identical pixels") {
    val jpeg = JpegCodec.encode(16, 8, rgb)
    val (w0, h0, px0) = JpegCodec.decode(jpeg)
    val (w1, h1, px1) = JpegCodec.decode(Exif.withExifOrientation(jpeg, 6))
    assert(w0 == w1 && h0 == h1)
    assert(px0.toSeq == px1.toSeq)
  }

  test("all 8 remaps agree with the JDK's AffineTransformOp") {
    import java.awt.geom.AffineTransform
    import java.awt.image.{AffineTransformOp, BufferedImage}
    val w = 13; val h = 7
    val src = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val plane = new Array[Float](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = rgb(x, y)
      src.setRGB(x, y, (r << 16) | (g << 8) | b)
      plane((y * w + x) * 3) = r
      plane((y * w + x) * 3 + 1) = g
      plane((y * w + x) * 3 + 2) = b
    }
    // forward stored→displayed affine per orientation (m00 m10 m01 m11 m02 m12)
    val affines = Map(
      2 -> new AffineTransform(-1, 0, 0, 1, w, 0),
      3 -> new AffineTransform(-1, 0, 0, -1, w, h),
      4 -> new AffineTransform(1, 0, 0, -1, 0, h),
      5 -> new AffineTransform(0, 1, 1, 0, 0, 0),
      6 -> new AffineTransform(0, 1, -1, 0, h, 0),
      7 -> new AffineTransform(0, -1, -1, 0, h, w),
      8 -> new AffineTransform(0, -1, 1, 0, 0, w))
    for (o <- 2 to 8) {
      val (dw, dh, got) = Exif.applyOrientation(w, h, 3, plane, o)
      assert((dw, dh) == (if (o >= 5) (h, w) else (w, h)), s"o=$o dims")
      val op = new AffineTransformOp(affines(o),
        AffineTransformOp.TYPE_NEAREST_NEIGHBOR)
      val dst = op.filter(src, null)
      assert(dst.getWidth == dw && dst.getHeight == dh, s"o=$o jdk dims")
      for (y <- 0 until dh; x <- 0 until dw) {
        val want = dst.getRGB(x, y) & 0xFFFFFF
        val gotRgb = (got((y * dw + x) * 3).toInt << 16) |
          (got((y * dw + x) * 3 + 1).toInt << 8) | got((y * dw + x) * 3 + 2).toInt
        assert(gotRgb == want, s"o=$o ($x,$y)")
      }
    }
    // identity returns the plane untouched
    val (iw, ih, ipx) = Exif.applyOrientation(w, h, 3, plane, 1)
    assert(iw == w && ih == h && (ipx eq plane))
  }

  test("extractOriented: TIFF tag drives a real dim-swapping remap end-to-end") {
    import spark.implicits._
    val tif6 = TiffCodec.encodeRgb(9, 5, rgb,
      TiffCodec.Options(orientation = 6, compression = 5))
    val plain = TiffCodec.encodeRgb(9, 5, rgb)
    val ds = Seq(
      graft.llm.Multimodal.MediaRow(1L, tif6, "image"),
      graft.llm.Multimodal.MediaRow(2L, plain, "image")).toDS()
    val rows = graft.llm.Multimodal.extractOriented(ds)
      .collect().sortBy(_.id)
    assert(rows(0).orient == 6 && rows(0).w == 5 && rows(0).h == 9)
    assert(rows(1).orient == 1 && rows(1).w == 9 && rows(1).h == 5)
    // spot-check the rotate: displayed(0,0) = stored(0, h-1)
    val (r, g, b) = rgb(0, 4)
    assert(rows(0).features(0) == r && rows(0).features(1) == g &&
      rows(0).features(2) == b)
  }
}
