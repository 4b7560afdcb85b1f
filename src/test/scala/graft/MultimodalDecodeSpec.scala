package graft

import graft.llm.{AudioFixtures, ImageFixtures, Multimodal}
import graft.llm.Multimodal.BmpWavDecoder

/** Byte-level semantics of the REAL decoders (q189/q190's engine
  * side): the oracle gate proves engine equivalence on aggregate
  * features; these prove the raw decoded streams are the intended
  * per-position values. */
class MultimodalDecodeSpec extends SparkSpec {

  private val pix = (x: Int, y: Int) => (x * 10 + y, 100 + x, 200 + y)

  test("decodeBmp: bottom-up flip, BGR->RGB, row padding (odd width)") {
    // width 3 -> row stride 9, padded to 12: 3 pad bytes per row
    val bytes = ImageFixtures.bmp(3, 2, pix)
    assert(bytes.length == 54 + 12 * 2)
    val out = BmpWavDecoder.decodeBmp(bytes)
    assert(out.length == 3 * 2 * 3)
    // decoded stream is TOP-DOWN row-major RGB: pixel (x=1, y=0)
    for (x <- 0 until 3; y <- 0 until 2) {
      val base = (y * 3 + x) * 3
      val (r, g, b) = pix(x, y)
      assert(out(base) == r.toFloat, s"R at ($x,$y)")
      assert(out(base + 1) == g.toFloat, s"G at ($x,$y)")
      assert(out(base + 2) == b.toFloat, s"B at ($x,$y)")
    }
  }

  test("decodeBmp rejects what it cannot decode, loudly") {
    val e = intercept[IllegalArgumentException] {
      BmpWavDecoder.decodeBmp(ImageFixtures.png(4, 4))
    }
    assert(e.getMessage.contains("BMP"))
    // truncated pixel array: header promises more rows than present
    val ok = ImageFixtures.bmp(2, 2, pix)
    intercept[IllegalArgumentException] {
      BmpWavDecoder.decodeBmp(ok.take(ok.length - 4))
    }
  }

  test("decodePng: all five scanline filters undo to the formula plane (RGB + RGBA)") {
    // h >= 5 cycles the fixture's y % 5 filter choice through
    // None/Sub/Up/Average/Paeth; RGBA additionally checks bpp=4
    // filter offsets and the alpha drop
    for (rgba <- Seq(false, true); (w, h) <- Seq((9, 7), (3, 6), (1, 5))) {
      val (gw, gh, out) = BmpWavDecoder.decodePngWithDims(
        ImageFixtures.pngFull(w, h, pix, rgba))
      assert((gw, gh) === ((w, h)))
      assert(out.length == w * h * 3)
      for (x <- 0 until w; y <- 0 until h) {
        val base = (y * w + x) * 3
        val (r, g, b) = pix(x, y)
        assert(out(base) == (r % 256).toFloat, s"R at ($x,$y) rgba=$rgba")
        assert(out(base + 1) == (g % 256).toFloat, s"G at ($x,$y) rgba=$rgba")
        assert(out(base + 2) == (b % 256).toFloat, s"B at ($x,$y) rgba=$rgba")
      }
    }
  }

  test("decodePng rejects what it cannot decode, loudly") {
    // header-only fixture: IHDR but no IDAT
    intercept[IllegalArgumentException] {
      BmpWavDecoder.decodePng(ImageFixtures.png(4, 4))
    }
    // not a PNG at all
    intercept[IllegalArgumentException] {
      BmpWavDecoder.decodePng(ImageFixtures.bmp(2, 2, pix))
    }
    // truncated pixel stream: drop the tail of the file
    val full = ImageFixtures.pngFull(8, 8, pix)
    intercept[IllegalArgumentException] {
      BmpWavDecoder.decodePng(full.take(full.length - 20))
    }
  }

  test("decodePng Adam7: interlaced decode equals the non-interlaced plane, incl. empty-pass dims") {
    // dims below 8 leave some of the seven passes EMPTY (zero bytes);
    // odd dims exercise the ceil pass geometry
    for ((w, h) <- Seq((16, 11), (8, 8), (7, 5), (3, 2), (1, 1), (2, 9),
                       (9, 1)); rgba <- Seq(false, true)) {
      val plain = BmpWavDecoder.decodePngWithDims(
        ImageFixtures.pngFull(w, h, pix, rgba))
      val inter = BmpWavDecoder.decodePngWithDims(
        ImageFixtures.pngFull(w, h, pix, rgba, interlace = true))
      assert((inter._1, inter._2) === ((w, h)), s"$w x $h rgba=$rgba dims")
      assert(inter._3.toSeq == plain._3.toSeq, s"$w x $h rgba=$rgba plane")
    }
  }

  test("decodePng Adam7: the independent JDK PNG reader decodes our interlaced fixture identically") {
    // PNG is lossless, so the cross-check is EXACT equality
    for ((w, h) <- Seq((16, 11), (7, 5))) {
      val bytes = ImageFixtures.pngFull(w, h, pix, interlace = true)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null && img.getWidth == w && img.getHeight == h,
        "ImageIO rejected the interlaced fixture")
      val mine = BmpWavDecoder.decodePng(bytes)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        val o = (y * w + x) * 3
        assert(mine(o) == ((rgb >> 16) & 0xFF).toFloat &&
               mine(o + 1) == ((rgb >> 8) & 0xFF).toFloat &&
               mine(o + 2) == (rgb & 0xFF).toFloat, s"($x,$y) of $w x $h")
      }
    }
  }

  test("decodePng grayscale (types 0 and 4): gray replicates to RGB, alpha drops, interlace composes") {
    val g = (x: Int, y: Int) => (x * 9 + y * 5 + 31) % 256
    for (alpha <- Seq(false, true); il <- Seq(false, true)) {
      val bytes = ImageFixtures.pngGray(11, 7, g, withAlpha = alpha,
        interlace = il)
      val (w, h, out) = BmpWavDecoder.decodePngWithDims(bytes)
      assert((w, h) === ((11, 7)))
      for (y <- 0 until 7; x <- 0 until 11) {
        val o = (y * 11 + x) * 3
        val e = g(x, y).toFloat
        assert(out(o) == e && out(o + 1) == e && out(o + 2) == e,
          s"($x,$y) alpha=$alpha il=$il")
      }
      // the independent JDK reader agrees exactly (lossless) — raw
      // RASTER samples: getRGB would gamma-convert gray through sRGB
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null)
      for (y <- 0 until 7; x <- 0 until 11)
        assert(img.getRaster.getSample(x, y, 0) == g(x, y),
          s"JDK split at ($x,$y) alpha=$alpha il=$il")
    }
  }

  test("decodePng bit-depth matrix: 1/2/4/16-bit samples raster-exact vs the JDK") {
    val g = (x: Int, y: Int) => x * 7 + y * 3 + 1 // fixture masks to depth
    // grayscale at every sub-byte depth plus 16-bit, plain and Adam7
    for (depth <- Seq(1, 2, 4, 16); il <- Seq(false, true)) {
      val bytes = ImageFixtures.pngGray(13, 9, g, interlace = il,
        depth = depth)
      val (w, h, out) = BmpWavDecoder.decodePngWithDims(bytes)
      assert((w, h) === ((13, 9)), s"d=$depth il=$il dims")
      val mask = (1 << depth) - 1
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO rejected d=$depth il=$il")
      for (y <- 0 until 9; x <- 0 until 13) {
        val e = (g(x, y) & mask).toFloat
        val o = (y * 13 + x) * 3
        assert(out(o) == e && out(o + 1) == e && out(o + 2) == e,
          s"($x,$y) d=$depth il=$il")
        assert(img.getRaster.getSample(x, y, 0) == (g(x, y) & mask),
          s"JDK split at ($x,$y) d=$depth il=$il")
      }
    }
    // 16-bit truecolor RGB and RGBA (alpha dropped), plain and Adam7
    val pix16 = (x: Int, y: Int) =>
      (x * 2021 + y * 977, x * 313 + y * 57 + 40000, x + y * 4099 + 7)
    for (rgba <- Seq(false, true); il <- Seq(false, true)) {
      val bytes = ImageFixtures.pngFull(11, 6, pix16, rgba, il, depth = 16)
      val (w, h, out) = BmpWavDecoder.decodePngWithDims(bytes)
      assert((w, h) === ((11, 6)))
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null)
      for (y <- 0 until 6; x <- 0 until 11; c <- 0 until 3) {
        val (r, gg, b) = pix16(x, y)
        val e = (Seq(r, gg, b)(c) & 0xFFFF).toFloat
        assert(out((y * 11 + x) * 3 + c) == e,
          s"($x,$y,$c) rgba=$rgba il=$il")
        assert(img.getRaster.getSample(x, y, c).toFloat == e,
          s"JDK split at ($x,$y,$c) rgba=$rgba il=$il")
      }
    }
    // sub-byte PALETTE indices (2- and 4-bit) through the PLTE
    val pal = (0 until 16).map(i =>
      ((i * 11) % 256, (i * 29 + 3) % 256, (i * 53 + 7) % 256))
    for (depth <- Seq(2, 4); il <- Seq(false, true)) {
      val nIdx = 1 << depth
      val idx = (x: Int, y: Int) => (x * 3 + y * 5) % nIdx
      val bytes = ImageFixtures.pngPalette(10, 7, pal.take(nIdx), idx,
        interlace = il, depth = depth)
      val (w, h, out) = BmpWavDecoder.decodePngWithDims(bytes)
      assert((w, h) === ((10, 7)))
      for (y <- 0 until 7; x <- 0 until 10) {
        val (r, gg, b) = pal(idx(x, y))
        val o = (y * 10 + x) * 3
        assert(out(o) == r.toFloat && out(o + 1) == gg.toFloat &&
          out(o + 2) == b.toFloat, s"($x,$y) d=$depth il=$il")
      }
    }
    // the legality matrix still refuses what the spec forbids
    intercept[IllegalArgumentException] { // 2-bit truecolor: illegal
      val bad = ImageFixtures.pngGray(4, 4, g, depth = 2)
      bad(25) = 2 // color type byte inside IHDR: 0 -> 2
      BmpWavDecoder.decodePngWithDims(bad)
    }
  }

  test("decodePng palette: indices map through PLTE, filters undo, tRNS skipped") {
    val pal = (0 until 16).map(i =>
      ((i * 11) % 256, (i * 29 + 3) % 256, (i * 53 + 7) % 256))
    val idx = (x: Int, y: Int) => (x * 3 + y * 7) % 16
    // h >= 5 cycles all five filters over the 1-byte-per-pixel rows;
    // withTrns on one variant proves the ancillary chunk is skipped
    for (trns <- Seq(false, true); (w, h) <- Seq((8, 9), (1, 5))) {
      val (gw, gh, out) = BmpWavDecoder.decodePngWithDims(
        ImageFixtures.pngPalette(w, h, pal, idx, withTrns = trns))
      assert((gw, gh) === ((w, h)))
      for (x <- 0 until w; y <- 0 until h) {
        val base = (y * w + x) * 3
        val (r, g, b) = pal(idx(x, y))
        assert(out(base) == r.toFloat && out(base + 1) == g.toFloat &&
          out(base + 2) == b.toFloat, s"at ($x,$y) trns=$trns")
      }
    }
  }

  test("decodePng palette refusals: missing PLTE, index beyond the palette") {
    val pal = Seq((10, 20, 30), (40, 50, 60))
    val withPlte = ImageFixtures.pngPalette(3, 3, pal, (x, y) => (x + y) % 2)
    // surgically drop the PLTE chunk (12 + 6 bytes after the 8-byte
    // signature + 25-byte IHDR chunk)
    val plteStart = 8 + 25
    val noPlte = withPlte.take(plteStart) ++ withPlte.drop(plteStart + 12 + 6)
    val e1 = intercept[IllegalArgumentException] {
      BmpWavDecoder.decodePng(noPlte)
    }
    assert(e1.getMessage.contains("missing PLTE"))
    // an index pointing past the 2-entry palette
    val e2 = intercept[IllegalArgumentException] {
      BmpWavDecoder.decodePng(
        ImageFixtures.pngPalette(3, 3, pal, (x, y) => 2 + ((x + y) % 2)))
    }
    assert(e2.getMessage.contains("beyond"))
  }

  test("image dispatch sniffs the container: PNG and BMP through one decode call") {
    val fromPng = BmpWavDecoder.decode(ImageFixtures.pngFull(4, 3, pix), "image")
    val fromBmp = BmpWavDecoder.decode(ImageFixtures.bmp(4, 3, pix), "image")
    assert(fromPng.toSeq === fromBmp.toSeq)
  }

  test("decodeWavPcm16: interleaved LE samples, negative values, LIST-chunk skip") {
    val samples = Array[Short](0, 1, -1, 32767, -32768, 1000, -999, 12)
    val plain = BmpWavDecoder.decodeWavPcm16(
      AudioFixtures.wavPcm16(16000, 2, samples))
    assert(plain.toSeq == samples.map(_.toFloat).toSeq)
    // the odd-length LIST chunk before fmt/data must be pad-skipped
    val listed = BmpWavDecoder.decodeWavPcm16(
      AudioFixtures.wavPcm16(16000, 2, samples, withListChunk = true))
    assert(listed.toSeq == samples.map(_.toFloat).toSeq)
  }

  test("decodeWav: the full encoding matrix decodes byte-exact") {
    import graft.llm.AudioFixtures.wavRaw
    def le24(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte)
    def le32i(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    // 8-bit offset binary: 0x80 is zero
    val d8 = Array.tabulate(16)(t => ((t * 37 + 5) % 256).toByte)
    assert(BmpWavDecoder.decodeWav(wavRaw(8000, 1, 1, 8, d8)).toSeq ==
      d8.map(b => ((b & 0xFF) - 128).toFloat).toSeq)
    // 24-bit signed LE, both signs
    val v24 = Array.tabulate(20)(t => t * 400003 - 4000000)
    assert(BmpWavDecoder.decodeWav(
      wavRaw(16000, 1, 1, 24, v24.flatMap(le24))).toSeq ==
      v24.map(_.toFloat).toSeq)
    // 32-bit signed int
    val v32 = Array(0, 1, -1, Int.MaxValue, Int.MinValue, 123456789)
    assert(BmpWavDecoder.decodeWav(
      wavRaw(16000, 1, 1, 32, v32.flatMap(le32i))).toSeq ==
      v32.map(_.toFloat).toSeq)
    // IEEE float32, plain and inside a WAVE_FORMAT_EXTENSIBLE wrapper
    val vf = Array.tabulate(12)(t => t * 0.25f - 100f)
    val df = vf.flatMap(f => le32i(java.lang.Float.floatToIntBits(f)))
    assert(BmpWavDecoder.decodeWav(wavRaw(44100, 1, 3, 32, df)).toSeq ==
      vf.toSeq)
    assert(BmpWavDecoder.decodeWav(
      wavRaw(48000, 2, 3, 32, df, extensible = true)).toSeq == vf.toSeq)
    // IEEE float64
    val dd = Array(1.5, -2.25, 0.0, 1e10).flatMap { d =>
      val l = java.lang.Double.doubleToLongBits(d)
      (0 until 8).map(i => ((l >> (8 * i)) & 0xFF).toByte)
    }
    assert(BmpWavDecoder.decodeWav(wavRaw(8000, 1, 3, 64, dd)).toSeq ==
      Seq(1.5f, -2.25f, 0.0f, 1e10f))
    // refusals stay loud
    intercept[IllegalArgumentException] {
      BmpWavDecoder.decodeWav(wavRaw(8000, 1, 1, 12,
        new Array[Byte](12))) // 12-bit PCM
    }
    intercept[IllegalArgumentException] {
      BmpWavDecoder.decodeWav(wavRaw(8000, 1, 2, 8,
        new Array[Byte](8))) // ADPCM
    }
  }

  test("IMA ADPCM: hand-worked steps, table properties, block resets, stereo interleave, clamps") {
    // hand-worked shift-add anchors (pred, idx) -> nibble -> (pred', idx')
    // step[20] = 50: delta 3 -> 6+25+12 = 43; step[19] = 45: delta 4,
    // sign -> -(5+45) = -50
    assert(BmpWavDecoder.imaStep(100, 20, 3) == ((143, 19)))
    assert(BmpWavDecoder.imaStep(143, 19, 12) == ((93, 21)))
    assert(BmpWavDecoder.imaStep(0, 0, 7) == ((11, 8)))
    // clamps at both rails and index 0/88
    assert(BmpWavDecoder.imaStep(32000, 88, 7)._1 == 32767)
    assert(BmpWavDecoder.imaStep(-32000, 88, 15)._1 == -32768)
    assert(BmpWavDecoder.imaStep(0, 0, 0)._2 == 0)
    assert(BmpWavDecoder.imaStep(0, 88, 7)._2 == 88)
    // the normative step table: 89 entries, 7..32767, strictly
    // increasing at ~1.1x per step — a transcription typo breaks this
    val st = BmpWavDecoder.ImaStep
    assert(st.length == 89 && st.head == 7 && st.last == 32767)
    assert(st.sliding(2).forall(p => p(1) > p(0)))
    assert(st.drop(8).sliding(2).forall { p =>
      val r = p(1).toDouble / p(0); r >= 1.05 && r <= 1.15 })
    // block headers RESET state: two mono blocks, the second block's
    // first output sample must be exactly its header predictor
    def le16b(v: Int) = Seq((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    val blk1 = le16b(900) ++ Seq(17.toByte, 0.toByte) ++
      (0 until 8).map(k => ((k * 37 + 11) % 256).toByte)
    val blk2 = le16b(-5) ++ Seq(3.toByte, 0.toByte) ++
      (0 until 8).map(k => ((k * 91 + 5) % 256).toByte)
    val wav = AudioFixtures.wavRaw(8000, 1, 0x11, 4,
      (blk1 ++ blk2).toArray, alignOverride = 12)
    val out = BmpWavDecoder.decode(wav, "audio")
    assert(out.length == 34) // (1 + 16) x 2 blocks
    assert(out(0) == 900.0f && out(17) == -5.0f,
      "block 2's header sample must reset the state")
    // stereo: one block, 8-sample group interleave; frame 0 is the
    // two header predictors in channel order
    val hdrs = le16b(1000) ++ Seq(30.toByte, 0.toByte) ++
      le16b(-800) ++ Seq(44.toByte, 0.toByte)
    val data = (0 until 16).map(k => ((k * 53 + 7) % 256).toByte)
    val st2 = AudioFixtures.wavRaw(8000, 2, 0x11, 4,
      (hdrs ++ data).toArray, alignOverride = 24)
    val sOut = BmpWavDecoder.decode(st2, "audio")
    assert(sOut.length == 34) // 17 frames x 2 channels
    assert(sOut(0) == 1000.0f && sOut(1) == -800.0f)
    // channel independence: decoding L's bytes as a MONO stream with
    // L's header must reproduce the interleaved stream's L channel
    val lBytes = (0 until 8).map(j =>
      (((j / 4) * 8 + (j % 4)) * 53 + 7) % 256).map(_.toByte)
    val lMono = AudioFixtures.wavRaw(8000, 1, 0x11, 4,
      (le16b(1000) ++ Seq(30.toByte, 0.toByte) ++ lBytes).toArray,
      alignOverride = 12)
    val lOut = BmpWavDecoder.decode(lMono, "audio")
    assert((0 until 17).forall(s => lOut(s) == sOut(2 * s)),
      "stereo group de-interleave drifted from the mono state machine")
    // refusals: bad block align, channel counts beyond the surface
    intercept[IllegalArgumentException] {
      BmpWavDecoder.decode(AudioFixtures.wavRaw(8000, 1, 0x11, 4,
        blk1.toArray, alignOverride = 10), "audio") // not 4-aligned
    }
    intercept[IllegalArgumentException] {
      BmpWavDecoder.decode(AudioFixtures.wavRaw(8000, 3, 0x11, 4,
        (blk1 ++ blk1 ++ blk1).toArray, alignOverride = 36), "audio")
    }
  }

  test("MS ADPCM: hand-worked steps, truncating division, delta floor, header order, stereo nibbles") {
    // hand-worked anchors: coef 0 (256,0) and 1 (512,-256)
    assert(BmpWavDecoder.msStep(100, 50, 20, 0, 3) == ((160, 17)))
    assert(BmpWavDecoder.msStep(100, 50, 20, 1, 12) == ((70, 23)))
    // C-truncating /256 on a NEGATIVE prediction sum: coef 3 (192,64),
    // sum -19264 -> -75 (floor would give -76)
    assert(BmpWavDecoder.msStep(-100, -1, 20, 3, 0)._1 == -75)
    // int16 clamp and the delta floor at 16
    assert(BmpWavDecoder.msStep(32000, 31000, 500, 1, 7) == ((32767, 1199)))
    assert(BmpWavDecoder.msStep(0, 0, 16, 0, 0)._2 == 16)
    // normative tables pinned
    assert(BmpWavDecoder.MsCoef.toSeq == Seq((256, 0), (512, -256), (0, 0),
      (192, 64), (240, 0), (460, -208), (392, -232)))
    assert(BmpWavDecoder.MsAdapt.toSeq == Seq(230, 230, 230, 230, 307, 409,
      512, 614, 768, 614, 512, 409, 307, 230, 230, 230))
    // mono block: header samples play OLDEST first; high nibble first
    def le16b(v: Int) = Seq((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    val hdr = Seq(1.toByte) ++ le16b(32) ++ le16b(500) ++ le16b(-300)
    val data = (0 until 13).map(k => ((k * 37 + 11) % 256).toByte)
    val wav = AudioFixtures.wavRaw(8000, 1, 2, 4,
      (hdr ++ data).toArray, alignOverride = 20)
    val out = BmpWavDecoder.decode(wav, "audio")
    assert(out.length == 28 && out(0) == -300.0f && out(1) == 500.0f)
    // first decoded sample replays the hand state machine: byte 11 ->
    // high nibble 0
    val (e2, _) = BmpWavDecoder.msStep(500, -300, 32, 1, 11 >> 4)
    assert(out(2) == e2.toFloat)
    // stereo: field-interleaved header, one frame per byte (hi=L lo=R)
    val sh = Seq(0.toByte, 4.toByte) ++ le16b(40) ++ le16b(25) ++
      le16b(800) ++ le16b(-650) ++ le16b(-120) ++ le16b(90)
    val sdata = (0 until 8).map(k => ((k * 91 + 5) % 256).toByte)
    val st2 = AudioFixtures.wavRaw(8000, 2, 2, 4,
      (sh ++ sdata).toArray, alignOverride = 22)
    val sOut = BmpWavDecoder.decode(st2, "audio")
    assert(sOut.length == 20)
    assert(sOut(0) == -120.0f && sOut(1) == 90.0f) // sample2 frame
    assert(sOut(2) == 800.0f && sOut(3) == -650.0f) // sample1 frame
    val (l0, _) = BmpWavDecoder.msStep(800, -120, 40, 0, (5 >> 4) & 0xF)
    val (r0, _) = BmpWavDecoder.msStep(-650, 90, 25, 4, 5 & 0xF)
    assert(sOut(4) == l0.toFloat && sOut(5) == r0.toFloat)
    // refusal: coefficient index beyond the 7 standard pairs
    intercept[IllegalArgumentException] {
      BmpWavDecoder.decode(AudioFixtures.wavRaw(8000, 1, 2, 4,
        (Seq(9.toByte) ++ hdr.tail ++ data).toArray,
        alignOverride = 20), "audio")
    }
  }

  test("AIFF/AU: cross-validated BOTH directions against the independent JDK sound stack") {
    import javax.sound.sampled._
    val samples = Array.tabulate(40)(t => ((t * 29 + 3) % 3001) - 1500)
    val be = samples.flatMap(s =>
      Seq(((s >> 8) & 0xFF).toByte, (s & 0xFF).toByte))
    val mine = AudioFixtures.aiff(8000, 1, 16, be)
    // the JDK parses OUR container: the 80-bit extended-float rate,
    // channels, bits, and the SSND offset all survive
    val ais = AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(mine))
    val fmt = ais.getFormat
    assert(fmt.getSampleRate == 8000f && fmt.getChannels == 1 &&
      fmt.getSampleSizeInBits == 16 && fmt.isBigEndian)
    assert(ais.readAllBytes().toSeq == be.toSeq,
      "JDK extracted different sample bytes from our AIFF")
    assert(BmpWavDecoder.decode(mine, "audio").toSeq ==
      samples.map(_.toFloat).toSeq)
    // reverse: the JDK WRITES the AIFF, we decode it bit-exact
    def jdkFile(tpe: AudioFileFormat.Type): Array[Byte] = {
      val f = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        11025f, 16, 1, 2, 11025f, true)
      val src = new AudioInputStream(
        new java.io.ByteArrayInputStream(be), f, samples.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(src, tpe, bos)
      bos.toByteArray
    }
    assert(BmpWavDecoder.decode(jdkFile(AudioFileFormat.Type.AIFF),
      "audio").toSeq == samples.map(_.toFloat).toSeq)
    assert(BmpWavDecoder.decode(jdkFile(AudioFileFormat.Type.AU),
      "audio").toSeq == samples.map(_.toFloat).toSeq)
    // our AU fixture through the JDK reader (incl. the offset skip)
    val myAu = AudioFixtures.au(8000, 1, 3, be)
    val ais2 = AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(myAu))
    assert(ais2.getFormat.getSampleRate == 8000f)
    assert(ais2.readAllBytes().toSeq == be.toSeq)
  }

  test("AIFF/AU: the full compression matrix decodes byte-exact; refusals are loud") {
    // 80-bit extended float round-trips every real rate exactly
    for (r <- Seq(1, 8000, 11025, 22050, 44100, 48000, 96000, 192000)) {
      val enc = AudioFixtures.extended80(r)
      assert(BmpWavDecoder.extended80ToInt(enc, 0) == r, s"rate $r")
    }
    def be24(v: Int) = Seq(((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def be32b(v: Int) = Seq(((v >> 24) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    // the SSND offset field is honored (the JDK reader ignores it,
    // so this is our-decoder-only coverage)
    val off16 = Array.tabulate(6)(t => t * 1000 - 2500)
    assert(BmpWavDecoder.decode(AudioFixtures.aiff(8000, 1, 16,
      off16.flatMap(v => Seq(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)),
      ssndOffset = 4), "audio").toSeq == off16.map(_.toFloat).toSeq)
    // AIFF signed 8-bit (WAV's is offset-binary; a sign confusion
    // would shift everything by 128)
    val s8 = Array.tabulate(16)(t => (t * 15 - 120))
    assert(BmpWavDecoder.decode(AudioFixtures.aiff(8000, 1, 8,
      s8.map(_.toByte)), "audio").toSeq == s8.map(_.toFloat).toSeq)
    // 24/32-bit BE PCM
    val s24 = Array.tabulate(10)(t => t * 400003 - 1500000)
    assert(BmpWavDecoder.decode(AudioFixtures.aiff(8000, 1, 24,
      s24.flatMap(be24)), "audio").toSeq == s24.map(_.toFloat).toSeq)
    val s32 = Array.tabulate(8)(t => t * 100000007 - 350000000)
    assert(BmpWavDecoder.decode(AudioFixtures.aiff(8000, 1, 32,
      s32.flatMap(be32b)), "audio").toSeq == s32.map(_.toFloat).toSeq)
    // sowt: little-endian 16 inside AIFC
    val s16 = Array.tabulate(12)(t => (t * 531 - 3000))
    val sowtBytes = s16.flatMap(v =>
      Seq((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte))
    assert(BmpWavDecoder.decode(AudioFixtures.aiff(44100, 1, 16,
      sowtBytes, comp = "sowt"), "audio").toSeq == s16.map(_.toFloat).toSeq)
    // fl32 + fl64 big-endian floats
    val fs = Array.tabulate(9)(t => t * 0.25f - 1f)
    val f32b = fs.flatMap(f => be32b(java.lang.Float.floatToIntBits(f)))
    assert(BmpWavDecoder.decode(AudioFixtures.aiff(48000, 1, 32,
      f32b, comp = "fl32"), "audio").toSeq == fs.toSeq)
    val f64b = fs.flatMap { f =>
      val l = java.lang.Double.doubleToLongBits(f.toDouble)
      be32b((l >>> 32).toInt) ++ be32b(l.toInt)
    }
    assert(BmpWavDecoder.decode(AudioFixtures.aiff(48000, 1, 64,
      f64b, comp = "fl64"), "audio").toSeq == fs.toSeq)
    // G.711 inside AIFC rides the JDK-validated expanders
    val codes = Array.tabulate(24)(t => ((t * 7 + 13) % 256).toByte)
    assert(BmpWavDecoder.decode(AudioFixtures.aiff(8000, 1, 16,
      codes, comp = "ulaw"), "audio").toSeq ==
      codes.map(c => BmpWavDecoder.mulawToLinear(c & 0xFF).toFloat).toSeq)
    // AU encodings: mu-law, signed 8, float32
    assert(BmpWavDecoder.decode(AudioFixtures.au(8000, 1, 1, codes),
      "audio").toSeq ==
      codes.map(c => BmpWavDecoder.mulawToLinear(c & 0xFF).toFloat).toSeq)
    assert(BmpWavDecoder.decode(AudioFixtures.au(8000, 1, 2,
      s8.map(_.toByte)), "audio").toSeq == s8.map(_.toFloat).toSeq)
    assert(BmpWavDecoder.decode(AudioFixtures.au(8000, 1, 6, f32b),
      "audio").toSeq == fs.toSeq)
    // refusals
    intercept[IllegalArgumentException] { // unknown compression 4CC
      BmpWavDecoder.decode(AudioFixtures.aiff(8000, 1, 16, sowtBytes,
        comp = "ima4"), "audio")
    }
    intercept[IllegalArgumentException] { // unknown AU encoding
      BmpWavDecoder.decode(AudioFixtures.au(8000, 1, 23, codes), "audio")
    }
    intercept[IllegalArgumentException] { // truncated FORM
      BmpWavDecoder.decode(AudioFixtures.aiff(8000, 1, 16, sowtBytes,
        comp = "sowt").take(30), "audio")
    }
  }

  test("G.711 mu-law and A-law expansion matches the independent JDK codec on all 256 codes") {
    import graft.llm.AudioFixtures.wavRaw
    val codes = Array.tabulate(256)(_.toByte)
    for ((fmtCode, name) <- Seq((7, "ULAW"), (6, "ALAW"))) {
      val wav = wavRaw(8000, 1, fmtCode, 8, codes)
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
      val pcmFmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1,
        true, false) // signed 16-bit LE
      val pcm = javax.sound.sampled.AudioSystem
        .getAudioInputStream(pcmFmt, ais)
      val buf = pcm.readAllBytes()
      assert(buf.length == 512, s"$name: JDK conversion length")
      val theirs = Array.tabulate(256)(i =>
        (((buf(2 * i) & 0xFF) | (buf(2 * i + 1).toInt << 8)).toShort).toFloat)
      val mine = BmpWavDecoder.decodeWav(wav)
      assert(mine.toSeq == theirs.toSeq, s"$name expansion table differs")
    }
  }

  test("resizeAreaAvg: integer-factor boxes average exactly; constant planes stay constant; fractional boxes conserve mass") {
    import spark.implicits._
    def plane(w: Int, h: Int, f: (Int, Int, Int) => Int): Array[Float] =
      Array.tabulate(w * h * 3)(p => f((p / 3) % w, (p / 3) / w, p % 3).toFloat)
    // 4x2 -> 2x1: each target channel is the mean of its 2x2 box
    val p1 = plane(4, 2, (x, y, c) => x * 10 + y * 40 + c)
    val df1 = Seq((1L, 4, 2, p1)).toDF("image_id", "w", "h", "features")
    val got = graft.llm.Multimodal
      .resizeAreaAvg(df1, "image_id", "w", "h", "features", 2, 1)
      .collect().map(r => r.getInt(1) -> r.getDouble(2)).toMap
    for (u <- 0 until 2; c <- 0 until 3) {
      val exp = (for (dx <- 0 until 2; dy <- 0 until 2)
        yield (u * 2 + dx) * 10 + dy * 40 + c).sum / 4.0
      assert(got(u * 3 + c) == exp, s"u=$u c=$c")
    }
    // constant plane survives ANY fractional geometry exactly
    val df2 = Seq((2L, 7, 5, plane(7, 5, (_, _, _) => 77)))
      .toDF("image_id", "w", "h", "features")
    val cst = graft.llm.Multimodal
      .resizeAreaAvg(df2, "image_id", "w", "h", "features", 3, 2)
      .collect()
    assert(cst.length == 3 * 2 * 3)
    assert(cst.forall(r => math.abs(r.getDouble(2) - 77.0) < 1e-3))
    // mass conservation under fractional boxes: total output mass x
    // box area equals total input mass (up to the rounding ladder)
    val p3 = plane(7, 5, (x, y, c) => (x * 31 + y * 17 + c * 5) % 256)
    val df3 = Seq((3L, 7, 5, p3)).toDF("image_id", "w", "h", "features")
    val outs = graft.llm.Multimodal
      .resizeAreaAvg(df3, "image_id", "w", "h", "features", 3, 2)
      .collect().map(_.getDouble(2))
    val outMass = outs.sum * (7.0 * 5.0) / (3.0 * 2.0)
    assert(math.abs(outMass - p3.map(_.toDouble).sum) < 0.1,
      s"mass drift: $outMass vs ${p3.sum}")
  }

  test("melEnergies: a pure tone lands exactly in the filters whose triangles cover its frequency") {
    import spark.implicits._
    val n = 200; val sr = 8000; val k0 = 30 // an exact bin: 1200 Hz, no leakage
    val samples = Array.tabulate(n)(t =>
      (1000.0 * math.cos(2 * math.Pi * k0 * t / n)).toFloat)
    val df = Seq((1L, samples)).toDF("clip_id", "samples")
    val out = graft.llm.Multimodal.melEnergies(df, "clip_id", "samples",
      sr, nMels = 8, nBins = 81).collect()
    val energies = out.map(r =>
      r.getInt(1) -> r.getDouble(2)).toMap
    val melMax = 2595.0 * math.log10(1.0 + 4000.0 / 700.0)
    val hz = (0 to 9).map(i =>
      700.0 * (math.pow(10.0, i * melMax / 9.0 / 2595.0) - 1.0))
    val covering = (1 to 8).filter(m =>
      1200.0 > hz(m - 1) && 1200.0 < hz(m + 1)).toSet
    assert(covering.nonEmpty)
    val hot = energies.filter(_._2 > 1.0).keySet
    assert(hot == covering, s"hot=$hot covering=$covering")
    assert(energies.values.forall(_ >= 0.0))
    // log-energy is the post-rounding ln(1 + e)
    out.foreach { r =>
      assert(r.getDouble(3) ==
        BigDecimal(math.log1p(math.max(r.getDouble(2), 0.0)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("melEnergies refuses mel grids too dense for 9-dp rounding (NaN-weight guard)") {
    import spark.implicits._
    val df = Seq((1L, Array(1.0f, 2.0f, 3.0f, 4.0f))).toDF("clip_id", "samples")
    // sampleRate 1 Hz with ~2^31 filters: the first mel gap rounds to
    // zero width, the triangle slope would divide by zero and the NaN
    // weight would PASS w > 0 under Spark NaN ordering — must refuse
    intercept[IllegalArgumentException] {
      graft.llm.Multimodal.melEnergies(df, "clip_id", "samples",
        sampleRate = 1, nMels = Int.MaxValue - 2, nBins = 4)
    }
    // degenerate sample rate: every mel point is 0 Hz
    intercept[IllegalArgumentException] {
      graft.llm.Multimodal.melEnergies(df, "clip_id", "samples",
        sampleRate = 0, nMels = 8, nBins = 4)
    }
    // sane parameters still pass the guard
    assert(graft.llm.Multimodal.melEnergies(df, "clip_id", "samples",
      sampleRate = 8000, nMels = 8, nBins = 4).count() > 0)
  }

  test("decode dispatches by kind; unknown kinds keep the fake-decoder interface") {
    val wav = AudioFixtures.wavPcm16(8000, 1, Array[Short](5, -5))
    assert(BmpWavDecoder.decode(wav, "audio").toSeq == Seq(5.0f, -5.0f))
    val vid = Array[Byte](1, 2, 3, 4)
    assert(BmpWavDecoder.decode(vid, "video").toSeq ==
      Multimodal.FakeDecoder.decode(vid, "video").toSeq)
  }
}
