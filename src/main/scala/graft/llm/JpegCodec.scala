package graft.llm

import java.io.ByteArrayOutputStream

/** Baseline JPEG (ITU T.81 sequential DCT, 8-bit) codec with zero
  * library dependencies — the JDK-only sibling of the Inflater-backed
  * PNG path, closing the "JPEG absent" gap in the multimodal decode
  * surface.
  *
  * DECODER ([[decode]]): marker walk (skips APPn/COM), multi-table DQT
  * (8- and 16-bit precisions) and DHT segments, SOF0 frames with 1 or
  * 3 components at sampling factors 1–2 (4:4:4, 4:2:2, 4:4:0, 4:2:0),
  * DRI/RSTn restart handling, byte-unstuffing (FF 00), per-MCU Huffman
  * decode of DC categories + AC run/size symbols, dequantize, zigzag
  * undo, double-precision separable IDCT, chroma upsample by
  * replication, JFIF YCbCr→RGB with clamp — returns row-major
  * top-down [r,g,b, …] floats, the [[Multimodal.BmpWavDecoder]] plane
  * contract. Progressive (SOF2), arithmetic-coded, 12-bit and
  * 4-component (CMYK) streams refuse loudly.
  *
  * ENCODER ([[encode]]): 4:4:4, quality-scaled Annex-K quantization
  * tables (the libjpeg 5000/q | 200−2q scaling), and SELF-DECLARED
  * canonical Huffman tables embedded in DHT — DC categories as twelve
  * 5-bit codes, AC run/size symbols as 162 8-bit codes (compression is
  * modest, correctness is exact, and every spec-compliant decoder
  * reads the tables from the stream; the all-ones code stays unused at
  * both lengths as T.81 recommends). The encoder exists to stage
  * pixel-exact-known fixtures: q242's oracle replays the original
  * plane formula and bounds the decode error by the quantization step.
  *
  * Decoder/encoder rounding is pinned (Math.round + clamp at every
  * stage), so the round-trip is deterministic on any JVM; T.81 allows
  * ±1 IDCT variance BETWEEN decoders, which is why the ImageIO
  * cross-checks in JpegCodecSpec assert small tolerances, not
  * equality, while the q242 gate pins THIS decoder's exact output
  * through invariant booleans.
  */
object JpegCodec {

  private val ZigZag: Array[Int] = Array(
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K.1 luminance / K.2 chrominance base quantization tables. */
  private val QLumBase: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  private val QChromBase: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** libjpeg quality scaling: q in [1, 100]. */
  private def scaleQ(base: Array[Int], quality: Int): Array[Int] = {
    val s = if (quality < 50) 5000 / quality else 200 - 2 * quality
    base.map(t => math.min(255, math.max(1, (t * s + 50) / 100)))
  }

  private def cosTab(u: Int, x: Int): Double =
    math.cos((2 * x + 1) * u * math.Pi / 16.0)

  private def cC(u: Int): Double = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0

  /** 2D 8×8 inverse DCT (naive double — 8×8 is 4096 mults, fine). */
  private def idct(in: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            s += cC(u) * cC(v) * in(v * 8 + u) * cosTab(u, x) * cosTab(v, y)
            u += 1
          }
          v += 1
        }
        out(y * 8 + x) = s / 4.0
        x += 1
      }
      y += 1
    }
    out
  }

  /** 2D 8×8 forward DCT. */
  private def fdct(in: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            s += in(y * 8 + x) * cosTab(u, x) * cosTab(v, y)
            x += 1
          }
          y += 1
        }
        out(v * 8 + u) = cC(u) * cC(v) * s / 4.0
        u += 1
      }
      v += 1
    }
    out
  }

  private def clamp255(v: Long): Int =
    if (v < 0) 0 else if (v > 255) 255 else v.toInt

  // ------------------------------------------------------------------
  // Huffman machinery — canonical code tables from DHT BITS/HUFFVAL.
  // ------------------------------------------------------------------

  /** Decode-side table: for each code length, the first code value and
    * the index of its first symbol (canonical layout). */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // -1 = no codes at this length
    val valPtr = new Array[Int](17)
    val values: Array[Int] = vals
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        maxCode(l) = if (bits(l - 1) > 0) code + bits(l - 1) - 1 else -1
        code += bits(l - 1)
        k += bits(l - 1)
        code <<= 1
        l += 1
      }
    }
  }

  /** Entropy-coded-segment bit reader with FF00 unstuffing; stops at
    * any marker (the caller inspects it). */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    var atMarker: Int = -1 // set when FFxx (xx != 0) interrupts the scan

    def bit(): Int = {
      if (nbits == 0) {
        if (atMarker >= 0) return 0 // draining past a marker: pad bits
        if (pos >= b.length) { atMarker = 0xD9; return 0 }
        var v = b(pos) & 0xFF
        pos += 1
        if (v == 0xFF) {
          val next = if (pos < b.length) b(pos) & 0xFF else 0xD9
          if (next == 0x00) { pos += 1 }
          else { atMarker = next; pos += 1; return 0 }
          v = 0xFF
        }
        acc = v; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }

    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }

    /** Consume an expected RSTn at a restart boundary: drop the
      * current byte's padding bits, then the marker — which the bit
      * loop may already have run into while draining padding. */
    def expectRestart(): Unit = {
      nbits = 0
      if (atMarker < 0) {
        require(pos + 1 < b.length && (b(pos) & 0xFF) == 0xFF,
          "JPEG restart marker missing")
        atMarker = b(pos + 1) & 0xFF
        pos += 2
      }
      require(atMarker >= 0xD0 && atMarker <= 0xD7,
        f"JPEG restart marker expected, found FF$atMarker%02X")
      atMarker = -1
    }

    def decodeSym(t: HuffTable): Int = {
      var code = bit()
      var l = 1
      while (l <= 16) {
        if (t.maxCode(l) >= 0 && code <= t.maxCode(l) && code >= t.minCode(l))
          return t.values(t.valPtr(l) + code - t.minCode(l))
        code = (code << 1) | bit()
        l += 1
      }
      throw new IllegalArgumentException("JPEG: invalid Huffman code")
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  // ------------------------------------------------------------------
  // Decoder
  // ------------------------------------------------------------------

  private case class Comp(id: Int, h: Int, v: Int, tq: Int,
                          var dcTab: Int = 0, var acTab: Int = 0)

  def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 3 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8 &&
      (b(2) & 0xFF) == 0xFF

  /** Decode a baseline JPEG to (width, height, row-major RGB floats). */
  def decode(b: Array[Byte]): (Int, Int, Array[Float]) = {
    require(isJpeg(b), "not a JPEG (no SOI)")
    val quant = Array.ofDim[Int](4, 64) // natural order
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var comps: Array[Comp] = null
    var w = 0; var h = 0
    var restartInterval = 0
    var pos = 2

    def u16(o: Int) = ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)

    var scanStart = -1
    while (scanStart < 0) {
      require(pos + 4 <= b.length, "truncated JPEG before SOS")
      require((b(pos) & 0xFF) == 0xFF, s"JPEG marker expected at $pos")
      // T.81 B.1.1.2: any number of FF fill bytes may precede a marker
      while (pos + 4 <= b.length && (b(pos + 1) & 0xFF) == 0xFF) pos += 1
      val m = b(pos + 1) & 0xFF
      val len = u16(pos + 2)
      require(pos + 2 + len <= b.length, s"truncated JPEG segment $m")
      m match {
        case 0xC0 | 0xC1 => // SOF0/1: baseline (extended-seq decodes the same)
          require((b(pos + 4) & 0xFF) == 8, "only 8-bit JPEG")
          h = u16(pos + 5); w = u16(pos + 7)
          val nc = b(pos + 9) & 0xFF
          require(nc == 1 || nc == 3,
            s"only grayscale or YCbCr JPEG ($nc components)")
          comps = Array.tabulate(nc) { i =>
            val o = pos + 10 + i * 3
            val hv = b(o + 1) & 0xFF
            val c = Comp(b(o) & 0xFF, (hv >> 4) & 0xF, hv & 0xF, b(o + 2) & 0xFF)
            require(c.h >= 1 && c.h <= 2 && c.v >= 1 && c.v <= 2,
              s"unsupported sampling ${c.h}x${c.v}")
            c
          }
        case 0xC2 => throw new IllegalArgumentException(
          "progressive JPEG (SOF2) not supported")
        case 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB | 0xCD | 0xCE | 0xCF =>
          throw new IllegalArgumentException(
            f"unsupported JPEG frame type FFC${m & 0xF}%X")
        case 0xC4 => // DHT (possibly several tables)
          var o = pos + 4
          while (o < pos + 2 + len) {
            val tc = (b(o) >> 4) & 0xF; val th = b(o) & 0xF
            require(tc <= 1 && th <= 3, "bad DHT header")
            val bits = Array.tabulate(16)(i => b(o + 1 + i) & 0xFF)
            val n = bits.sum
            val vals = Array.tabulate(n)(i => b(o + 17 + i) & 0xFF)
            val t = new HuffTable(bits, vals)
            if (tc == 0) dcTabs(th) = t else acTabs(th) = t
            o += 17 + n
          }
        case 0xDB => // DQT (possibly several tables, 8- or 16-bit)
          var o = pos + 4
          while (o < pos + 2 + len) {
            val pq = (b(o) >> 4) & 0xF; val tq = b(o) & 0xF
            require(pq <= 1 && tq <= 3, "bad DQT header")
            var i = 0
            while (i < 64) {
              val v = if (pq == 0) b(o + 1 + i) & 0xFF
                      else u16(o + 1 + 2 * i)
              quant(tq)(ZigZag(i)) = v
              i += 1
            }
            o += 1 + (if (pq == 0) 64 else 128)
          }
        case 0xDD => restartInterval = u16(pos + 4)
        case 0xDA => // SOS
          require(comps != null, "JPEG SOS before SOF")
          val ns = b(pos + 4) & 0xFF
          require(ns == comps.length, "partial-scan JPEG not supported")
          for (i <- 0 until ns) {
            val cid = b(pos + 5 + 2 * i) & 0xFF
            val tt = b(pos + 6 + 2 * i) & 0xFF
            val c = comps.find(_.id == cid).getOrElse(
              throw new IllegalArgumentException("SOS names unknown component"))
            c.dcTab = (tt >> 4) & 0xF; c.acTab = tt & 0xF
          }
          scanStart = pos + 2 + len
        case _ => // APPn / COM / others: skip
      }
      if (scanStart < 0) pos += 2 + len
    }

    require(w > 0 && h > 0, "JPEG missing SOF dimensions")
    val maxH = comps.map(_.h).max
    val maxV = comps.map(_.v).max
    val mcusX = (w + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (h + 8 * maxV - 1) / (8 * maxV)
    // per-component padded planes at natural resolution
    val planes = comps.map(c => new Array[Int](mcusX * c.h * 8 * mcusY * c.v * 8))
    val planeW = comps.map(c => mcusX * c.h * 8)

    val br = new BitReader(b, scanStart)
    val dcPred = new Array[Int](comps.length)
    val coeffs = new Array[Double](64)
    var mcu = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        br.expectRestart()
        java.util.Arrays.fill(dcPred, 0)
      }
      val my = mcu / mcusX; val mx = mcu % mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            // --- one 8x8 block ---
            java.util.Arrays.fill(coeffs, 0.0)
            val sDc = br.decodeSym(dcTabs(c.dcTab))
            require(sDc <= 11, "bad DC category")
            dcPred(ci) += extend(br.bits(sDc), sDc)
            coeffs(0) = dcPred(ci).toDouble * quant(c.tq)(0)
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = br.decodeSym(acTabs(c.acTab))
              val r = (rs >> 4) & 0xF; val s = rs & 0xF
              if (s == 0) {
                if (r == 15) k += 16 // ZRL
                else eob = true      // EOB
              } else {
                k += r
                require(k < 64, "AC run past block end")
                coeffs(ZigZag(k)) =
                  extend(br.bits(s), s).toDouble * quant(c.tq)(ZigZag(k))
                k += 1
              }
            }
            val px = idct(coeffs)
            val ox = (mx * c.h + bx) * 8; val oy = (my * c.v + by) * 8
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                planes(ci)((oy + yy) * planeW(ci) + ox + xx) =
                  clamp255(math.round(px(yy * 8 + xx) + 128.0))
                xx += 1
              }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }

    val out = new Array[Float](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        if (comps.length == 1) {
          val g = planes(0)(y * planeW(0) + x).toFloat
          out(o) = g; out(o + 1) = g; out(o + 2) = g
        } else {
          def sample(ci: Int): Int = {
            val c = comps(ci)
            planes(ci)((y * c.v / maxV) * planeW(ci) + (x * c.h / maxH))
          }
          val yv = sample(0).toDouble
          val cb = sample(1).toDouble - 128.0
          val cr = sample(2).toDouble - 128.0
          out(o) = clamp255(math.round(yv + 1.402 * cr)).toFloat
          out(o + 1) = clamp255(
            math.round(yv - 0.344136 * cb - 0.714136 * cr)).toFloat
          out(o + 2) = clamp255(math.round(yv + 1.772 * cb)).toFloat
        }
        x += 1
      }
      y += 1
    }
    (w, h, out)
  }

  // ------------------------------------------------------------------
  // Encoder (4:4:4, self-declared canonical Huffman tables)
  // ------------------------------------------------------------------

  /** DC symbols 0..11 as 5-bit canonical codes; AC symbols (EOB, ZRL,
    * every run/size) as 8-bit canonical codes — the all-ones code is
    * unused at both lengths. */
  private val DcBits: Array[Int] =
    Array(0, 0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals: Array[Int] = (0 to 11).toArray
  private val AcVals: Array[Int] =
    (0x00 +: (for (r <- 0 to 15; s <- 1 to 10) yield (r << 4) | s) :+ 0xF0)
      .sorted.toArray
  private val AcBits: Array[Int] =
    Array(0, 0, 0, 0, 0, 0, 0, AcVals.length, 0, 0, 0, 0, 0, 0, 0, 0)

  /** (code, length) per symbol from BITS/HUFFVAL. */
  private def encTable(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0; var k = 0
    val m = Map.newBuilder[Int, (Int, Int)]
    for (l <- 1 to 16) {
      for (_ <- 0 until bits(l - 1)) {
        m += vals(k) -> ((code, l)); code += 1; k += 1
      }
      code <<= 1
    }
    m.result()
  }

  private final class BitWriter(out: ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc & 0xFF)
          if ((acc & 0xFF) == 0xFF) out.write(0x00) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (n > 0) { put(0xFF, 8 - n) } // 1-padding
  }

  private def category(v: Int): Int = {
    var s = 0; var a = math.abs(v)
    while (a > 0) { s += 1; a >>= 1 }
    s
  }

  /** Encode an RGB formula plane as a 4:4:4 baseline JPEG;
    * `restartInterval` > 0 adds DRI + RSTn markers every that many
    * MCUs (exercises the decoder's restart path). */
  def encode(width: Int, height: Int, pix: (Int, Int) => (Int, Int, Int),
             quality: Int = 95, restartInterval: Int = 0): Array[Byte] = {
    require(width >= 1 && height >= 1, "empty image")
    require(width <= 65535 && height <= 65535,
      "JPEG dimensions are 16-bit (T.81 B.2.2)")
    require(quality >= 1 && quality <= 100, "quality in [1, 100]")
    require(restartInterval >= 0, "restartInterval >= 0")
    val qLum = scaleQ(QLumBase, quality)
    val qChrom = scaleQ(QChromBase, quality)
    val dcEnc = encTable(DcBits, DcVals)
    val acEnc = encTable(AcBits, AcVals)

    // color transform to full-resolution Y/Cb/Cr planes
    val planes = Array.ofDim[Int](3, width * height)
    for (y <- 0 until height; x <- 0 until width) {
      val (r0, g0, b0) = pix(x, y)
      val r = r0 & 0xFF; val g = g0 & 0xFF; val bb = b0 & 0xFF
      val o = y * width + x
      planes(0)(o) = clamp255(math.round(0.299 * r + 0.587 * g + 0.114 * bb))
      planes(1)(o) = clamp255(math.round(
        -0.168736 * r - 0.331264 * g + 0.5 * bb + 128.0))
      planes(2)(o) = clamp255(math.round(
        0.5 * r - 0.418688 * g - 0.081312 * bb + 128.0))
    }

    val out = new ByteArrayOutputStream()
    def be16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }

    marker(0xD8) // SOI
    // DQT: two 8-bit tables
    marker(0xDB); be16(2 + 2 * 65)
    out.write(0x00); ZigZag.foreach(i => out.write(qLum(i)))
    out.write(0x01); ZigZag.foreach(i => out.write(qChrom(i)))
    // SOF0: 3 components, 1x1 sampling each
    marker(0xC0); be16(8 + 3 * 3); out.write(8)
    be16(height); be16(width); out.write(3)
    out.write(1); out.write(0x11); out.write(0) // Y  -> q0
    out.write(2); out.write(0x11); out.write(1) // Cb -> q1
    out.write(3); out.write(0x11); out.write(1) // Cr -> q1
    // DHT: same canonical tables declared for ids 0 and 1, DC and AC
    def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xC4); be16(2 + 1 + 16 + vals.length)
      out.write((tc << 4) | th); bits.foreach(out.write); vals.foreach(out.write)
    }
    dht(0, 0, DcBits, DcVals); dht(1, 0, AcBits, AcVals)
    dht(0, 1, DcBits, DcVals); dht(1, 1, AcBits, AcVals)
    if (restartInterval > 0) { marker(0xDD); be16(4); be16(restartInterval) }
    // SOS
    marker(0xDA); be16(6 + 2 * 3); out.write(3)
    out.write(1); out.write(0x00)
    out.write(2); out.write(0x11)
    out.write(3); out.write(0x11)
    out.write(0); out.write(63); out.write(0) // Ss/Se/Ah-Al (baseline)

    val bw = new BitWriter(out)
    val dcPred = new Array[Int](3)
    val blocksX = (width + 7) / 8
    val blocksY = (height + 7) / 8
    val block = new Array[Double](64)
    var rstCount = 0
    for (m <- 0 until blocksX * blocksY) {
      val by = m / blocksX; val bx = m % blocksX
      if (restartInterval > 0 && m > 0 && m % restartInterval == 0) {
        bw.flush()
        marker(0xD0 + (rstCount % 8)); rstCount += 1
        java.util.Arrays.fill(dcPred, 0)
      }
      for (ci <- 0 until 3) {
      val q = if (ci == 0) qLum else qChrom
      // edge blocks replicate the last row/column (the usual pad)
      for (yy <- 0 until 8; xx <- 0 until 8) {
        val sx = math.min(bx * 8 + xx, width - 1)
        val sy = math.min(by * 8 + yy, height - 1)
        block(yy * 8 + xx) = planes(ci)(sy * width + sx) - 128.0
      }
      val f = fdct(block)
      val qz = new Array[Int](64)
      for (i <- 0 until 64)
        qz(i) = math.round(f(ZigZag(i)) / q(ZigZag(i))).toInt
      // DC
      val diff = qz(0) - dcPred(ci)
      dcPred(ci) = qz(0)
      val s = category(diff)
      val (dc, dl) = dcEnc(s)
      bw.put(dc, dl)
      if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      // AC with run-lengths
      var k = 1
      while (k < 64) {
        var run = 0
        while (k < 64 && qz(k) == 0) { run += 1; k += 1 }
        if (k == 64) {
          val (c, l) = acEnc(0x00); bw.put(c, l) // EOB
        } else {
          while (run > 15) {
            val (c, l) = acEnc(0xF0); bw.put(c, l); run -= 16 // ZRL
          }
          val v = qz(k)
          val sz = category(v)
          require(sz <= 10, "AC coefficient out of baseline range")
          val (c, l) = acEnc((run << 4) | sz)
          bw.put(c, l)
          bw.put(if (v < 0) v + (1 << sz) - 1 else v, sz)
          k += 1
        }
      }
      }
    }
    bw.flush()
    marker(0xD9) // EOI
    out.toByteArray
  }
}
