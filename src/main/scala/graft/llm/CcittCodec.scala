package graft.llm

import scala.collection.mutable.ArrayBuffer

/** CCITT Group 3 / Group 4 fax coding (ITU-T T.4 / T.6) — the
  * compressions scanned-document TIFF corpora actually ship
  * (compression tags 2 = Modified Huffman, 3 = T.4 1-D with EOLs,
  * 4 = T.6 2-D). Pure bilevel run-length/2-D coding from the public
  * spec tables; both directions (decode for the corpus, encode for
  * fixtures) so specs can cross-validate bit-exactly against the
  * JDK's independent TIFF plugin.
  *
  * Conventions (TIFF 6.0 §Section 10/11): FillOrder 1 (MSB-first
  * bits), rows code as alternating WHITE-first runs, white pixel =
  * bit 0 (PhotometricInterpretation 0, WhiteIsZero — the only legal
  * CCITT photometric here; callers refuse 1). Decoded rows pack
  * MSB-first like every other bilevel path in [[TiffCodec]].
  *
  * Group 4 follows T.6 §2.2: pass/vertical/horizontal modes against
  * the reference line, imaginary all-white line above row 0, EOFB
  * terminated (accepted, not required). Group 3 1-D accepts an
  * optional leading EOL per row (writers differ) and byte-aligns
  * nothing; Modified Huffman (tag 2) byte-aligns every row.
  */
object CcittCodec {

  // ------------------------------------------------------- code tables

  /** (runLength, codeBits, codeLength) — T.4 table 2 (white). */
  private val WhiteCodes: Array[(Int, Int, Int)] = Array(
    (0, 0x35, 8), (1, 0x07, 6), (2, 0x07, 4), (3, 0x08, 4),
    (4, 0x0B, 4), (5, 0x0C, 4), (6, 0x0E, 4), (7, 0x0F, 4),
    (8, 0x13, 5), (9, 0x14, 5), (10, 0x07, 5), (11, 0x08, 5),
    (12, 0x08, 6), (13, 0x03, 6), (14, 0x34, 6), (15, 0x35, 6),
    (16, 0x2A, 6), (17, 0x2B, 6), (18, 0x27, 7), (19, 0x0C, 7),
    (20, 0x08, 7), (21, 0x17, 7), (22, 0x03, 7), (23, 0x04, 7),
    (24, 0x28, 7), (25, 0x2B, 7), (26, 0x13, 7), (27, 0x24, 7),
    (28, 0x18, 7), (29, 0x02, 8), (30, 0x03, 8), (31, 0x1A, 8),
    (32, 0x1B, 8), (33, 0x12, 8), (34, 0x13, 8), (35, 0x14, 8),
    (36, 0x15, 8), (37, 0x16, 8), (38, 0x17, 8), (39, 0x28, 8),
    (40, 0x29, 8), (41, 0x2A, 8), (42, 0x2B, 8), (43, 0x2C, 8),
    (44, 0x2D, 8), (45, 0x04, 8), (46, 0x05, 8), (47, 0x0A, 8),
    (48, 0x0B, 8), (49, 0x52, 8), (50, 0x53, 8), (51, 0x54, 8),
    (52, 0x55, 8), (53, 0x24, 8), (54, 0x25, 8), (55, 0x58, 8),
    (56, 0x59, 8), (57, 0x5A, 8), (58, 0x5B, 8), (59, 0x4A, 8),
    (60, 0x4B, 8), (61, 0x32, 8), (62, 0x33, 8), (63, 0x34, 8),
    // makeup
    (64, 0x1B, 5), (128, 0x12, 5), (192, 0x17, 6), (256, 0x37, 7),
    (320, 0x36, 8), (384, 0x37, 8), (448, 0x64, 8), (512, 0x65, 8),
    (576, 0x68, 8), (640, 0x67, 8), (704, 0xCC, 9), (768, 0xCD, 9),
    (832, 0xD2, 9), (896, 0xD3, 9), (960, 0xD4, 9), (1024, 0xD5, 9),
    (1088, 0xD6, 9), (1152, 0xD7, 9), (1216, 0xD8, 9), (1280, 0xD9, 9),
    (1344, 0xDA, 9), (1408, 0xDB, 9), (1472, 0x98, 9), (1536, 0x99, 9),
    (1600, 0x9A, 9), (1664, 0x18, 6), (1728, 0x9B, 9))

  /** T.4 table 3 (black). */
  private val BlackCodes: Array[(Int, Int, Int)] = Array(
    (0, 0x37, 10), (1, 0x02, 3), (2, 0x03, 2), (3, 0x02, 2),
    (4, 0x03, 3), (5, 0x03, 4), (6, 0x02, 4), (7, 0x03, 5),
    (8, 0x05, 6), (9, 0x04, 6), (10, 0x04, 7), (11, 0x05, 7),
    (12, 0x07, 7), (13, 0x04, 8), (14, 0x07, 8), (15, 0x18, 9),
    (16, 0x17, 10), (17, 0x18, 10), (18, 0x08, 10), (19, 0x67, 11),
    (20, 0x68, 11), (21, 0x6C, 11), (22, 0x37, 11), (23, 0x28, 11),
    (24, 0x17, 11), (25, 0x18, 11), (26, 0xCA, 12), (27, 0xCB, 12),
    (28, 0xCC, 12), (29, 0xCD, 12), (30, 0x68, 12), (31, 0x69, 12),
    (32, 0x6A, 12), (33, 0x6B, 12), (34, 0xD2, 12), (35, 0xD3, 12),
    (36, 0xD4, 12), (37, 0xD5, 12), (38, 0xD6, 12), (39, 0xD7, 12),
    (40, 0x6C, 12), (41, 0x6D, 12), (42, 0xDA, 12), (43, 0xDB, 12),
    (44, 0x54, 12), (45, 0x55, 12), (46, 0x56, 12), (47, 0x57, 12),
    (48, 0x64, 12), (49, 0x65, 12), (50, 0x52, 12), (51, 0x53, 12),
    (52, 0x24, 12), (53, 0x37, 12), (54, 0x38, 12), (55, 0x27, 12),
    (56, 0x28, 12), (57, 0x58, 12), (58, 0x59, 12), (59, 0x2B, 12),
    (60, 0x2C, 12), (61, 0x5A, 12), (62, 0x66, 12), (63, 0x67, 12),
    // makeup
    (64, 0x0F, 10), (128, 0xC8, 12), (192, 0xC9, 12), (256, 0x5B, 12),
    (320, 0x33, 12), (384, 0x34, 12), (448, 0x35, 12), (512, 0x6C, 13),
    (576, 0x6D, 13), (640, 0x4A, 13), (704, 0x4B, 13), (768, 0x4C, 13),
    (832, 0x4D, 13), (896, 0x72, 13), (960, 0x73, 13), (1024, 0x74, 13),
    (1088, 0x75, 13), (1152, 0x76, 13), (1216, 0x77, 13), (1280, 0x52, 13),
    (1344, 0x53, 13), (1408, 0x54, 13), (1472, 0x55, 13), (1536, 0x5A, 13),
    (1600, 0x5B, 13), (1664, 0x64, 13), (1728, 0x65, 13))

  /** Extended makeup codes shared by both colors (T.4 table 4). */
  private val ExtCodes: Array[(Int, Int, Int)] = Array(
    (1792, 0x08, 11), (1856, 0x0C, 11), (1920, 0x0D, 11),
    (1984, 0x12, 12), (2048, 0x13, 12), (2112, 0x14, 12),
    (2176, 0x15, 12), (2240, 0x16, 12), (2304, 0x17, 12),
    (2368, 0x1C, 12), (2432, 0x1D, 12), (2496, 0x1E, 12),
    (2560, 0x1F, 12))

  /** Decode lookup: (length, bits) → run, per color. */
  private def decodeMap(codes: Array[(Int, Int, Int)]): Map[(Int, Int), Int] =
    (codes ++ ExtCodes).map { case (run, bits, len) => (len, bits) -> run }
      .toMap

  private val WhiteDecode = decodeMap(WhiteCodes)
  private val BlackDecode = decodeMap(BlackCodes)
  private val WhiteEncode =
    (WhiteCodes ++ ExtCodes).map { case (r, b, l) => r -> (b, l) }.toMap
  private val BlackEncode =
    (BlackCodes ++ ExtCodes).map { case (r, b, l) => r -> (b, l) }.toMap

  // --------------------------------------------------------- bit reader

  private final class BitRd(b: Array[Byte], off: Int, len: Int) {
    private var pos = 0L
    private val end = len.toLong * 8
    def remaining: Long = end - pos
    def bit(): Int = {
      require(pos < end, "truncated CCITT segment")
      val v = (b(off + (pos >> 3).toInt) >> (7 - (pos & 7).toInt)) & 1
      pos += 1
      v
    }
    def peekBits(n: Int): Int = {
      var v = 0
      var k = 0
      while (k < n) {
        val p = pos + k
        v = (v << 1) |
          (if (p < end) (b(off + (p >> 3).toInt) >> (7 - (p & 7).toInt)) & 1
           else 0)
        k += 1
      }
      v
    }
    def skip(n: Int): Unit = { pos += n }
    def alignByte(): Unit = { pos = (pos + 7) & ~7L }
  }

  /** One MH run of `white` color: read code(s), makeups accumulate
    * until a terminating code (< 64). */
  private def readRun(rd: BitRd, white: Boolean): Int = {
    var total = 0
    var terminating = false
    while (!terminating) {
      var len = 1
      var bits = rd.bit()
      var run = -1
      val table = if (white) WhiteDecode else BlackDecode
      while (run < 0) {
        require(len <= 14, s"unknown CCITT ${if (white) "white" else "black"} code")
        run = table.getOrElse((len, bits), -1)
        if (run < 0) { bits = (bits << 1) | rd.bit(); len += 1 }
      }
      total += run
      terminating = run < 64
    }
    total
  }

  private def writeRun(out: BitWr, run0: Int, white: Boolean): Unit = {
    var run = run0
    val table = if (white) WhiteEncode else BlackEncode
    while (run >= 2624) { // 2560 makeup + at least a terminating code
      val (bits, len) = table(2560)
      out.write(bits, len)
      run -= 2560
    }
    if (run >= 64) {
      val makeup = (run / 64) * 64
      val (bits, len) = table(makeup)
      out.write(bits, len)
      run -= makeup
    }
    val (bits, len) = table(run)
    out.write(bits, len)
  }

  private final class BitWr {
    val buf = new ArrayBuffer[Byte]()
    private var acc = 0L
    private var n = 0
    def write(bits: Int, len: Int): Unit = {
      acc = (acc << len) | (bits.toLong & ((1L << len) - 1))
      n += len
      while (n >= 8) {
        buf += ((acc >> (n - 8)) & 0xFF).toByte
        n -= 8
      }
    }
    def alignByte(): Unit = if (n > 0) write(0, 8 - n)
    def toArray: Array[Byte] = { alignByte(); buf.toArray }
  }

  // ----------------------------------------------------------- decoding

  /** Decode a CCITT segment of `rows` rows of `w` pixels into
    * MSB-first packed bilevel rows (bit 1 = black, photometric 0
    * raw). `comp` ∈ {2 (MH byte-aligned), 3 (T.4; `g3TwoD` selects
    * the 2-D variant with mandatory EOL + per-row tag bit — what
    * T4Options bit 0 declares and the JDK writer emits), 4 (T.6)}. */
  def decode(b: Array[Byte], off: Int, len: Int, w: Int, rows: Int,
             comp: Int, g3TwoD: Boolean = false): Array[Byte] = {
    require(w > 0 && rows >= 0, "bad CCITT geometry")
    val rowBytes = (w + 7) / 8
    val out = new Array[Byte](rowBytes * rows)
    val rd = new BitRd(b, off, len)
    comp match {
      case 3 if g3TwoD =>
        var ref = Array(w, w)
        var r = 0
        while (r < rows) {
          require(skipEolAndFill(rd), "T.4 2-D line lacks its EOL")
          val cur =
            if (rd.bit() == 1) padElems(decodeMhElems(rd, w), w) // 1-D tag
            else decode2dRow(rd, w, ref)
          packRow(cur, w, out, r * rowBytes)
          ref = cur
          r += 1
        }
      case 2 | 3 =>
        var r = 0
        while (r < rows) {
          if (comp == 2 && r > 0) rd.alignByte()
          if (comp == 3) skipEolAndFill(rd)
          packRow(padElems(decodeMhElems(rd, w), w), w, out, r * rowBytes)
          r += 1
        }
      case 4 =>
        // reference line as changing elements; starts all-white
        var ref = Array(w, w)
        var r = 0
        while (r < rows) {
          val cur = decode2dRow(rd, w, ref)
          packRow(cur, w, out, r * rowBytes)
          ref = cur
          r += 1
        }
      case other =>
        throw new IllegalArgumentException(s"CCITT compression $other")
    }
    out
  }

  /** T.4 fill bits (zeros) then an optional EOL (000000000001);
    * returns whether an EOL was consumed. */
  private def skipEolAndFill(rd: BitRd): Boolean = {
    // an EOL is at least 12 bits: 11 zeros + 1. Peek: a run of >= 11
    // zeros followed by a 1 is EOL (+ fill); otherwise leave alone.
    var zeros = 0
    while (zeros < 64 && rd.remaining > zeros && rd.peekBits(zeros + 1) == 0)
      zeros += 1
    if (zeros >= 11 && rd.remaining > zeros) {
      rd.skip(zeros) // fill + the EOL's 11 zeros
      require(rd.bit() == 1, "malformed T.4 EOL")
      true
    } else false
  }

  /** One 1-D MH row as changing elements (cumulative run ends < w,
    * white-first so even indexes open black runs). */
  private def decodeMhElems(rd: BitRd, w: Int): ArrayBuffer[Int] = {
    val elems = new ArrayBuffer[Int]()
    var x = 0
    var white = true
    while (x < w) {
      val run = readRun(rd, white)
      require(x + run <= w, s"CCITT run overflows row ($x + $run > $w)")
      x += run
      if (x < w) elems += x
      white = !white
    }
    elems
  }

  /** Pad a changing-element list to the (even, w-terminated) shape
    * packRow/decode2dRow expect. */
  private def padElems(elems: ArrayBuffer[Int], w: Int): Array[Int] = {
    val arr = elems.toArray
    if (arr.length % 2 == 0) arr :+ w :+ w else arr :+ w
  }

  /** One T.6 2-D row; `ref` are the reference line's changing
    * elements (ascending, padded with w). Returns this row's
    * changing elements in the same form. */
  private def decode2dRow(rd: BitRd, w: Int, ref: Array[Int]): Array[Int] = {
    val cur = new ArrayBuffer[Int]()
    var a0 = -1
    var white = true
    while (a0 < w) {
      // b1: first changing element of ref > a0 with opposite color
      // of a0's color (i.e. where the ref line changes TO !white →
      // the (2k)th entries are white→black transitions)
      var i = 0
      // entries at even index are white->black changes, odd black->white
      while (i < ref.length && (ref(i) <= a0 ||
             ((i & 1) == 0) != white)) i += 1
      val b1 = if (i < ref.length) ref(i) else w
      val b2 = if (i + 1 < ref.length) ref(i + 1) else w
      // mode dispatch
      if (rd.peekBits(1) == 1) { // V0
        rd.skip(1)
        vertical(cur, b1, 0, w, white); white = !white; a0 = math.min(b1, w)
      } else if (rd.peekBits(3) == 1) { // 001 horizontal
        rd.skip(3)
        val start = math.max(a0, 0)
        val run1 = readRun(rd, white)
        val run2 = readRun(rd, !white)
        val a1 = start + run1
        val a2 = a1 + run2
        require(a2 <= w, s"T.6 horizontal overflows row ($a2 > $w)")
        cur += a1 += a2
        a0 = a2
      } else if (rd.peekBits(4) == 1) { // 0001 pass
        rd.skip(4)
        a0 = b2
        require(a0 <= w, "T.6 pass overflows row")
      } else if (rd.peekBits(3) == 3) { // 011 VR1
        rd.skip(3); vertical(cur, b1, 1, w, white); white = !white
        a0 = b1 + 1
      } else if (rd.peekBits(3) == 2) { // 010 VL1
        rd.skip(3); vertical(cur, b1, -1, w, white); white = !white
        a0 = b1 - 1
      } else if (rd.peekBits(6) == 3) { // 000011 VR2
        rd.skip(6); vertical(cur, b1, 2, w, white); white = !white
        a0 = b1 + 2
      } else if (rd.peekBits(6) == 2) { // 000010 VL2
        rd.skip(6); vertical(cur, b1, -2, w, white); white = !white
        a0 = b1 - 2
      } else if (rd.peekBits(7) == 3) { // 0000011 VR3
        rd.skip(7); vertical(cur, b1, 3, w, white); white = !white
        a0 = b1 + 3
      } else if (rd.peekBits(7) == 2) { // 0000010 VL3
        rd.skip(7); vertical(cur, b1, -3, w, white); white = !white
        a0 = b1 - 3
      } else {
        throw new IllegalArgumentException(
          s"unknown T.6 mode code near bit ${rd.peekBits(12)}")
      }
    }
    // normalize: ascending, pad to even length with w
    val arr = cur.toArray
    require(arr.forall(v => v >= 0 && v <= w), "T.6 changing element range")
    val padded = if (arr.length % 2 == 0) arr :+ w :+ w else arr :+ w
    padded
  }

  private def vertical(cur: ArrayBuffer[Int], b1: Int, d: Int, w: Int,
                       white: Boolean): Unit = {
    val a1 = b1 + d
    require(a1 >= 0 && a1 <= w, s"T.6 vertical a1=$a1 out of row")
    cur += a1
  }

  /** changing-element row → packed bits (black = 1). Elements at
    * even positions open black runs, odd positions close them. */
  private def packRow(elems: Array[Int], w: Int, out: Array[Byte],
                      base: Int): Unit = {
    var i = 0
    while (i + 1 < elems.length) {
      val from = elems(i)
      val to = elems(i + 1)
      if (from < w && to > from) setBits(out, base, from, math.min(to, w))
      i += 2
    }
  }

  private def setBits(out: Array[Byte], base: Int, from: Int,
                      to: Int): Unit = {
    var x = from
    while (x < to) {
      out(base + (x >> 3)) = (out(base + (x >> 3)) | (1 << (7 - (x & 7)))).toByte
      x += 1
    }
  }

  // ----------------------------------------------------------- encoding

  /** Encode packed bilevel rows (bit 1 = black) as a CCITT segment.
    * comp 2 = MH byte-aligned rows, 3 = T.4 1-D with a leading EOL
    * per row, 4 = T.6 with EOFB. */
  def encode(rows: Array[Byte], w: Int, nRows: Int, comp: Int): Array[Byte] = {
    val rowBytes = (w + 7) / 8
    require(rows.length >= rowBytes * nRows, "CCITT encode input short")
    val out = new BitWr
    def runsOf(r: Int): Array[Int] = {
      // changing elements of row r
      val elems = new ArrayBuffer[Int]()
      var x = 0
      var cur = 0 // current color: 0 white
      while (x < w) {
        val bit = (rows(r * rowBytes + (x >> 3)) >> (7 - (x & 7))) & 1
        if (bit != cur) { elems += x; cur = bit }
        x += 1
      }
      elems.toArray
    }
    comp match {
      case 2 | 3 =>
        var r = 0
        while (r < nRows) {
          if (comp == 3) out.write(1, 12) // EOL
          var x = 0
          var white = true
          val elems = runsOf(r) :+ w
          var i = 0
          var prev = 0
          while (prev < w && i < elems.length) {
            val next = elems(i)
            writeRun(out, next - prev, white)
            white = !white
            prev = next
            i += 1
          }
          if (prev < w) writeRun(out, w - prev, white)
          if (comp == 2) out.alignByte()
          r += 1
        }
      case 4 =>
        var ref = Array(w, w)
        var r = 0
        while (r < nRows) {
          val cur0 = runsOf(r)
          val cur = (if (cur0.length % 2 == 0) cur0 :+ w :+ w
                     else cur0 :+ w)
          encode2dRow(out, w, ref, cur)
          ref = cur
          r += 1
        }
        out.write(1, 12); out.write(1, 12) // EOFB
      case other =>
        throw new IllegalArgumentException(s"CCITT compression $other")
    }
    out.toArray
  }

  private def encode2dRow(out: BitWr, w: Int, ref: Array[Int],
                          cur: Array[Int]): Unit = {
    var a0 = -1
    var white = true
    var ci = 0 // index of a1 in cur (next changing element > a0)
    while (a0 < w) {
      while (ci < cur.length && cur(ci) <= a0) ci += 1
      val a1 = if (ci < cur.length) cur(ci) else w
      val a2 = if (ci + 1 < cur.length) cur(ci + 1) else w
      var i = 0
      while (i < ref.length && (ref(i) <= a0 ||
             ((i & 1) == 0) != white)) i += 1
      val b1 = if (i < ref.length) ref(i) else w
      val b2 = if (i + 1 < ref.length) ref(i + 1) else w
      if (b2 < a1) { // pass
        out.write(1, 4) // 0001
        a0 = b2
      } else if (math.abs(a1 - b1) <= 3) { // vertical
        val d = a1 - b1
        d match {
          case 0  => out.write(1, 1)
          case 1  => out.write(3, 3)
          case -1 => out.write(2, 3)
          case 2  => out.write(3, 6)
          case -2 => out.write(2, 6)
          case 3  => out.write(3, 7)
          case -3 => out.write(2, 7)
        }
        a0 = a1
        white = !white
        ci += 1
      } else { // horizontal
        out.write(1, 3) // 001
        val start = math.max(a0, 0)
        writeRun(out, a1 - start, white)
        writeRun(out, a2 - a1, !white)
        a0 = a2
        ci += 2
      }
    }
  }
}
