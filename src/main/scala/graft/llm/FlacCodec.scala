package graft.llm

/** Dependency-free FLAC codec: a full sample DECODER for the lossless
  * FLAC bitstream (RFC 9639 / the xiph FLAC format spec) plus a
  * fixture ENCODER — the [[GifCodec]]/[[JpegCodec]] pattern: the
  * encoder exists so specs and oracle queries can exercise every
  * decoder branch from generative formulas, and because FLAC is
  * lossless the decode of any encode must reproduce the input
  * BIT-EXACTLY (the spec asserts it; the q256 oracle replays the
  * generative formulas without knowing FLAC exists).
  *
  * Decoder surface — the whole subset a real audio crawl carries:
  *   - STREAMINFO + metadata-block walk (unknown blocks skipped);
  *   - frame headers with the full blocksize/sample-rate/sample-size
  *     code tables, extended-UTF-8 frame numbers, CRC-8 VERIFIED;
  *   - subframes: CONSTANT, VERBATIM, FIXED orders 0–4, LPC orders
  *     1–32 (quantized coefficients, arithmetic-shift prediction in
  *     64-bit), each with optional wasted-bits shifts;
  *   - Rice-partitioned residuals, both 4- and 5-bit parameter
  *     methods, including the raw-binary ESCAPE code;
  *   - inter-channel decorrelation: left/side, right/side, mid/side
  *     (the side channel one bit deeper);
  *   - frame CRC-16 VERIFIED, and the STREAMINFO MD5 of the decoded
  *     stream VERIFIED when present — an end-to-end integrity check
  *     independent of the per-frame CRCs.
  * Anything reserved/invalid refuses loudly; allocation is capped
  * before it happens (crafted-header hardening, the GIF/PNG rule).
  *
  * Unlike GIF/JPEG there is no JDK codec to cross-check against, so
  * the MD5 check carries that weight: the encoder computes it from
  * the RAW INPUT before any encoding decision, the decoder recomputes
  * it from decoded samples — any lossy bug on either side breaks a
  * hash neither side can fake. FlacCodecSpec additionally pins
  * hand-worked Rice/UTF-8/CRC bit patterns.
  *
  * Scale shape: decode is a pure per-row byte-array function (no
  * Spark types), driven inside narrow `mapPartitions` batches by
  * [[Multimodal.extractFeatures]] — embarrassingly parallel across a
  * 100 TB audio corpus, zero shuffle before downstream features.
  *
  * Reference scope: the reference pipeline carries no audio at all —
  * this extends the engine's multimodal decode matrix (SURVEY §2's
  * training-data mandate) the same way GifCodec/JpegCodec did for
  * images.
  */
object FlacCodec {

  def isFlac(b: Array[Byte]): Boolean =
    b != null && b.length >= 4 &&
      b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C'

  // ---------------------------------------------------------------
  // CRCs: CRC-8 poly 0x07 over the frame header, CRC-16 poly 0x8005
  // over the whole frame — both init 0, MSB-first (spec §9.3).
  // ---------------------------------------------------------------
  private val crc8Table: Array[Int] = Array.tabulate(256) { i =>
    var c = i; var k = 0
    while (k < 8) {
      c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xFF else (c << 1) & 0xFF
      k += 1
    }
    c
  }
  private val crc16Table: Array[Int] = Array.tabulate(256) { i =>
    var c = i << 8; var k = 0
    while (k < 8) {
      c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xFFFF
          else (c << 1) & 0xFFFF
      k += 1
    }
    c
  }
  private def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var c = 0; var i = from
    while (i < until) { c = crc8Table(c ^ (b(i) & 0xFF)); i += 1 }
    c
  }
  private def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var c = 0; var i = from
    while (i < until) {
      c = (crc16Table(((c >> 8) ^ (b(i) & 0xFF)) & 0xFF) ^ (c << 8)) & 0xFFFF
      i += 1
    }
    c
  }

  // ---------------------------------------------------------------
  // MSB-first bit IO
  // ---------------------------------------------------------------
  private final class BitWriter {
    private var buf = new Array[Byte](256)
    private var len = 0
    private var cur = 0
    private var nb = 0
    private def push(byte: Int): Unit = {
      if (len == buf.length) buf = java.util.Arrays.copyOf(buf, len * 2)
      buf(len) = byte.toByte; len += 1
    }
    def writeBit(v: Int): Unit = {
      cur = (cur << 1) | (v & 1); nb += 1
      if (nb == 8) { push(cur); cur = 0; nb = 0 }
    }
    def writeBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { writeBit(((v >>> i) & 1L).toInt); i -= 1 }
    }
    /** FLAC unary: q zero bits then a one bit. */
    def writeUnary(q: Long): Unit = {
      var i = 0L
      while (i < q) { writeBit(0); i += 1 }
      writeBit(1)
    }
    def alignZero(): Unit = while (nb != 0) writeBit(0)
    def bytes: Array[Byte] = {
      require(nb == 0, "BitWriter: unaligned")
      java.util.Arrays.copyOf(buf, len)
    }
    def crc8From(from: Int): Int = { require(nb == 0); crc8(buf, from, len) }
    def crc16From(from: Int): Int = { require(nb == 0); crc16(buf, from, len) }
  }

  private final class BitReader(b: Array[Byte], startByte: Int) {
    private var bit: Long = startByte.toLong * 8
    private val end: Long = b.length.toLong * 8
    def bytePos: Int = {
      require(bit % 8 == 0, "BitReader: unaligned bytePos")
      (bit / 8).toInt
    }
    def readBit(): Int = {
      require(bit < end, "truncated FLAC stream")
      val v = (b((bit / 8).toInt) >> (7 - (bit % 8).toInt)) & 1
      bit += 1
      v
    }
    def readBits(n: Int): Long = {
      require(n >= 0 && n <= 57, s"readBits($n)")
      require(bit + n <= end, "truncated FLAC stream")
      var v = 0L; var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def readSigned(n: Int): Long = {
      val v = readBits(n)
      if (n > 0 && (v & (1L << (n - 1))) != 0) v - (1L << n) else v
    }
    /** FLAC unary: count of zero bits before the terminating one. */
    def readUnary(): Long = {
      var q = 0L
      while (readBit() == 0) q += 1
      q
    }
    def alignToByte(): Unit = bit = (bit + 7) / 8 * 8
    def remainingBytes: Int = ((end - bit) / 8).toInt
  }

  // ---------------------------------------------------------------
  // Shared coding tables
  // ---------------------------------------------------------------
  /** Fixed-predictor coefficients (spec §9.2.2): order k predicts with
    * binomial weights; the residual is the k-th difference. */
  private val FixedCoefs: Array[Array[Long]] = Array(
    Array(), Array(1L), Array(2L, -1L), Array(3L, -3L, 1L),
    Array(4L, -6L, 4L, -1L))

  private def zigzag(r: Long): Long = (r << 1) ^ (r >> 63)
  private def unzigzag(u: Long): Long = (u >>> 1) ^ -(u & 1L)

  /** Extended UTF-8 coded number (spec §9.1.5) — up to 36 bits. */
  private def writeUtf8(w: BitWriter, vIn: Long): Unit = {
    val v = vIn
    require(v >= 0 && v < (1L << 36), s"utf8 range: $v")
    if (v < 0x80) w.writeBits(v, 8)
    else {
      val nBytes =
        if (v < (1L << 11)) 2 else if (v < (1L << 16)) 3
        else if (v < (1L << 21)) 4 else if (v < (1L << 26)) 5
        else if (v < (1L << 31)) 6 else 7
      // lead byte: nBytes ones, a zero, then the top payload bits
      val payloadBits = if (nBytes == 7) 36 else 6 * (nBytes - 1) + (7 - nBytes)
      val leadBits = if (nBytes == 7) 0 else 7 - nBytes
      w.writeBits((1L << nBytes) - 1, nBytes) // nBytes one-bits
      w.writeBit(0)
      var rem = payloadBits
      if (leadBits > 0) { rem -= leadBits; w.writeBits(v >>> rem, leadBits) }
      while (rem > 0) {
        rem -= 6
        w.writeBits(0x2, 2) // 10
        w.writeBits((v >>> rem) & 0x3F, 6)
      }
    }
  }

  private def readUtf8(r: BitReader): Long = {
    val first = r.readBits(8).toInt
    if ((first & 0x80) == 0) return first.toLong
    var nBytes = 0
    var mask = 0x80
    while (nBytes < 8 && (first & mask) != 0) { nBytes += 1; mask >>= 1 }
    require(nBytes >= 2 && nBytes <= 7, s"bad UTF-8 lead byte $first")
    var v: Long = (first & (0xFF >> (nBytes + 1))).toLong
    var i = 1
    while (i < nBytes) {
      val c = r.readBits(8).toInt
      require((c & 0xC0) == 0x80, s"bad UTF-8 continuation $c")
      v = (v << 6) | (c & 0x3F)
      i += 1
    }
    v
  }

  // ---------------------------------------------------------------
  // DECODER
  // ---------------------------------------------------------------
  final case class Meta(sampleRate: Int, channels: Int, bits: Int,
                        totalSamples: Long)

  /** Hard allocation cap — a 34-byte crafted STREAMINFO must not be
    * able to demand gigabytes before the first frame is even read. */
  private val MaxTotalValues = 1 << 27 // 128M samples×channels ≈ 512 MB ints

  def decodeWithMeta(b: Array[Byte]): (Meta, Array[Int]) = {
    require(isFlac(b), "not a FLAC stream")
    // --- metadata block walk; STREAMINFO mandatory and first ---
    var pos = 4
    require(b.length >= pos + 4 + 34, "truncated FLAC metadata")
    require((b(pos) & 0x7F) == 0, "first FLAC metadata block not STREAMINFO")
    var last = (b(pos) & 0x80) != 0
    val siLen = ((b(pos + 1) & 0xFF) << 16) | ((b(pos + 2) & 0xFF) << 8) |
      (b(pos + 3) & 0xFF)
    require(siLen == 34, s"STREAMINFO length $siLen")
    val si = pos + 4
    val minBlock = ((b(si) & 0xFF) << 8) | (b(si + 1) & 0xFF)
    val maxBlock = ((b(si + 2) & 0xFF) << 8) | (b(si + 3) & 0xFF)
    require(minBlock >= 1 && maxBlock >= minBlock,
      s"STREAMINFO block sizes $minBlock/$maxBlock")
    val o = si + 10
    val sampleRate = ((b(o) & 0xFF) << 12) | ((b(o + 1) & 0xFF) << 4) |
      ((b(o + 2) & 0xF0) >>> 4)
    val channels = ((b(o + 2) & 0x0E) >>> 1) + 1
    val bits = (((b(o + 2) & 0x01) << 4) | ((b(o + 3) & 0xF0) >>> 4)) + 1
    val total = ((b(o + 3) & 0x0FL) << 32) | ((b(o + 4) & 0xFFL) << 24) |
      ((b(o + 5) & 0xFFL) << 16) | ((b(o + 6) & 0xFFL) << 8) |
      (b(o + 7) & 0xFFL)
    require(sampleRate > 0, "STREAMINFO sample rate 0")
    require(bits >= 4 && bits <= 32, s"STREAMINFO bits $bits")
    val md5 = java.util.Arrays.copyOfRange(b, o + 8, o + 24)
    require(total * channels <= MaxTotalValues,
      s"FLAC stream too large to decode in-memory: $total×$channels")
    pos = si + 34
    while (!last) {
      require(pos + 4 <= b.length, "truncated FLAC metadata header")
      last = (b(pos) & 0x80) != 0
      require((b(pos) & 0x7F) != 127, "invalid FLAC metadata block type 127")
      val len = ((b(pos + 1) & 0xFF) << 16) | ((b(pos + 2) & 0xFF) << 8) |
        (b(pos + 3) & 0xFF)
      pos += 4 + len
      require(pos <= b.length, "truncated FLAC metadata block")
    }

    // --- frames until the declared sample count (or EOF if unknown) ---
    val out =
      if (total > 0) new Array[Int]((total * channels).toInt)
      else new Array[Int](0)
    var grown = out // reallocated when total is unknown
    var decoded = 0L
    val r = new BitReader(b, pos)
    while ((total > 0 && decoded < total) ||
           (total == 0 && r.remainingBytes >= 2)) {
      val frameStart = r.bytePos
      // frame header: 14-bit sync, reserved 0, blocking strategy
      require(r.readBits(14) == 0x3FFE, "lost FLAC frame sync")
      require(r.readBit() == 0, "reserved frame-header bit set")
      val variableBlocking = r.readBit() == 1
      val bsCode = r.readBits(4).toInt
      val srCode = r.readBits(4).toInt
      val chanAsgn = r.readBits(4).toInt
      val sizeCode = r.readBits(3).toInt
      require(r.readBit() == 0, "reserved frame-header bit set")
      readUtf8(r) // frame/sample number (ordering not re-derived here)
      val blockSize = bsCode match {
        case 0 => throw new IllegalArgumentException("reserved blocksize code")
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 => r.readBits(8).toInt + 1
        case 7 => r.readBits(16).toInt + 1
        case c => 256 << (c - 8)
      }
      srCode match { // value itself comes from STREAMINFO; codes validated
        case 12 => r.readBits(8)
        case 13 | 14 => r.readBits(16)
        case 15 => throw new IllegalArgumentException("invalid sample-rate code")
        case _ => ()
      }
      val frameBits = sizeCode match {
        case 0 => bits
        case 1 => 8
        case 2 => 12
        case 3 => throw new IllegalArgumentException("reserved sample-size code")
        case 4 => 16
        case 5 => 20
        case 6 => 24
        case 7 => 32
      }
      require(frameBits == bits,
        s"frame sample size $frameBits != STREAMINFO $bits")
      val nCh = if (chanAsgn < 8) chanAsgn + 1 else 2
      require(nCh == channels,
        s"frame channels $nCh != STREAMINFO $channels")
      require(chanAsgn <= 10, s"reserved channel assignment $chanAsgn")
      val headerCrc = crc8(b, frameStart, r.bytePos)
      require(r.readBits(8).toInt == headerCrc, "FLAC frame header CRC-8 mismatch")
      require(blockSize <= 65536 &&
        decoded + blockSize <= (if (total > 0) total else MaxTotalValues / channels),
        "FLAC frame overruns the declared stream length")
      if (!variableBlocking && total > 0)
        require(blockSize <= maxBlock, "frame blocksize exceeds STREAMINFO max")

      // subframes
      val chans = Array.tabulate(nCh) { ch =>
        val depth = bits + (chanAsgn match {
          case 8 => if (ch == 1) 1 else 0  // left/side
          case 9 => if (ch == 0) 1 else 0  // side/right
          case 10 => if (ch == 1) 1 else 0 // mid/side
          case _ => 0
        })
        decodeSubframe(r, blockSize, depth)
      }
      r.alignToByte()
      val frameCrc = crc16(b, frameStart, r.bytePos)
      require(r.readBits(16).toInt == frameCrc, "FLAC frame CRC-16 mismatch")

      // undo inter-channel decorrelation (spec §4.2)
      chanAsgn match {
        case 8 => // left/side: right = left - side
          var i = 0
          while (i < blockSize) {
            chans(1)(i) = chans(0)(i) - chans(1)(i); i += 1 }
        case 9 => // side/right: left = side + right
          var i = 0
          while (i < blockSize) {
            chans(0)(i) = chans(0)(i) + chans(1)(i); i += 1 }
        case 10 => // mid/side
          var i = 0
          while (i < blockSize) {
            val side = chans(1)(i)
            val mid = (chans(0)(i).toLong << 1) | (side.toLong & 1L)
            chans(0)(i) = ((mid + side) >> 1).toInt
            chans(1)(i) = ((mid - side) >> 1).toInt
            i += 1
          }
        case _ => ()
      }

      // interleave
      val base = (decoded * channels).toInt
      if (total == 0) {
        val need = base + blockSize * channels
        if (need > grown.length)
          grown = java.util.Arrays.copyOf(grown, math.max(need, grown.length * 2 + 64))
      }
      val dst = if (total > 0) out else grown
      var i = 0
      while (i < blockSize) {
        var c = 0
        while (c < channels) { dst(base + i * channels + c) = chans(c)(i); c += 1 }
        i += 1
      }
      decoded += blockSize
    }
    val samples =
      if (total > 0) out
      else java.util.Arrays.copyOf(grown, (decoded * channels).toInt)
    if (total > 0)
      require(decoded == total,
        s"decoded $decoded samples, STREAMINFO declared $total")

    // STREAMINFO MD5 over the little-endian byte-aligned sample stream
    // — the end-to-end losslessness proof (all-zero = unset, skipped)
    if (md5.exists(_ != 0) && bits % 8 == 0) {
      val got = md5Of(samples, bits)
      require(java.util.Arrays.equals(got, md5),
        "FLAC MD5 mismatch: decoded stream is not the encoded audio")
    }
    (Meta(sampleRate, channels, bits, decoded), samples)
  }

  private def decodeSubframe(r: BitReader, n: Int, depth: Int): Array[Int] = {
    require(r.readBit() == 0, "subframe padding bit set")
    val t = r.readBits(6).toInt
    val wasted =
      if (r.readBit() == 1) (r.readUnary() + 1).toInt else 0
    val d = depth - wasted
    require(d >= 1, s"wasted bits $wasted consume the whole depth $depth")
    // 33-bit side channels (32-bit stereo audio) would overflow the
    // Int sample lattice — an honest refusal, not a silent truncation
    require(d <= 32, s"subframe depth $d exceeds the 32-bit decode surface")
    val x = new Array[Int](n)
    t match {
      case 0 => // CONSTANT
        val v = r.readSigned(d)
        java.util.Arrays.fill(x, checkedInt(v, d))
      case 1 => // VERBATIM
        var i = 0
        while (i < n) { x(i) = checkedInt(r.readSigned(d), d); i += 1 }
      case f if f >= 8 && f <= 12 => // FIXED order f-8
        val order = f - 8
        decodePredicted(r, x, n, d, FixedCoefs(order), 0)
      case l if l >= 32 => // LPC order l-31
        val order = l - 31
        require(n > order, s"LPC order $order >= blocksize $n")
        var i = 0
        while (i < order) { x(i) = checkedInt(r.readSigned(d), d); i += 1 }
        val precision = r.readBits(4).toInt + 1
        require(precision <= 15, "invalid LPC precision code 15")
        val shift = r.readSigned(5).toInt
        require(shift >= 0, s"negative LPC shift $shift")
        val coefs = Array.fill(order)(r.readSigned(precision))
        decodeResidualInto(r, x, n, d, coefs, shift, warmupAlreadyRead = true)
      case other =>
        throw new IllegalArgumentException(s"reserved subframe type $other")
    }
    if (wasted > 0) {
      var i = 0
      while (i < n) { x(i) = x(i) << wasted; i += 1 }
    }
    x
  }

  private def decodePredicted(r: BitReader, x: Array[Int], n: Int, d: Int,
                              coefs: Array[Long], shift: Int): Unit = {
    val order = coefs.length
    require(n >= order, s"order $order > blocksize $n")
    var i = 0
    while (i < order) { x(i) = checkedInt(r.readSigned(d), d); i += 1 }
    decodeResidualInto(r, x, n, d, coefs, shift, warmupAlreadyRead = true)
  }

  private def decodeResidualInto(r: BitReader, x: Array[Int], n: Int, d: Int,
                                 coefs: Array[Long], shift: Int,
                                 warmupAlreadyRead: Boolean): Unit = {
    require(warmupAlreadyRead)
    val order = coefs.length
    val method = r.readBits(2).toInt
    require(method <= 1, s"reserved residual method $method")
    val pBits = if (method == 0) 4 else 5
    val escape = if (method == 0) 0xF else 0x1F
    val po = r.readBits(4).toInt
    val parts = 1 << po
    require(n % parts == 0, s"blocksize $n not divisible into 2^$po partitions")
    var idx = order
    var p = 0
    while (p < parts) {
      val cnt = n / parts - (if (p == 0) order else 0)
      require(cnt >= 0,
        s"partition order $po leaves partition 0 shorter than order $order")
      val param = r.readBits(pBits).toInt
      if (param == escape) {
        val width = r.readBits(5).toInt
        var i = 0
        while (i < cnt) {
          val res = if (width == 0) 0L else r.readSigned(width)
          predictStep(x, idx, res, coefs, shift, d); idx += 1; i += 1
        }
      } else {
        var i = 0
        while (i < cnt) {
          val q = r.readUnary()
          require(q < (1L << 30), "runaway Rice quotient")
          val u = (q << param) | r.readBits(param)
          predictStep(x, idx, unzigzag(u), coefs, shift, d); idx += 1; i += 1
        }
      }
      p += 1
    }
    require(idx == n, s"residual count $idx != blocksize $n")
  }

  private def predictStep(x: Array[Int], i: Int, res: Long,
                          coefs: Array[Long], shift: Int, d: Int): Unit = {
    var acc = 0L
    var k = 0
    while (k < coefs.length) { acc += coefs(k) * x(i - 1 - k); k += 1 }
    val v = res + (acc >> shift)
    x(i) = checkedInt(v, d)
  }

  private def checkedInt(v: Long, d: Int): Int = {
    require(v >= -(1L << (d - 1)) && v < (1L << (d - 1)),
      s"decoded sample $v outside $d-bit range")
    v.toInt
  }

  private def md5Of(interleaved: Array[Int], bits: Int): Array[Byte] = {
    val width = bits / 8
    val md = java.security.MessageDigest.getInstance("MD5")
    val bb = new Array[Byte](width)
    var i = 0
    while (i < interleaved.length) {
      val v = interleaved(i)
      var k = 0
      while (k < width) { bb(k) = ((v >> (8 * k)) & 0xFF).toByte; k += 1 }
      md.update(bb)
      i += 1
    }
    md.digest()
  }

  /** [[Multimodal.MediaDecoder]]-shaped decode: interleaved raw sample
    * values as floats (bit-exact for depths ≤ 24; the decodeWav
    * contract). */
  def decode(b: Array[Byte]): Array[Float] = {
    val (_, samples) = decodeWithMeta(b)
    val out = new Array[Float](samples.length)
    var i = 0
    while (i < samples.length) { out(i) = samples(i).toFloat; i += 1 }
    out
  }

  // ---------------------------------------------------------------
  // FIXTURE ENCODER
  // ---------------------------------------------------------------
  /** Per-subframe strategy. [[Auto]] picks constant when the block is
    * constant, else the best fixed order by the abs-sum heuristic
    * with verbatim as the cost floor — the real-encoder shape. The
    * Force* variants exist so specs/oracles can pin a branch. */
  sealed trait SubframeMode extends Serializable
  case object Auto extends SubframeMode
  case object ForceConstant extends SubframeMode
  case object ForceVerbatim extends SubframeMode
  final case class ForceFixed(order: Int) extends SubframeMode
  /** Quantized-LPC subframe with CALLER-CHOSEN coefficients: decode
    * must invert any (coefs, shift) exactly, optimal or not, so the
    * fixture skips Levinson–Durbin and proves the general contract. */
  final case class ForceLpc(coefs: Array[Int], shift: Int, precision: Int)
      extends SubframeMode

  def encode(sampleRate: Int, channels: Int, bits: Int,
             interleaved: Array[Int], blockSize: Int = 4096,
             stereo: String = "independent",
             mode: SubframeMode = Auto,
             partitionOrder: Int = 0,
             forceEscape: Boolean = false,
             useWastedBits: Boolean = true): Array[Byte] = {
    require(channels >= 1 && channels <= 8, s"channels $channels")
    require(Set(8, 16, 24, 32).contains(bits), s"fixture bits $bits")
    require(interleaved.length % channels == 0, "ragged interleave")
    require(blockSize >= 1 && blockSize <= 65535, s"blockSize $blockSize")
    require(stereo == "independent" || channels == 2,
      s"stereo mode $stereo needs 2 channels")
    require(stereo == "independent" || bits <= 24,
      "side channel would exceed 25 bits")
    val lim = 1L << (bits - 1)
    require(interleaved.forall(v => v >= -lim && v < lim),
      s"samples exceed $bits-bit range")
    val nSamples = interleaved.length / channels
    require(nSamples >= 1, "empty stream")

    val chanAsgn = stereo match {
      case "independent" => channels - 1
      case "left_side" => 8
      case "right_side" => 9
      case "mid_side" => 10
      case other => throw new IllegalArgumentException(s"stereo mode $other")
    }

    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var off = 0
    var frameNo = 0L
    while (off < nSamples) {
      val n = math.min(blockSize, nSamples - off)
      // de-interleave + decorrelate
      val chans: Array[(Array[Int], Int)] = chanAsgn match {
        case a if a < 8 =>
          Array.tabulate(channels)(c =>
            (Array.tabulate(n)(i => interleaved((off + i) * channels + c)),
             bits))
        case 8 =>
          val l = Array.tabulate(n)(i => interleaved((off + i) * 2))
          val s = Array.tabulate(n)(i =>
            interleaved((off + i) * 2) - interleaved((off + i) * 2 + 1))
          Array((l, bits), (s, bits + 1))
        case 9 =>
          val s = Array.tabulate(n)(i =>
            interleaved((off + i) * 2) - interleaved((off + i) * 2 + 1))
          val r = Array.tabulate(n)(i => interleaved((off + i) * 2 + 1))
          Array((s, bits + 1), (r, bits))
        case 10 =>
          val m = Array.tabulate(n)(i =>
            (interleaved((off + i) * 2) + interleaved((off + i) * 2 + 1)) >> 1)
          val s = Array.tabulate(n)(i =>
            interleaved((off + i) * 2) - interleaved((off + i) * 2 + 1))
          Array((m, bits), (s, bits + 1))
      }
      val w = new BitWriter
      // header: sync + fixed blocking
      w.writeBits(0x3FFE, 14); w.writeBit(0); w.writeBit(0)
      w.writeBits(0x7, 4) // blocksize: 16-bit (n-1) at header end
      w.writeBits(0x0, 4) // sample rate: from STREAMINFO
      w.writeBits(chanAsgn, 4)
      w.writeBits(bits match {
        case 8 => 1; case 16 => 4; case 24 => 6; case 32 => 7 }, 3)
      w.writeBit(0)
      writeUtf8(w, frameNo)
      w.writeBits(n - 1, 16)
      w.writeBits(w.crc8From(0), 8)
      chans.foreach { case (x, depth) =>
        encodeSubframe(w, x, depth, mode, partitionOrder, forceEscape,
          useWastedBits)
      }
      w.alignZero()
      w.writeBits(w.crc16From(0), 16)
      frames += w.bytes
      off += n
      frameNo += 1
    }

    // STREAMINFO + assembly
    val h = new BitWriter
    h.writeBits(0x664C6143L, 32) // "fLaC"
    h.writeBits(0x80, 8) // last-metadata-block + type 0
    h.writeBits(34, 24)
    h.writeBits(math.min(blockSize, nSamples), 16) // min block
    h.writeBits(math.min(blockSize, nSamples), 16) // max block
    val fmin = frames.map(_.length).min
    val fmax = frames.map(_.length).max
    h.writeBits(fmin, 24); h.writeBits(fmax, 24)
    h.writeBits(sampleRate, 20)
    h.writeBits(channels - 1, 3)
    h.writeBits(bits - 1, 5)
    h.writeBits(nSamples.toLong, 36)
    // MD5 from the RAW INPUT — independent of every encoding decision
    md5Of(interleaved, bits).foreach(x => h.writeBits(x & 0xFF, 8))
    val head = h.bytes
    val out = new java.io.ByteArrayOutputStream(
      head.length + frames.map(_.length).sum)
    out.write(head)
    frames.foreach(out.write)
    out.toByteArray
  }

  private def trailingZeros(v: Int): Int =
    java.lang.Integer.numberOfTrailingZeros(v)

  private def encodeSubframe(w: BitWriter, xIn: Array[Int], depth: Int,
                             mode: SubframeMode, po: Int,
                             forceEscape: Boolean,
                             useWastedBits: Boolean): Unit = {
    val n = xIn.length
    // wasted bits: shared trailing zeros (over nonzero samples)
    val wasted =
      if (!useWastedBits) 0
      else {
        val nz = xIn.filter(_ != 0)
        if (nz.isEmpty) 0
        else math.min(nz.map(trailingZeros).min, depth - 2)
      }
    val x = if (wasted == 0) xIn else xIn.map(_ >> wasted)
    val d = depth - wasted

    def writeHeader(t: Int): Unit = {
      w.writeBit(0)
      w.writeBits(t, 6)
      if (wasted == 0) w.writeBit(0)
      else { w.writeBit(1); w.writeUnary(wasted - 1) }
    }

    def fixedResiduals(order: Int): Array[Long] = {
      var cur = x.map(_.toLong)
      var k = 0
      while (k < order) {
        val next = new Array[Long](cur.length - 1)
        var i = 0
        while (i < next.length) { next(i) = cur(i + 1) - cur(i); i += 1 }
        cur = next; k += 1
      }
      cur
    }

    val constant = x.forall(_ == x(0))
    val chosen: SubframeMode = mode match {
      case Auto =>
        if (constant) ForceConstant
        else {
          val maxOrder = math.min(4, n - 1)
          val costs = (0 to maxOrder).map(k =>
            k -> fixedResiduals(k).map(r => math.abs(r)).sum)
          val best = costs.minBy(_._2)._1
          // verbatim floor: pathological blocks where differencing
          // inflates (rice estimate vs n·d raw bits)
          val res = fixedResiduals(best)
          val riceBits = res.map(r => estRiceBits(zigzag(r))).sum + best.toLong * d
          if (riceBits > n.toLong * d) ForceVerbatim else ForceFixed(best)
        }
      case m => m
    }

    chosen match {
      case ForceConstant =>
        require(constant, "ForceConstant on a non-constant block")
        writeHeader(0)
        w.writeBits(x(0).toLong & ((1L << d) - 1), d)
      case ForceVerbatim =>
        writeHeader(1)
        x.foreach(v => w.writeBits(v.toLong & ((1L << d) - 1), d))
      case ForceFixed(order) =>
        require(order >= 0 && order <= 4 && n > order,
          s"fixed order $order on $n samples")
        writeHeader(8 + order)
        var i = 0
        while (i < order) {
          w.writeBits(x(i).toLong & ((1L << d) - 1), d); i += 1 }
        writeResidual(w, fixedResiduals(order), n, order, po, forceEscape)
      case ForceLpc(coefs, shift, precision) =>
        val order = coefs.length
        require(order >= 1 && order <= 32 && n > order,
          s"LPC order $order on $n samples")
        require(precision >= 2 && precision <= 15, s"precision $precision")
        require(shift >= 0 && shift <= 15, s"shift $shift")
        val clim = 1L << (precision - 1)
        require(coefs.forall(c => c >= -clim && c < clim),
          s"coefficients exceed $precision bits")
        writeHeader(32 + (order - 1))
        var i = 0
        while (i < order) {
          w.writeBits(x(i).toLong & ((1L << d) - 1), d); i += 1 }
        w.writeBits(precision - 1, 4)
        w.writeBits(shift.toLong & 0x1F, 5)
        coefs.foreach(c =>
          w.writeBits(c.toLong & ((1L << precision) - 1), precision))
        val res = new Array[Long](n - order)
        i = order
        while (i < n) {
          var acc = 0L
          var k = 0
          while (k < order) { acc += coefs(k).toLong * x(i - 1 - k); k += 1 }
          res(i - order) = x(i).toLong - (acc >> shift)
          i += 1
        }
        writeResidual(w, res, n, order, po, forceEscape)
      case Auto => throw new IllegalStateException("unreachable")
    }
  }

  private def estRiceBits(u: Long): Long = {
    // best single-sample cost over params 0..14 — a selection
    // heuristic only (the real per-partition search runs at write)
    var best = Long.MaxValue
    var k = 0
    while (k <= 14) {
      val c = (u >>> k) + k + 1
      if (c < best) best = c
      k += 1
    }
    best
  }

  private def writeResidual(w: BitWriter, res: Array[Long], n: Int,
                            order: Int, poIn: Int,
                            forceEscape: Boolean): Unit = {
    // clamp the partition order to what the geometry allows
    var po = poIn
    while (po > 0 && (n % (1 << po) != 0 || n / (1 << po) <= order)) po -= 1
    val parts = 1 << po
    // per-partition plan: (param, escapeWidth) — param -1 = escape
    case class Plan(param: Int, width: Int)
    val plans = new Array[Plan](parts)
    var idx = 0
    var p = 0
    var anyBigParam = false
    while (p < parts) {
      val cnt = n / parts - (if (p == 0) order else 0)
      val slice = res.slice(idx, idx + cnt)
      val widths = slice.map(r =>
        if (r == 0) 1 else 65 - java.lang.Long.numberOfLeadingZeros(
          if (r >= 0) r else -(r + 1)))
      val escWidth = if (slice.isEmpty) 0 else widths.max.toInt
      require(escWidth <= 31, s"residual needs $escWidth bits")
      val escCost = 5L + slice.length.toLong * escWidth
      var bestK = -1; var bestCost = escCost
      var k = 0
      while (k <= 30) {
        var c = (k + 1).toLong * slice.length
        slice.foreach(r => c += zigzag(r) >>> k)
        if (c < bestCost) { bestCost = c; bestK = k }
        k += 1
      }
      val plan = if (forceEscape || bestK < 0) Plan(-1, escWidth)
                 else Plan(bestK, 0)
      if (plan.param > 14) anyBigParam = true
      plans(p) = plan
      idx += cnt
      p += 1
    }
    val method = if (anyBigParam) 1 else 0
    val pBits = if (method == 0) 4 else 5
    val escape = if (method == 0) 0xF else 0x1F
    w.writeBits(method, 2)
    w.writeBits(po, 4)
    idx = 0
    p = 0
    while (p < parts) {
      val cnt = n / parts - (if (p == 0) order else 0)
      val plan = plans(p)
      if (plan.param < 0) {
        w.writeBits(escape, pBits)
        w.writeBits(plan.width, 5)
        var i = 0
        while (i < cnt) {
          if (plan.width > 0)
            w.writeBits(res(idx) & ((1L << plan.width) - 1), plan.width)
          idx += 1; i += 1
        }
      } else {
        w.writeBits(plan.param, pBits)
        var i = 0
        while (i < cnt) {
          val u = zigzag(res(idx))
          w.writeUnary(u >>> plan.param)
          if (plan.param > 0) w.writeBits(u & ((1L << plan.param) - 1), plan.param)
          idx += 1; i += 1
        }
      }
      p += 1
    }
  }
}
