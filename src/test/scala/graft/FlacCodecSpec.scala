package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.FlacCodec
import graft.llm.FlacCodec._

/** FLAC codec ground truth. FLAC is LOSSLESS, so every round-trip
  * asserts exact sample equality — and the STREAMINFO MD5 (computed
  * by the encoder from the RAW input, recomputed by the decoder from
  * decoded samples) makes each round-trip an integrity proof neither
  * side can fake. There is no JDK FLAC codec to cross-check against
  * (unlike GIF/JPEG/WAV), so hand-worked bit patterns pin the Rice,
  * UTF-8 and CRC layers directly. */
class FlacCodecSpec extends AnyFunSuite {

  private def ramp(n: Int, a: Int, b: Int, m: Int): Array[Int] =
    Array.tabulate(n)(t => ((t * a + b) % m) - m / 2)

  private def rt(sr: Int, ch: Int, bits: Int, s: Array[Int],
                 blockSize: Int = 4096, stereo: String = "independent",
                 mode: SubframeMode = Auto, po: Int = 0,
                 esc: Boolean = false, wasted: Boolean = true): Unit = {
    val enc = FlacCodec.encode(sr, ch, bits, s, blockSize, stereo, mode,
      po, esc, wasted)
    val (meta, got) = FlacCodec.decodeWithMeta(enc)
    assert(meta.sampleRate == sr && meta.channels == ch && meta.bits == bits)
    assert(meta.totalSamples == s.length / ch)
    assert(got.toSeq == s.toSeq)
  }

  test("round-trip: auto mode across depths, block sizes, multi-frame streams") {
    for (bits <- Seq(8, 16, 24);
         (n, bsz) <- Seq((64, 4096), (130, 48), (200, 16), (1, 4096))) {
      val lim = 1 << (bits - 2)
      rt(8000, 1, bits, ramp(n, 37, 11, lim), blockSize = bsz)
    }
    // 32-bit independent (no decorrelation at that depth)
    rt(44100, 1, 32, ramp(50, 7919, 3, 1 << 20))
  }

  test("round-trip: every forced subframe type decodes back exactly") {
    val s = ramp(96, 29, 5, 4000)
    rt(8000, 1, 16, s, mode = ForceVerbatim)
    for (k <- 0 to 4) rt(8000, 1, 16, s, mode = ForceFixed(k))
    rt(8000, 1, 16, Array.fill(96)(-777), mode = ForceConstant)
    // LPC with arbitrary (non-optimal) quantized coefficients: decode
    // must invert ANY (coefs, shift), which is the whole contract
    rt(8000, 1, 16, s,
      mode = ForceLpc(Array(3, -2, 1), shift = 1, precision = 4))
    rt(16000, 1, 24, ramp(200, 400003, 0, 1 << 23),
      mode = ForceLpc(Array(120, -60, 31, -5, 1), shift = 6, precision = 9))
  }

  test("round-trip: stereo decorrelation modes, side channel one bit deeper") {
    val l = ramp(80, 29, 3, 3000)
    val r = ramp(80, 17, 19, 2500)
    val inter = Array.tabulate(160)(i => if (i % 2 == 0) l(i / 2) else r(i / 2))
    for (st <- Seq("independent", "left_side", "right_side", "mid_side"))
      rt(48000, 2, 16, inter, stereo = st)
    // extreme values where the side channel genuinely needs bits+1
    val ext = Array(32767, -32768, -32768, 32767, 32767, 32767, -32768, -32768)
    for (st <- Seq("left_side", "right_side", "mid_side"))
      rt(8000, 2, 16, ext, stereo = st)
  }

  test("round-trip: rice partitions, escape codes, wasted bits") {
    val s = ramp(128, 37, 11, 60000)
    for (po <- 0 to 3) rt(8000, 1, 16, s, po = po)
    rt(8000, 1, 16, s, po = 2, esc = true) // raw-binary escape partitions
    // wasted bits: all samples share 3 trailing zero bits
    val w = ramp(64, 13, 7, 256).map(_ * 8)
    rt(8000, 1, 16, w)
    rt(8000, 1, 16, w, wasted = false) // same stream, plain path
    // all-zero block (constant 0, no wasted-bit division by the nz set)
    rt(8000, 1, 16, new Array[Int](32))
  }

  test("multi-byte UTF-8 frame numbers: >128 frames decode in order") {
    // 150 frames of 16 samples: frame numbers cross the 1-byte/2-byte
    // UTF-8 boundary at frame 128
    val s = ramp(150 * 16, 97, 13, 5000)
    rt(8000, 1, 16, s, blockSize = 16)
  }

  test("hand-worked layers: zigzag, CRC tables, UTF-8 vectors") {
    // zigzag fold (spec §9.2.6): 0,-1,1,-2,2 -> 0,1,2,3,4 — proven
    // through a 1-frame stream whose only residuals are those values:
    // verbatim vs fixed-order-1 must agree after round-trip
    val vals = Array(0, 0, -1, 0, -2, 0)
    rt(8000, 1, 8, vals, mode = ForceFixed(1))
    // CRC-8 poly 0x07 known vector: "123456789" -> 0xF4
    val crcIn = "123456789".getBytes("US-ASCII")
    def crcOf(name: String): Int = {
      val m = FlacCodec.getClass.getDeclaredMethods
        .find(_.getName.endsWith(name)).get
      m.setAccessible(true)
      m.invoke(FlacCodec, crcIn, Integer.valueOf(0),
        Integer.valueOf(crcIn.length)).asInstanceOf[Int]
    }
    assert(crcOf("crc8") == 0xF4)
    // CRC-16/BUYPASS (poly 0x8005, init 0, no reflect): "123456789" -> 0xFEE8
    assert(crcOf("crc16") == 0xFEE8)
  }

  test("corruption fails LOUDLY: header CRC, frame CRC, MD5, sync") {
    val enc = FlacCodec.encode(8000, 1, 16, ramp(64, 37, 11, 4000))
    def flipAt(i: Int): Array[Byte] = {
      val c = enc.clone(); c(i) = (c(i) ^ 0x01).toByte; c
    }
    // find the first frame: metadata is 4 + 4 + 34 bytes (STREAMINFO only)
    val frame0 = 42
    assert((enc(frame0) & 0xFF) == 0xFF, "fixture layout drifted")
    // flip inside the frame header (blocksize byte) -> CRC-8 catches it
    val exHdr = intercept[IllegalArgumentException] {
      FlacCodec.decodeWithMeta(flipAt(frame0 + 5))
    }
    assert(exHdr.getMessage.contains("CRC") ||
      exHdr.getMessage.contains("sync") ||
      exHdr.getMessage.contains("UTF-8"), exHdr.getMessage)
    // flip a residual byte near the frame end -> CRC-16 catches it
    val exBody = intercept[IllegalArgumentException] {
      FlacCodec.decodeWithMeta(flipAt(enc.length - 4))
    }
    assert(exBody.getMessage.nonEmpty)
    // corrupt the stored MD5 itself: frames decode fine, MD5 check fires
    val badMd5 = enc.clone(); badMd5(30) = (badMd5(30) ^ 0xFF).toByte
    val exMd5 = intercept[IllegalArgumentException] {
      FlacCodec.decodeWithMeta(badMd5)
    }
    assert(exMd5.getMessage.contains("MD5"), exMd5.getMessage)
    // truncation refuses, never hangs or mis-decodes
    intercept[IllegalArgumentException] {
      FlacCodec.decodeWithMeta(enc.take(enc.length - 3))
    }
    intercept[IllegalArgumentException] {
      FlacCodec.decodeWithMeta(enc.take(20))
    }
  }

  test("refusals: crafted headers cannot demand huge allocations; bad params refuse") {
    // STREAMINFO declaring 2^36-1 samples: must refuse BEFORE allocating
    val enc = FlacCodec.encode(8000, 1, 16, Array(1, 2, 3))
    val huge = enc.clone()
    // total-samples field: bytes 21(low nibble)..25 of STREAMINFO
    huge(8 + 13) = (huge(8 + 13) | 0x0F).toByte
    for (i <- 14 to 17) huge(8 + i) = 0xFF.toByte
    val ex = intercept[IllegalArgumentException] {
      FlacCodec.decodeWithMeta(huge)
    }
    assert(ex.getMessage.contains("too large"), ex.getMessage)
    intercept[IllegalArgumentException] { // not FLAC at all
      FlacCodec.decodeWithMeta("RIFFxxxxWAVE".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] { // samples out of declared depth
      FlacCodec.encode(8000, 1, 8, Array(300))
    }
    intercept[IllegalArgumentException] { // stereo mode needs 2 channels
      FlacCodec.encode(8000, 1, 16, Array(1, 2), stereo = "mid_side")
    }
  }

  test("audio dispatch sniffs the container: FLAC and WAV through one decode call") {
    val samples = ramp(40, 29, 3, 3000)
    val flac = FlacCodec.encode(8000, 1, 16, samples)
    val wav = graft.llm.AudioFixtures.wavPcm16(8000, 1,
      samples.map(_.toShort))
    val viaFlac = graft.llm.Multimodal.BmpWavDecoder.decode(flac, "audio")
    val viaWav = graft.llm.Multimodal.BmpWavDecoder.decode(wav, "audio")
    assert(viaFlac.toSeq == viaWav.toSeq,
      "FLAC and WAV of the same samples must decode identically")
    assert(viaFlac.toSeq == samples.map(_.toFloat).toSeq)
  }

  test("AudioMeta header parse agrees with the full decode on every field") {
    val s = ramp(444, 41, 7, 60000)
    val enc = FlacCodec.encode(22050, 1, 16, s, blockSize = 256)
    val (meta, got) = FlacCodec.decodeWithMeta(enc)
    assert(meta == Meta(22050, 1, 16, 444))
    assert(got.length == 444)
  }
}
