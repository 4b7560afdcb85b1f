package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Dependency-free audio metadata from raw bytes — the audio sibling
  * of [[ImageMeta]]: container format, sample rate, channel count,
  * bit depth, and total frame count parsed straight out of the header
  * with no codec library. WAV (RIFF chunk walk to "fmt " and "data",
  * per the WAVE spec's little-endian layout) and FLAC (the 34-byte
  * STREAMINFO metadata block's packed bit fields, per the FLAC format
  * spec). Sample DECODE stays behind
  * [[graft.llm.Multimodal.MediaDecoder]] exactly as for images.
  *
  * Returned struct: (format, sample_rate, channels, bits_per_sample,
  * n_frames). format is "wav" / "flac" when the magic matches (the
  * numeric fields null if the header is truncated or the needed chunk
  * is missing) and "unknown" with nulls otherwise; null bytes → null
  * struct.
  *
  * Scale shape: identical to [[ImageMeta]] — a pure per-row
  * expression reading only header bytes, inside whole-stage codegen,
  * zero shuffle; the parser is a static JVM method invoked from the
  * generated code (not inlined — the Janino method-size lesson).
  */
case class AudioMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = AudioMeta.schema
  override def nullable: Boolean = true
  override def prettyName: String = "audio_meta"

  override def nullSafeEval(input: Any): Any =
    AudioMeta.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.AudioMeta.parse($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AudioMeta {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("bits_per_sample", IntegerType, nullable = true),
    StructField("n_frames", LongType, nullable = true)))

  private def row(fmt: String, rate: Any, ch: Any, bits: Any,
                  frames: Any): InternalRow =
    new GenericInternalRow(
      Array[Any](UTF8String.fromString(fmt), rate, ch, bits, frames))

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)

  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)

  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    i + s.length <= b.length && s.indices.forall(j => b(i + j) == s(j).toByte)

  /** Called from both the interpreted eval and the generated code. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null) return null
    // WAV: "RIFF" <size> "WAVE", then a chunk walk. "fmt " carries
    // (audioFormat, channels, sampleRate, byteRate, blockAlign,
    // bitsPerSample), all little-endian; "data"'s size / blockAlign
    // is the frame count.
    if (tag(b, 0, "RIFF") && tag(b, 8, "WAVE")) {
      var rate: Any = null; var ch: Any = null; var bits: Any = null
      var align = 0
      var dataSize = -1L
      var i = 12
      while (i + 8 <= b.length) {
        val size = le32(b, i + 4)
        if (tag(b, i, "fmt ") && i + 8 + 16 <= b.length) {
          ch = le16(b, i + 10)
          rate = le32(b, i + 12).toInt
          align = le16(b, i + 20)
          bits = le16(b, i + 22)
        } else if (tag(b, i, "data")) {
          dataSize = size
        }
        // chunks are word-aligned: odd sizes carry a pad byte
        i += 8 + size.toInt + (size.toInt & 1)
      }
      val frames: Any =
        if (dataSize >= 0 && align > 0) dataSize / align else null
      return row("wav", rate, ch, bits, frames)
    }
    // FLAC: "fLaC", then metadata blocks; STREAMINFO (type 0) is
    // mandatory and first: 4-byte block header, 10 bytes of block/frame
    // sizes, then 8 bytes packing sample rate (20 bits), channels-1
    // (3), bits-1 (5), and total samples (36).
    if (tag(b, 0, "fLaC")) {
      if (b.length >= 4 + 4 + 18 + 8 && (b(4) & 0x7F) == 0) {
        val o = 8 + 10 // skip block header + min/max block/frame sizes
        val rate20 = ((b(o) & 0xFF) << 12) | ((b(o + 1) & 0xFF) << 4) |
          ((b(o + 2) & 0xF0) >>> 4)
        val channels = ((b(o + 2) & 0x0E) >>> 1) + 1
        val bits = (((b(o + 2) & 0x01) << 4) | ((b(o + 3) & 0xF0) >>> 4)) + 1
        val frames = ((b(o + 3) & 0x0FL) << 32) | ((b(o + 4) & 0xFFL) << 24) |
          ((b(o + 5) & 0xFFL) << 16) | ((b(o + 6) & 0xFFL) << 8) |
          (b(o + 7) & 0xFFL)
        return row("flac", rate20, channels, bits, frames)
      }
      return row("flac", null, null, null, null)
    }
    // MP3: an optional ID3v2 tag (10-byte header, 28-bit syncsafe
    // size) followed by an MPEG audio frame header — 11 sync bits,
    // then version (V1/V2/V2.5 select the sample-rate table), layer,
    // bitrate/samplerate indices, and the channel mode (11 = mono).
    // Lossy frames have no bit depth and the frame count needs a full
    // scan, so both stay null — honest header-only metadata.
    {
      val hasId3 = tag(b, 0, "ID3")
      val off =
        if (hasId3 && b.length >= 10)
          10 + (((b(6) & 0x7F) << 21) | ((b(7) & 0x7F) << 14) |
            ((b(8) & 0x7F) << 7) | (b(9) & 0x7F))
        else 0
      val sync = off >= 0 && off + 4 <= b.length &&
        (b(off) & 0xFF) == 0xFF && (b(off + 1) & 0xE0) == 0xE0
      if (hasId3 || sync) {
        if (!sync) return row("mp3", null, null, null, null)
        val version = (b(off + 1) >> 3) & 3 // 3=V1, 2=V2, 0=V2.5
        val layer = (b(off + 1) >> 1) & 3   // 0 = reserved
        val srIdx = (b(off + 2) >> 2) & 3   // 3 = reserved
        val mode = (b(off + 3) >> 6) & 3
        if (version == 1 || layer == 0 || srIdx == 3)
          return row("mp3", null, null, null, null)
        val base =
          if (version == 3) Array(44100, 48000, 32000)
          else if (version == 2) Array(22050, 24000, 16000)
          else Array(11025, 12000, 8000)
        return row("mp3", base(srIdx), if (mode == 3) 1 else 2, null, null)
      }
    }
    row("unknown", null, null, null, null)
  }
}

object AudioMetaNative {
  val Name = "audio_meta"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      Name, exprs => AudioMeta(exprs(0)), "built-in")

  /** struct(format, sample_rate, channels, bits_per_sample, n_frames)
    * parsed from a binary column. */
  def audioMeta(spark: SparkSession, bytes: Column): Column = {
    register(spark)
    call_function(Name, bytes)
  }
}
