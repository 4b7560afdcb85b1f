package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Dependency-free image metadata from raw bytes: container format and
  * pixel dimensions parsed straight out of the header — PNG (IHDR
  * chunk), JPEG (SOFn segment walk), GIF (logical screen descriptor) —
  * with no codec library. This makes the multimodal binary column's
  * `width`/`height`/`format` REAL metadata (the pixel-decode step
  * stays behind [[graft.llm.Multimodal.MediaDecoder]], which this
  * container can't satisfy; header inspection needs no decoder).
  *
  * The returned struct is (format, width, height): format is "png" /
  * "jpeg" / "gif" when the magic bytes match (dimensions null if the
  * header is truncated or, for JPEG, no SOF frame is found), and
  * "unknown" with null dimensions otherwise. Null bytes → null struct.
  *
  * Scale shape: a pure per-row expression — at 100 TB the metadata
  * pass reads only header bytes of each value, stays inside
  * whole-stage codegen, and never shuffles. The branchy byte-walk
  * lives in a static JVM method invoked FROM the generated code
  * (inlining a ~100-line parser per call site would bloat Janino
  * method bodies toward the 64 KB limit — the q63 lesson — for zero
  * gain: the call target JITs identically).
  */
case class ImageMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ImageMeta.schema
  override def nullable: Boolean = true
  override def prettyName: String = "image_meta"

  override def nullSafeEval(input: Any): Any =
    ImageMeta.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.ImageMeta.parse($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ImageMeta {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))

  private def row(fmt: String, w: Any, h: Any): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(fmt), w, h))

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) |
      ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)

  /** SOF0-SOF15 carry frame dimensions, except the non-frame markers
    * that share the 0xCx range: DHT (C4), JPG (C8), DAC (CC). */
  private def isSof(m: Int): Boolean =
    m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC

  /** Called from both the interpreted eval and the generated code. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null) return null
    // PNG: 8-byte signature; the spec requires IHDR as the first chunk
    // (length 13 at offset 8, type at 12, width/height big-endian at
    // 16/20).
    if (b.length >= 8 && (b(0) & 0xFF) == 0x89 && b(1) == 'P' &&
        b(2) == 'N' && b(3) == 'G' && b(4) == 0x0D && b(5) == 0x0A &&
        b(6) == 0x1A && b(7) == 0x0A) {
      if (b.length >= 24 && b(12) == 'I' && b(13) == 'H' && b(14) == 'D' &&
          b(15) == 'R')
        return row("png", be32(b, 16), be32(b, 20))
      return row("png", null, null)
    }
    // GIF: "GIF87a"/"GIF89a", then the logical screen descriptor's
    // little-endian width/height at offsets 6/8.
    if (b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
      if (b.length >= 10) return row("gif", le16(b, 6), le16(b, 8))
      return row("gif", null, null)
    }
    // JPEG: SOI, then a marker-segment walk to the first SOFn frame
    // header (precision byte, then big-endian height and width).
    if (b.length >= 2 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8) {
      var i = 2
      while (i + 1 < b.length) {
        if ((b(i) & 0xFF) != 0xFF) return row("jpeg", null, null)
        var j = i
        while (j + 1 < b.length && (b(j + 1) & 0xFF) == 0xFF) j += 1 // fill bytes
        if (j + 1 >= b.length) return row("jpeg", null, null)
        val marker = b(j + 1) & 0xFF
        if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD9)) {
          i = j + 2 // standalone marker: TEM, RSTn, SOI, EOI — no length
        } else {
          if (j + 3 >= b.length) return row("jpeg", null, null)
          if (isSof(marker)) {
            if (j + 8 >= b.length) return row("jpeg", null, null)
            return row("jpeg", be16(b, j + 7), be16(b, j + 5))
          }
          i = j + 2 + be16(b, j + 2)
        }
      }
      return row("jpeg", null, null)
    }
    row("unknown", null, null)
  }
}

object ImageMetaNative {
  val Name = "image_meta"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      Name, exprs => ImageMeta(exprs(0)), "built-in")

  /** struct(format, width, height) parsed from a binary column. */
  def imageMeta(spark: SparkSession, bytes: Column): Column = {
    register(spark)
    call_function(Name, bytes)
  }
}
