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
  * chunk), JPEG (SOFn segment walk), GIF (logical screen descriptor),
  * WebP (RIFF chunk walk: VP8X canvas, VP8 lossy start-code fields,
  * VP8L lossless packed fields), AVIF (ISO-BMFF box walk to the first
  * meta → iprp → ipco → ispe property) — with no codec library. This
  * makes the multimodal binary column's `width`/`height`/`format`
  * REAL metadata (the pixel-decode step stays behind
  * [[graft.llm.Multimodal.MediaDecoder]]; WebP/AVIF pixels genuinely
  * need VP8/AV1 codecs, but header inspection does not).
  *
  * The returned struct is (format, width, height): format is "png" /
  * "jpeg" / "gif" / "webp" / "avif" when the magic bytes match
  * (dimensions null if the header is truncated or the size-carrying
  * chunk is absent), and "unknown" with null dimensions otherwise.
  * Null bytes → null struct.
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
    // WebP: RIFF container with a 'WEBP' form type; dimensions come
    // from whichever first chunk carries them — VP8X (extended: 24-bit
    // LE canvas minus-one fields), VP8 (lossy: 0x9D012A start code,
    // 14-bit LE fields), or VP8L (lossless: 0x2F signature, 14-bit
    // packed minus-one fields).
    if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == 'F' && b(8) == 'W' && b(9) == 'E' && b(10) == 'B' &&
        b(11) == 'P') {
      var i = 12
      while (i + 8 <= b.length) {
        val size = le32(b, i + 4)
        val p = i + 8
        if (size < 0 || p + size > b.length) return row("webp", null, null)
        if (b(i) == 'V' && b(i + 1) == 'P' && b(i + 2) == '8') {
          (b(i + 3): @annotation.switch) match {
            case 'X' => // extended header: canvas size at payload +4
              if (size >= 10)
                return row("webp",
                  (le16(b, p + 4) | ((b(p + 6) & 0xFF) << 16)) + 1,
                  (le16(b, p + 7) | ((b(p + 9) & 0xFF) << 16)) + 1)
              return row("webp", null, null)
            case ' ' => // lossy: frame tag (3), start code 9D 01 2A
              if (size >= 10 && (b(p + 3) & 0xFF) == 0x9D &&
                  (b(p + 4) & 0xFF) == 0x01 && (b(p + 5) & 0xFF) == 0x2A)
                return row("webp", le16(b, p + 6) & 0x3FFF,
                  le16(b, p + 8) & 0x3FFF)
              return row("webp", null, null)
            case 'L' => // lossless: 0x2F, then 2x 14-bit minus-one
              if (size >= 5 && (b(p) & 0xFF) == 0x2F) {
                val bits = le32(b, p + 1)
                return row("webp", (bits & 0x3FFF).toInt + 1,
                  ((bits >> 14) & 0x3FFF).toInt + 1)
              }
              return row("webp", null, null)
            case _ => // fall through to the next chunk
          }
        }
        i = p + size.toInt + (size.toInt & 1) // RIFF chunks pad to even
      }
      return row("webp", null, null)
    }
    // AVIF: ISO-BMFF with an 'avif'/'avis' ftyp brand; dimensions are
    // the first 'ispe' (image spatial extents) property inside
    // meta → iprp → ipco. meta is a FULL box (4-byte version/flags).
    if (b.length >= 12 && be32top(b, 4) == fourcc("ftyp") &&
        (be32top(b, 8) == fourcc("avif") || be32top(b, 8) == fourcc("avis"))) {
      var i = 0
      while (i + 8 <= b.length) {
        val sz = be32len(b, i)
        if (sz < 8 || i + sz > b.length) return row("avif", null, null)
        if (be32top(b, i + 4) == fourcc("meta")) {
          var j = i + 12 // header + version/flags (full box)
          val me = i + sz
          while (j + 8 <= me) {
            val s2 = be32len(b, j)
            if (s2 < 8 || j + s2 > me) return row("avif", null, null)
            if (be32top(b, j + 4) == fourcc("iprp")) {
              var k = j + 8
              val pe = j + s2
              while (k + 8 <= pe) {
                val s3 = be32len(b, k)
                if (s3 < 8 || k + s3 > pe) return row("avif", null, null)
                if (be32top(b, k + 4) == fourcc("ipco")) {
                  var m = k + 8
                  val ce = k + s3
                  while (m + 8 <= ce) {
                    val s4 = be32len(b, m)
                    if (s4 < 8 || m + s4 > ce) return row("avif", null, null)
                    if (be32top(b, m + 4) == fourcc("ispe") && s4 >= 20)
                      return row("avif", be32(b, m + 12), be32(b, m + 16))
                    m += s4
                  }
                }
                k += s3
              }
            }
            j += s2
          }
          return row("avif", null, null)
        }
        i += sz
      }
      return row("avif", null, null)
    }
    // ICO: reserved 0 + type 1/2 + entry count; dims are the BEST
    // directory entry (largest area, then deepest bit-count — the
    // selection IcoCodec.decode returns), width/height byte 0 = 256.
    if (graft.llm.IcoCodec.isIco(b)) {
      val n = le16(b, 4)
      var bw = 0; var bh = 0; var bbits = -1
      var i = 0
      while (i < n) {
        val e = 6 + 16 * i
        val w = if ((b(e) & 0xFF) == 0) 256 else b(e) & 0xFF
        val h = if ((b(e + 1) & 0xFF) == 0) 256 else b(e + 1) & 0xFF
        val bits = le16(b, e + 6)
        if (w.toLong * h > bw.toLong * bh ||
            (w.toLong * h == bw.toLong * bh && bits > bbits)) {
          bw = w; bh = h; bbits = bits
        }
        i += 1
      }
      return row("ico", bw, bh)
    }
    // PNM: P1-P6, then ASCII width/height tokens (comments skipped);
    // header-only — no raster walk.
    if (graft.llm.PnmCodec.isPnm(b)) {
      try {
        val (w, h) = graft.llm.PnmCodec.dims(b)
        return row("pnm", w, h)
      } catch {
        case _: IllegalArgumentException => return row("pnm", null, null)
      }
    }
    // TIFF: "II*\0" / "MM\0*", then ImageWidth (256) / ImageLength
    // (257) out of the first IFD — the codec's defensive walk, with
    // malformed files degrading to null dims rather than throwing.
    if (graft.llm.TiffCodec.isTiff(b)) {
      try {
        val (_, tags) = graft.llm.TiffCodec.parseIfd(b)
        (tags.get(256), tags.get(257)) match {
          case (Some(w), Some(h)) =>
            return row("tiff", w.vals.head.toInt, h.vals.head.toInt)
          case _ => return row("tiff", null, null)
        }
      } catch {
        case _: IllegalArgumentException => return row("tiff", null, null)
      }
    }
    // QOI: "qoif" magic, big-endian dims at 4/8.
    if (graft.llm.QoiCodec.isQoi(b))
      return row("qoi", be32(b, 4), be32(b, 8))
    // TGA last: the format has no magic, so the header-consistency
    // sniff only runs when nothing above matched.
    if (graft.llm.TgaCodec.isTga(b))
      return row("tga", le16(b, 12), le16(b, 14))
    row("unknown", null, null)
  }

  private def fourcc(s: String): Int =
    (s(0) << 24) | (s(1) << 16) | (s(2) << 8) | s(3)

  private def be32top(b: Array[Byte], i: Int): Int =
    if (i + 4 > b.length) 0
    else ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) |
      ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)

  /** Box length as Int; 0/1 (to-end / largesize) unsupported here —
    * header fixtures and real still-image AVIFs use plain sizes. */
  private def be32len(b: Array[Byte], i: Int): Int = be32top(b, i)

  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)
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
