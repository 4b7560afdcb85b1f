package graft.llm

import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}

/** Charset detection + decode for crawled HTML bytes — the step the
  * UTF-8-with-replacement shortcut gets wrong on the long tail of
  * legacy pages (a mis-decoded page poisons dedup hashes and
  * tokenizer statistics silently).
  *
  * Resolution order (the WHATWG-encoding-standard shape):
  *   1. BOM (UTF-8 / UTF-16LE / UTF-16BE) — authoritative;
  *   2. `charset=` parameter of the HTTP Content-Type;
  *   3. `<meta charset=…>` / `<meta http-equiv … charset=…>` scanned
  *      in the first 1024 bytes (ASCII-compatible prescan);
  *   4. content sniff: STRICT UTF-8 validation — valid means UTF-8;
  *   5. fallback windows-1252 (every byte maps, the crawl
  *      convention for latin-ish legacy bytes).
  * A declared charset that fails strict decode falls through to the
  * sniff (crawled headers lie). Unknown charset NAMES fall through
  * too, rather than throwing — decode must be total.
  */
object Charsets {

  private val MetaCharset =
    "(?i)<meta[^>]*charset\\s*=\\s*[\"']?([A-Za-z0-9_.:-]+)".r

  /** (text, resolved charset name). */
  def decodeHtml(bytes: Array[Byte],
                 httpContentType: String = ""): (String, String) = {
    if (bytes == null || bytes.isEmpty) return ("", "utf-8")
    // 1. BOM
    if (bytes.length >= 3 && (bytes(0) & 0xFF) == 0xEF &&
        (bytes(1) & 0xFF) == 0xBB && (bytes(2) & 0xFF) == 0xBF)
      return (new String(bytes, 3, bytes.length - 3,
        StandardCharsets.UTF_8), "utf-8")
    if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFF &&
        (bytes(1) & 0xFF) == 0xFE)
      return (new String(bytes, 2, bytes.length - 2,
        StandardCharsets.UTF_16LE), "utf-16le")
    if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFE &&
        (bytes(1) & 0xFF) == 0xFF)
      return (new String(bytes, 2, bytes.length - 2,
        StandardCharsets.UTF_16BE), "utf-16be")
    // 2. HTTP header parameter
    declared(httpContentType).flatMap(tryStrict(bytes, _)).getOrElse {
      // 3. meta prescan over the first 1 KiB (ASCII-compatible)
      val head = new String(bytes, 0, math.min(bytes.length, 1024),
        StandardCharsets.ISO_8859_1)
      MetaCharset.findFirstMatchIn(head).map(_.group(1))
        .flatMap(tryStrict(bytes, _))
        .getOrElse {
          // 4./5. content sniff: strict UTF-8, else windows-1252
          tryStrict(bytes, "utf-8").getOrElse(
            (new String(bytes, Charset.forName("windows-1252")),
             "windows-1252"))
        }
    }
  }

  /** (id, charset, text) — narrow per-row resolution + decode over a
    * (id, bytes, contentType) frame. */
  def decodeFrame(df: org.apache.spark.sql.DataFrame, idCol: String,
                  bytesCol: String,
                  ctypeCol: String): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    df.select(col(idCol).cast("long"), col(bytesCol), col(ctypeCol))
      .as[(Long, Array[Byte], String)]
      .mapPartitions(_.map { case (id, bytes, ct) =>
        val (text, cs) = decodeHtml(bytes, ct)
        (id, cs, text)
      })
      .toDF("id", "charset", "text")
  }

  private def declared(contentType: String): Option[String] =
    Option(contentType).flatMap { ct =>
      "(?i)charset\\s*=\\s*[\"']?([A-Za-z0-9_.:-]+)".r
        .findFirstMatchIn(ct).map(_.group(1))
    }

  /** Strict decode under the named charset; None when the name is
    * unknown or any byte sequence is malformed/unmappable. */
  private def tryStrict(bytes: Array[Byte],
                        name: String): Option[(String, String)] =
    scala.util.Try {
      val cs = Charset.forName(name.trim)
      val dec = cs.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      val out = dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
      (out, cs.name().toLowerCase)
    }.toOption
}
