package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer

/** WARC (ISO 28500) reader — the container web crawls (Common Crawl)
  * actually ship. A WARC file is a sequence of records, each
  * `WARC/1.x\r\n` + name:value headers + `\r\n` + a Content-Length-
  * delimited payload + `\r\n\r\n`; crawl archives gzip each record as
  * its own member and concatenate, which `GZIPInputStream` walks
  * natively.
  *
  * `records` is the Spark path: a binaryFile scan over the .warc[.gz]
  * glob, one task per file (the Common Crawl layout — thousands of
  * ~1 GB segment files — parallelizes at file grain; records never
  * shuffle), flatMapping each file into response rows with the HTTP
  * envelope split off: (file, record_offset ordinal, target_uri,
  * warc_date, http_status, content_type, body). Non-response records
  * (warcinfo, request, metadata) are filtered at parse time so the
  * scan emits only what a text pipeline consumes.
  *
  * Bodies decode charset-aware ([[graft.llm.Charsets.decodeHtml]]:
  * BOM > HTTP charset param > meta prescan > strict-UTF-8 sniff >
  * windows-1252 fallback), so legacy pages don't silently mangle.
  */
object Warc {

  case class WarcResponse(file: String, ordinal: Int, targetUri: String,
                          warcDate: String, httpStatus: Int,
                          contentType: String, body: String)

  /** All records of one (possibly multi-member-gzipped) WARC file. */
  def parseFile(name: String, bytes: Array[Byte]): Seq[WarcResponse] = {
    val raw = if (isGzip(bytes)) gunzipAll(bytes) else bytes
    val out = ArrayBuffer[WarcResponse]()
    var pos = 0
    var ordinal = 0
    while (pos < raw.length) {
      // tolerate stray CRLF padding between records
      while (pos < raw.length && (raw(pos) == '\r' || raw(pos) == '\n'))
        pos += 1
      if (pos >= raw.length) return out.toSeq
      val (headers, bodyStart) = readHeaders(raw, pos, "WARC record")
      require(headers.getOrElse("__version", "").startsWith("WARC/1"),
        s"$name: record at $pos lacks a WARC/1.x version line")
      val lenStr = headers.getOrElse("content-length",
        throw new IllegalArgumentException(
          s"$name: record at $pos lacks Content-Length")).trim
      require(lenStr.nonEmpty && lenStr.length <= 18 &&
        lenStr.forall(_.isDigit),
        s"$name: record at $pos has malformed Content-Length '$lenStr'")
      val lenL = lenStr.toLong
      require(lenL <= Int.MaxValue && bodyStart + lenL <= raw.length,
        s"$name: record at $pos truncated (len=$lenL)")
      val len = lenL.toInt
      val wtype = headers.getOrElse("warc-type", "")
      if (wtype == "response") {
        val uri = headers.getOrElse("warc-target-uri", "")
        val date = headers.getOrElse("warc-date", "")
        val (status, ctype, payload) = splitHttp(raw, bodyStart, len)
        // charset-aware decode (BOM > header param > meta prescan >
        // strict-UTF-8 sniff > windows-1252) — see graft.llm.Charsets
        out += WarcResponse(name, ordinal, uri, date, status, ctype,
          graft.llm.Charsets.decodeHtml(payload, ctype)._1)
      }
      ordinal += 1
      pos = bodyStart + len
    }
    out.toSeq
  }

  /** header block at `pos`: first line is kept under `__version`,
    * the rest lowercase-keyed; returns (headers, body offset). */
  private def readHeaders(b: Array[Byte], pos: Int,
                          what: String): (Map[String, String], Int) = {
    var i = pos
    var first = true
    val m = Map.newBuilder[String, String]
    while (true) {
      val eol = lineEnd(b, i)
      require(eol >= 0, s"unterminated $what header")
      val line = new String(b, i, eol - i, "US-ASCII")
      if (line.isEmpty) return (m.result(), eol + 2)
      if (first) { m += "__version" -> line; first = false }
      else {
        val c = line.indexOf(':')
        if (c > 0)
          m += line.substring(0, c).toLowerCase.trim ->
            line.substring(c + 1).trim
      }
      i = eol + 2
    }
    throw new IllegalStateException("unreachable")
  }

  private def lineEnd(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  /** Split an HTTP response message into (status, content-type,
    * payload). A record whose body is not HTTP (e.g. resource
    * records) comes back as status 0 with the raw body. */
  private def splitHttp(b: Array[Byte], start: Int,
                        len: Int): (Int, String, Array[Byte]) = {
    val end = start + len
    if (len < 12 || !(b(start) == 'H' && b(start + 1) == 'T' &&
        b(start + 2) == 'T' && b(start + 3) == 'P'))
      return (0, "", java.util.Arrays.copyOfRange(b, start, end))
    val (headers, bodyStart) = readHeaders(b, start, "HTTP response")
    val status = headers("__version").split(' ') match {
      case parts if parts.length >= 2 && parts(1).forall(_.isDigit) =>
        parts(1).toInt
      case _ => 0
    }
    (status, headers.getOrElse("content-type", ""),
      java.util.Arrays.copyOfRange(b, math.min(bodyStart, end), end))
  }

  private def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xFF) == 0x1F && (b(1) & 0xFF) == 0x8B

  /** Inflate ALL members of a concatenated gzip stream, with a hard
    * expansion cap — crawl archives are untrusted, and an unbounded
    * inflate is a decompression-bomb OOM primitive inside a task.
    * 2 GiB-per-file is ~2000x a typical segment's record; real WARCs
    * never approach it, bombs hit it immediately and fail loudly. */
  private[graft] def gunzipAll(b: Array[Byte],
                                 maxBytes: Long = 2L << 30): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(b))
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](65536)
    var total = 0L
    var n = in.read(buf)
    while (n >= 0) {
      total += n
      require(total <= maxBytes,
        s"gzip expansion exceeds $maxBytes bytes (decompression bomb?)")
      out.write(buf, 0, n)
      n = in.read(buf)
    }
    out.toByteArray
  }

  /** The distributed scan: binaryFile over the glob, one flatMap task
    * per file. Filters (status, content-type) are cheap post-parse
    * selections — at crawl scale, push a path-level partition filter
    * into the glob instead. */
  def records(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) => parseFile(path, bytes) }
      .toDF()
  }

  // ---------------------------------------------------------------- fixture

  /** One fixture page; non-200 statuses and non-html content types
    * exercise downstream intake filters. */
  case class Page(uri: String, html: String, status: Int = 200,
                  contentType: String = "text/html; charset=utf-8")

  /** Fixture writer: a warcinfo record, then per page a request
    * record (which the reader must skip) and a response record
    * wrapping an HTTP 200 message. `gzipPerRecord` concatenates one
    * gzip member per record — the Common Crawl layout. */
  def fixture(pages: Seq[(String, String)],
              gzipPerRecord: Boolean = false): Array[Byte] =
    fixtureOf(pages.map { case (u, h) => Page(u, h) }, gzipPerRecord)

  def fixtureOf(pages: Seq[Page],
                gzipPerRecord: Boolean = false): Array[Byte] = {
    def record(headers: Seq[(String, String)], body: Array[Byte]): Array[Byte] = {
      val h = new StringBuilder("WARC/1.0\r\n")
      headers.foreach { case (k, v) => h.append(s"$k: $v\r\n") }
      h.append(s"Content-Length: ${body.length}\r\n\r\n")
      h.toString.getBytes("US-ASCII") ++ body ++ "\r\n\r\n".getBytes("US-ASCII")
    }
    val info = record(Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Date" -> "2026-01-01T00:00:00Z",
      "WARC-Record-ID" -> "<urn:uuid:00000000-0000-0000-0000-000000000000>"),
      "software: graft-fixture\r\n".getBytes("US-ASCII"))
    val recs = ArrayBuffer[Array[Byte]](info)
    pages.zipWithIndex.foreach { case (pg, i) =>
      recs += record(Seq(
        "WARC-Type" -> "request",
        "WARC-Target-URI" -> pg.uri,
        "WARC-Date" -> "2026-01-01T00:00:00Z",
        "WARC-Record-ID" -> f"<urn:uuid:req-$i%08d>"),
        s"GET ${pg.uri} HTTP/1.1\r\nHost: example.com\r\n\r\n"
          .getBytes("US-ASCII"))
      val payload = pg.html.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val reason = if (pg.status == 200) "OK" else "NOK"
      val http = (s"HTTP/1.1 ${pg.status} $reason\r\n" +
        s"Content-Type: ${pg.contentType}\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n").getBytes("US-ASCII") ++
        payload
      recs += record(Seq(
        "WARC-Type" -> "response",
        "WARC-Target-URI" -> pg.uri,
        "WARC-Date" -> "2026-01-01T00:00:00Z",
        "WARC-Record-ID" -> f"<urn:uuid:resp-$i%08d>"),
        http)
    }
    if (!gzipPerRecord) recs.flatten.toArray
    else recs.toArray.flatMap { r =>
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(r); gz.close()
      bos.toByteArray
    }
  }
}
