package graft

import graft.sources.Warc

/** The streaming WARC record walker vs the round-12
  * inflate-whole-file-then-index implementation (kept verbatim below
  * as [[LegacyWarc]], test-only): byte-identical output on the q267
  * fixture shapes, plus the walker-only guarantees — lazy per-record
  * consumption, per-record Content-Length cap firing BEFORE
  * allocation, cumulative decompression-bomb cap, and the bounded
  * HTTP header scan (a header block crossing the record boundary is
  * non-HTTP, never a read into the next record). */
class WarcStreamingSpec extends SparkSpec {

  private def pagesOf(n: Int): Seq[(String, String)] =
    (0 until n).map { i =>
      (s"http://example.com/doc/$i",
       s"<html><head><title>doc $i</title></head>" +
         s"<body><p>body &amp; text $i</p></body></html>")
    }

  test("differential: streaming walker == legacy whole-file parse, both layouts") {
    for (gz <- Seq(false, true); n <- Seq(1, 7)) {
      val bytes = Warc.fixture(pagesOf(n), gzipPerRecord = gz)
      val got = Warc.parseFile("f", bytes)
      val legacy = LegacyWarc.parseFile("f", bytes)
      assert(got.size == legacy.size, s"gz=$gz n=$n")
      got.zip(legacy).foreach { case (g, l) =>
        assert((g.file, g.ordinal, g.targetUri, g.warcDate, g.httpStatus,
          g.contentType, g.body) == l, s"gz=$gz n=$n")
      }
    }
  }

  test("laziness: records stream one at a time, never the whole file") {
    // feed a stream that poisons after the first response record's
    // bytes: the iterator must still yield that record — proof the
    // walker consumed incrementally, not inflate-all-then-index
    val bytes = Warc.fixture(pagesOf(3))
    val firstRespEnd = {
      val legacy = LegacyWarc.parseFile("f", bytes)
      assert(legacy.size == 3)
      // locate the SECOND response record's header start in the raw
      // bytes; poison there
      val marker = "WARC-Record-ID: <urn:uuid:resp-00000001>"
      new String(bytes, "ISO-8859-1").indexOf(marker)
    }
    assert(firstRespEnd > 0)
    val poisoned = new java.io.InputStream {
      private var i = 0
      def read(): Int = {
        if (i >= firstRespEnd) throw new java.io.IOException("poison")
        val b = bytes(i) & 0xFF; i += 1; b
      }
      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        if (i >= firstRespEnd) throw new java.io.IOException("poison")
        val n = math.min(len, firstRespEnd - i)
        System.arraycopy(bytes, i, b, off, n); i += n; n
      }
    }
    val it = Warc.responses("f", poisoned)
    val first = it.next()
    assert(first.targetUri == "http://example.com/doc/0")
    intercept[java.io.IOException] { while (it.hasNext) it.next() }
  }

  test("per-record cap fires on a >Int.MaxValue declaration, before allocation") {
    val hostile = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: 4294967296\r\n\r\n").getBytes("US-ASCII")
    val ex = intercept[IllegalArgumentException] {
      Warc.parseFile("f", hostile)
    }
    assert(ex.getMessage.contains("per-record cap"))
  }

  test("cumulative gzip expansion cap fires on decompression bombs") {
    // a 1 MiB-of-zeros "record" compresses to ~1 KiB; a 1000-byte
    // cap must trip inside the walker, loudly
    val huge = new Array[Byte](1 << 20)
    val fake = ("WARC/1.0\r\nWARC-Type: metadata\r\n" +
      s"Content-Length: ${huge.length}\r\n\r\n").getBytes("US-ASCII") ++
      huge ++ "\r\n\r\n".getBytes("US-ASCII")
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(fake); gz.close()
    val ex = intercept[IllegalArgumentException] {
      Warc.responses("f",
        new java.io.ByteArrayInputStream(bos.toByteArray),
        maxBytes = 1000).toSeq
    }
    assert(ex.getMessage.contains("decompression bomb"))
    // honest payloads stay silent under the default cap
    assert(Warc.responses("f",
      new java.io.ByteArrayInputStream(bos.toByteArray)).toSeq.isEmpty)
  }

  test("HTTP header block crossing the record boundary degrades to non-HTTP") {
    // response body LOOKS like HTTP but never terminates its headers
    // within Content-Length; legacy unbounded scan would have read
    // headers out of the NEXT record
    val body = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" // no blank
    val rec = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://x/\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n$body\r\n\r\n" +
      "WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://y/\r\n" +
      "Content-Length: 5\r\n\r\nhello\r\n\r\n").getBytes("US-ASCII")
    val got = Warc.parseFile("f", rec)
    assert(got.size == 2)
    assert(got.head.httpStatus == 0 && got.head.body == body)
    assert(got(1).targetUri == "http://y/" && got(1).body == "hello")
  }

  test("payload digests: the archive's digests substitute for re-hashing") {
    // three pages, two distinct payloads across different uris:
    // grouping by the surfaced WARC-Payload-Digest must equal
    // grouping by our own md5 over the raw bytes — the intake can
    // skip hashing gigabytes of body per segment
    val p1 = "shared payload bytes".getBytes("UTF-8")
    val p2 = "unique payload bytes".getBytes("UTF-8")
    val bytes = Warc.fixtureRaw(Seq(
      Warc.RawPage("http://a/1", p1),
      Warc.RawPage("http://a/2", p2),
      Warc.RawPage("http://b/1", p1)), gzipPerRecord = true)
    val got = Warc.parseFile("f", bytes)
    assert(got.size == 3)
    val byDigest = got.groupBy(_.payloadDigest)
      .view.mapValues(_.map(_.targetUri).toSet).toMap
    val byOwnMd5 = got.groupBy(r => Warc.md5Digest(r.bodyBytes))
      .view.mapValues(_.map(_.targetUri).toSet).toMap
    assert(byDigest == byOwnMd5)
    assert(byDigest.size == 2)
    assert(byDigest(Warc.md5Digest(p1)) == Set("http://a/1", "http://b/1"))

    // a revisit record surfaces with the ORIGINAL's digest, no body
    val rv = Warc.parseFile("f", Warc.fixtureRaw(Seq(
      Warc.RawPage("http://a/3", p1, revisit = true))))
    assert(rv.size == 1)
    assert(rv.head.warcType == "revisit")
    assert(rv.head.payloadDigest == Warc.md5Digest(p1))
    assert(rv.head.bodyBytes.isEmpty)
  }

  test("binary content types keep raw payload bytes, no charset ladder") {
    val pdfish = Array[Byte]('%', 'P', 'D', 'F', '-', '1', '.', '4',
      0x0A, 0xE9.toByte, 0x93.toByte, 0x00)
    val bytes = Warc.fixtureRaw(Seq(
      Warc.RawPage("http://x/a.pdf", pdfish,
        contentType = "application/pdf"),
      Warc.RawPage("http://x/p.html",
        "<p>hi</p>".getBytes("UTF-8"), contentType = "text/html")),
      gzipPerRecord = true)
    val got = Warc.parseFile("f", bytes)
    assert(got.size == 2)
    val pdf = got.find(_.contentType == "application/pdf").get
    assert(pdf.body == null && pdf.bodyBytes.toSeq == pdfish.toSeq)
    val html = got.find(_.contentType == "text/html").get
    assert(html.bodyBytes == null && html.body == "<p>hi</p>")
  }
}

/** Round-12 `Warc` parse path, verbatim (whole-file gunzip + index
  * walk) — kept ONLY as the differential reference for
  * [[WarcStreamingSpec]]. Returns plain tuples to stay decoupled
  * from the production row type. */
private[graft] object LegacyWarc {
  import scala.collection.mutable.ArrayBuffer

  def parseFile(name: String, bytes: Array[Byte])
      : Seq[(String, Int, String, String, Int, String, String)] = {
    val raw = if (isGzip(bytes)) gunzipAll(bytes) else bytes
    val out = ArrayBuffer[(String, Int, String, String, Int, String, String)]()
    var pos = 0
    var ordinal = 0
    while (pos < raw.length) {
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
        out += ((name, ordinal, uri, date, status, ctype,
          graft.llm.Charsets.decodeHtml(payload, ctype)._1))
      }
      ordinal += 1
      pos = bodyStart + len
    }
    out.toSeq
  }

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

  private def gunzipAll(b: Array[Byte],
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
}
