package graft

import graft.sources.Warc

/** HTTP wire decoding inside the WARC walker (RFC 9112 §7.1 / RFC
  * 9110 §8.4.1): Common Crawl stores decoded payloads, but raw
  * Heritrix/wget archives keep the wire bytes — the walker must
  * de-chunk and inflate BEFORE the charset ladder, or a
  * `Content-Encoding: gzip` page surfaces as mojibake "text" (the
  * silent-wrong shape refuse-loudly forbids). Unknown codings (`br`
  * has no JDK decoder) refuse loudly instead of passing compressed
  * bytes through as text. */
class WarcWireDecodeSpec extends SparkSpec {

  private val text = "wire text — café ☃ " + ("abc " * 200) + "end"

  private def archive(pages: Seq[Warc.RawPage]): Seq[Warc.WarcResponse] =
    Warc.parseFile("w", Warc.fixtureRaw(pages, gzipPerRecord = true))

  private def page(ce: String = "", chunked: Boolean = false,
                   ct: String = "text/plain; charset=utf-8") =
    Warc.RawPage("http://e.com/p",
      text.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      contentType = ct, contentEncoding = ce, chunked = chunked)

  test("every wire encoding round-trips byte-exact to the identity body") {
    val identity = archive(Seq(page())).head.body
    assert(identity == text)
    for (ce <- Seq("gzip", "x-gzip", "deflate", "gzip, identity");
         ch <- Seq(false, true)) {
      val got = archive(Seq(page(ce, ch))).head.body
      assert(got == identity, s"ce=$ce chunked=$ch")
    }
    // chunked alone (extension + trailer in the fixture wire form)
    assert(archive(Seq(page(chunked = true))).head.body == identity)
  }

  test("binary payloads decode too — content types off the charset ladder") {
    val payload = Array.tabulate[Byte](4096)(i => (i * 131 % 251).toByte)
    val got = archive(Seq(Warc.RawPage("http://e.com/b", payload,
      contentType = "application/pdf", contentEncoding = "gzip",
      chunked = true))).head
    assert(got.body == null)
    assert(java.util.Arrays.equals(got.bodyBytes, payload))
  }

  test("raw (unwrapped) deflate falls back and still verifies") {
    // a long tail of servers send raw deflate under the 'deflate'
    // token; hand-build that wire shape
    val raw = {
      val d = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      d.setInput(text.getBytes("UTF-8")); d.finish()
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
      d.end(); bos.toByteArray
    }
    val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/plain; " +
      "charset=utf-8\r\nContent-Encoding: deflate\r\n" +
      s"Content-Length: ${raw.length}\r\n\r\n").getBytes("US-ASCII") ++ raw
    val rec = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://e.com/rd\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes("US-ASCII") ++
      http ++ "\r\n\r\n".getBytes("US-ASCII")
    assert(Warc.parseFile("w", rec).head.body == text)
  }

  test("br and unknown codings fail at RECORD grain — never mojibake, never archive abort") {
    for (enc <- Seq("br", "zstd", "compress")) {
      val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
        s"Content-Encoding: $enc\r\nContent-Length: 4\r\n\r\nXXXX")
        .getBytes("US-ASCII")
      val rec = ("WARC/1.0\r\nWARC-Type: response\r\n" +
        s"Content-Length: ${http.length}\r\n\r\n").getBytes("US-ASCII") ++
        http ++ "\r\n\r\n".getBytes("US-ASCII")
      val got = Warc.parseFile("w", rec).head
      // the failure is LOUD (message surfaces) but record-scoped:
      // body is never fabricated from undecoded bytes, raw payload
      // is retained, and the walk continues
      assert(got.decodeFailure.contains(enc), enc)
      assert(got.body == null, enc)
      assert(new String(got.bodyBytes, "US-ASCII") == "XXXX", enc)
    }
    // one undecodable record must NOT lose the rest of the archive —
    // Brotli responses are routine in raw wire archives
    val pages = Seq(
      page(), // clean
      Warc.RawPage("http://e.com/clean2",
        "after the bad one".getBytes("UTF-8"),
        contentType = "text/plain; charset=utf-8"))
    val bytes = Warc.fixtureRaw(pages, gzipPerRecord = true)
    // splice a br record between them by re-parsing + rebuilding:
    // simpler — archive with the br record FIRST via raw bytes
    val brHttp = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      "Content-Encoding: br\r\nContent-Length: 2\r\n\r\nZZ")
      .getBytes("US-ASCII")
    val brRec = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://e.com/br\r\n" +
      s"Content-Length: ${brHttp.length}\r\n\r\n").getBytes("US-ASCII") ++
      brHttp ++ "\r\n\r\n".getBytes("US-ASCII")
    val mixed = brRec ++ Warc.fixtureRaw(pages, gzipPerRecord = false)
    val all = Warc.parseFile("w", mixed)
    assert(all.size == 3)
    assert(all.head.decodeFailure.contains("br"))
    assert(all(1).decodeFailure.isEmpty && all(1).body == text)
    assert(all(2).body == "after the bad one")
    assert(bytes.nonEmpty) // (gz variant exercised in the first test)
  }

  test("zlib FDICT deflate fails loudly instead of spinning forever") {
    // 0x78 0x20: CMF=0x78, FLG=0x20 (FDICT set, checksum valid:
    // (120*256+32) % 31 == 0) — Inflater.inflate() returns 0 with
    // needsDictionary(), which once busy-spun the decode loop
    val body = Array[Byte](0x78, 0x20, 1, 2, 3, 4, 5, 6, 7, 8)
    val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n" +
      s"Content-Encoding: deflate\r\nContent-Length: ${body.length}\r\n\r\n")
      .getBytes("US-ASCII") ++ body
    val rec = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes("US-ASCII") ++
      http ++ "\r\n\r\n".getBytes("US-ASCII")
    val got = Warc.parseFile("w", rec).head // must terminate
    assert(got.decodeFailure.toLowerCase.contains("deflate"))
  }

  test("revisit records (empty body) pass through despite encoding headers") {
    // a revisit carries the original's headers and NO payload; the
    // decoder must not try to gunzip zero bytes
    val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      "Content-Encoding: gzip\r\nContent-Length: 0\r\n\r\n")
      .getBytes("US-ASCII")
    val rec = ("WARC/1.0\r\nWARC-Type: revisit\r\n" +
      "WARC-Payload-Digest: md5:00\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes("US-ASCII") ++
      http ++ "\r\n\r\n".getBytes("US-ASCII")
    val got = Warc.parseFile("w", rec).head
    assert(got.warcType == "revisit" && got.body == "")
  }

  test("malformed chunked bodies fail per record; leading zeros are legal") {
    def recOf(body: String): Array[Byte] = {
      val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n" +
        "Transfer-Encoding: chunked\r\n\r\n" + body).getBytes("US-ASCII")
      ("WARC/1.0\r\nWARC-Type: response\r\n" +
        s"Content-Length: ${http.length}\r\n\r\n").getBytes("US-ASCII") ++
        http ++ "\r\n\r\n".getBytes("US-ASCII")
    }
    // good shape parses (sanity)
    assert(Warc.parseFile("w",
      recOf("4\r\nwxyz\r\n0\r\n\r\n")).head.body == "wxyz")
    // RFC 9112 chunk-size is 1*HEXDIG: fixed-width leading zeros are
    // legal — bound the VALUE, not the token length
    assert(Warc.parseFile("w",
      recOf("0000000004\r\nwxyz\r\n000\r\n\r\n")).head.body == "wxyz")
    for (bad <- Seq(
        "Z\r\nwxyz\r\n0\r\n\r\n", // non-hex size
        "5\r\nwxyz\r\n0\r\n\r\n", // truncated mid-chunk
        "4\r\nwxyzXX0\r\n\r\n", // chunk not CRLF-terminated
        "00FFFFFFFFF\r\nx\r\n0\r\n\r\n", // genuinely oversized value
        "4\r\nwxyz\r\n")) { // no zero chunk / truncated
      val got = Warc.parseFile("w", recOf(bad)).head
      assert(got.decodeFailure.nonEmpty && got.body == null, bad)
    }
    // chunked listed before another coding is malformed per RFC 9112
    val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n" +
      "Transfer-Encoding: chunked, gzip\r\n\r\nXX").getBytes("US-ASCII")
    val rec = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes("US-ASCII") ++
      http ++ "\r\n\r\n".getBytes("US-ASCII")
    assert(Warc.parseFile("w", rec).head.decodeFailure.nonEmpty)
  }

  test("corrupt gzip body fails loudly per record, not silently-empty") {
    val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n" +
      "Content-Encoding: gzip\r\nContent-Length: 6\r\n\r\nnotgz!")
      .getBytes("US-ASCII")
    val rec = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes("US-ASCII") ++
      http ++ "\r\n\r\n".getBytes("US-ASCII")
    val got = Warc.parseFile("w", rec).head
    assert(got.decodeFailure.toLowerCase.contains("gzip"))
    assert(got.body == null &&
      new String(got.bodyBytes, "US-ASCII") == "notgz!")
  }
}
