package graft

import org.apache.spark.sql.functions._
import graft.sources.Warc
import graft.llm.HtmlText

/** WARC record walk (plain + per-record-gzip-member) and the HTML
  * boilerplate extractor: skip semantics, HTTP envelope split,
  * binaryFile scan path, entity single-pass decode, link density. */
class WarcHtmlSpec extends SparkSpec {
  import spark.implicits._

  private val pages = Seq(
    ("http://example.com/a", "<html><body><p>Hello &amp; goodbye</p></body></html>"),
    ("http://example.com/b", "<html><body><div>Second page</div></body></html>"))

  test("parseFile: responses only, byte-exact bodies, both layouts") {
    for (gz <- Seq(false, true)) {
      val recs = Warc.parseFile("f", Warc.fixture(pages, gzipPerRecord = gz))
      assert(recs.size == 2, s"gz=$gz") // warcinfo + requests skipped
      assert(recs.map(_.targetUri) == pages.map(_._1))
      assert(recs.forall(_.httpStatus == 200))
      assert(recs.forall(_.contentType == "text/html; charset=utf-8"))
      assert(recs.map(_.body) == pages.map(_._2))
      // ordinals count ALL records: info=0, then (req, resp) pairs
      assert(recs.map(_.ordinal) == Seq(2, 4))
    }
  }

  test("records(): binaryFile scan over a directory of .warc.gz files") {
    val dir = tmpDir("warc")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part1.warc.gz"),
      Warc.fixture(pages.take(1), gzipPerRecord = true))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part2.warc"),
      Warc.fixture(pages.drop(1)))
    val df = Warc.records(spark, dir + "/*")
    val rows = df.select(col("targetUri"), col("body")).collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    assert(rows.toSeq == pages.sortBy(_._1))
  }

  test("malformed records refuse loudly; non-HTTP bodies pass through as status 0") {
    intercept[IllegalArgumentException] {
      Warc.parseFile("f", "WARC/1.0\r\nWARC-Type: response\r\n\r\n".getBytes("US-ASCII"))
    }
    val resource = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://x/\r\nContent-Length: 5\r\n\r\nhello\r\n\r\n")
      .getBytes("US-ASCII")
    val r = Warc.parseFile("f", resource)
    assert(r.size == 1 && r.head.httpStatus == 0 && r.head.body == "hello")
    // hostile Content-Length values refuse loudly, never overflow
    for (cl <- Seq("99999999999999999999", "-3", "12x")) {
      intercept[IllegalArgumentException] {
        Warc.parseFile("f", ("WARC/1.0\r\nWARC-Type: response\r\n" +
          s"Content-Length: $cl\r\n\r\nhello\r\n\r\n").getBytes("US-ASCII"))
      }
    }
  }

  test("gzip expansion cap fires on decompression bombs") {
    // 1 MiB of zeros compresses to ~1 KiB; a 1000-byte cap must trip
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(new Array[Byte](1 << 20)); gz.close()
    intercept[IllegalArgumentException] {
      Warc.gunzipAll(bos.toByteArray, maxBytes = 1000)
    }
    // and stays silent for honest payloads
    assert(Warc.gunzipAll(bos.toByteArray).length == (1 << 20))
  }

  test("extractText: dead subtrees, blocks, entities, single-pass decode") {
    val html = """<html><head><title>T</title><script>var a = "<p>";</script>
      |<style>p { color: red }</style></head>
      |<body><!-- nav --><p>A &lt;b&gt; &amp;lt; &#65;&#x42; C</p>
      |<div>next</div><br>line<noscript>off</noscript></body></html>"""
      .stripMargin
    assert(HtmlText.extractText(html) == "T A <b> &lt; AB C next line")
    assert(HtmlText.extractText(null) == null)
    assert(HtmlText.extractText("no tags at all") == "no tags at all")
    // unknown entity stays literal; unterminated & stays literal
    assert(HtmlText.extractText("<p>&bogus; A&B</p>") == "&bogus; A&B")
  }

  test("linkDensity: anchored fraction of extracted characters") {
    val html = "<body><p>twelve chars</p><a href='/x'>four</a></body>"
    // extracted = "twelve chars four" (17 chars), linked = "four" (4)
    assert(HtmlText.linkDensity(html) == BigDecimal(4.0 / 17)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(HtmlText.linkDensity("<p>no links</p>") == 0.0)
    assert(HtmlText.linkDensity("") == 0.0)
  }

  test("extract(): narrow dataframe path") {
    val df = Seq((1L, "<p>Hello &amp; bye</p><a>x</a>"),
                 (2L, "<div>plain</div>")).toDF("doc_id", "html")
    val got = HtmlText.extract(df, "doc_id", "html").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sortBy(_._1)
    assert(got(0) == ((1L, "Hello & bye x", 0.0769)))
    assert(got(1) == ((2L, "plain", 0.0)))
  }
}
