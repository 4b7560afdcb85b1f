package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Warc
import graft.sources.Warc.Page
import graft.streaming.StreamingWarcIntake

/** Streaming crawl intake: new WARC segment files are discovered by
  * the checkpointed file source, parsed, extracted, quality-gated,
  * and exact-deduped against all accepted history; restarts skip
  * committed files, and a fresh checkpoint over the same directory
  * converges to zero new accepts. */
class StreamingWarcIntakeSpec extends SparkSpec {

  private def html(body: String) = s"<html><body><p>$body</p></body></html>"

  private def write(dir: String, name: String, bytes: Array[Byte]): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, name), bytes)

  test("incremental files, quality gate, history dedup, restart + replay") {
    val dir = tmpDir("warc-in")
    val store = tmpDir("warc-store")
    val accepted = collection.mutable.ArrayBuffer[(String, String)]()
    def accept(df: DataFrame): Unit =
      accepted ++= df.select(col("uri"), col("text")).collect()
        .map(r => (r.getString(0), r.getString(1)))
    def runOnce(ckpt: String): Unit =
      graft.streaming.StreamingWarcIntake.run(spark, dir + "/*", store,
        ckpt)(accept).awaitTermination(120000)

    // segment 1: two clean pages
    write(dir, "part1.warc.gz", Warc.fixture(Seq(
      ("http://x/a", html("alpha content here")),
      ("http://x/b", html("beta content here"))), gzipPerRecord = true))
    val ckpt = tmpDir("warc-ckpt")
    runOnce(ckpt)
    assert(accepted.map(_._1).sorted.toSeq ==
      Seq("http://x/a", "http://x/b"))
    assert(accepted.toMap.apply("http://x/a") == "alpha content here")

    // segment 2: a duplicate of /a under a NEW uri (history dedup),
    // one novel page, one 404, one non-html, one link-chrome page
    // (density > 0.9), plus an in-batch duplicate pair (min uri wins)
    accepted.clear()
    write(dir, "part2.warc", Warc.fixtureOf(Seq(
      Page("http://y/a-copy", html("alpha content here")),
      Page("http://y/c", html("gamma content here")),
      Page("http://y/missing", html("gone"), status = 404),
      Page("http://y/data.json", "{\"k\":1}",
        contentType = "application/json"),
      Page("http://y/nav", "<a href='/'>home home home home</a> x"),
      Page("http://y/d2", html("delta content here")),
      Page("http://y/d1", html("delta content here")))))
    runOnce(ckpt)
    assert(accepted.map(_._1).sorted.toSeq ==
      Seq("http://y/c", "http://y/d1"), s"got $accepted")

    // restart on the SAME checkpoint with no new files: nothing runs
    accepted.clear()
    runOnce(ckpt)
    assert(accepted.isEmpty)

    // fresh checkpoint over the same directory: every file re-parses,
    // every hash hits the store -> zero accepts, store unchanged
    val before = spark.read.parquet(store).count()
    runOnce(tmpDir("warc-ckpt2"))
    assert(accepted.isEmpty, s"replay re-accepted $accepted")
    assert(spark.read.parquet(store).count() == before)
    assert(before == 4) // a, b, c, d1

    // segment 3: the PDF branch — one clean PDF (raw bytes through
    // PdfText, never the charset ladder), one HOSTILE truncated PDF
    // that must DROP (per-document failure domain, the stream
    // survives), one more html page in the same archive
    accepted.clear()
    val pdf = graft.llm.PdfText.fixture(Seq(Seq("epsilon pdf content")))
    write(dir, "part3.warc.gz", Warc.fixtureRaw(Seq(
      Warc.RawPage("http://z/report.pdf", pdf,
        contentType = "application/pdf"),
      Warc.RawPage("http://z/broken.pdf",
        java.util.Arrays.copyOf(pdf, pdf.length / 2),
        contentType = "application/pdf"),
      Warc.RawPage("http://z/e", html("zeta content here")
        .getBytes("UTF-8"), contentType = "text/html; charset=utf-8")),
      gzipPerRecord = true))
    runOnce(ckpt)
    assert(accepted.map(_._1).sorted.toSeq ==
      Seq("http://z/e", "http://z/report.pdf"), s"got $accepted")
    assert(accepted.toMap.apply("http://z/report.pdf") ==
      "epsilon pdf content")

    // segment 4: the DOCX branch — one clean package (raw bytes
    // through DocxText), one HOSTILE OLE-magic payload that must
    // DROP (encrypted/legacy .doc shape — the refusal stays inside
    // the per-document Try)
    accepted.clear()
    val DocxType = "application/vnd.openxmlformats-officedocument" +
      ".wordprocessingml.document"
    write(dir, "part4.warc.gz", Warc.fixtureRaw(Seq(
      Warc.RawPage("http://z/memo.docx",
        graft.llm.DocxText.fixture(Seq("eta docx paragraph", "and two")),
        contentType = DocxType),
      Warc.RawPage("http://z/locked.docx",
        Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1, 0, 0)
          .map(_.toByte),
        contentType = DocxType)),
      gzipPerRecord = true))
    runOnce(ckpt)
    assert(accepted.map(_._1).sorted.toSeq ==
      Seq("http://z/memo.docx"), s"got $accepted")
    assert(accepted.toMap.apply("http://z/memo.docx") ==
      "eta docx paragraph\nand two")
  }

  test("revisit records never become phantom documents, even at minChars=0") {
    import spark.implicits._
    val payload = html("theta content here").getBytes("UTF-8")
    val archive = Warc.fixtureRaw(Seq(
      Warc.RawPage("http://w/live", payload,
        contentType = "text/html; charset=utf-8"),
      // unchanged page: digest-only revisit, EMPTY body — without the
      // warcType guard this row would pass a minChars=0 gate as a
      // phantom empty document and poison the store with md5("")
      Warc.RawPage("http://w/unchanged", payload,
        contentType = "text/html; charset=utf-8", revisit = true)),
      gzipPerRecord = true)
    val files = Seq(("mem.warc.gz", archive)).toDF("path", "content")
    val got = StreamingWarcIntake.extractBatch(files, minChars = 0,
        maxChars = 1000000, maxLinkDensity = 1.0)
      .select("uri").as[String].collect().toSeq
    assert(got == Seq("http://w/live"), s"got $got")
  }

  test("undecodable wire bodies drop explicitly, never as mojibake text") {
    import spark.implicits._
    val archive = Warc.fixtureRaw(Seq(
      Warc.RawPage("http://w/ok", html("clean page text here")
          .getBytes("UTF-8"),
        contentType = "text/html; charset=utf-8"),
      // a br-declared response: the walker surfaces it with
      // decodeFailure set and NO text — the intake's explicit guard
      // drops it (without the guard, compressed bytes would reach
      // the extractor as garbage "html")
      Warc.RawPage("http://w/br", html("unreachable text")
          .getBytes("UTF-8"),
        contentType = "text/html; charset=utf-8",
        contentEncoding = "br")), gzipPerRecord = true)
    val files = Seq(("mem2.warc.gz", archive)).toDF("path", "content")
    val got = StreamingWarcIntake.extractBatch(files, minChars = 0,
        maxChars = 1000000, maxLinkDensity = 1.0)
      .select("uri").as[String].collect().toSeq
    assert(got == Seq("http://w/ok"), s"got $got")
  }
}
