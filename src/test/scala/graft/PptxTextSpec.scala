package graft

import graft.llm.{DocxText, PptxText}

/** PPTX slide-deck extraction: fixture round-trips (split a:r runs
  * rejoin, a:br inside a paragraph, unicode), part-NUMBER slide
  * ordering against reverse zip order at 12 slides (where
  * lexicographic order diverges), notes slides, and the loud
  * refusals (OLE/legacy .ppt, non-zip, zip without the presentation
  * part, hostile nesting depth). */
class PptxTextSpec extends SparkSpec {
  import spark.implicits._

  test("fixture round-trip: split runs rejoin, whitespace, unicode") {
    val deck = Seq(
      Seq("title line", "  leading and trailing  ", "汉字 — café ☃"),
      Seq("second slide", ""))
    val pptx = PptxText.fixture(deck)
    assert(DocxText.isZip(pptx) && !DocxText.isOle(pptx))
    assert(PptxText.slides(pptx) == deck.map(_.mkString("\n")))
    assert(PptxText.extractText(pptx) ==
      deck.map(_.mkString("\n")).mkString("\n\n"))
  }

  test("slides order by part number, not zip or lexicographic order") {
    // 12 slides: lexicographic would read slide10,11,12 before
    // slide2; the fixture ALSO writes them reverse — both wrong
    // orders break this assert
    val deck = (1 to 12).map(i => Seq(s"slide $i"))
    assert(PptxText.slides(PptxText.fixture(deck)) ==
      (1 to 12).map(i => s"slide $i"))
  }

  test("notes slides surface separately, in part-number order") {
    val pptx = PptxText.fixture(
      Seq(Seq("s1"), Seq("s2")),
      notesParas = Seq(Seq("note one"), Seq("note two", "more")))
    assert(PptxText.notes(pptx) == Seq("note one", "note two\nmore"))
    // decks without notes parts yield nothing
    assert(PptxText.notes(PptxText.fixture(Seq(Seq("s1")))).isEmpty)
  }

  test("a:br yields a newline INSIDE the paragraph's line") {
    val xml =
      """<?xml version="1.0"?><p:sld
        | xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main"
        | xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main">
        |<p:cSld><p:spTree><p:sp><p:txBody>
        |<a:p><a:r><a:t>one</a:t></a:r><a:br/><a:r><a:t>two</a:t></a:r></a:p>
        |</p:txBody></p:sp></p:spTree></p:cSld></p:sld>""".stripMargin
    val pptx = pptxOf(Seq("ppt/slides/slide1.xml" -> xml))
    assert(PptxText.slides(pptx) == Seq("one\ntwo"))
  }

  test("table cells (a:tbl graphicFrame) contribute their paragraphs") {
    // DrawingML tables nest txBody under tr/tc inside a
    // graphicFrame — the generic walk must surface each cell's a:p
    // as a line in document order
    val xml =
      """<?xml version="1.0"?><p:sld
        | xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main"
        | xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main">
        |<p:cSld><p:spTree>
        |<p:sp><p:txBody><a:p><a:r><a:t>before table</a:t></a:r></a:p></p:txBody></p:sp>
        |<p:graphicFrame><a:graphic><a:graphicData><a:tbl>
        |<a:tr><a:tc><a:txBody><a:p><a:r><a:t>cell A</a:t></a:r></a:p></a:txBody></a:tc>
        |<a:tc><a:txBody><a:p><a:r><a:t>cell B</a:t></a:r></a:p></a:txBody></a:tc></a:tr>
        |</a:tbl></a:graphicData></a:graphic></p:graphicFrame>
        |</p:spTree></p:cSld></p:sld>""".stripMargin
    val pptx = pptxOf(Seq("ppt/slides/slide1.xml" -> xml))
    assert(PptxText.slides(pptx) == Seq("before table\ncell A\ncell B"))
  }

  test("refusals: OLE, non-zip, no presentation part, hostile nesting") {
    val ole = Array[Byte](0xD0.toByte, 0xCF.toByte, 0x11, 0xE0.toByte,
      0xA1.toByte, 0xB1.toByte, 0x1A, 0xE1.toByte) ++ Array.fill[Byte](24)(0)
    assert(intercept[IllegalArgumentException] {
      PptxText.slides(ole)
    }.getMessage.contains("OLE"))
    intercept[IllegalArgumentException] {
      PptxText.slides("plain text".getBytes("UTF-8"))
    }
    // a zip that is not a pptx (no ppt/presentation.xml)
    val notPptx = pptxOf(Seq("word/document.xml" -> "<w:document/>"),
      presentation = false)
    assert(intercept[IllegalArgumentException] {
      PptxText.slides(notPptx)
    }.getMessage.contains("presentation"))
    // hostile nesting dies as IAE (depth cap), never StackOverflow
    val nested = new StringBuilder(
      """<?xml version="1.0"?><p:sld
        | xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main"
        | xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main">""".stripMargin)
    (1 to 200).foreach(_ => nested ++= "<p:grpSp>")
    (1 to 200).foreach(_ => nested ++= "</p:grpSp>")
    nested ++= "</p:sld>"
    assert(intercept[IllegalArgumentException] {
      PptxText.slides(pptxOf(Seq("ppt/slides/slide1.xml" -> nested.toString)))
    }.getMessage.contains("deep"))
  }

  test("extract(): narrow per-row frame") {
    val df = Seq(
      (1L, PptxText.fixture(Seq(Seq("a", "b"), Seq("c")))),
      (2L, PptxText.fixture(Seq(Seq("only"))))).toDF("id", "bytes")
    val got = PptxText.extract(df, "id", "bytes")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(got.toSeq == Seq((1L, 2, "a\nb\n\nc"), (2L, 1, "only")))
  }

  /** Hand-built package: named parts + the standard skeleton. */
  private def pptxOf(parts: Seq[(String, String)],
                     presentation: Boolean = true): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    def part(name: String, content: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    if (presentation)
      part("ppt/presentation.xml",
        """<?xml version="1.0"?><p:presentation xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main"/>""")
    parts.foreach { case (n, c) => part(n, c) }
    zos.close()
    bos.toByteArray
  }
}
