package graft

import graft.llm.DocxText

/** DOCX text extraction: fixture round-trips (split runs rejoin,
  * preserved whitespace, unicode), the paragraph/run contract over
  * hand-built document.xml (tables, tabs vs tab STOPS, breaks,
  * tracked changes, hyperlinks), and the loud refusals (OLE/legacy
  * .doc, non-zip, zip without the document part, DOCTYPE). */
class DocxTextSpec extends SparkSpec {
  import spark.implicits._

  test("fixture round-trip: split runs rejoin, whitespace, unicode") {
    val paras = Seq("first paragraph", "  leading and trailing  ",
      "汉字 — café ☃", "", "last")
    val docx = DocxText.fixture(paras)
    assert(DocxText.isZip(docx) && !DocxText.isOle(docx))
    assert(DocxText.paragraphs(docx) == paras)
    assert(DocxText.extractText(docx) == paras.mkString("\n"))
  }

  // hand-built package around an arbitrary document.xml body
  private def docxOf(bodyXml: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    def part(name: String, content: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    part("[Content_Types].xml", "<Types/>")
    part("word/document.xml",
      """<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"><w:body>""" +
        bodyXml + "</w:body></w:document>")
    zos.close()
    bos.toByteArray
  }

  test("run contract: tabs, breaks, table cells, tracked changes, fields") {
    val body =
      // w:tab INSIDE a run is a tab char; w:tabs in pPr is a STOP
      // definition and must NOT emit
      "<w:p><w:pPr><w:tabs><w:tab/><w:tab/></w:tabs></w:pPr>" +
        "<w:r><w:t>a</w:t><w:tab/><w:t>b</w:t><w:br/><w:t>c</w:t></w:r></w:p>" +
        // tracked change: inserted text kept, deleted text dropped
        "<w:p><w:ins><w:r><w:t>kept</w:t></w:r></w:ins>" +
        "<w:del><w:r><w:delText>gone</w:delText></w:r></w:del></w:p>" +
        // hyperlink wraps runs; field instruction text is plumbing
        "<w:p><w:hyperlink><w:r><w:t>linked</w:t></w:r></w:hyperlink>" +
        "<w:r><w:instrText>HYPERLINK \"x\"</w:instrText></w:r></w:p>" +
        // paragraphs inside a table, document order
        "<w:tbl><w:tr><w:tc><w:p><w:r><w:t>cell one</w:t></w:r></w:p>" +
        "</w:tc><w:tc><w:p><w:r><w:t>cell two</w:t></w:r></w:p></w:tc>" +
        "</w:tr></w:tbl>" +
        "<w:p><w:r><w:t>after table</w:t></w:r></w:p>"
    assert(DocxText.paragraphs(docxOf(body)) == Seq(
      "a\tb\nc", "kept", "linked", "cell one", "cell two", "after table"))
  }

  test("refusals: OLE, non-zip, missing part, DOCTYPE") {
    val ole = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1,
      0, 0).map(_.toByte)
    val e1 = intercept[IllegalArgumentException] {
      DocxText.extractText(ole)
    }
    assert(e1.getMessage.contains("OLE"))
    intercept[IllegalArgumentException] {
      DocxText.extractText("plain text".getBytes("US-ASCII"))
    }
    val noPart = {
      val bos = new java.io.ByteArrayOutputStream()
      val zos = new java.util.zip.ZipOutputStream(bos)
      zos.putNextEntry(new java.util.zip.ZipEntry("other.xml"))
      zos.write("<x/>".getBytes("UTF-8"))
      zos.closeEntry(); zos.close()
      bos.toByteArray
    }
    val e2 = intercept[IllegalArgumentException] {
      DocxText.extractText(noPart)
    }
    assert(e2.getMessage.contains("word/document.xml"))
    // hostile DOCTYPE (billion laughs shape) refuses at the parser
    val bomb = {
      val bos = new java.io.ByteArrayOutputStream()
      val zos = new java.util.zip.ZipOutputStream(bos)
      zos.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
      zos.write(("<?xml version=\"1.0\"?><!DOCTYPE x [<!ENTITY a \"b\">]>" +
        "<w:document xmlns:w=\"n\"><w:body/></w:document>").getBytes("UTF-8"))
      zos.closeEntry(); zos.close()
      bos.toByteArray
    }
    intercept[Exception] { DocxText.extractText(bomb) }
  }

  test("footnotes/endnotes: real notes only, separators excluded") {
    // fixture path: footnotes part with the separator pseudo-notes
    val docx = DocxText.fixture(Seq("body para"),
      footnotes = Seq("first note", "second — café"))
    assert(DocxText.paragraphs(docx) == Seq("body para"))
    assert(DocxText.notes(docx) == Seq("first note", "second — café"))
    // no parts at all: no notes, never an error
    assert(DocxText.notes(DocxText.fixture(Seq("only body"))).isEmpty)

    // hand-built: an endnotes part too, multi-paragraph notes, and
    // the w:type-carrying pseudo-notes dropped from BOTH parts
    val w = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    def part(name: String, content: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    part("word/document.xml",
      s"""<w:document xmlns:w="$w"><w:body><w:p><w:r><w:t>b</w:t></w:r></w:p></w:body></w:document>""")
    part("word/footnotes.xml",
      s"""<w:footnotes xmlns:w="$w">""" +
        """<w:footnote w:type="separator" w:id="-1"><w:p><w:r><w:t>SEP</w:t></w:r></w:p></w:footnote>""" +
        """<w:footnote w:id="1"><w:p><w:r><w:t>fn line one</w:t></w:r></w:p>""" +
        """<w:p><w:r><w:t>fn line two</w:t></w:r></w:p></w:footnote>""" +
        "</w:footnotes>")
    part("word/endnotes.xml",
      s"""<w:endnotes xmlns:w="$w">""" +
        """<w:endnote w:type="continuationSeparator" w:id="0"><w:p/></w:endnote>""" +
        """<w:endnote w:id="1"><w:p><w:r><w:t>en text</w:t></w:r></w:p></w:endnote>""" +
        "</w:endnotes>")
    zos.close()
    val got = DocxText.notes(bos.toByteArray)
    assert(got == Seq("fn line one\nfn line two", "en text"))

    // ST_FtnEdn: "normal" is the schema default — Word omits it, but
    // an explicit w:type="normal" is a REAL note, not a separator
    val bos2 = new java.io.ByteArrayOutputStream()
    val zos2 = new java.util.zip.ZipOutputStream(bos2)
    zos2.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
    zos2.write(
      s"""<w:document xmlns:w="$w"><w:body/></w:document>""".getBytes("UTF-8"))
    zos2.closeEntry()
    zos2.putNextEntry(new java.util.zip.ZipEntry("word/footnotes.xml"))
    zos2.write((s"""<w:footnotes xmlns:w="$w">""" +
      """<w:footnote w:type="normal" w:id="1"><w:p><w:r><w:t>explicit""" +
      """</w:t></w:r></w:p></w:footnote></w:footnotes>""").getBytes("UTF-8"))
    zos2.closeEntry(); zos2.close()
    assert(DocxText.notes(bos2.toByteArray) == Seq("explicit"))
  }

  test("hostile nesting refuses as IAE, never StackOverflowError") {
    // 200k nested elements: an unbounded recursion would SOE — fatal,
    // escaping the streaming intake's per-document Try
    val deep = new StringBuilder
    (0 until 200000).foreach(_ => deep ++= "<w:sdt>")
    deep ++= "<w:p><w:r><w:t>x</w:t></w:r></w:p>"
    (0 until 200000).foreach(_ => deep ++= "</w:sdt>")
    val ex = intercept[IllegalArgumentException] {
      DocxText.paragraphs(docxOf(deep.toString))
    }
    assert(ex.getMessage.contains("nesting"))
    // same guard inside one paragraph's run tree
    val deepRun = new StringBuilder("<w:p>")
    (0 until 200000).foreach(_ => deepRun ++= "<w:smartTag>")
    deepRun ++= "<w:r><w:t>x</w:t></w:r>"
    (0 until 200000).foreach(_ => deepRun ++= "</w:smartTag>")
    deepRun ++= "</w:p>"
    intercept[IllegalArgumentException] {
      DocxText.paragraphs(docxOf(deepRun.toString))
    }
  }

  test("fixture never splits a surrogate pair across runs") {
    // U+1D11E at the midpoint of a length-3 paragraph: a naive
    // length/2 split would cut the pair into two lone surrogates and
    // UTF-8-encode them as '?'
    val astral = "𝄞x"
    assert(DocxText.paragraphs(DocxText.fixture(Seq(astral)))
      == Seq(astral))
    val astral2 = "ab😀cd" // pair straddling length/2 = 3
    assert(DocxText.paragraphs(DocxText.fixture(Seq(astral2)))
      == Seq(astral2))
  }

  test("extract(): narrow dataframe path") {
    val rows = Seq(
      (1L, DocxText.fixture(Seq("doc one", "line two"))),
      (2L, DocxText.fixture(Seq("p1", "p2", "p3"))))
      .toDF("doc_id", "docx")
    val got = DocxText.extract(rows, "doc_id", "docx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sortBy(_._1)
    assert(got(0) == ((1L, 2, "doc one\nline two")))
    assert(got(1) == ((2L, 3, "p1\np2\np3")))
  }
}
