package graft

import graft.llm.EpubText

/** EPUB extraction: container → nested OPF → spine reading order
  * (reverse zip order must not matter; spine images and linear="no"
  * items skip), href resolution relative to the OPF directory with
  * `..` traversal guarded, and the loud refusals (DRM encryption,
  * non-zip, missing container/OPF/chapter). */
class EpubTextSpec extends SparkSpec {
  import spark.implicits._

  test("fixture round-trip: spine order from reverse zip order") {
    val epub = EpubText.fixture(Seq(
      Seq("first chapter text"),
      Seq("second chapter", "with two paragraphs"),
      Seq("third — café ☃")))
    val got = EpubText.chapters(epub)
    // each chapter: title word "ch" + whitespace-collapsed paragraphs
    assert(got == Seq(
      "ch first chapter text",
      "ch second chapter with two paragraphs",
      "ch third — café ☃"))
    assert(EpubText.extractText(epub) == got.mkString("\n\n"))
    // the spine cover image and the linear="no" notes item are gone
    assert(!EpubText.extractText(epub).contains("NON-LINEAR"))
  }

  test("DRM refuses loudly; font obfuscation alone does NOT") {
    // encryption.xml listing a SPINE CHAPTER → genuine DRM, refuse
    val drm = EpubText.fixture(Seq(Seq("chapter")), drm = true)
    val e = intercept[IllegalArgumentException] { EpubText.chapters(drm) }
    assert(e.getMessage.contains("DRM"))
    // encryption.xml listing only FONT resources (the IDPF/Adobe
    // obfuscation DRM-free InDesign books routinely carry) must NOT
    // refuse a fully readable book
    def withEncryption(encXml: String): Array[Byte] = {
      val base = EpubText.fixture(Seq(Seq("readable text")))
      val bos = new java.io.ByteArrayOutputStream()
      val zos = new java.util.zip.ZipOutputStream(bos)
      val zin = new java.util.zip.ZipInputStream(
        new java.io.ByteArrayInputStream(base))
      var entry = zin.getNextEntry
      while (entry != null) {
        zos.putNextEntry(new java.util.zip.ZipEntry(entry.getName))
        val buf = new Array[Byte](65536)
        var n = zin.read(buf)
        while (n >= 0) { zos.write(buf, 0, n); n = zin.read(buf) }
        zos.closeEntry()
        entry = zin.getNextEntry
      }
      zos.putNextEntry(new java.util.zip.ZipEntry("META-INF/encryption.xml"))
      zos.write(encXml.getBytes("UTF-8"))
      zos.closeEntry()
      zos.close()
      bos.toByteArray
    }
    val fontOnly = withEncryption(
      """<?xml version="1.0"?>""" +
      """<encryption xmlns="urn:oasis:names:tc:opendocument:xmlns:container" xmlns:enc="http://www.w3.org/2001/04/xmlenc#">""" +
      """<enc:EncryptedData><enc:CipherData>""" +
      """<enc:CipherReference URI="OEBPS/fonts/body.otf"/>""" +
      """</enc:CipherData></enc:EncryptedData></encryption>""")
    assert(EpubText.chapters(fontOnly) == Seq("ch readable text"))
    // an UNPARSEABLE encryption manifest refuses — the chapters
    // cannot be proven clean
    val broken = withEncryption("this is not xml")
    assert(intercept[IllegalArgumentException] {
      EpubText.chapters(broken)
    }.getMessage.contains("unparseable"))
  }

  test("refusals: non-zip, missing container, missing OPF, missing chapter") {
    intercept[IllegalArgumentException] {
      EpubText.chapters("not a zip".getBytes("UTF-8"))
    }
    assert(intercept[IllegalArgumentException] {
      EpubText.chapters(zipOf(Seq("mimetype" -> "application/epub+zip")))
    }.getMessage.contains("container"))
    assert(intercept[IllegalArgumentException] {
      EpubText.chapters(zipOf(Seq(
        "META-INF/container.xml" -> container("missing.opf"))))
    }.getMessage.contains("missing package document"))
    // OPF whose spine names a chapter that is not in the archive
    val opf = """<?xml version="1.0"?>
      |<package xmlns="http://www.idpf.org/2007/opf" version="3.0">
      |<manifest><item id="c1" href="gone.xhtml" media-type="application/xhtml+xml"/></manifest>
      |<spine><itemref idref="c1"/></spine></package>""".stripMargin
    assert(intercept[IllegalArgumentException] {
      EpubText.chapters(zipOf(Seq(
        "META-INF/container.xml" -> container("book.opf"),
        "book.opf" -> opf)))
    }.getMessage.contains("missing chapter"))
    // spine itemref with no manifest entry
    val dangling = opf.replace("idref=\"c1\"", "idref=\"nope\"")
    assert(intercept[IllegalArgumentException] {
      EpubText.chapters(zipOf(Seq(
        "META-INF/container.xml" -> container("book.opf"),
        "book.opf" -> dangling)))
    }.getMessage.contains("missing from the manifest"))
  }

  test("hrefs resolve relative to the OPF dir; traversal is guarded") {
    // OPF in a nested dir with an ../ href back toward the root
    val opf = """<?xml version="1.0"?>
      |<package xmlns="http://www.idpf.org/2007/opf" version="3.0">
      |<manifest><item id="c1" href="../shared/ch.xhtml" media-type="application/xhtml+xml"/></manifest>
      |<spine><itemref idref="c1"/></spine></package>""".stripMargin
    val epub = zipOf(Seq(
      "META-INF/container.xml" -> container("pkg/book.opf"),
      "pkg/book.opf" -> opf,
      "shared/ch.xhtml" ->
        "<html xmlns=\"http://www.w3.org/1999/xhtml\"><body><p>hello</p></body></html>"))
    assert(EpubText.chapters(epub) == Seq("hello"))
    // an href escaping the archive root refuses
    val escape = opf.replace("../shared", "../../etc")
    assert(intercept[IllegalArgumentException] {
      EpubText.chapters(zipOf(Seq(
        "META-INF/container.xml" -> container("pkg/book.opf"),
        "pkg/book.opf" -> escape)))
    }.getMessage.contains("escapes"))
  }

  test("OPF hrefs are URIs: percent escapes decode, fragments strip") {
    // a chapter filename WITH A SPACE, referenced percent-encoded
    // (the InDesign shape), plus a fragment-targeted href
    val opf = """<?xml version="1.0"?>
      |<package xmlns="http://www.idpf.org/2007/opf" version="3.0">
      |<manifest>
      |<item id="c1" href="ch%20one.xhtml" media-type="application/xhtml+xml"/>
      |<item id="c2" href="two.xhtml#sec1" media-type="application/xhtml+xml"/>
      |</manifest>
      |<spine><itemref idref="c1"/><itemref idref="c2"/></spine>
      |</package>""".stripMargin
    def ch(t: String) =
      s"""<html xmlns="http://www.w3.org/1999/xhtml"><body><p>$t</p></body></html>"""
    val epub = zipOf(Seq(
      "META-INF/container.xml" -> container("book.opf"),
      "book.opf" -> opf,
      "ch one.xhtml" -> ch("spaced"),
      "two.xhtml" -> ch("fragmented")))
    assert(EpubText.chapters(epub) == Seq("spaced", "fragmented"))
    // malformed escapes refuse loudly
    val bad = opf.replace("ch%20one.xhtml", "ch%2")
    assert(intercept[IllegalArgumentException] {
      EpubText.chapters(zipOf(Seq(
        "META-INF/container.xml" -> container("book.opf"),
        "book.opf" -> bad)))
    }.getMessage.contains("percent"))
  }

  test("extract(): narrow per-row frame") {
    val df = Seq(
      (1L, EpubText.fixture(Seq(Seq("a"), Seq("b")))),
      (2L, EpubText.fixture(Seq(Seq("only one"))))).toDF("id", "bytes")
    val got = EpubText.extract(df, "id", "bytes")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(got.toSeq == Seq((1L, 2, "ch a\n\nch b"), (2L, 1, "ch only one")))
  }

  private def container(opfPath: String): String =
    """<?xml version="1.0"?>""" +
      """<container version="1.0" xmlns="urn:oasis:names:tc:opendocument:xmlns:container">""" +
      s"""<rootfiles><rootfile full-path="$opfPath" media-type="application/oebps-package+xml"/>""" +
      """</rootfiles></container>"""

  private def zipOf(parts: Seq[(String, String)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    parts.foreach { case (n, c) =>
      zos.putNextEntry(new java.util.zip.ZipEntry(n))
      zos.write(c.getBytes("UTF-8"))
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }
}
