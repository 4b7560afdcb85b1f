package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EPUB text extraction — books are prime LLM training data, and an
  * EPUB (EPUB 3 / OCF) is a ZIP of XHTML chapters behind two levels
  * of indirection this walks honestly:
  *
  *   1. `META-INF/container.xml` names the package document
  *      (`<rootfile full-path=… media-type="application/
  *      oebps-package+xml"/>`),
  *   2. the OPF package maps manifest ids to hrefs and the `<spine>`
  *      lists the READING ORDER as `<itemref idref=…>` entries,
  *   3. each spine item's XHTML resolves relative to the OPF's own
  *      directory and extracts through the existing [[HtmlText]]
  *      boilerplate-stripping pipeline.
  *
  * Non-XHTML spine items (images in the spine are legal) skip;
  * `linear="no"` auxiliary items skip too — they are not the book's
  * reading flow. REFUSES loudly: DRM (a SPINE CHAPTER listed in
  * `META-INF/encryption.xml` — mis-decoding encrypted chapters
  * would be silent garbage; font-obfuscation-only entries, which
  * DRM-free InDesign books routinely carry, pass), an unparseable
  * encryption manifest, non-zip payloads, OLE containers, packages
  * missing container.xml / the OPF / a spine chapter, hostile entry
  * counts, and cumulative inflation past the bomb cap. XML parsing
  * is XXE-hardened like [[graft.sources.Sitemap]].
  *
  * Scale shape: [[extract]] is a narrow per-row map (bytes in, text
  * out) — the crawl-intake shape shared by [[PdfText]]/[[DocxText]]/
  * [[PptxText]]; one zip pass collects all parts.
  */
object EpubText {

  private val MaxTotalBytes = 512L << 20 // cumulative inflation cap
  private val MaxEntries = 10000 // hostile part-count bound

  /** One string per spine chapter, spine order. */
  def chapters(epub: Array[Byte]): Seq[String] = {
    val parts = readParts(epub)
    val container = parts.getOrElse("META-INF/container.xml",
      throw new IllegalArgumentException(
        "not an EPUB (no META-INF/container.xml)"))
    val opfPath = rootfilePath(container)
    val opf = parts.getOrElse(opfPath,
      throw new IllegalArgumentException(
        s"EPUB container names missing package document '$opfPath'"))
    val opfDir = {
      val c = opfPath.lastIndexOf('/')
      if (c >= 0) opfPath.substring(0, c + 1) else ""
    }
    val chapterPaths =
      spineHrefs(opf).map(h => normalize(opfDir + decodeHref(h)))
    // META-INF/encryption.xml also ships in DRM-FREE books for IDPF/
    // Adobe FONT obfuscation — presence alone must not refuse a
    // fully readable EPUB. Refuse only when a SPINE CHAPTER is among
    // the encrypted resources (that text genuinely cannot be
    // extracted), or when the manifest is unparseable (can't prove
    // the chapters are clean).
    parts.get("META-INF/encryption.xml").foreach { enc =>
      val encrypted = encryptedUris(enc).map(u => normalize(u)).toSet
      val hit = chapterPaths.find(encrypted.contains)
      require(hit.isEmpty,
        s"DRM-protected EPUB: spine chapter '${hit.get}' is encrypted " +
          "(refusing, not mis-decoding)")
    }
    chapterPaths.map { path =>
      val bytes = parts.getOrElse(path,
        throw new IllegalArgumentException(
          s"EPUB spine names missing chapter '$path'"))
      // chapters declare their encoding in the XML decl; EPUB 3
      // mandates UTF-8 and EPUB 2 overwhelmingly ships it
      HtmlText.extractText(
        new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
    }
  }

  /** CipherReference URIs (package-root-relative) out of
    * META-INF/encryption.xml; an unparseable manifest refuses —
    * without it the chapters cannot be proven unencrypted. */
  private def encryptedUris(enc: Array[Byte]): Seq[String] = {
    val doc =
      try graft.util.SecureXml.builder().parse(new java.io.ByteArrayInputStream(enc))
      catch {
        case e: Exception => throw new IllegalArgumentException(
          s"EPUB encryption.xml unparseable: ${e.getMessage}")
      }
    val refs = doc.getElementsByTagNameNS("*", "CipherReference")
    (0 until refs.getLength).map(refs.item(_)).collect {
      case e: org.w3c.dom.Element if e.getAttribute("URI").nonEmpty =>
        e.getAttribute("URI")
    }
  }

  /** All chapters joined with a blank line, spine order. */
  def extractText(epub: Array[Byte]): String =
    chapters(epub).mkString("\n\n")

  /** (id, n_chapters, text) — narrow per-row extraction; fail-fast
    * per row like its siblings (callers over untrusted crawl bytes
    * wrap rows in their own Try). */
  def extract(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val cs = chapters(bytes)
        (id, cs.length, cs.mkString("\n\n"))
      })
      .toDF("id", "n_chapters", "text")
  }

  /** ONE zip pass → name → inflated bytes, bomb- and count-capped
    * via the shared [[graft.util.ZipParts]] walk. */
  private def readParts(epub: Array[Byte]): Map[String, Array[Byte]] = {
    require(!DocxText.isOle(epub),
      "OLE container unsupported (refusing, not mis-decoding)")
    require(DocxText.isZip(epub), "not an EPUB (missing zip magic)")
    graft.util.ZipParts.collect(epub, keep = _ => true,
      maxTotalBytes = MaxTotalBytes, maxEntries = MaxEntries).toMap
  }

  /** container.xml → the first package-document rootfile's
    * full-path (OCF §3.5.2.1: the first rootfile is the default
    * rendition). */
  private def rootfilePath(container: Array[Byte]): String = {
    val doc = graft.util.SecureXml.builder().parse(new java.io.ByteArrayInputStream(container))
    val nodes = doc.getElementsByTagNameNS("*", "rootfile")
    val hit = (0 until nodes.getLength).map(nodes.item(_)).collectFirst {
      case e: org.w3c.dom.Element
          if e.getAttribute("media-type") ==
            "application/oebps-package+xml" &&
            e.getAttribute("full-path").nonEmpty =>
        e.getAttribute("full-path")
    }
    hit.getOrElse(throw new IllegalArgumentException(
      "EPUB container.xml lacks a package-document rootfile"))
  }

  /** OPF → spine hrefs in reading order: manifest id→(href,
    * media-type), spine itemrefs resolve through it; non-XHTML and
    * linear="no" items skip. */
  private def spineHrefs(opf: Array[Byte]): Seq[String] = {
    val doc = graft.util.SecureXml.builder().parse(new java.io.ByteArrayInputStream(opf))
    val items = doc.getElementsByTagNameNS("*", "item")
    val manifest = (0 until items.getLength).map(items.item(_)).collect {
      case e: org.w3c.dom.Element if e.getAttribute("id").nonEmpty =>
        e.getAttribute("id") ->
          (e.getAttribute("href"), e.getAttribute("media-type"))
    }.toMap
    val refs = doc.getElementsByTagNameNS("*", "itemref")
    (0 until refs.getLength).map(refs.item(_)).collect {
      case e: org.w3c.dom.Element
          if e.getAttribute("linear") != "no" &&
            e.getAttribute("idref").nonEmpty =>
        e.getAttribute("idref")
    }.flatMap { idref =>
      val (href, mtype) = manifest.getOrElse(idref,
        throw new IllegalArgumentException(
          s"EPUB spine itemref '$idref' missing from the manifest"))
      // spine images/audio are legal; only document items carry text
      if (mtype == "application/xhtml+xml" || mtype == "text/html")
        Some(href)
      else None
    }
  }

  /** OPF hrefs are relative URIs, not raw zip paths: percent-encoded
    * octets decode (books with spaces ship `ch%201.xhtml` for the
    * zip entry `ch 1.xhtml` — real InDesign output), a fragment or
    * query suffix strips (`chapter.xhtml#s1` targets the whole
    * part). `+` stays literal — that's form encoding, not path
    * encoding. Malformed escapes refuse loudly. */
  private def decodeHref(href: String): String = {
    val frag = href.indexWhere(c => c == '#' || c == '?')
    val path = if (frag >= 0) href.substring(0, frag) else href
    if (!path.contains('%')) return path
    val out = new java.io.ByteArrayOutputStream(path.length)
    var i = 0
    while (i < path.length) {
      val c = path.charAt(i)
      if (c == '%') {
        require(i + 2 < path.length &&
          Character.digit(path.charAt(i + 1), 16) >= 0 &&
          Character.digit(path.charAt(i + 2), 16) >= 0,
          s"EPUB href '$href' has a malformed percent escape")
        out.write(Character.digit(path.charAt(i + 1), 16) * 16 +
          Character.digit(path.charAt(i + 2), 16))
        i += 3
      } else if (Character.isHighSurrogate(c) && i + 1 < path.length &&
          Character.isLowSurrogate(path.charAt(i + 1))) {
        // astral chars: encode the PAIR together (a lone surrogate
        // through getBytes would corrupt to '?')
        out.write(path.substring(i, i + 2).getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
        i += 2
      } else {
        // non-ASCII chars in the raw href pass through as UTF-8
        out.write(c.toString.getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
        i += 1
      }
    }
    new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Resolve `./` and `a/../b` segments — OPF hrefs are relative
    * URLs; a traversal escaping the archive root refuses. */
  private def normalize(path: String): String = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    path.split('/').foreach {
      case "" | "." =>
      case ".." =>
        require(out.nonEmpty,
          s"EPUB href '$path' escapes the archive root")
        out.remove(out.length - 1)
      case seg => out += seg
    }
    out.mkString("/")
  }

  // ------------------------------------------------------------ fixture

  /** Minimal-but-real .epub writer: mimetype (stored first, the OCF
    * convention), container.xml pointing at a NESTED OPF
    * (`OEBPS/content.opf` — chapter hrefs must resolve relative to
    * it), one XHTML chapter per element of `chapterParas`, spine in
    * REVERSE manifest order (the reader must follow the spine, not
    * the manifest or zip order), plus a spine-listed cover image and
    * a linear="no" item the reader must skip. `drm = true` plants
    * META-INF/encryption.xml (the reader must refuse). */
  def fixture(chapterParas: Seq[Seq[String]],
              drm: Boolean = false): Array[Byte] = {
    require(chapterParas.nonEmpty, "fixture needs at least one chapter")
    val n = chapterParas.size
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    def part(name: String, content: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    part("mimetype", "application/epub+zip")
    part("META-INF/container.xml",
      """<?xml version="1.0" encoding="UTF-8"?>""" +
      """<container version="1.0" xmlns="urn:oasis:names:tc:opendocument:xmlns:container">""" +
      """<rootfiles><rootfile full-path="OEBPS/content.opf" media-type="application/oebps-package+xml"/>""" +
      """</rootfiles></container>""")
    if (drm)
      // a real DRM shape: the FIRST spine chapter is listed as an
      // encrypted resource (the reader must refuse — its text is
      // unrecoverable)
      part("META-INF/encryption.xml",
        """<?xml version="1.0"?>""" +
        """<encryption xmlns="urn:oasis:names:tc:opendocument:xmlns:container" xmlns:enc="http://www.w3.org/2001/04/xmlenc#">""" +
        """<enc:EncryptedData><enc:CipherData>""" +
        """<enc:CipherReference URI="OEBPS/text/ch1.xhtml"/>""" +
        """</enc:CipherData></enc:EncryptedData></encryption>""")
    val manifest = (1 to n).map(i =>
      s"""<item id="ch$i" href="text/ch$i.xhtml" media-type="application/xhtml+xml"/>""")
      .mkString +
      """<item id="cover" href="img/cover.png" media-type="image/png"/>""" +
      """<item id="notes" href="text/notes.xhtml" media-type="application/xhtml+xml"/>"""
    val spine = """<itemref idref="cover"/>""" + // non-XHTML: skipped
      (1 to n).map(i => s"""<itemref idref="ch$i"/>""").mkString +
      """<itemref idref="notes" linear="no"/>""" // aux: skipped
    part("OEBPS/content.opf",
      """<?xml version="1.0" encoding="UTF-8"?>""" +
      """<package xmlns="http://www.idpf.org/2007/opf" version="3.0" unique-identifier="uid">""" +
      """<metadata xmlns:dc="http://purl.org/dc/elements/1.1/">""" +
      """<dc:identifier id="uid">graft-fixture</dc:identifier><dc:title>t</dc:title></metadata>""" +
      s"<manifest>$manifest</manifest><spine>$spine</spine></package>")
    part("OEBPS/img/cover.png", "not really a png")
    part("OEBPS/text/notes.xhtml",
      chapterXhtml(Seq("NON-LINEAR NOTES — must not surface")))
    // chapters land in the zip in REVERSE order; the spine re-orders
    chapterParas.indices.reverse.foreach { i =>
      part(s"OEBPS/text/ch${i + 1}.xhtml", chapterXhtml(chapterParas(i)))
    }
    zos.close()
    bos.toByteArray
  }

  private def chapterXhtml(paras: Seq[String]): String =
    """<?xml version="1.0" encoding="UTF-8"?>""" +
      "<html xmlns=\"http://www.w3.org/1999/xhtml\"><head>" +
      "<title>ch</title></head><body>" +
      paras.map(p => s"<p>${graft.util.SecureXml.escape(p)}</p>").mkString +
      "</body></html>"
}
