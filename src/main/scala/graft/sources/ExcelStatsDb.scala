package graft.sources

import java.io.{BufferedOutputStream, ByteArrayInputStream, File, FileOutputStream}
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import scala.jdk.CollectionConverters._

/** S4/K3: the reference's legacy Excel stats database
  * (`team_rankings_scraper.py:243-251` — `read_excel` the whole stats
  * DB, concat the fresh day's frame, `to_excel` it back).
  *
  * Dependency-free by design (zero-egress build): an `.xlsx` is a ZIP
  * of SpreadsheetML parts, so the writer emits the five-part minimal
  * package (content types, rels, workbook, one inline-string sheet)
  * with `java.util.zip`, and the reader parses the sheet XML with the
  * JDK DOM parser — no POI, no extra jars.
  *
  * Contract notes:
  *  - An Excel workbook is a DRIVER-SIDE artifact (the format caps at
  *    ~1M rows); `write` collects and enforces `maxRows`. This is the
  *    legacy bounded path — the scale path is PartitionedParquetStore.
  *  - `read` returns every cell as a STRING column (header row =
  *    column names), matching the repo's scraped-data convention: the
  *    F11 coercion ladder (TypeCoercion.normalizeTypes) decides types
  *    downstream, exactly as it does for scraped HTML tables.
  *  - Reader accepts inline strings, shared strings, and numeric
  *    cells, so files written by pandas/openpyxl (shared strings) load
  *    too, not just our own output.
  */
object ExcelStatsDb {

  /** 0-based column index → A1-style letters. */
  private[graft] def colLetters(i: Int): String = {
    var n = i + 1; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  /** A1-style ref → 0-based column index ("BC12" → 54). */
  private def colIndex(ref: String): Int = {
    val letters = ref.takeWhile(_.isLetter)
    letters.foldLeft(0)((acc, c) => acc * 26 + (c - 'A' + 1)) - 1
  }

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case c   => c.toString
    }

  private val xmlDecl = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""

  /** K3: write `df` as a single-sheet .xlsx. Numeric columns become
    * number cells, everything else inline strings; nulls are omitted
    * cells (Excel blank). Collects — but through
    * [[graft.util.Bounded.collect]], so the TRANSFER itself is capped
    * at maxRows+1 rows: a corpus-scale frame fails loudly at the
    * `require` instead of OOMing the driver during the collect. */
  def write(df: DataFrame, path: String, maxRows: Int = 1048575): Unit = {
    val rows = graft.util.Bounded.collect(df, maxRows,
      s"ExcelStatsDb.write (bounded legacy Excel sink, maxRows=$maxRows)")
    val isNum = df.schema.fields.map(f =>
      f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])

    val sheet = new StringBuilder
    sheet ++= xmlDecl
    sheet ++= """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>"""
    sheet ++= df.columns.zipWithIndex.map { case (c, i) =>
      s"""<c r="${colLetters(i)}1" t="inlineStr"><is><t>${xmlEscape(c)}</t></is></c>"""
    }.mkString("""<row r="1">""", "", "</row>")
    rows.zipWithIndex.foreach { case (row, ri) =>
      val r = ri + 2
      sheet ++= s"""<row r="$r">"""
      var i = 0
      while (i < row.length) {
        if (!row.isNullAt(i)) {
          val ref = s"${colLetters(i)}$r"
          if (isNum(i)) sheet ++= s"""<c r="$ref"><v>${row.get(i)}</v></c>"""
          else sheet ++=
            s"""<c r="$ref" t="inlineStr"><is><t>${xmlEscape(String.valueOf(row.get(i)))}</t></is></c>"""
        }
        i += 1
      }
      sheet ++= "</row>"
    }
    sheet ++= "</sheetData></worksheet>"

    val zos = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    def part(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    try {
      part("[Content_Types].xml", xmlDecl +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
        """</Types>""")
      part("_rels/.rels", xmlDecl +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
        """</Relationships>""")
      part("xl/workbook.xml", xmlDecl +
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
        """<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>""")
      part("xl/_rels/workbook.xml.rels", xmlDecl +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
        """</Relationships>""")
      part("xl/worksheets/sheet1.xml", sheet.toString)
    } finally zos.close()
  }

  /** S4: read an .xlsx sheet to an all-string DataFrame (header row =
    * column names; missing/blank cells → null). None if the file
    * doesn't exist — the reference's start-fresh semantics. */
  def read(spark: SparkSession, path: String): Option[DataFrame] = {
    val f = new File(path)
    if (!f.exists()) return None
    val zf = new ZipFile(f)
    try {
      def bytes(name: String): Option[Array[Byte]] =
        Option(zf.getEntry(name)).map(e => zf.getInputStream(e).readAllBytes())
      def parse(b: Array[Byte]) =
        // Hardened: workbooks come from outside this process
        // (pandas/openpyxl artifacts) — the shared XXE-off builder
        // (graft.util.SecureXml) refuses DTDs and external entities.
        graft.util.SecureXml.builder().parse(new ByteArrayInputStream(b))
      // shared-strings table (pandas/openpyxl write strings this way)
      val shared: IndexedSeq[String] = bytes("xl/sharedStrings.xml").map { b =>
        val sis = parse(b).getElementsByTagName("si")
        (0 until sis.getLength).map { i =>
          val ts = sis.item(i).asInstanceOf[org.w3c.dom.Element].getElementsByTagName("t")
          (0 until ts.getLength).map(ts.item(_).getTextContent).mkString
        }.toIndexedSeq
      }.getOrElse(IndexedSeq.empty)

      val sheetBytes = bytes("xl/worksheets/sheet1.xml").orElse {
        zf.entries().asScala.map(_.getName)
          .find(n => n.startsWith("xl/worksheets/") && n.endsWith(".xml"))
          .flatMap(bytes)
      }.getOrElse(throw new IllegalArgumentException(s"no worksheet in $path"))

      val rowNodes = parse(sheetBytes).getElementsByTagName("row")
      val parsed: IndexedSeq[Map[Int, String]] = (0 until rowNodes.getLength).map { ri =>
        val cells = rowNodes.item(ri).asInstanceOf[org.w3c.dom.Element]
          .getElementsByTagName("c")
        (0 until cells.getLength).flatMap { ci =>
          val c = cells.item(ci).asInstanceOf[org.w3c.dom.Element]
          val idx = colIndex(c.getAttribute("r"))
          val t = c.getAttribute("t")
          val value: Option[String] = t match {
            case "inlineStr" =>
              val ts = c.getElementsByTagName("t")
              if (ts.getLength == 0) None
              else Some((0 until ts.getLength).map(ts.item(_).getTextContent).mkString)
            case "s" =>
              val vs = c.getElementsByTagName("v")
              if (vs.getLength == 0) None else Some(shared(vs.item(0).getTextContent.trim.toInt))
            case _ =>
              val vs = c.getElementsByTagName("v")
              if (vs.getLength == 0) None else Some(vs.item(0).getTextContent)
          }
          value.map(idx -> _)
        }.toMap
      }
      require(parsed.nonEmpty, s"empty worksheet in $path")

      val header = parsed.head
      // width spans ALL rows, not just the header — a trailing column
      // whose header cell is blank (unnamed columns happen in legacy
      // sheets) must not silently drop its data; it surfaces as _cN
      // and survives the read-modify-write append.
      val width = parsed.iterator.flatMap(_.keys).foldLeft(-1)(math.max) + 1
      require(width > 0, s"no addressable cells in $path")
      val names = (0 until width).map(i => header.getOrElse(i, s"_c$i"))
      val schema = StructType(names.map(StructField(_, StringType)))
      val data = parsed.tail.map { m =>
        Row.fromSeq((0 until width).map(i => m.getOrElse(i, null)))
      }
      Some(spark.createDataFrame(
        new java.util.ArrayList[Row](data.asJava), schema))
    } finally zf.close()
  }

  /** The reference's read-modify-write append
    * (`append_date_to_database`): load the stats DB if present, concat
    * the fresh frame (name-aligned, string-normalized — Excel is a
    * display-value store), write the whole workbook back. Returns the
    * merged frame. */
  def appendRows(spark: SparkSession, path: String, fresh: DataFrame): DataFrame = {
    val freshStr = fresh.select(fresh.columns.map(c => col(c).cast("string").as(c)).toIndexedSeq: _*)
    val merged = read(spark, path) match {
      case Some(existing) => existing.unionByName(freshStr, allowMissingColumns = true)
      case None           => freshStr
    }
    write(merged, path)
    merged
  }
}
