package graft

import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.sources.ExcelStatsDb

/** S4/K3: the dependency-free Excel legacy-stats-DB path — write/read
  * round trip, the reference's read-modify-write append semantics
  * (team_rankings_scraper.py:243-251), and reading a shared-strings
  * workbook (the shape pandas/openpyxl produce). */
class ExcelStatsDbSpec extends SparkSpec {
  import spark.implicits._

  test("column letters cover the multi-letter range") {
    assert(ExcelStatsDb.colLetters(0) === "A")
    assert(ExcelStatsDb.colLetters(25) === "Z")
    assert(ExcelStatsDb.colLetters(26) === "AA")
    assert(ExcelStatsDb.colLetters(27 * 26 - 1) === "ZZ")
  }

  test("write/read round-trips header, strings, numbers, nulls, and XML specials") {
    val df = Seq(
      ("KC <Chiefs> & co", Some(27), 0.55),
      ("BUF", None, 0.61)
    ).toDF("team", "pts", "ratio")
    val path = tmpDir("xlsx") + "/stats.xlsx"
    ExcelStatsDb.write(df, path)
    val back = ExcelStatsDb.read(spark, path).get
    assert(back.columns.toSeq === Seq("team", "pts", "ratio"))
    val rows = back.collect().map(r =>
      (r.getString(0), Option(r.getString(1)), r.getString(2))).toSet
    assert(rows === Set(
      ("KC <Chiefs> & co", Some("27"), "0.55"),
      ("BUF", None, "0.61")))
  }

  test("read of a missing file is None (start-fresh semantics)") {
    assert(ExcelStatsDb.read(spark, "/tmp/does-not-exist-graft.xlsx") === None)
  }

  test("appendRows reproduces the reference read-modify-write append") {
    val path = tmpDir("xlsxdb") + "/tr_stats_short.xlsx"
    val day1 = Seq(("KC", "2024-11-17", 27)).toDF("team", "date", "pts")
    val day2 = Seq(("BUF", "2024-11-18", 31)).toDF("team", "date", "pts")
    ExcelStatsDb.appendRows(spark, path, day1)
    ExcelStatsDb.appendRows(spark, path, day2)
    val db = ExcelStatsDb.read(spark, path).get
    assert(db.count() === 2)
    assert(db.select("team").as[String].collect().toSet === Set("KC", "BUF"))
    // the coercion ladder types the string columns downstream (F11):
    // every pts cell parses as an integer -> int64, pandas parity
    val typed = graft.functions.TypeCoercion.normalizeTypes(db)
    assert(typed.schema("pts").dataType.typeName === "long")
    assert(typed.schema("team").dataType.typeName === "string")
  }

  test("reads shared-strings workbooks (pandas/openpyxl shape)") {
    // hand-built minimal xlsx using a sharedStrings part and t="s" cells
    val path = tmpDir("xlsxss") + "/shared.xlsx"
    val zos = new ZipOutputStream(new java.io.FileOutputStream(path))
    def part(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    part("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
        "<si><t>team</t></si><si><t>wins</t></si><si><t>Dallas</t></si></sst>")
    part("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
        """<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>""" +
        """<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>9</v></c></row>""" +
        "</sheetData></worksheet>")
    zos.close()
    val df = ExcelStatsDb.read(spark, path).get
    assert(df.columns.toSeq === Seq("team", "wins"))
    val r = df.collect().head
    assert(r.getString(0) === "Dallas" && r.getString(1) === "9")
  }

  test("write refuses an over-bound frame WITHOUT materializing it (Bounded.collect guard)") {
    // The failure must fire from the capped limit(maxRows+1) transfer,
    // not after a full collect: count per-row evaluations with an
    // accumulator and assert the 100k-row frame was never drained.
    val evaluated = spark.sparkContext.longAccumulator("xlsxRowsEvaluated")
    val big = spark.range(0, 100000, 1, 1)
      .map { i => evaluated.add(1); i }.toDF("id")
    val ex = intercept[IllegalArgumentException] {
      ExcelStatsDb.write(big, tmpDir("xlsxbig") + "/too_big.xlsx", maxRows = 10)
    }
    assert(ex.getMessage.contains("ExcelStatsDb.write"))
    assert(evaluated.value < 10000,
      s"guard materialized ${evaluated.value} rows — the transfer itself " +
        "must be bounded, not just checked after the fact")
  }
}
