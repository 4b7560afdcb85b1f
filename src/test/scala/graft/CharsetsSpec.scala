package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Charsets

/** Charset resolution ladder: BOMs, HTTP param, meta prescan, strict
  * UTF-8 sniff, windows-1252 fallback, and lying headers. */
class CharsetsSpec extends AnyFunSuite {

  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("BOMs are authoritative") {
    assert(Charsets.decodeHtml(b(0xEF, 0xBB, 0xBF) ++
      "hi".getBytes("UTF-8")) == (("hi", "utf-8")))
    assert(Charsets.decodeHtml(b(0xFF, 0xFE) ++
      "hi".getBytes("UTF-16LE")) == (("hi", "utf-16le")))
    assert(Charsets.decodeHtml(b(0xFE, 0xFF) ++
      "hi".getBytes("UTF-16BE")) == (("hi", "utf-16be")))
  }

  test("HTTP charset param wins over meta; meta wins over sniff") {
    val latin = "café".getBytes("ISO-8859-1") // 0xE9: invalid UTF-8
    assert(Charsets.decodeHtml(latin,
      "text/html; charset=ISO-8859-1") == (("café", "iso-8859-1")))
    val metaDoc = ("<html><meta charset='ISO-8859-1'><body>caf")
      .getBytes("US-ASCII") ++ b(0xE9)
    val (text, cs) = Charsets.decodeHtml(metaDoc)
    assert(cs == "iso-8859-1" && text.endsWith("café"))
    val metaEquiv = ("<meta http-equiv=\"Content-Type\" content=\"text/" +
      "html; charset=ISO-8859-1\">x").getBytes("US-ASCII") ++ b(0xE9)
    assert(Charsets.decodeHtml(metaEquiv)._2 == "iso-8859-1")
  }

  test("valid UTF-8 sniffs as UTF-8; invalid falls back to windows-1252") {
    assert(Charsets.decodeHtml("snowman ☃".getBytes("UTF-8")) ==
      (("snowman ☃", "utf-8")))
    // 0x93/0x94: curly quotes in cp1252, invalid as UTF-8
    val cp = "said ".getBytes("US-ASCII") ++ b(0x93) ++
      "hi".getBytes("US-ASCII") ++ b(0x94)
    assert(Charsets.decodeHtml(cp) ==
      (("said “hi”", "windows-1252")))
  }

  test("lying or unknown declared charsets fall through; decode is total") {
    // header says utf-8 but bytes aren't: sniff fails too -> 1252
    val lying = b(0x93) ++ "x".getBytes("US-ASCII")
    assert(Charsets.decodeHtml(lying,
      "text/html; charset=utf-8") == (("“x", "windows-1252")))
    assert(Charsets.decodeHtml("ok".getBytes("UTF-8"),
      "text/html; charset=bogus-999")._1 == "ok")
    assert(Charsets.decodeHtml(Array.empty[Byte]) == (("", "utf-8")))
  }
}
