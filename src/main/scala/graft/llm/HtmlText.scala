package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** HTML → training text: the boilerplate-stripping step between a
  * crawl archive (see `sources.Warc`) and the `documents` table.
  *
  * Deterministic pipeline (the order matters and is part of the
  * contract): (1) drop comments, (2) drop script/style/noscript
  * SUBTREES (their text is never content), (3) block-level tags
  * (p/div/br/h1-6/li/tr/table/…) become newlines so words from
  * adjacent blocks don't fuse, (4) every remaining tag is stripped,
  * (5) character entities decode in ONE left-to-right pass (the
  * core set + the HTML 4 Latin-1 and punctuation blocks +
  * decimal/hex numeric, surrogate refs excluded — single-pass means
  * `&amp;lt;` decodes to the literal `&lt;`, never double-decodes), (6)
  * ASCII whitespace collapses to single spaces (ASCII-only so SQL
  * oracles can replay the normalization byte-for-byte).
  *
  * `linkDensity` is the classic boilerplate signal: the fraction of
  * extracted characters living inside `<a>` anchors — navigation and
  * footer chrome score near 1, article bodies near 0.
  *
  * Everything is a narrow per-row map (mapPartitions, no shuffle);
  * at crawl scale the extractor runs inside the same task as the
  * WARC record parse.
  */
object HtmlText {

  private val Block = ("(?i)</?(?:p|div|br|h[1-6]|li|ul|ol|tr|td|th|table|" +
    "section|article|header|footer|blockquote|pre|form|nav|aside)\\b[^>]*>").r
  private val AnyTag = "(?s)<[^>]*>".r
  private val Ws = "[ \\t\\r\\n]+".r

  /** Anchor inner-HTML spans, as a linear scan with the same
    * exhausted-close memoization as [[stripDead]] — the reluctant
    * `<a ...>(.*?)</a>` regex had the identical O(n*k) hostile-input
    * window (a page of N unclosed `<a>` openers rescans to EOF per
    * opener). Semantics match the regex: minimal close, unclosed
    * openers contribute nothing. */
  private[graft] def anchorSpans(s: String): Seq[String] = {
    val lower = s.toLowerCase(java.util.Locale.ROOT)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var noClose = false
    var i = lower.indexOf('<')
    while (i >= 0) {
      var next = -2 // sentinel: not set
      val after = i + 2
      if (lower.startsWith("a", i + 1) &&
          (after >= lower.length || !isWordChar(lower.charAt(after)))) {
        val gt = lower.indexOf('>', i + 1)
        if (gt >= 0 && !noClose) {
          var closeStart = -1
          var closeEnd = -1
          var c = lower.indexOf("</a", gt + 1)
          while (closeEnd < 0 && c >= 0) {
            var j = c + 3
            while (j < lower.length && (lower.charAt(j) == ' ' ||
                   lower.charAt(j) == '\t' || lower.charAt(j) == '\r' ||
                   lower.charAt(j) == '\n')) j += 1
            if (j < lower.length && lower.charAt(j) == '>') {
              closeStart = c; closeEnd = j + 1
            } else c = lower.indexOf("</a", c + 1)
          }
          if (closeEnd >= 0) {
            out += s.substring(gt + 1, closeStart)
            next = lower.indexOf('<', closeEnd)
          } else noClose = true
        }
      }
      i = if (next != -2) next else lower.indexOf('<', i + 1)
    }
    out.toSeq
  }

  /** Comment removal as a single left-to-right scan: each complete
    * `<!-- -->` becomes one space; an unclosed `<!--` stays literal
    * (the later tag strip eats its prefix) — the same semantics the
    * old reluctant regex had, without its hostile-input cost (a page
    * of N unclosed `<!--` openers made the regex rescan to EOF per
    * opener, O(N * page)). */
  private[graft] def stripComments(s: String): String = {
    var i = s.indexOf("<!--")
    if (i < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var pos = 0
    while (i >= 0) {
      val close = s.indexOf("-->", i + 4)
      if (close < 0) i = -1 // unclosed: rest stays literal
      else {
        sb.append(s, pos, i).append(' ')
        pos = close + 3
        i = s.indexOf("<!--", pos)
      }
    }
    sb.append(s, pos, s.length)
    sb.toString
  }

  private val DeadTags = Array("script", "style", "noscript")

  /** Dead-subtree (script/style/noscript) removal as a linear scan.
    * Matches the old regex contract exactly — a complete
    * `<tag ...> ... </tag >` subtree (case-insensitive, minimal
    * close) becomes one space; an opener with no valid close stays
    * literal — but amortizes to O(n): once a close-search for a tag
    * exhausts the document, later openers of that tag skip the
    * search (`noClose`), killing the O(n*k) window a page of
    * thousands of unclosed `<script>` tags opened against the
    * reluctant regex. */
  private[graft] def stripDead(s: String): String = {
    val lower = s.toLowerCase(java.util.Locale.ROOT)
    val sb = new java.lang.StringBuilder(s.length)
    val noClose = new Array[Boolean](DeadTags.length)
    var pos = 0
    var i = lower.indexOf('<')
    while (i >= 0) {
      var matchedEnd = -1
      var t = 0
      while (matchedEnd < 0 && t < DeadTags.length) {
        val tag = DeadTags(t)
        val after = i + 1 + tag.length
        // `<tag` + word boundary (the regex's \b), then `[^>]*>`
        if (lower.startsWith(tag, i + 1) &&
            (after >= lower.length || !isWordChar(lower.charAt(after)))) {
          val gt = lower.indexOf('>', after)
          if (gt >= 0 && !noClose(t)) {
            val closeTok = "</" + tag
            var closeEnd = -1
            var c = lower.indexOf(closeTok, gt + 1)
            while (closeEnd < 0 && c >= 0) {
              var j = c + closeTok.length
              while (j < lower.length && (lower.charAt(j) == ' ' ||
                     lower.charAt(j) == '\t' || lower.charAt(j) == '\r' ||
                     lower.charAt(j) == '\n')) j += 1
              if (j < lower.length && lower.charAt(j) == '>') closeEnd = j + 1
              else c = lower.indexOf(closeTok, c + 1)
            }
            if (closeEnd >= 0) matchedEnd = closeEnd
            else noClose(t) = true
          }
        }
        t += 1
      }
      if (matchedEnd >= 0) {
        sb.append(s, pos, i).append(' ')
        pos = matchedEnd
        i = lower.indexOf('<', matchedEnd)
      } else i = lower.indexOf('<', i + 1)
    }
    if (pos == 0) s
    else { sb.append(s, pos, s.length); sb.toString }
  }

  private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
    (c >= '0' && c <= '9') || c == '_'

  private def stripDeadAndComments(s: String): String =
    stripDead(stripComments(s))

  /** HTML 4 Latin-1 entity names, in codepoint order 0xA1..0xFF. */
  private val Latin1Names = Array(
    "iexcl", "cent", "pound", "curren", "yen", "brvbar", "sect", "uml",
    "copy", "ordf", "laquo", "not", "shy", "reg", "macr", "deg",
    "plusmn", "sup2", "sup3", "acute", "micro", "para", "middot", "cedil",
    "sup1", "ordm", "raquo", "frac14", "frac12", "frac34", "iquest",
    "Agrave", "Aacute", "Acirc", "Atilde", "Auml", "Aring", "AElig",
    "Ccedil", "Egrave", "Eacute", "Ecirc", "Euml", "Igrave", "Iacute",
    "Icirc", "Iuml", "ETH", "Ntilde", "Ograve", "Oacute", "Ocirc",
    "Otilde", "Ouml", "times", "Oslash", "Ugrave", "Uacute", "Ucirc",
    "Uuml", "Yacute", "THORN", "szlig", "agrave", "aacute", "acirc",
    "atilde", "auml", "aring", "aelig", "ccedil", "egrave", "eacute",
    "ecirc", "euml", "igrave", "iacute", "icirc", "iuml", "eth",
    "ntilde", "ograve", "oacute", "ocirc", "otilde", "ouml", "divide",
    "oslash", "ugrave", "uacute", "ucirc", "uuml", "yacute", "thorn",
    "yuml")

  /** HTML 4 "special" punctuation / Latin Extended block — the
    * entities legacy pages actually use (&mdash; &hellip; &euro; …)
    * that previously survived as literals into training text. */
  private val SpecialNames: Map[String, Int] = Map(
    "OElig" -> 0x152, "oelig" -> 0x153, "Scaron" -> 0x160,
    "scaron" -> 0x161, "Yuml" -> 0x178, "fnof" -> 0x192,
    "circ" -> 0x2C6, "tilde" -> 0x2DC, "ensp" -> 0x2002,
    "emsp" -> 0x2003, "thinsp" -> 0x2009, "zwnj" -> 0x200C,
    "zwj" -> 0x200D, "lrm" -> 0x200E, "rlm" -> 0x200F,
    "ndash" -> 0x2013, "mdash" -> 0x2014, "lsquo" -> 0x2018,
    "rsquo" -> 0x2019, "sbquo" -> 0x201A, "ldquo" -> 0x201C,
    "rdquo" -> 0x201D, "bdquo" -> 0x201E, "dagger" -> 0x2020,
    "Dagger" -> 0x2021, "bull" -> 0x2022, "hellip" -> 0x2026,
    "permil" -> 0x2030, "prime" -> 0x2032, "Prime" -> 0x2033,
    "lsaquo" -> 0x2039, "rsaquo" -> 0x203A, "oline" -> 0x203E,
    "frasl" -> 0x2044, "euro" -> 0x20AC, "trade" -> 0x2122,
    "minus" -> 0x2212)

  // nbsp maps to a PLAIN space deliberately: the extractor's output
  // is whitespace-normalized training text, and a U+00A0 surviving
  // ASCII-only collapse would fuse words across the nbsp.
  private val Named: Map[String, Char] = {
    require(Latin1Names.length == 95, s"Latin-1 table ${Latin1Names.length}")
    Map("amp" -> '&', "lt" -> '<', "gt" -> '>',
        "quot" -> '"', "apos" -> '\'', "nbsp" -> ' ') ++
      Latin1Names.zipWithIndex.map { case (n, k) => n -> (0xA1 + k).toChar } ++
      SpecialNames.map { case (n, cp) => n -> cp.toChar }
  }

  /** One left-to-right entity-decode pass; unknown entities stay
    * literal. */
  private[graft] def decodeEntities(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else {
        val semi = s.indexOf(';', i + 1)
        val name = if (semi > i && semi - i <= 10) s.substring(i + 1, semi)
                   else null
        val decoded: Option[Char] =
          if (name == null) None
          else if (Named.contains(name)) Some(Named(name))
          else if (name.length > 1 && name.charAt(0) == '#') {
            val num = name.substring(1)
            val cp =
              if ((num.startsWith("x") || num.startsWith("X")) &&
                  num.length > 1 && num.drop(1).forall(isHex))
                Some(Integer.parseInt(num.drop(1), 16))
              else if (num.nonEmpty && num.forall(_.isDigit))
                Some(num.toInt)
              else None
            // surrogate codepoints (0xD800-0xDFFF) stay literal: a
            // lone surrogate is malformed UTF-16 that breaks
            // downstream encoders/hashes on the extracted text
            cp.filter(v => v > 0 &&
              (v < 0xD800 || (v >= 0xE000 && v < 0x10000))).map(_.toChar)
          } else None
        decoded match {
          case Some(ch) => sb.append(ch); i = semi + 1
          case None => sb.append('&'); i += 1
        }
      }
    }
    sb.toString
  }

  private def isHex(c: Char): Boolean =
    c.isDigit || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** The extracted, entity-decoded, whitespace-collapsed text. */
  def extractText(html: String): String = {
    if (html == null) return null
    textOf(stripDeadAndComments(html))
  }

  private def textOf(noDead: String): String =
    Ws.replaceAllIn(decodeEntities(
      AnyTag.replaceAllIn(Block.replaceAllIn(noDead, "\n"), "")), " ").trim

  /** (text, link_density) in ONE pass over the document — the
    * hot-path form: computing them separately re-runs the dead-
    * subtree strip and extraction (the intake calls both per crawled
    * page). Values are bit-identical to the standalone functions. */
  def extractWithDensity(html: String): (String, Double) = {
    if (html == null) return (null, 0.0)
    val noDead = stripDeadAndComments(html)
    val text = textOf(noDead)
    if (text.isEmpty) return (text, 0.0)
    val linked = anchorSpans(noDead).map(inner => textOf(inner).length).sum
    (text, BigDecimal(linked.toDouble / text.length)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  /** Fraction of extracted characters inside <a> anchors, 4 dp;
    * 0.0 for link-free or empty documents. */
  def linkDensity(html: String): Double = extractWithDensity(html)._2

  /** (id, text, link_density) — narrow per-row extraction, one pass
    * per document. */
  def extract(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(htmlCol))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, html) =>
        val (text, density) = extractWithDensity(html)
        (id, text, density)
      })
      .toDF("id", "text", "link_density")
  }
}
