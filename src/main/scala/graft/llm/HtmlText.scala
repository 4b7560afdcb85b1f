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
  * (5) character entities decode in ONE left-to-right pass (named
  * core set + decimal/hex numeric — single-pass means `&amp;lt;`
  * decodes to the literal `&lt;`, never double-decodes), (6)
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

  private val Comment = "(?s)<!--.*?-->".r
  private val Dead = "(?is)<(script|style|noscript)\\b[^>]*>.*?</\\1\\s*>".r
  private val Block = ("(?i)</?(?:p|div|br|h[1-6]|li|ul|ol|tr|td|th|table|" +
    "section|article|header|footer|blockquote|pre|form|nav|aside)\\b[^>]*>").r
  private val AnyTag = "(?s)<[^>]*>".r
  private val Anchor = "(?is)<a\\b[^>]*>(.*?)</a\\s*>".r
  private val Ws = "[ \\t\\r\\n]+".r

  private val Named = Map("amp" -> '&', "lt" -> '<', "gt" -> '>',
    "quot" -> '"', "apos" -> '\'', "nbsp" -> ' ')

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
            cp.filter(v => v > 0 && v < 0x10000).map(_.toChar)
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
    val noDead = Dead.replaceAllIn(Comment.replaceAllIn(html, " "), " ")
    val blocked = Block.replaceAllIn(noDead, "\n")
    val stripped = AnyTag.replaceAllIn(blocked, "")
    Ws.replaceAllIn(decodeEntities(stripped), " ").trim
  }

  /** Fraction of extracted characters inside <a> anchors, 4 dp;
    * 0.0 for link-free or empty documents. */
  def linkDensity(html: String): Double = {
    if (html == null) return 0.0
    val noDead = Dead.replaceAllIn(Comment.replaceAllIn(html, " "), " ")
    val total = extractText(html).length
    if (total == 0) return 0.0
    val linked = Anchor.findAllMatchIn(noDead).map { m =>
      Ws.replaceAllIn(decodeEntities(
        AnyTag.replaceAllIn(Block.replaceAllIn(m.group(1), "\n"), "")),
        " ").trim.length
    }.sum
    BigDecimal(linked.toDouble / total)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** (id, text, link_density) — narrow per-row extraction. */
  def extract(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(htmlCol))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, html) =>
        (id, extractText(html), linkDensity(html))
      })
      .toDF("id", "text", "link_density")
  }
}
