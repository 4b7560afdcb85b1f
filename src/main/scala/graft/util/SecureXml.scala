package graft.util

/** The ONE XXE-hardened XML entry point for every parser that reads
  * crawled/untrusted documents (sitemaps, feeds, OOXML parts, EPUB
  * manifests, xlsx sheets). Centralized so a future JAXP hardening
  * flag lands in one place instead of five drifting copies:
  * DOCTYPE declarations are refused outright (entity-expansion and
  * billion-laughs primitives), external general/parameter entities
  * and XInclude are off (an external-entity fetch from a parser
  * worker is an SSRF primitive), entity references never expand. */
object SecureXml {

  def builder(): javax.xml.parsers.DocumentBuilder = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setFeature(
      "http://xml.org/sax/features/external-general-entities", false)
    f.setFeature(
      "http://xml.org/sax/features/external-parameter-entities", false)
    f.setXIncludeAware(false)
    f.setExpandEntityReferences(false)
    f.setNamespaceAware(true)
    f.newDocumentBuilder()
  }

  /** Minimal text-content escape for fixture writers. */
  def escape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case c => c.toString
    }
}
