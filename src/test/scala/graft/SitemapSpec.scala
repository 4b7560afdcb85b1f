package graft

import org.apache.spark.sql.functions._
import graft.sources.Sitemap

/** Sitemap protocol: urlset + sitemapindex parse, optional fields,
  * XML escaping round-trip, XXE refusal, the narrow Spark path. */
class SitemapSpec extends SparkSpec {
  import spark.implicits._

  test("urlset and sitemapindex round-trip with optional fields") {
    val xml = Sitemap.fixture(Seq(
      ("http://x/a?p=1&q=2", Some("2026-01-02"), Some("daily"), Some(0.8)),
      ("http://x/b", None, None, None),
      ("http://x/<odd>", Some("2026-02-03"), None, Some(0.5))))
    val got = Sitemap.parse(xml)
    assert(got.size == 3)
    assert(got(0) == Sitemap.Entry("url", "http://x/a?p=1&q=2",
      "2026-01-02", "daily", Some(0.8)))
    assert(got(1) == Sitemap.Entry("url", "http://x/b", null, null, None))
    assert(got(2).loc == "http://x/<odd>") // escape round-trip
    val idx = Sitemap.parse(Sitemap.fixture(
      Seq(("http://x/sitemap1.xml", Some("2026-01-01"), None, None)),
      index = true))
    assert(idx == Seq(Sitemap.Entry("sitemap", "http://x/sitemap1.xml",
      "2026-01-01", null, None)))
  }

  test("hostile input: DOCTYPE/XXE refused, wrong root refused, junk priority nulls") {
    val xxe = """<?xml version="1.0"?>
      |<!DOCTYPE urlset [<!ENTITY x SYSTEM "file:///etc/passwd">]>
      |<urlset><url><loc>http://x/&x;</loc></url></urlset>""".stripMargin
    intercept[Exception] { Sitemap.parse(xxe) }
    intercept[IllegalArgumentException] {
      Sitemap.parse("<html><body/></html>")
    }
    val junk = """<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |<url><loc>http://x/a</loc><priority>soon</priority></url>
      |<url><lastmod>2026-01-01</lastmod></url>
      |</urlset>""".stripMargin
    val got = Sitemap.parse(junk)
    assert(got == Seq(Sitemap.Entry("url", "http://x/a", null, null, None)))
  }

  test("parseBytes: gz by magic, plain bytes, bomb cap, encoding decl") {
    val xml = Sitemap.fixture(Seq(("http://x/a", Some("2026-01-01"),
      None, Some(0.3))))
    val expect = Sitemap.parse(xml)
    assert(Sitemap.parseBytes(xml.getBytes("UTF-8")) == expect)
    assert(Sitemap.parseBytes(Sitemap.gzipped(xml)) == expect)
    // the XML parser resolves the document's OWN encoding decl from
    // bytes — a latin-1 sitemap with a non-ASCII loc survives
    val latin = ("<?xml version=\"1.0\" encoding=\"ISO-8859-1\"?>" +
      "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">" +
      "<url><loc>http://x/café</loc></url></urlset>")
      .getBytes("ISO-8859-1")
    assert(Sitemap.parseBytes(latin).head.loc == "http://x/café")
    // a gzip bomb past the protocol's 50 MB uncompressed cap refuses
    val bomb = Sitemap.gzipped(new String(Array.fill(64 << 20)(' ')))
    val ex = intercept[IllegalArgumentException] {
      Sitemap.parseBytes(bomb)
    }
    assert(ex.getMessage.contains("50 MB"))
  }

  test("RSS 2.0 parses as a sitemap: item links, pubDate as lastmod") {
    val rss = Sitemap.rssFixture(Seq(
      ("http://x/a", Some("Mon, 02 Mar 2026 10:00:00 GMT")),
      ("http://x/b", None)))
    val got = Sitemap.parse(rss)
    assert(got.map(_.kind).distinct == Seq("url"))
    // the linkless item the fixture always appends must drop
    assert(got.map(_.loc) == Seq("http://x/a", "http://x/b"))
    assert(got.head.lastmod == "Mon, 02 Mar 2026 10:00:00 GMT")
    assert(got(1).lastmod == null)
    assert(got.forall(e => e.changefreq == null && e.priority.isEmpty))
    // bytes path too (feeds arrive as crawl payloads like any sitemap)
    assert(Sitemap.parseBytes(rss.getBytes("UTF-8")) == got)
    // real feeds interleave <atom:link rel="self"/> (namespaced,
    // empty text) BEFORE the item's actual <link> — it must not
    // shadow it (RSS 2.0 core elements are non-namespaced)
    val withAtom =
      """<rss version="2.0" xmlns:atom="http://www.w3.org/2005/Atom">""" +
      "<channel><item>" +
      """<atom:link rel="self" href="http://x/self"/>""" +
      "<link>http://x/real</link></item></channel></rss>"
    assert(Sitemap.parse(withAtom).map(_.loc) == Seq("http://x/real"))
  }

  test("Atom parses as a sitemap: alternate links only, updated as lastmod") {
    val atom = Sitemap.atomFixture(Seq(
      ("http://x/p1", Some("2026-03-02T10:00:00Z")),
      ("http://x/p2", None)))
    val got = Sitemap.parse(atom)
    // every fixture entry leads with a rel="self" link that must be
    // SKIPPED — self links are feed plumbing, not page URLs
    assert(got.map(_.loc) == Seq("http://x/p1", "http://x/p2"))
    assert(got.head.lastmod == "2026-03-02T10:00:00Z")
    // explicit rel="alternate" is equivalent to absent rel
    val explicit = "<feed xmlns=\"http://www.w3.org/2005/Atom\">" +
      "<entry><link rel=\"alternate\" href=\"http://x/alt\"/></entry></feed>"
    assert(Sitemap.parse(explicit).map(_.loc) == Seq("http://x/alt"))
    // an entry with ONLY plumbing links contributes nothing
    val plumbing = "<feed xmlns=\"http://www.w3.org/2005/Atom\">" +
      "<entry><link rel=\"self\" href=\"http://x/self\"/>" +
      "<link rel=\"edit\" href=\"http://x/edit\"/></entry></feed>"
    assert(Sitemap.parse(plumbing).isEmpty)
  }

  test("entries(): one narrow row per entry") {
    val df = Seq(
      (1L, Sitemap.fixture(Seq(("http://x/a", Some("2026-01-01"), None,
        Some(0.3)), ("http://x/b", None, None, None)))),
      (2L, Sitemap.fixture(Seq(("http://x/child.xml", None, None, None)),
        index = true))).toDF("site_id", "xml")
    val got = Sitemap.entries(df, "site_id", "xml")
      .orderBy(col("id"), col("loc")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq((1L, "url", "http://x/a"),
      (1L, "url", "http://x/b"), (2L, "sitemap", "http://x/child.xml")))
  }
}
