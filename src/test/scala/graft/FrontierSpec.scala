package graft

import org.apache.spark.sql.functions._
import graft.sources.{Frontier, Sitemap}
import graft.llm.RobotsTxt

/** Crawl-frontier composition: robots `Sitemap:` seeds, sitemapindex
  * recursion with a cycle cut and an unfetched child, canonical-URL
  * dedup with the min-(url,source) keeper, and the per-URL robots
  * decision. */
class FrontierSpec extends SparkSpec {
  import spark.implicits._

  test("RobotsTxt.sitemaps: global directives, case-insensitive, bounded") {
    val content =
      """User-agent: *
        |Disallow: /tmp
        |sitemap: http://x/a.xml
        |SITEMAP: http://x/b.xml # trailing comment
        |Sitemap:
        |Sitemap: http://x/""".stripMargin + ("c" * 3000) + "\n"
    assert(RobotsTxt.sitemaps(content) ==
      Seq("http://x/a.xml", "http://x/b.xml"))
    // and the directive still doesn't leak into rule groups
    assert(RobotsTxt.rulesFor(content, "any") ==
      Seq(RobotsTxt.Rule(false, "/tmp")))
  }

  test("build: recursion, cycle cut, unfetched drop, dedup, robots decision") {
    val robots = Seq(
      ("a.com", "User-agent: *\nDisallow: /priv\n" +
        "Sitemap: http://a.com/index.xml\n"),
      // a host with robots but no Sitemap: contributes nothing
      ("c.com", "User-agent: *\nDisallow: /\n")).toDF("rhost", "content")
    val index = Sitemap.fixture(Seq(
      ("http://a.com/s1.xml", None, None, None),
      ("http://a.com/index.xml", None, None, None), // self-cycle
      ("http://a.com/never-fetched.xml", None, None, None)), index = true)
    val s1 = Sitemap.fixture(Seq(
      ("http://a.com/page?z=1&utm_campaign=x&a=2", Some("2026-03-01"),
       None, Some(0.8)),
      ("http://www.a.com/page?a=2&z=1", None, None, None), // same canonical
      ("http://a.com/priv/secret", None, None, None)))
    val fetched = Seq(
      ("http://a.com/index.xml", index),
      ("http://a.com/s1.xml", s1)).toDF("url", "xml")
    val got = Frontier.build(robots, "rhost", "content",
        fetched, "url", "xml", "bot")
      .orderBy(col("canonical_url")).collect()
    assert(got.length == 2)
    val page = got.find(_.getAs[String]("canonical_url")
      .endsWith("/page?a=2&z=1")).get
    // keeper is the min raw url — the non-www spelling sorts first —
    // and carries ITS lastmod/priority
    assert(page.getAs[String]("url") ==
      "http://a.com/page?z=1&utm_campaign=x&a=2")
    assert(page.getAs[String]("lastmod") == "2026-03-01")
    assert(page.getAs[Double]("priority") == 0.8)
    assert(page.getAs[Boolean]("allowed"))
    val priv = got.find(_.getAs[String]("url").contains("/priv/")).get
    assert(!priv.getAs[Boolean]("allowed"))
  }

  test("build: depth bound stops runaway chains; empty seeds yield empty frame") {
    // a 5-deep chain under maxDepth=2 only surfaces the first level's
    // URLs (depth 0 parses the seed index, depth 1 parses s1)
    val robots = Seq(("h.com",
      "User-agent: *\nSitemap: http://h.com/d0.xml\n")).toDF("rhost", "content")
    val chain = (0 until 5).map { i =>
      (s"http://h.com/d$i.xml", Sitemap.fixture(Seq(
        (s"http://h.com/d${i + 1}.xml", None, None, None)), index = true))
    } :+ (("http://h.com/d5.xml", Sitemap.fixture(Seq(
      ("http://h.com/leaf", None, None, None)))))
    val fetched = chain.toDF("url", "xml")
    val got = Frontier.build(robots, "rhost", "content",
      fetched, "url", "xml", "bot", maxDepth = 2)
    assert(got.count() == 0) // depth 0/1 are all index docs, no urls
    val full = Frontier.build(robots, "rhost", "content",
      fetched, "url", "xml", "bot", maxDepth = 10)
    assert(full.select(col("url")).as[String].collect().toSeq ==
      Seq("http://h.com/leaf"))
    val none = Frontier.build(
      Seq(("x.com", "User-agent: *\nDisallow:\n")).toDF("rhost", "content"),
      "rhost", "content", fetched, "url", "xml", "bot")
    assert(none.count() == 0)
  }

  test("hostile sitemap documents drop without killing the walk") {
    val robots = Seq(("a.com",
      "User-agent: *\nSitemap: http://a.com/idx.xml\n")).toDF("rhost", "content")
    val idx = Sitemap.fixture(Seq(
      ("http://a.com/good.xml", None, None, None),
      ("http://a.com/evil.xml", None, None, None),
      ("http://a.com/junk.xml", None, None, None)), index = true)
    val fetched = Seq(
      ("http://a.com/idx.xml", idx),
      ("http://a.com/good.xml", Sitemap.fixture(Seq(
        ("http://a.com/page", None, None, None)))),
      // hostile DOCTYPE (the XXE probe SitemapSpec refuses loudly)
      ("http://a.com/evil.xml", "<?xml version=\"1.0\"?>" +
        "<!DOCTYPE x [<!ENTITY e SYSTEM \"file:///etc/passwd\">]>" +
        "<urlset><url><loc>http://a.com/stolen&e;</loc></url></urlset>"),
      // junk bytes built with escapes, not literals (literal NULs
      // would make git treat this source file as binary)
      ("http://a.com/junk.xml", "not xml at all \u0000\u0001"))
      .toDF("url", "xml")
    val got = Frontier.build(robots, "rhost", "content",
      fetched, "url", "xml", "bot")
    assert(got.select(col("url")).as[String].collect().toSeq ==
      Seq("http://a.com/page"))
  }

  test("gzipped sitemaps walk: .xml.gz children, string AND binary columns") {
    val robots = Seq(("a.com",
      "User-agent: *\nSitemap: http://a.com/idx.xml\n")).toDF("rhost", "content")
    val idx = Sitemap.fixture(Seq(
      ("http://a.com/plain.xml", None, None, None),
      ("http://a.com/zipped.xml.gz", None, None, None)), index = true)
    val plain = Sitemap.fixture(Seq(
      ("http://a.com/p1", None, None, None)))
    val zipped = Sitemap.gzipped(Sitemap.fixture(Seq(
      ("http://a.com/p2", None, None, None))))

    // string column: the gz payload rides ISO-8859-1-decoded
    // (byte-transparent), recovered by magic
    val asString = Seq(
      ("http://a.com/idx.xml", idx),
      ("http://a.com/plain.xml", plain),
      ("http://a.com/zipped.xml.gz",
        new String(zipped, java.nio.charset.StandardCharsets.ISO_8859_1)))
      .toDF("url", "xml")
    val gotS = Frontier.build(robots, "rhost", "content",
      asString, "url", "xml", "bot")
    assert(gotS.select(col("url")).as[String].collect().sorted.toSeq ==
      Seq("http://a.com/p1", "http://a.com/p2"))

    // binary column: raw crawl payloads straight through
    val asBytes = Seq(
      ("http://a.com/idx.xml", idx.getBytes("UTF-8")),
      ("http://a.com/plain.xml", plain.getBytes("UTF-8")),
      ("http://a.com/zipped.xml.gz", zipped))
      .toDF("url", "xml")
    val gotB = Frontier.build(robots, "rhost", "content",
      asBytes, "url", "xml", "bot")
    assert(gotB.select(col("url")).as[String].collect().sorted.toSeq ==
      Seq("http://a.com/p1", "http://a.com/p2"))

    // a gzip bomb past the 50 MB protocol cap drops like any other
    // hostile document (per-document Try), the walk survives
    val bomb = Sitemap.gzipped(new String(Array.fill(64 << 20)(' ')))
    val withBomb = Seq(
      ("http://a.com/idx.xml", idx.getBytes("UTF-8")),
      ("http://a.com/plain.xml", plain.getBytes("UTF-8")),
      ("http://a.com/zipped.xml.gz", bomb)).toDF("url", "xml")
    val gotBomb = Frontier.build(robots, "rhost", "content",
      withBomb, "url", "xml", "bot")
    assert(gotBomb.select(col("url")).as[String].collect().toSeq ==
      Seq("http://a.com/p1"))
  }

  test("relative or malformed <loc> entries drop, never a defaulted decision") {
    val robots = Seq(("a.com",
      "User-agent: *\nDisallow: /\nAllow: /ok\n" +
        "Sitemap: http://a.com/s.xml\n")).toDF("rhost", "content")
    val s = Sitemap.fixture(Seq(
      ("http://a.com/ok/page", None, None, None),
      ("/relative/page", None, None, None), // no authority: dropped
      ("not a url", None, None, None)))
    val fetched = Seq(("http://a.com/s.xml", s)).toDF("url", "xml")
    val got = Frontier.build(robots, "rhost", "content",
      fetched, "url", "xml", "bot").collect()
    // under the old "/"-default the relative rows would have ridden
    // the site-root Disallow into the frame as allowed=false rows
    assert(got.map(_.getAs[String]("url")).toSeq ==
      Seq("http://a.com/ok/page"))
    assert(got.head.getAs[Boolean]("allowed"))
  }

  test("feed children walk, crawl_delay rides along, broken docs drop") {
    val robots = Seq(
      ("a.com", "User-agent: *\nDisallow: /x\nCrawl-delay: 2.5\n" +
        "Sitemap: http://a.com/idx.xml\n"),
      ("b.com", "User-agent: *\nDisallow: /\n" +
        "Sitemap: http://b.com/feed.atom\n")).toDF("rhost", "content")
    val idx = Sitemap.fixture(Seq(
      ("http://a.com/feed.xml", None, None, None), // RSS child
      ("http://a.com/broken.xml", None, None, None)), index = true)
    val feed = Sitemap.rssFixture(Seq(
      ("http://a.com/p1", Some("2026-01-02")),
      ("http://a.com/x/p2", None)))
    val atom = Sitemap.atomFixture(Seq(("http://b.com/q1", None)))
    val fetched = Seq(
      ("http://a.com/idx.xml", idx),
      ("http://a.com/feed.xml", feed),
      // malformed document: contributes nothing, bumps the
      // frontier.sitemap_parse_failures accumulator (UI-observable)
      ("http://a.com/broken.xml", "this is not xml at all"),
      ("http://b.com/feed.atom", atom)).toDF("url", "xml")
    val got = Frontier.build(robots, "rhost", "content",
      fetched, "url", "xml", "bot").orderBy("url").collect()
    assert(got.map(_.getAs[String]("url")).toSeq ==
      Seq("http://a.com/p1", "http://a.com/x/p2", "http://b.com/q1"))
    assert(got(0).getAs[Boolean]("allowed"))
    assert(!got(1).getAs[Boolean]("allowed")) // /x prefix disallowed
    assert(!got(2).getAs[Boolean]("allowed")) // b.com disallows all
    assert(got(0).getAs[String]("lastmod") == "2026-01-02")
    assert(got(0).getAs[Double]("crawl_delay") == 2.5)
    assert(got(1).getAs[Double]("crawl_delay") == 2.5)
    assert(got(2).isNullAt(got(2).fieldIndex("crawl_delay")))
  }

  test("plan shape: level joins broadcast, rule frame broadcasts") {
    val robots = Seq(("a.com",
      "User-agent: *\nDisallow: /x\nSitemap: http://a.com/s.xml\n"))
      .toDF("rhost", "content")
    val fetched = Seq(("http://a.com/s.xml", Sitemap.fixture(Seq(
      ("http://a.com/p1", None, None, None))))).toDF("url", "xml")
    val plan = Frontier.build(robots, "rhost", "content",
      fetched, "url", "xml", "bot").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "frontier joins must broadcast")
    assert(!plan.contains("SortMergeJoin"), "no corpus-wide sort-merge join")
  }
}
