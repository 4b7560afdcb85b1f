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
