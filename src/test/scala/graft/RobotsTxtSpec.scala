package graft

import org.apache.spark.sql.functions._
import graft.llm.RobotsTxt
import graft.llm.RobotsTxt.Rule

/** RFC 9309 robots engine: grouping, agent selection, wildcard/$
  * translation, longest-match with the Allow tie-break, and the
  * broadcast Spark filter path. Worked decisions follow the RFC's
  * own §2.2.2 and §5.2 examples. */
class RobotsTxtSpec extends SparkSpec {
  import spark.implicits._

  private val robots =
    """# crawl policy
      |User-agent: graftbot
      |Disallow: /private/
      |Allow: /private/ok*
      |
      |User-agent: *
      |Disallow: /tmp/*.bak$
      |Disallow: /search
      |Allow: /search/about
      |Crawl-delay: 5
      |Sitemap: http://x/sitemap.xml
      |""".stripMargin

  test("agent group selection: named beats *, unknown agent gets *") {
    val named = RobotsTxt.rulesFor(robots, "GraftBot")
    assert(named == Seq(Rule(false, "/private/"), Rule(true, "/private/ok*")))
    val star = RobotsTxt.rulesFor(robots, "otherbot")
    assert(star == Seq(Rule(false, "/tmp/*.bak$"),
      Rule(false, "/search"), Rule(true, "/search/about")))
    assert(RobotsTxt.rulesFor("User-agent: x\nDisallow: /", "y").isEmpty)
  }

  test("crawl-delay: group-scoped, named-group selection, junk ignored") {
    val content =
      """User-agent: graftbot
        |Crawl-delay: 2.5
        |Disallow: /x
        |
        |User-agent: *
        |Crawl-delay: 10
        |Disallow: /
        |""".stripMargin
    assert(RobotsTxt.crawlDelay(content, "graftbot") == Some(2.5))
    assert(RobotsTxt.crawlDelay(content, "GraftBot") == Some(2.5))
    assert(RobotsTxt.crawlDelay(content, "other") == Some(10.0))
    // a named group WITHOUT a delay never falls through to * (same
    // group selection as the rules)
    val noDelay = "User-agent: graftbot\nDisallow: /a\n\n" +
      "User-agent: *\nCrawl-delay: 7\n"
    assert(RobotsTxt.crawlDelay(noDelay, "graftbot").isEmpty)
    assert(RobotsTxt.crawlDelay(noDelay, "anyone") == Some(7.0))
    // junk, negative, and parked-forever values ignore; first wins
    assert(RobotsTxt.crawlDelay(
      "User-agent: *\nCrawl-delay: soon\n", "x").isEmpty)
    assert(RobotsTxt.crawlDelay(
      "User-agent: *\nCrawl-delay: -3\n", "x").isEmpty)
    assert(RobotsTxt.crawlDelay(
      "User-agent: *\nCrawl-delay: 9999999\n", "x").isEmpty)
    assert(RobotsTxt.crawlDelay(
      "User-agent: *\nCrawl-delay: 3\nCrawl-delay: 9\n", "x") == Some(3.0))
    // and the directive still doesn't disturb rule parsing
    assert(RobotsTxt.rulesFor(content, "graftbot") ==
      Seq(RobotsTxt.Rule(false, "/x")))
  }

  test("UTF-8 BOM strips: the leading group must not silently vanish") {
    // Windows editors save robots.txt with a BOM; without stripping
    // it the first field name is BOM+"user-agent" and the whole
    // leading group disappears
    val bom = "\uFEFF" + "User-agent: graftbot\nDisallow: /x\n" +
      "Sitemap: http://a.com/s.xml\n"
    assert(RobotsTxt.rulesFor(bom, "graftbot") == Seq(Rule(false, "/x")))
    assert(RobotsTxt.sitemaps(bom) == Seq("http://a.com/s.xml"))
  }

  test("RFC 9309 §2.2.1: groups sharing a user-agent token merge") {
    // two 'User-agent: graftbot' groups — rules combine, and a delay
    // carried by only the SECOND group is still found
    val twoGroups =
      """User-agent: graftbot
        |Disallow: /a
        |
        |User-agent: graftbot
        |Crawl-delay: 4
        |Disallow: /b
        |
        |User-agent: *
        |Crawl-delay: 60
        |Disallow: /
        |""".stripMargin
    assert(RobotsTxt.rulesFor(twoGroups, "graftbot") ==
      Seq(Rule(false, "/a"), Rule(false, "/b")))
    assert(RobotsTxt.crawlDelay(twoGroups, "graftbot") == Some(4.0))
    assert(RobotsTxt.isAllowed(
      RobotsTxt.rulesFor(twoGroups, "graftbot"), "/b/x") == false)
    // same for split * groups on the fallback path
    val twoStars = "User-agent: *\nDisallow: /x\n\n" +
      "User-agent: *\nCrawl-delay: 2\n"
    assert(RobotsTxt.crawlDelay(twoStars, "anybot") == Some(2.0))
    assert(RobotsTxt.rulesFor(twoStars, "anybot") == Seq(Rule(false, "/x")))
    // ANY named group existing suppresses * entirely — even when the
    // named groups carry no delay at all
    val namedNoDelay = "User-agent: graftbot\nDisallow: /a\n\n" +
      "User-agent: graftbot\nDisallow: /b\n\n" +
      "User-agent: *\nCrawl-delay: 9\n"
    assert(RobotsTxt.crawlDelay(namedNoDelay, "graftbot").isEmpty)
  }

  test("longest-match decisions, wildcards, anchors, Allow tie-break") {
    val r = RobotsTxt.rulesFor(robots, "otherbot")
    assert(RobotsTxt.isAllowed(r, "/index.html"))
    assert(!RobotsTxt.isAllowed(r, "/search"))
    assert(!RobotsTxt.isAllowed(r, "/search/results?q=1"))
    assert(RobotsTxt.isAllowed(r, "/search/about"))      // longer Allow wins
    assert(!RobotsTxt.isAllowed(r, "/tmp/a.bak"))        // $ anchors
    assert(RobotsTxt.isAllowed(r, "/tmp/a.bak.txt"))     // past the anchor
    val g = RobotsTxt.rulesFor(robots, "graftbot")
    assert(!RobotsTxt.isAllowed(g, "/private/x"))
    assert(RobotsTxt.isAllowed(g, "/private/ok/page"))   // wildcard Allow
    // Allow wins an exact-length tie (RFC 9309 §2.2.2)
    val tie = Seq(Rule(false, "/page"), Rule(true, "/page"))
    assert(RobotsTxt.isAllowed(tie, "/page/x"))
    // regex metacharacters in paths are literal
    val meta = Seq(Rule(false, "/a.b(c)+"))
    assert(!RobotsTxt.isAllowed(meta, "/a.b(c)+/d"))
    assert(RobotsTxt.isAllowed(meta, "/aXb(c)+/d"))
    // implementer limits: a hostile kilobyte-plus wildcard pattern is
    // skipped at parse (conservative: unparsed rules don't disallow)
    val hostile = "User-agent: *\nDisallow: /" + ("a*" * 600) + "\n" +
      "Disallow: /real\n"
    assert(RobotsTxt.rulesFor(hostile, "x") == Seq(Rule(false, "/real")))
  }

  test("withAllowed: broadcast rule join, per-URL decision, ruleless hosts allow") {
    val robotsDf = Seq(
      ("x.com", robots),
      ("empty.com", "User-agent: *\n")).toDF("host", "content")
    val urls = Seq(
      (1L, "x.com", "/index.html"),
      (2L, "x.com", "/search"),
      (3L, "x.com", "/search/about"),
      (4L, "x.com", "/tmp/old.bak"),
      // $-anchored rule must NOT match a path extending past the
      // anchor under regexp_like's find semantics (the Spark path)
      (7L, "x.com", "/tmp/old.bak.txt"),
      (5L, "empty.com", "/anything"),
      (6L, "norobots.com", "/whatever")).toDF("id", "host", "path")
    val got = RobotsTxt.withAllowed(urls, "host", "path",
        robotsDf, "host", "content", "otherbot")
      .select(col("id"), col("allowed")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> true, 4L -> false,
      7L -> true, 5L -> true, 6L -> true))
    val plan = RobotsTxt.withAllowed(urls, "host", "path",
      robotsDf, "host", "content", "otherbot")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "rules must broadcast")
  }
}
