package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** robots.txt (RFC 9309) — the crawl-permission filter an honest
  * web-scale intake runs before fetching or keeping a page.
  *
  * Parsing: `#` comments strip anywhere, field names are
  * case-insensitive, consecutive `User-agent` lines open one group,
  * `Allow`/`Disallow` rules and the de-facto `Crawl-delay` attach to
  * the open group(s) (`Sitemap:` is a global record — see
  * [[sitemaps]]); other unknown fields are ignored per spec. Group
  * selection: the group naming the crawler's product token
  * (case-insensitive exact token) wins over the `*` group; no match
  * → everything is allowed.
  *
  * Matching (RFC 9309 §2.2.2): rule paths match as prefixes with
  * `*` wildcards and a `$` end anchor; the decision is the matching
  * rule with the LONGEST pattern (octet length), ties broken in
  * favor of Allow; no matching rule → allowed. Empty `Disallow:` is
  * a no-op rule (matches nothing).
  *
  * The Spark path keeps rule frames tiny ((host, rule) rows — a few
  * per host) and BROADCASTS them into the URL frame: per-URL work is
  * a narrow regexp over the handful of host rules, aggregated by
  * max((length, allow)) — no window, no shuffle of the corpus.
  */
object RobotsTxt {

  case class Rule(allow: Boolean, pattern: String)

  private[graft] case class Group(agents: Seq[String], rules: Seq[Rule],
                                  crawlDelay: Option[Double] = None)

  /** Robots files routinely open with a UTF-8 BOM (saved from
    * Windows editors); without stripping it the first line's field
    * name parses as BOM+"user-agent" and the whole leading group
    * silently disappears. */
  private def stripBom(s: String): String =
    if (s.nonEmpty && s.charAt(0) == '\uFEFF') s.substring(1) else s

  private[graft] def parseGroups(raw: String): Seq[Group] = {
    val content = stripBom(raw)
    val groups = scala.collection.mutable.ArrayBuffer[Group]()
    var agents = scala.collection.mutable.ArrayBuffer[String]()
    var rules = scala.collection.mutable.ArrayBuffer[Rule]()
    var delay: Option[Double] = None
    var inAgents = false
    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents.toSeq, rules.toSeq, delay)
      agents = scala.collection.mutable.ArrayBuffer[String]()
      rules = scala.collection.mutable.ArrayBuffer[Rule]()
      delay = None
    }
    content.split("\n").foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val c = line.indexOf(':')
      if (c > 0) {
        val field = line.substring(0, c).trim.toLowerCase
        val value = line.substring(c + 1).trim
        field match {
          case "user-agent" =>
            if (!inAgents) flush()
            agents += value.toLowerCase
            inAgents = true
          case "allow" | "disallow" =>
            inAgents = false
            // implementer limits (RFC 9309 §2.5 sanctions them): a
            // hostile pattern of interleaved wildcards is a regex-
            // backtracking DoS primitive, and a hostile file can
            // carry millions of rules — skip past both bounds,
            // matching the conservative reading (unparsed rules
            // don't disallow)
            if (value.nonEmpty && value.length <= 1024 &&
                rules.size < 2000)
              rules += Rule(field == "allow", value)
          case "crawl-delay" =>
            // de-facto extension (Bing/Yandex honor it; not RFC 9309
            // but group-scoped by universal convention). First value
            // in a group wins; junk or negative values ignore —
            // crawled robots files lie. Clamped to a day so one
            // hostile file can't park a scheduler.
            inAgents = false
            if (delay.isEmpty)
              delay = value.toDoubleOption
                .filter(d => d >= 0 && d <= 86400 && !d.isNaN)
          case _ => inAgents = false // sitemap, host, …
        }
      }
    }
    flush()
    groups.toSeq
  }

  /** ALL groups governing `agent` — RFC 9309 §2.2.1 merges groups
    * sharing a user-agent token into one logical group, so a file
    * with two `User-agent: bot` groups contributes BOTH groups'
    * rules/delay. Named groups win over `*` (never both). */
  private def groupsFor(groups: Seq[Group], agent: String): Seq[Group] = {
    val a = agent.toLowerCase
    val named = groups.filter(_.agents.contains(a))
    if (named.nonEmpty) named else groups.filter(_.agents.contains("*"))
  }

  /** `Crawl-delay` (seconds) governing `agent`: the first defined
    * value across its named groups (RFC 9309 merges same-token
    * groups) if any name it, else across the `*` groups (a named
    * group with no delay means "no delay for you", never a
    * fall-through to `*`). */
  def crawlDelay(content: String, agent: String): Option[Double] =
    groupsFor(parseGroups(content), agent)
      .flatMap(_.crawlDelay).headOption

  /** (host, crawl_delay) rows for `agent` — null where the selected
    * group carries no delay; the scheduler's broadcastable unit. */
  def crawlDelayFrame(robots: DataFrame, hostCol: String,
                      contentCol: String, agent: String): DataFrame = {
    val spark = robots.sparkSession
    import spark.implicits._
    robots.select(col(hostCol).as("host"), col(contentCol).as("content"))
      .as[(String, String)]
      .map { case (host, content) => (host, crawlDelay(content, agent)) }
      .toDF("host", "crawl_delay")
  }

  /** `Sitemap:` directives — RFC 9309 non-group records, global to
    * the file and independent of any user-agent group. These seed
    * the crawl-frontier walk (see [[graft.sources.Frontier]]);
    * hostile-length values are skipped like oversized rules. */
  def sitemaps(content: String): Seq[String] =
    stripBom(content).split("\n").toSeq.flatMap { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val c = line.indexOf(':')
      if (c > 0 && line.substring(0, c).trim.equalsIgnoreCase("sitemap")) {
        val v = line.substring(c + 1).trim
        if (v.nonEmpty && v.length <= 2048) Some(v) else None
      } else None
    }

  /** The rules governing `agent`: all its named groups' rules
    * combined (RFC 9309 §2.2.1 — same-token groups merge) if any
    * group names it, else all `*` groups' rules, else no rules (all
    * allowed). Longest-match decides, so combination order is
    * immaterial. */
  def rulesFor(content: String, agent: String): Seq[Rule] =
    groupsFor(parseGroups(content), agent).flatMap(_.rules)

  /** RFC 9309 pattern → a regex over the whole path: `*` is any
    * run, a trailing `$` anchors the end (kept as a literal `$` in
    * the regex — harmless under full-match `String.matches`, and
    * REQUIRED under find-semantics matchers like Spark's
    * `regexp_like`, where an unanchored `^/a/.*3` from the rule
    * "slash-a-slash-star-3-dollar" would wrongly prefix-match
    * `/a/x3.txt`), everything
    * else is literal prefix-matched (the unanchored form ends
    * `.*`). */
  def toRegex(pattern: String): String = {
    val anchored = pattern.endsWith("$")
    val body = if (anchored) pattern.dropRight(1) else pattern
    val sb = new StringBuilder("^")
    body.foreach {
      case '*' => sb.append(".*")
      case ch if "\\.[]{}()+-?^$|".indexOf(ch) >= 0 =>
        sb.append('\\').append(ch)
      case ch => sb.append(ch)
    }
    sb.append(if (anchored) "$" else ".*")
    sb.toString
  }

  /** Longest-match decision for one path (Allow wins ties). */
  def isAllowed(rules: Seq[Rule], path: String): Boolean = {
    val hits = rules.filter(r => path.matches(toRegex(r.pattern)))
    if (hits.isEmpty) true
    else hits.maxBy(r => (r.pattern.length, r.allow)).allow
  }

  /** (host, allow, pattern, regex, pat_len) rule rows for `agent`
    * from a (hostCol, contentCol) robots frame — the broadcastable
    * unit. */
  def ruleFrame(robots: DataFrame, hostCol: String, contentCol: String,
                agent: String): DataFrame = {
    val spark = robots.sparkSession
    import spark.implicits._
    robots.select(col(hostCol).as("host"), col(contentCol).as("content"))
      .as[(String, String)]
      .flatMap { case (host, content) =>
        rulesFor(content, agent).map(r =>
          (host, r.allow, r.pattern, toRegex(r.pattern),
           r.pattern.length))
      }
      .toDF("host", "allow", "pattern", "regex", "pat_len")
  }

  /** Filter a URL frame by robots permission: left-join the
    * broadcast rule frame on host, regexp-match each rule against
    * the path (RFC prefix semantics: the anchored regex matches a
    * PREFIX, so match against path with `.*` appended unless the
    * rule anchors), take the longest-match decision per URL, keep
    * allowed (hosts without robots rows allow everything). Adds an
    * `allowed` boolean; callers filter or audit. */
  def withAllowed(urls: DataFrame, hostCol: String, pathCol: String,
                  robots: DataFrame, robotsHostCol: String,
                  robotsContentCol: String, agent: String): DataFrame = {
    val rules = ruleFrame(robots, robotsHostCol, robotsContentCol, agent)
    val u = urls
    u.join(broadcast(rules), u(hostCol) === rules("host"), "left")
      .withColumn("__hit",
        col("regex").isNotNull && regexp_like(u(pathCol), col("regex")))
      .groupBy(u.columns.map(u(_)): _*)
      .agg(coalesce(
        max(when(col("__hit"),
          struct(col("pat_len").as("l"), col("allow").cast("int").as("a"))))
          .getField("a") === 1,
        lit(true)).as("allowed"))
  }
}
