package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.llm.{RobotsTxt, UrlCanon}

/** Crawl-frontier composition — the discovery loop a real intake
  * runs between "we have each host's robots.txt" and "we have a URL
  * list to fetch": robots `Sitemap:` directives seed the walk, each
  * sitemap document either lists page URLs (`urlset`) or recurses
  * into child sitemaps (`sitemapindex`), and the terminal URL
  * entries dedup by canonical form and carry the robots decision for
  * the crawling agent.
  *
  * Zero-egress stand-in for the fetch step: `fetched` is a
  * (url, xml) corpus frame — the crawl's already-archived sitemap
  * responses. Sitemap URLs with no fetched row drop (nothing to
  * parse); a `sitemapindex` cycle is cut by the visited-set
  * anti-join, and depth is bounded by `maxDepth` regardless.
  *
  * Scale shape: the per-level frame is frontier METADATA (a handful
  * of sitemap URLs per host, ≤50k URL entries per document by spec),
  * so each level broadcasts into the fetched-corpus join and the
  * parse is a narrow flatMap; the only corpus-sized exchange is the
  * final canonical-URL dedup groupBy. The robots rule frame
  * broadcasts exactly as in [[graft.llm.RobotsTxt.withAllowed]].
  */
object Frontier {

  /** (host, url, canonical_url, source_sitemap, lastmod, priority,
    * allowed) — one row per canonically-distinct discovered URL;
    * the keeper among duplicate spellings is the min (url,
    * source_sitemap) pair, the dedup family's deterministic-survivor
    * convention. */
  def build(robots: DataFrame, robotsHostCol: String, contentCol: String,
            fetched: DataFrame, urlCol: String, xmlCol: String,
            agent: String, maxDepth: Int = 3): DataFrame = {
    val spark = robots.sparkSession
    import spark.implicits._

    val seeds = robots
      .select(col(robotsHostCol).as("host"), col(contentCol).as("content"))
      .as[(String, String)]
      .flatMap { case (h, c) => RobotsTxt.sitemaps(c).map(u => (h, u)) }
      .toDF("host", "sitemap_url")
      .distinct()

    val docs = fetched.select(col(urlCol).as("__url"), col(xmlCol).as("__xml"))

    var level = seeds
    var visited = seeds
    var urls: Option[DataFrame] = None
    var depth = 0
    while (depth < maxDepth && !level.isEmpty) {
      // localCheckpoint cuts the per-level lineage: without it each
      // level's isEmpty/action re-parses the WHOLE chain above it
      // (O(depth^2) XML parses) — the classic iterative-algorithm
      // lineage blowup
      val entries = docs
        .join(broadcast(level), col("__url") === col("sitemap_url"))
        .select(col("host"), col("sitemap_url"), col("__xml"))
        .as[(String, String, String)]
        .flatMap { case (h, parent, xml) =>
          // crawled sitemap documents lie: a hostile or malformed one
          // (DOCTYPE bomb, junk bytes, wrong root) contributes nothing
          // instead of killing the frontier job — the per-document
          // failure domain a web-scale walk needs
          scala.util.Try(Sitemap.parse(xml)).getOrElse(Seq.empty).map(e =>
            (h, parent, e.kind, e.loc, e.lastmod, e.priority))
        }
        .toDF("host", "source_sitemap", "kind", "loc", "lastmod", "priority")
        .localCheckpoint()
      val urlEntries = entries.filter(col("kind") === "url")
        .select(col("host"), col("source_sitemap"), col("loc"),
                col("lastmod"), col("priority"))
      urls = Some(urls.map(_.unionByName(urlEntries)).getOrElse(urlEntries))
      val children = entries.filter(col("kind") === "sitemap")
        .select(col("host"), col("loc").as("sitemap_url"))
        .distinct()
        .join(broadcast(visited), Seq("host", "sitemap_url"),
          "left_anti") // cycle cut; visited is tiny frontier metadata
      visited = visited.unionByName(children)
      level = children
      depth += 1
    }

    val found = urls.getOrElse {
      Seq.empty[(String, String, String, String, Option[Double])]
        .toDF("host", "source_sitemap", "loc", "lastmod", "priority")
    }

    // canonical dedup: deterministic keeper = min (loc, source) pair
    val kept = found
      .withColumn("canonical_url", UrlCanon.canonicalize(col("loc")))
      .groupBy(col("canonical_url"))
      .agg(min(struct(col("loc"), col("source_sitemap"), col("host"),
        col("lastmod"), col("priority"))).as("k"))
      .select(col("k.host").as("host"), col("k.loc").as("url"),
        col("canonical_url"),
        col("k.source_sitemap").as("source_sitemap"),
        col("k.lastmod").as("lastmod"), col("k.priority").as("priority"))

    // robots decision on path+query (the component rules match on)
    val withPath = kept.withColumn("__path",
      when(regexp_extract(col("url"),
          "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)", 1) === "", lit("/"))
        .otherwise(regexp_extract(col("url"),
          "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)", 1)))
    RobotsTxt.withAllowed(withPath, "host", "__path", robots,
        robotsHostCol, contentCol, agent)
      .drop("__path")
  }
}
