package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization — the first dedup key a web-scale corpus is
  * grouped by, BEFORE any text hashing: the same page is typically
  * crawled under many raw spellings (scheme/host case, default ports,
  * `www.` prefixes, trailing slashes, `index.html`, tracking params,
  * fragments, query-param order). Canonicalizing collapses those
  * spellings so URL-level dedup catches what exact text hashing pays
  * a full content pass for.
  *
  * Reference scope: the reference engine has no URL layer (it ingests
  * typed API feeds); this operator belongs to the training-data
  * pipeline mandate (the q23 exact-dedup family's upstream key).
  *
  * Scale shape: [[canonicalize]] is a pure per-row Column expression —
  * regex extracts + an array sort over the handful of query params —
  * entirely inside whole-stage codegen, no UDF, no shuffle. The only
  * exchange in [[dupGroups]] is the final groupBy on the canonical
  * string (map-side combined).
  */
object UrlCanon {

  /** Tracking params stripped by key (the standard click-id set:
    * Facebook, Google Ads, Microsoft, Mailchimp, Instagram,
    * Yandex) — these vary per CLICK, so leaving any one of them
    * keeps every duplicate spelling distinct. `utm_*` strips by
    * prefix. */
  private[graft] val TrackerKeys: Seq[String] = Seq(
    "fbclid", "gclid", "gclsrc", "dclid", "wbraid", "gbraid",
    "msclkid", "mc_cid", "mc_eid", "igshid", "yclid")

  /** Canonical form of an http(s) URL:
    *   - scheme and host lowercased; `www.` prefix and default ports
    *     (`:80` http, `:443` https) dropped
    *   - fragment dropped; `/index.html` suffix and trailing slashes
    *     normalized away (empty path → `/`, path case preserved)
    *   - query params: `utm_*`-prefixed keys, the [[TrackerKeys]]
    *     click-id set, and empties dropped; the rest sorted
    *     byte-wise for order independence
    * Malformed input (no `scheme://`) canonicalizes from whatever the
    * regexes match — empty scheme/host — rather than erroring. */
  def canonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostRaw =
      lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    val hostNoPort = when(scheme === "http", regexp_replace(hostRaw, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostRaw, ":443$", ""))
      .otherwise(hostRaw)
    val host = regexp_replace(hostNoPort, "^www\\.", "")
    val pathRaw =
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    val stripped =
      regexp_replace(regexp_replace(pathRaw, "/index\\.html$", "/"), "/+$", "")
    val path = when(stripped === "", lit("/")).otherwise(stripped)
    // Anchored to the pre-fragment prefix: a bare "\\?([^#]*)" matches
    // the first '?' ANYWHERE, including inside a fragment, so
    // `http://a/p#frag?x=1` would resurrect `x=1` as a query and break
    // the fragment-dropped contract. The lazy "[^#]*?" prefix pins the
    // match to the first '?' that precedes any '#'.
    val qRaw = regexp_extract(url, "^[^#]*?\\?([^#]*)", 1)
    val params = array_sort(filter(split(qRaw, "&"), p => {
      // key = the part before '=' (a bare key is its own key)
      val k = substring_index(p, "=", 1)
      p =!= "" && !k.startsWith("utm_") && !k.isInCollection(TrackerKeys)
    }))
    val qs = array_join(params, "&")
    concat(scheme, lit("://"), host, path,
      when(qs === "", lit("")).otherwise(concat(lit("?"), qs)))
  }

  /** URL-level dedup groups: one row per canonical URL with how many
    * raw spellings and rows collapsed into it and the keeper (min id —
    * the deterministic survivor convention of the dedup family).
    * Output: (canonical_url, n_raw_forms, n_docs, keeper_id). */
  def dupGroups(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(col(idCol).as("__id"), col(urlCol).as("__url"))
      .withColumn("canonical_url", canonicalize(col("__url")))
      .groupBy(col("canonical_url"))
      .agg(countDistinct(col("__url")).as("n_raw_forms"),
           count(lit(1)).as("n_docs"),
           min(col("__id")).as("keeper_id"))
}
