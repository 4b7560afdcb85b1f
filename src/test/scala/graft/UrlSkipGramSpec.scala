package graft

import org.apache.spark.sql.functions._

import graft.llm.{SkipGram, UrlCanon}

/** Hand-case semantics for the URL canonicalizer and the skip-gram
  * pair generator (q222/q223); the oracle gate proves engine
  * equivalence, these prove the intended normalizations/pairs. */
class UrlSkipGramSpec extends SparkSpec {
  import spark.implicits._

  private def canon(u: String): String =
    Seq(u).toDF("url").select(UrlCanon.canonicalize(col("url")).as("c"))
      .head().getString(0)

  test("canonicalize: case, default port, www, slash, utm, param order, fragment") {
    assert(canon("HTTP://WWW.Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag")
      == "http://example.com/a/b?a=1&b=2")
    assert(canon("http://example.com/a/b?a=1&b=2")
      == "http://example.com/a/b?a=1&b=2") // already canonical: fixpoint
    assert(canon("https://Site.com:443/index.html") == "https://site.com/")
    assert(canon("https://site.com") == "https://site.com/")
    // non-default port and path case are preserved
    assert(canon("https://site.com:8080/Camel/Case")
      == "https://site.com:8080/Camel/Case")
    // http does not strip :443 (not its default)
    assert(canon("http://site.com:443/x") == "http://site.com:443/x")
    // all params tracking -> no query at all
    assert(canon("https://a.org/p?utm_a=1&utm_b=2") == "https://a.org/p")
  }

  test("canonicalize: click-id keys strip; lookalikes survive") {
    // the standard click-id set strips by KEY (value irrelevant)
    assert(canon("https://a.org/p?fbclid=IwAR123&x=1")
      == "https://a.org/p?x=1")
    assert(canon("https://a.org/p?gclid=Cj0&msclkid=m1&mc_eid=e&yclid=9")
      == "https://a.org/p")
    // bare tracker key (no '=') strips too
    assert(canon("https://a.org/p?igshid&a=2") == "https://a.org/p?a=2")
    // lookalike keys are NOT in the set: a PREFIX match would eat them
    assert(canon("https://a.org/p?fbclid2=keep&gclid_x=keep")
      == "https://a.org/p?fbclid2=keep&gclid_x=keep")
    // tracker string in the VALUE never strips
    assert(canon("https://a.org/p?q=fbclid") == "https://a.org/p?q=fbclid")
  }

  test("dupGroups: spellings of one page collapse; keeper is min id") {
    val df = Seq(
      (3L, "HTTP://WWW.site.com:80/p/?b=2&a=1"),
      (7L, "http://site.com/p?a=1&b=2"),
      (5L, "https://site.com/p?a=1&b=2")).toDF("id", "url")
    val out = UrlCanon.dupGroups(df, "id", "url")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("http://site.com/p?a=1&b=2") == ((2L, 2L, 3L)))
    assert(out("https://site.com/p?a=1&b=2") == ((1L, 1L, 5L)))
  }

  test("skip-gram pairs: window, symmetry, repeated tokens, minCount") {
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val out = SkipGram.pairs(docs, "doc_id", "text", window = 2,
        minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // forward at distance 1 and 2, flipped for the symmetric direction
    assert(out(("a", "b")) == 1L && out(("b", "a")) == 1L)
    assert(out(("a", "c")) == 1L && out(("c", "a")) == 1L)
    assert(!out.contains(("a", "d"))) // distance 3 > window
    assert(out.size == 10) // 5 forward pairs, both directions
    // self-pairs from token runs count per occurrence
    val runs = Seq((1L, "x x x")).toDF("doc_id", "text")
    val r = SkipGram.pairs(runs, "doc_id", "text", window = 1, minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(r(("x", "x")) == 4L) // 2 forward + 2 flipped
    // minCount prunes
    assert(SkipGram.pairs(docs, "doc_id", "text", window = 2,
      minCount = 2L).count() == 0L)
  }

  test("negativeTable: draws conserved, ^0.75 weights exact, frequency bias") {
    // corpus: 'a' x8, 'b' x1 -> weights 8^0.75 and 1 in micro-units
    val docs = Seq((1L, "a a a a a a a a b")).toDF("doc_id", "text")
    val out = SkipGram.negativeTable(docs, "text", nDraws = 500)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("a")._1 == 8L && out("b")._1 == 1L)
    // sqrt-composed 3/4 power: sqrt(8*sqrt(8))*1e6 rounds to 4756828
    assert(out("a")._2 == 4756828L)
    assert(out("b")._2 == 1000000L)
    // every draw lands in exactly one interval
    assert(out("a")._3 + out("b")._3 == 500L)
    // p(a) = 0.826: the frequent word must dominate the noise draws
    assert(out("a")._3 > out("b")._3)
    // deterministic end to end
    val again = SkipGram.negativeTable(docs, "text", nDraws = 500)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(again("a") == out("a")._3 && again("b") == out("b")._3)
  }
}
