package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, fingerprinting.
  * All pure Catalyst expressions (split / higher-order functions /
  * regexp) — they run inside whole-stage codegen with no UDFs and
  * scale linearly with no shuffle.
  */
object TextStats {

  /** Whitespace tokenization (the BPE-ish regex variant below for
    * punctuation-aware counting). */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish token estimate: word pieces + digits + punctuation runs. */
  def bpeishTokens(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  def charCount(c: Column): Column = length(c)

  /** Ratio of characters that are punctuation/symbols. */
  def punctRatio(c: Column): Column =
    size(regexp_extract_all(c, lit("[^A-Za-z0-9\\s]"), lit(0)))
      .cast("double") / greatest(length(c), lit(1)).cast("double")

  /** Fraction of tokens found in `stopwords` — a cheap fluency signal. */
  def stopwordRatio(c: Column, stopwords: Seq[String]): Column =
    size(filter(tokens(c), t => t.isInCollection(stopwords)))
      .cast("double") / greatest(size(tokens(c)), lit(1)).cast("double")

  /** Mean token length — with char and token counts, the core of a
    * length/punct/stopword quality score. */
  def avgTokenLen(c: Column): Column = {
    val t = tokens(c)
    aggregate(t, lit(0), (acc, x) => acc + length(x)).cast("double") /
      greatest(size(t), lit(1)).cast("double")
  }

  /** Marker-word language ID (n-gram-heuristic family): count hits from
    * tiny per-language stopword lists over the token set, argmax with a
    * fixed priority order, 'und' when nothing matches. Deterministic and
    * SQL-mirrorable. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "de" -> Seq("der", "die", "das", "und"),
    "fr" -> Seq("le", "la", "et", "les"))

  def langScores(c: Column): Seq[(String, Column)] = {
    val t = tokens(c)
    langMarkers.map { case (lang, words) =>
      lang -> size(filter(t, x => x.isInCollection(words)))
    }
  }

  def langId(c: Column): Column = {
    val scores = langScores(c)
    val total = scores.map(_._2).reduce(_ + _)
    // nested CASE with fixed tie priority (en > de > fr):
    val Seq(en, de, fr) = scores.map(_._2)
    when(total === 0, lit("und"))
      .when(en >= de && en >= fr, lit("en"))
      .when(de >= fr, lit("de"))
      .otherwise(lit("fr"))
  }

  /** Vocabulary extraction: the k most frequent whitespace tokens with
    * a deterministic (freq desc, token asc) tiebreak. Partial counts
    * combine map-side; the final top-k is TakeOrdered (per-partition
    * heaps + driver merge of k·partitions rows), never a full sort. */
  def topTokens(df: org.apache.spark.sql.DataFrame, textCol: String,
                k: Int): org.apache.spark.sql.DataFrame =
    df.select(explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token").asc)
      .limit(k)

  /** Document fingerprint: md5 over whitespace-normalized lowercase
    * text, truncated to 64 bits of hex — stable across engines (vs
    * xxhash64, which DuckDB lacks). */
  def fingerprint(c: Column): Column =
    substring(md5(lower(trim(regexp_replace(c, "\\s+", " ")))), 1, 16)

  /** Rolling (polynomial) hash over the normalized text, reduced mod
    * 2^31 at every step: never overflows a long (ANSI mode throws on
    * long overflow, so the classic wrapping h*31+c is a trap here),
    * and plain modular arithmetic keeps it SQL-mirrorable. */
  def rollingHash64(c: Column): Column = {
    val norm = lower(trim(regexp_replace(c, "\\s+", " ")))
    aggregate(
      split(norm, ""),
      lit(0L),
      (acc, ch) => (acc * 31L + coalesce(ascii(ch).cast("long"), lit(0L)))
        % 2147483648L)
  }
}
