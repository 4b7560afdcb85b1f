package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share word
  * n-gram shingles with a held-out evaluation set, so eval questions
  * that leaked into the crawl are dropped (or at least known) before
  * training. This is the standard n-gram-overlap decontamination pass
  * of large-corpus pipelines — distinct from the intra-corpus dedup
  * family (q23/q28/q91): the comparison is corpus × BENCHMARK, and the
  * asymmetry is the scale lever.
  */
object Decontaminate {

  /** Per corpus document: how many of its DISTINCT word n-gram
    * shingles appear anywhere in the benchmark set, the overlap ratio
    * against its own shingle count, and the contamination flag at
    * `minHits`. Only documents with at least one hit are returned
    * (the clean corpus vastly outnumbers the flagged slice; a
    * downstream anti-join removes flagged ids from training).
    *
    * Scale shape: the benchmark's distinct shingle set is tiny next
    * to a 100 TB corpus (eval suites are MBs), so it is distinct'd
    * and BROADCAST; the corpus side is scan → explode → broadcast
    * hash join → per-doc count — the corpus never shuffles by
    * shingle, and the only exchange is the per-doc hit aggregation
    * (doc-cardinality, map-side combined). Shingles join as raw
    * n-gram strings for oracle portability; at petabyte scale the
    * same plan runs on xxhash64(shingle) to shrink the broadcast and
    * the probe keys — the join shape is unchanged. */
  def overlapAudit(corpus: DataFrame, bench: DataFrame, idCol: String,
                   textCol: String, n: Int, minHits: Int): DataFrame = {
    def shingled(df: DataFrame) =
      df.select(col(idCol), array_distinct(
        TextStats.ngramsOfTokens(TextStats.tokens(col(textCol)), n)).as("__g"))
    val benchSet = shingled(bench)
      .select(explode(col("__g")).as("__t")).distinct()
    val c = shingled(corpus)
    val hits = c.select(col(idCol), explode(col("__g")).as("__t"))
      .join(broadcast(benchSet), "__t")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
    c.select(col(idCol), size(col("__g")).cast("long").as("n_shingles"))
      .join(hits, Seq(idCol))
      .select(col(idCol), col("n_shingles"), col("n_hits"),
              round(col("n_hits").cast("double") /
                    greatest(col("n_shingles"), lit(1L)).cast("double"), 4)
                .as("overlap_ratio"),
              (col("n_hits") >= minHits).as("contaminated"))
  }
}
