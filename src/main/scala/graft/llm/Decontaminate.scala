package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Distinct (id, shingle) rows via posexplode + lead() — the
    * CODEGEN shingle path: Spark's array higher-order functions
    * (transform/slice) run interpreted, and on an unbounded corpus
    * that interpretation dominated the whole audit (measured ~15×
    * slower at sf0.1 than this window form). One doc-keyed exchange;
    * per-task memory bounds at the longest document. */
  private def shingleRows(df: DataFrame, idCol: String, textCol: String,
                          n: Int): DataFrame = {
    val toks = df.select(col(idCol),
      posexplode(TextStats.tokens(col(textCol))).as(Seq("__p", "__w")))
    val w = Window.partitionBy(col(idCol)).orderBy(col("__p"))
    val parts = (0 until n).map(k =>
      if (k == 0) col("__w") else lead(col("__w"), k).over(w))
    toks.select(col(idCol), concat_ws(" ", parts: _*).as("__t"),
                parts.last.as("__chk"))
      .filter(col("__chk").isNotNull)
      .select(col(idCol), col("__t"))
      .distinct()
  }

  /** Per corpus document: how many of its DISTINCT n-gram shingles
    * appear anywhere in the benchmark set, the overlap ratio against
    * its own shingle count, and the contamination flag at `minHits`.
    * Only documents with at least one hit are returned (the clean
    * corpus vastly outnumbers the flagged slice; a downstream
    * anti-join removes flagged ids from training).
    *
    * Scale shape: the benchmark's distinct shingle set is tiny next
    * to a 100 TB corpus (eval suites are MBs), so it is distinct'd
    * and BROADCAST; the corpus side is scan → shingle (one doc-keyed
    * exchange, codegen window form) → broadcast hash join → per-doc
    * count — the corpus never shuffles by shingle. Shingles join as
    * raw n-gram strings for oracle portability; at petabyte scale the
    * same plan runs on xxhash64(shingle) to shrink the broadcast and
    * the probe keys — the join shape is unchanged. */
  def overlapAudit(corpus: DataFrame, bench: DataFrame, idCol: String,
                   textCol: String, n: Int, minHits: Int): DataFrame = {
    val benchSet = shingleRows(bench, idCol, textCol, n)
      .select(col("__t")).distinct()
    val c = shingleRows(corpus, idCol, textCol, n)
    val hits = c.join(broadcast(benchSet), "__t")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
    c.groupBy(col(idCol)).agg(count(lit(1)).as("n_shingles"))
      .join(hits, Seq(idCol))
      .select(col(idCol), col("n_shingles"), col("n_hits"),
              round(col("n_hits").cast("double") /
                    greatest(col("n_shingles"), lit(1L)).cast("double"), 4)
                .as("overlap_ratio"),
              (col("n_hits") >= minHits).as("contaminated"))
  }
}
