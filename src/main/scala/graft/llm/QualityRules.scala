package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher/C4-style rule-based corpus filtering — the first, cheapest
  * gate of an LLM data pipeline (Rae et al. 2021 §A1.1, Raffel et al.
  * C4): reject documents whose surface statistics mark them as
  * boilerplate, gibberish, or machine junk BEFORE any model-based
  * scoring spends compute on them.
  *
  * Every metric is a scan-local expression over built-in functions
  * (split / aggregate / arrays_overlap / regexp_replace) — zero
  * shuffles, zero UDFs, whole-stage codegen end to end. At 100 TB this
  * runs at parquet-scan speed and the keep flag prunes the corpus for
  * every downstream stage.
  *
  * Metrics (per document):
  *  - n_words: whitespace token count
  *  - mean_wl: mean word length (exact integer sum / count)
  *  - symbol_ratio: fraction of chars outside [a-z0-9 ] (junk signal)
  *  - has_stopword: any of a tiny high-frequency function-word set
  *    present (absence marks word-salad / non-linguistic text)
  * Rules: n_words in [minWords, maxWords]; mean_wl in [minWl, maxWl];
  * symbol_ratio <= maxSymbolRatio; has_stopword. keep = all pass.
  */
object QualityRules {

  val defaultStopwords: Seq[String] =
    Seq("the", "a", "of", "to", "and", "in", "is", "that")

  /** Per-document metrics + per-rule pass flags + overall keep; keeps
    * every input column except the text itself. */
  def gopherMetrics(df: DataFrame, textCol: String,
                    minWords: Int = 10, maxWords: Int = 100000,
                    minWl: Double = 2.0, maxWl: Double = 10.0,
                    maxSymbolRatio: Double = 0.1,
                    stopwords: Seq[String] = defaultStopwords): DataFrame = {
    val t = col(textCol)
    val ws = split(t, " ")
    val nWords = size(ws).cast("long")
    // exact: integer char sum over tokens, divided once
    val meanWl = aggregate(ws, lit(0L), (acc, w) => acc + length(w))
      .cast("double") / nWords.cast("double")
    val symbolRatio =
      length(regexp_replace(t, "[a-z0-9 ]", "")).cast("double") /
        when(length(t) > 0, length(t).cast("double"))
    val hasStop = arrays_overlap(ws, array(stopwords.map(lit): _*))
    // keeps every input column except the text itself (metrics replace it)
    df.select(
        df.columns.filterNot(_ == textCol).map(col) ++ Seq(
          nWords.as("n_words"),
          round(meanWl, 4).as("mean_wl"),
          round(symbolRatio, 4).as("symbol_ratio"),
          hasStop.as("has_stopword")): _*)
      .withColumn("pass_words",
        col("n_words").between(minWords, maxWords))
      .withColumn("pass_wl", col("mean_wl").between(minWl, maxWl))
      .withColumn("pass_symbol", col("symbol_ratio") <= maxSymbolRatio)
      .withColumn("keep",
        col("pass_words") && col("pass_wl") && col("pass_symbol") &&
          col("has_stopword"))
  }

  /** The overall keep predicate as a single scan-local Column — so the
    * gate composes as a FILTER on the corpus scan (no join, no second
    * pass over the text). Must stay in sync with [[gopherMetrics]]. */
  def keepExpr(textCol: Column,
               minWords: Int = 10, maxWords: Int = 100000,
               minWl: Double = 2.0, maxWl: Double = 10.0,
               maxSymbolRatio: Double = 0.1,
               stopwords: Seq[String] = defaultStopwords): Column = {
    val ws = split(textCol, " ")
    val nWords = size(ws).cast("long")
    val meanWl = round(aggregate(ws, lit(0L), (acc, w) => acc + length(w))
      .cast("double") / nWords.cast("double"), 4)
    val symbolRatio = round(
      length(regexp_replace(textCol, "[a-z0-9 ]", "")).cast("double") /
        when(length(textCol) > 0, length(textCol).cast("double")), 4)
    nWords.between(minWords, maxWords) && meanWl.between(minWl, maxWl) &&
      (symbolRatio <= maxSymbolRatio) &&
      arrays_overlap(ws, array(stopwords.map(lit): _*))
  }

  /** The corpus after the gate — what downstream stages read. A plain
    * filter on the scan: no join, no shuffle. */
  def gopherFilter(df: DataFrame, textCol: String): DataFrame =
    df.filter(keepExpr(col(textCol)))
}
