package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.llm.QualityRules
import graft.operators.{BloomJoin, TopK}

/** Round-6 scale-operator queries: aggregation-shaped top-k, join
  * pruning, corpus quality rules, lexical ranking, projection-based
  * dimensionality reduction, stratified sampling. Each query pairs the
  * library operator with a DuckDB oracle that recomputes the semantics
  * from first principles (windows/CTEs), so the gate proves the
  * scale-shaped plan is EQUIVALENT to the textbook formulation.
  */
object PipelineQueries {
  type Q = (SparkSession, String) => DataFrame

  private val dsum = (x: String) => s"CAST(SUM(CAST($x AS DECIMAL(30,6))) AS DOUBLE)"

  val queries: Map[String, Q] = Map(

    // Per-group top-k as a bounded-buffer AGGREGATION (map-side combine
    // keeps <=k rows per group per partition) — not a window sort over
    // the corpus. Oracle is the window form: the gate proves equivalence.
    "q143_group_topk" -> ((s, d) => {
      val li = lineitem(s, d).select(
        col("l_suppkey"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("item_id"),
        col("l_extendedprice"))
      TopK.perGroupTopK(li, Seq("l_suppkey"), col("l_extendedprice"),
                        col("item_id"), k = 3)
        .select(col("l_suppkey"), col("rank"),
                col("id").as("item_id"), col("score"))
    }),

    // Bloom-pruned selective join: the fact scan drops non-matching
    // rows via an 8 KB bit test BEFORE any shuffle; the exact join on
    // survivors makes false positives invisible — oracle is the PLAIN
    // join, proving the pruned plan is lossless.
    "q144_bloom_join" -> ((s, d) => {
      val urgent = orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_totalprice"))
      BloomJoin.prunedJoin(lineitem(s, d), "l_orderkey", urgent, "o_orderkey")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
             graft.util.Exact.exactSum(col("l_extendedprice")).as("revenue"))
    }),

    // Gopher/C4 rule gate: scan-local surface statistics decide keep —
    // per-source pass/fail profile (what a curation dashboard reads to
    // see WHICH rule rejects each source's documents).
    "q145_quality_rules" -> ((s, d) => {
      QualityRules.gopherMetrics(documents(s, d), "text",
          minWords = 20, maxWords = 80, minWl = 3.9, maxWl = 5.0,
          maxSymbolRatio = 0.1)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
             sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
             sum(when(!col("pass_words"), 1L).otherwise(0L)).as("n_fail_words"),
             sum(when(!col("pass_wl"), 1L).otherwise(0L)).as("n_fail_wl"),
             sum(when(!col("has_stopword"), 1L).otherwise(0L)).as("n_stopless"))
    })
  )

  val oracles: Map[String, String] = Map(

    "q143_group_topk" ->
      """WITH r AS (
        |  SELECT l_suppkey,
        |         l_orderkey*10 + l_linenumber AS item_id,
        |         l_extendedprice AS score,
        |         row_number() OVER (
        |           PARTITION BY l_suppkey
        |           ORDER BY l_extendedprice DESC, l_orderkey*10 + l_linenumber
        |         ) AS rank
        |  FROM lineitem)
        |SELECT l_suppkey, rank, item_id, score FROM r WHERE rank <= 3""".stripMargin,

    "q144_bloom_join" ->
      s"""SELECT l_returnflag, COUNT(*) AS n, ${dsum("l_extendedprice")} AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE o_orderpriority = '1-URGENT'
         |GROUP BY l_returnflag""".stripMargin,

    "q145_quality_rules" ->
      """WITH m AS (
        |  SELECT source,
        |    len(string_split(text, ' ')) AS n_words,
        |    round(CAST(list_aggregate(list_transform(string_split(text, ' '),
        |            x -> length(x)), 'sum') AS DOUBLE)
        |          / len(string_split(text, ' ')), 4) AS mean_wl,
        |    round(CAST(length(text) - length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
        |          / NULLIF(length(text), 0), 4) AS symbol_ratio,
        |    list_has_any(string_split(text, ' '),
        |      ['the','a','of','to','and','in','is','that']) AS has_stop
        |  FROM documents)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN n_words BETWEEN 20 AND 80
        |                 AND mean_wl BETWEEN 3.9 AND 5.0
        |                 AND symbol_ratio <= 0.1 AND has_stop
        |            THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
        |  CAST(SUM(CASE WHEN n_words NOT BETWEEN 20 AND 80 THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_words,
        |  CAST(SUM(CASE WHEN mean_wl NOT BETWEEN 3.9 AND 5.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_wl,
        |  CAST(SUM(CASE WHEN NOT has_stop THEN 1 ELSE 0 END) AS BIGINT) AS n_stopless
        |FROM m GROUP BY source""".stripMargin
  )
}
