package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.llm.{Decontaminate, QualityRules, Sampling}
import graft.operators.{Eval, TargetEncode}

/** Round-6 curation/governance queries: the audit layer between a raw
  * corpus and a training run — benchmark decontamination, leakage-safe
  * temporal splitting, categorical predictive-power scoring, and
  * annotation agreement. Each oracle recomputes the full semantics in
  * DuckDB from first principles.
  */
object CurationQueries {
  type Q = (SparkSession, String) => DataFrame

  // DuckDB word-tokenizer mirror of TextStats.tokens
  private val toks = "regexp_split_to_array(trim(text), '\\s+')"

  val queries: Map[String, Q] = Map(

    // Benchmark decontamination: docs with doc_id % 101 == 0 stand in
    // for the held-out eval suite; every other doc is audited for
    // trigram-shingle overlap against it. The benchmark shingle set
    // broadcasts; the corpus never shuffles by shingle.
    "q159_decontaminate" -> ((s, d) => {
      val docs = documents(s, d)
      Decontaminate.overlapAudit(
        corpus = docs.filter(col("doc_id") % 101 =!= 0),
        bench  = docs.filter(col("doc_id") % 101 === 0),
        idCol = "doc_id", textCol = "text", n = 3, minHits = 2)
    }),

    // Purged time split with a 3-day embargo on the events stream:
    // train < Jan 18, purged [18, 21), test >= Jan 21; per-split
    // envelope + how many of its units also appear in train.
    "q160_time_split" -> ((s, d) => {
      Sampling.timeSplitEmbargo(events(s, d), "ts", "user_id",
                                cutoff = "2024-01-18 00:00:00",
                                embargoDays = 3)
    }),

    // Weight-of-evidence + information value of order priority
    // against the 'F' (fulfilled) status label — one category-
    // cardinality aggregation, 1-row total broadcast.
    "q161_woe_encode" -> ((s, d) => {
      TargetEncode.woeIv(orders(s, d), "o_orderpriority",
                         col("o_orderstatus") === "F")
    }),

    // Cohen's kappa between two rule-based document raters (word-count
    // gate vs mean-word-length gate, the q145 thresholds): how much of
    // their agreement exceeds chance. One fold to a 2x2 table.
    "q162_kappa" -> ((s, d) => {
      val m = QualityRules.gopherMetrics(documents(s, d), "text",
          minWords = 20, maxWords = 80, minWl = 3.9, maxWl = 5.0,
          maxSymbolRatio = 0.1)
      Eval.cohenKappa(m, col("pass_words"), col("pass_wl"))
    })
  )

  val oracles: Map[String, String] = Map(

    "q159_decontaminate" ->
      s"""WITH d AS (SELECT doc_id, list_distinct(list_transform(
         |    range(len($toks) - 2),
         |    i -> array_to_string(list_slice($toks, i + 1, i + 3), ' '))) AS g
         |  FROM documents),
         |b AS (SELECT DISTINCT unnest(g) AS t FROM d WHERE doc_id % 101 = 0),
         |c AS (SELECT doc_id, unnest(g) AS t FROM d WHERE doc_id % 101 <> 0),
         |h AS (SELECT doc_id, COUNT(*) AS n_hits FROM c JOIN b USING (t)
         |      GROUP BY 1),
         |n AS (SELECT doc_id, CAST(len(g) AS BIGINT) AS n_shingles FROM d)
         |SELECT h.doc_id, n_shingles, n_hits,
         |  round(CAST(n_hits AS DOUBLE) /
         |        CAST(greatest(n_shingles, 1) AS DOUBLE), 4) AS overlap_ratio,
         |  n_hits >= 2 AS contaminated
         |FROM h JOIN n ON h.doc_id = n.doc_id""".stripMargin,

    "q160_time_split" ->
      """WITH t AS (
        |  SELECT user_id, ts,
        |    CASE WHEN ts < TIMESTAMP '2024-01-18 00:00:00' THEN 'train'
        |         WHEN ts < TIMESTAMP '2024-01-21 00:00:00' THEN 'purged'
        |         ELSE 'test' END AS split
        |  FROM events),
        |per AS (SELECT split, COUNT(*) AS n_rows,
        |          COUNT(DISTINCT user_id) AS n_units,
        |          MIN(epoch_us(ts)) AS min_ts_us,
        |          MAX(epoch_us(ts)) AS max_ts_us
        |        FROM t GROUP BY 1),
        |pairs AS (SELECT DISTINCT split, user_id FROM t),
        |shared AS (SELECT p.split, COUNT(*) AS n_units_in_train
        |           FROM pairs p JOIN (SELECT user_id FROM pairs
        |                              WHERE split = 'train') tr
        |             ON p.user_id = tr.user_id
        |           GROUP BY 1)
        |SELECT per.split, n_rows, n_units, min_ts_us, max_ts_us,
        |  CAST(COALESCE(n_units_in_train, 0) AS BIGINT) AS n_units_in_train
        |FROM per LEFT JOIN shared ON per.split = shared.split""".stripMargin,

    "q161_woe_encode" ->
      """WITH c AS (
        |  SELECT o_orderpriority, COUNT(*) AS n,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_pos,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END)
        |         AS BIGINT) AS n_neg
        |  FROM orders GROUP BY 1),
        |t AS (SELECT SUM(n_pos) AS p, SUM(n_neg) AS nn FROM c)
        |SELECT o_orderpriority, n, n_pos, n_neg,
        |  round(ln(((CAST(n_pos AS DOUBLE) + 0.5) / CAST(p AS DOUBLE)) /
        |           ((CAST(n_neg AS DOUBLE) + 0.5) / CAST(nn AS DOUBLE))), 6)
        |    AS woe,
        |  round(((CAST(n_pos AS DOUBLE) + 0.5) / CAST(p AS DOUBLE) -
        |         (CAST(n_neg AS DOUBLE) + 0.5) / CAST(nn AS DOUBLE)) *
        |        ln(((CAST(n_pos AS DOUBLE) + 0.5) / CAST(p AS DOUBLE)) /
        |           ((CAST(n_neg AS DOUBLE) + 0.5) / CAST(nn AS DOUBLE))), 6)
        |    AS iv_term
        |FROM c, t""".stripMargin,

    "q162_kappa" ->
      s"""WITH m AS (
         |  SELECT
         |    CASE WHEN len(string_split(text, ' '))
         |              BETWEEN 20 AND 80 THEN 1 ELSE 0 END AS a,
         |    CASE WHEN round(CAST(list_aggregate(list_transform(
         |            string_split(text, ' '), x -> length(x)), 'sum')
         |          AS DOUBLE) / len(string_split(text, ' ')), 4)
         |              BETWEEN 3.9 AND 5.0 THEN 1 ELSE 0 END AS b
         |  FROM documents),
         |cm AS (SELECT COUNT(*) AS n,
         |  CAST(SUM(a*b) AS BIGINT) AS n11,
         |  CAST(SUM(a*(1-b)) AS BIGINT) AS n10,
         |  CAST(SUM((1-a)*b) AS BIGINT) AS n01,
         |  CAST(SUM((1-a)*(1-b)) AS BIGINT) AS n00 FROM m),
         |r AS (SELECT n, n11, n10, n01, n00,
         |  round(CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS po,
         |  round((CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE) +
         |         CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE)) /
         |        (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS pe
         |  FROM cm)
         |SELECT n, n11, n10, n01, n00, po, pe,
         |  round((po - pe) / (CASE WHEN pe < 1.0 THEN 1.0 - pe END), 6)
         |    AS kappa
         |FROM r""".stripMargin
  )
}
