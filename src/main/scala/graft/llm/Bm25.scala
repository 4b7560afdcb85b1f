package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.util.Exact.exactSum

/** Okapi BM25 ranking — the sparse-retrieval scorer that complements
  * the TF-IDF cosine (TextStats.sparseCosineTopK) with document-length
  * normalization and tf saturation (Robertson et al.): the standard
  * first-stage retriever a RAG/dedup pipeline pairs with dense ANN.
  *
  * Scale shape: ONE corpus exchange. The doc-id repartition feeds both
  * the token explode→(doc, term) tf aggregation (ClusteredDistribution
  * on a superset of the partition keys — no second shuffle) and the
  * doc-length frame it joins back to; the per-term document-frequency
  * table is |query terms| rows and broadcasts; corpus size + average
  * doc length are a 1-row broadcast summary. The final top-k is
  * TakeOrdered (orderBy.limit), never a global sort.
  *
  * Portability: per-term contributions quantize through DECIMAL(30,6)
  * before summation (order-independent; the q83 ln contract), score
  * rounded to 4 — ties cut by doc_id so the top-k SET is deterministic
  * in any engine.
  */
object Bm25 {

  /** Top `topK` documents for a bag-of-terms query. Returns
    * (idCol, score) ordered by (score desc, id asc). */
  def topK(df: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
           topK: Int = 20): DataFrame = {
    val docs = df.repartition(col(idCol))
    val toks = docs.select(col(idCol),
                           explode(TextStats.tokens(col(textCol))).as("token"))
      .filter(col("token").isin(terms: _*))
    val dl = docs.select(col(idCol),
                         size(TextStats.tokens(col(textCol))).cast("double").as("dl"))
    val stats = df.agg(
      count(lit(1)).as("n_docs"),
      (sum(size(TextStats.tokens(col(textCol)))).cast("double") /
        count(lit(1)).cast("double")).as("avgdl"))
    val dfreq = toks.select(col(idCol), col("token")).distinct()
      .groupBy(col("token")).agg(count(lit(1)).as("dft"))
    val tf = toks.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("dft") + 0.5) / (col("dft") + 0.5))
    val tfNorm = col("tf") * (lit(k1) + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / col("avgdl")))
    tf.join(broadcast(dfreq), "token")
      .crossJoin(broadcast(stats))
      .join(dl, idCol)
      .groupBy(col(idCol))
      .agg(round(exactSum(idf * tfNorm), 4).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(topK)
  }
}
