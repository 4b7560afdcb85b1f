package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al.,
  * "Data Selection for Language Models via Importance Resampling",
  * arXiv:2302.03169): pick raw web documents whose hashed-n-gram
  * profile looks like a small, high-quality target corpus.
  *
  * Features are word unigrams + bigrams hashed into `buckets` bins
  * (the paper's hashed generative model) using the repo's md5
  * convention (first 14 hex chars mod bucket count — SQL-replayable,
  * see NearDup). Each corpus fits an add-one-smoothed multinomial
  * over bins; a document's importance score is its log-likelihood
  * ratio Σ_gram [ln p̂_target(bin) − ln p̂_raw(bin)], i.e. a
  * per-bucket weight times the document's bucket counts.
  *
  * 100 TB shape: the raw corpus is scanned twice, each time reducing
  * straight to a ≤`buckets`-row or per-doc aggregate with map-side
  * combine — no shuffle ever carries grams, only (bucket, count)
  * partials. The fitted model is ≤`buckets` rows and joins by
  * BROADCAST; selection uses the bounded-buffer TopK aggregator
  * (O(k) per partition before the exchange), never a global window
  * sort. Scores quantize per-term to the exact-decimal grid
  * (DECIMAL(30,6), the q98 convention) so the sum is
  * order-independent under any partitioning.
  */
object Dsir {

  /** (id, gram) — word unigrams + bigrams per document. */
  private def gramFrame(df: DataFrame, idCol: String,
                        textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
        split(trim(col(textCol)), "\\s+").as("ws"))
      .select(col("id"), explode(concat(col("ws"),
        // bigrams via a 1-based transform; filter drops the sentinel
        // NULL at i = size(ws) (sequence(1, n) is never empty, so no
        // ANSI empty-sequence edge)
        expr("""filter(transform(sequence(1, size(ws)),
               |  i -> IF(i < size(ws),
               |          concat(element_at(ws, i), ' ',
               |                 element_at(ws, i + 1)), NULL)),
               |  x -> x IS NOT NULL)""".stripMargin))).as("gram"))

  private def bucketOf(gram: Column, buckets: Int): Column =
    (conv(substring(md5(gram), 1, 14), 16, 10).cast("long") %
      buckets).cast("int")

  /** The fitted per-bucket log-likelihood-ratio weights:
    * (bucket, tc, rc, lr) over every bucket either corpus touches
    * (absent side counts 0 via the outer join). ≤ `buckets` rows. */
  def bucketModel(raw: DataFrame, target: DataFrame, idCol: String,
                  textCol: String, buckets: Int = 512): DataFrame = {
    require(buckets > 0 && buckets <= (1 << 20), s"buckets $buckets")
    val tb = gramFrame(target, idCol, textCol)
      .select(bucketOf(col("gram"), buckets).as("bucket"))
    val rb = gramFrame(raw, idCol, textCol)
      .select(bucketOf(col("gram"), buckets).as("bucket"))
    val tc = tb.groupBy("bucket").agg(count(lit(1)).as("tc"))
    val rc = rb.groupBy("bucket").agg(count(lit(1)).as("rc"))
    // corpus totals: 1-row frames, broadcast into the model
    val tTot = tb.agg(count(lit(1)).as("t_total"))
    val rTot = rb.agg(count(lit(1)).as("r_total"))
    tc.join(rc, Seq("bucket"), "full_outer")
      .na.fill(0L, Seq("tc", "rc"))
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      .select(col("bucket"), col("tc"), col("rc"),
        (log((col("tc") + 1).cast("double") /
             (col("t_total") + buckets).cast("double")) -
         log((col("rc") + 1).cast("double") /
             (col("r_total") + buckets).cast("double"))).as("lr"))
  }

  /** Per-document importance scores against the target profile:
    * (id, n_grams, score), score = Σ_b count_doc(b) · lr(b) on the
    * exact-decimal grid, rounded to 4. */
  def importanceScores(raw: DataFrame, target: DataFrame, idCol: String,
                       textCol: String, buckets: Int = 512): DataFrame = {
    val model = bucketModel(raw, target, idCol, textCol, buckets)
    val docBuckets = gramFrame(raw, idCol, textCol)
      .groupBy(col("id"), bucketOf(col("gram"), buckets).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    docBuckets
      .join(broadcast(model.select(col("bucket"), col("lr"))), Seq("bucket"))
      .groupBy(col("id"))
      .agg(sum(col("cnt")).cast("long").as("n_grams"),
        round(sum((col("cnt") * col("lr")).cast("decimal(30,6)"))
          .cast("double"), 4).as("score"))
  }

  /** Deterministic top-k selection by (score DESC, id ASC) through
    * the bounded-buffer aggregator — (rank, id, score), rank
    * 1-based. The paper's Gumbel-noise resample degenerates to this
    * when the temperature is 0; for the stochastic variant, add a
    * seeded Gumbel column upstream and pass the perturbed score. */
  def selectTopK(raw: DataFrame, target: DataFrame, idCol: String,
                 textCol: String, buckets: Int = 512,
                 k: Int = 100): DataFrame =
    graft.operators.TopK.perGroupTopK(
      importanceScores(raw, target, idCol, textCol, buckets),
      Seq.empty, col("score"), col("id"), k)
}
