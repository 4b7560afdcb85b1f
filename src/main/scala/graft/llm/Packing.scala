package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: batch documents into fixed token-budget bins for
  * training (each bin feeds one packed training sequence).
  *
  * Deterministic contract: within a shard, documents are taken in
  * `order`; a document's bin is floor(exclusive-running-token-sum /
  * budget) — the greedy sequential fill, expressible as ONE window
  * cumulative sum (and mirrored 1:1 in the SQL oracle). Sharding
  * bounds the window: a global order would serialize to one task, so
  * the corpus is split into `nShards` deterministic shards
  * (Sampling.shardOf) packed independently — exactly how a 100 TB
  * corpus is packed in practice (per output file / per worker).
  */
object Packing {

  /** Per-document bin assignment: (shard, bin) columns appended. */
  def assignBins(df: DataFrame, idCol: String, tokenCol: String,
                 budget: Int, nShards: Int, order: Seq[Column]): DataFrame = {
    val sharded = df.withColumn("shard", Sampling.shardOf(col(idCol), nShards))
    val w = Window.partitionBy(col("shard")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sharded
      .withColumn("__cum", sum(col(tokenCol)).over(w) - col(tokenCol))
      .withColumn("bin", floor(col("__cum") / budget))
      .drop("__cum")
  }

  /** Bin-level summary: documents and token totals per (shard, bin). */
  def packBins(df: DataFrame, idCol: String, tokenCol: String,
               budget: Int, nShards: Int, order: Seq[Column]): DataFrame =
    assignBins(df, idCol, tokenCol, budget, nShards, order)
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col(tokenCol)).as("sum_tokens"),
           min(col(idCol)).as("first_doc"),
           max(col(idCol)).as("last_doc"))
}
