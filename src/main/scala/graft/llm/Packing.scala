package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing: batch documents into token-budget bins for
  * training (each bin feeds one packed training sequence).
  *
  * Deterministic contract — contiguous chunking by cumulative tokens:
  * within a shard, documents are taken in `order`, and a document's
  * bin is floor(exclusive-running-token-sum / budget). This is ONE
  * window cumulative sum (mirrored 1:1 in the SQL oracle), but it is
  * NOT first-fit: a document whose tokens straddle a budget boundary
  * stays in the earlier bin, so a bin's token total can exceed
  * `budget` by up to one document's length (downstream packing must
  * truncate or spill the overhang — the usual choice when sequences
  * are cut to fixed length anyway). [[assignBinsFirstFit]] is the
  * strict variant that closes a bin instead of overflowing it.
  *
  * Sharding bounds the window: a global order would serialize to one
  * task, so the corpus is split into `nShards` deterministic shards
  * (Sampling.shardOf) packed independently — exactly how a 100 TB
  * corpus is packed in practice (per output file / per worker).
  */
object Packing {

  /** Per-document bin assignment: (shard, bin) columns appended.
    * `extraKeys` partition the packing further (e.g. pack each
    * train/val/test split independently — a bin never mixes splits). */
  def assignBins(df: DataFrame, idCol: String, tokenCol: String,
                 budget: Int, nShards: Int, order: Seq[Column],
                 extraKeys: Seq[Column] = Nil): DataFrame = {
    val sharded = df.withColumn("shard", Sampling.shardOf(col(idCol), nShards))
    val w = Window.partitionBy(extraKeys :+ col("shard"): _*).orderBy(order: _*)
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

  /** Length-bucketed INFERENCE batching: within each deterministic
    * shard, order documents by (length, id) and cut fixed-COUNT
    * batches of `batchSize` — consecutive lengths per batch is what
    * keeps padding waste low, since a batch's cost is
    * n_docs × max-length. Returns per-batch stats including `padding`
    * (wasted token slots) so the layout's efficiency is itself a
    * queryable metric. Same shard-bounds-the-window scale story as
    * [[assignBins]]; training-side token-budget packing is
    * [[packBins]]/[[packBinsFirstFit]], this is the serving-side
    * complement. */
  def lengthBatches(df: DataFrame, idCol: String, tokenCol: String,
                    batchSize: Int, nShards: Int): DataFrame = {
    val sharded = df.withColumn("shard", Sampling.shardOf(col(idCol), nShards))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col(tokenCol).asc, col(idCol).asc)
    sharded
      .withColumn("batch",
        floor((row_number().over(w) - 1).cast("long") / batchSize))
      .groupBy(col("shard"), col("batch"))
      .agg(count(lit(1)).as("n_docs"),
           max(col(tokenCol)).as("max_len"),
           sum(col(tokenCol)).as("sum_tokens"))
      .withColumn("padding",
        col("n_docs") * col("max_len") - col("sum_tokens"))
  }

  /** Strict greedy first-fit: a bin CLOSES when the next document
    * would overflow it, so sum_tokens <= budget always holds (except a
    * single document larger than the whole budget, which gets a bin of
    * its own). This needs a running fill that RESETS — not expressible
    * as a window cumsum — so each shard is folded sequentially with
    * `flatMapSortedGroups` (the sort arrives via the group-sort
    * machinery; the fold itself is a streaming iterator, nothing
    * materializes per group). Sequential-per-shard is inherent to
    * first-fit semantics, and the shard count is the parallelism knob
    * — same scale story as [[assignBins]]. `extraKeys` partition the
    * packing further (same contract as [[assignBins]] — e.g. pack each
    * train/val/test split independently); they fold into the group key
    * alongside the shard. */
  def assignBinsFirstFit(df: DataFrame, idCol: String, tokenCol: String,
                         budget: Int, nShards: Int, order: Seq[Column],
                         extraKeys: Seq[Column] = Nil): DataFrame = {
    val sharded = df
      .withColumn(tokenCol, col(tokenCol).cast("long"))
      .withColumn("shard", Sampling.shardOf(col(idCol), nShards))
      .withColumn("__gkey",
        concat_ws("\u0001", /* group-key separator */ (extraKeys :+ col("shard")).map(_.cast("string")): _*))
    val tokIdx = sharded.schema.fieldIndex(tokenCol)
    val gkeyIdx = sharded.schema.fieldIndex("__gkey")
    val outEnc = Encoders.row(sharded.schema.add("bin", LongType, nullable = false))
    sharded
      .groupByKey(_.getString(gkeyIdx))(Encoders.STRING)
      .flatMapSortedGroups(order: _*) { (_, rows) =>
        var bin = 0L; var fill = 0L
        rows.map { r =>
          val t = r.getLong(tokIdx)
          if (fill > 0L && fill + t > budget) { bin += 1L; fill = 0L }
          fill += t
          Row.fromSeq(r.toSeq :+ bin)
        }
      }(outEnc)
      .drop("__gkey")
  }

  /** [[packBins]] over the strict first-fit assignment. */
  def packBinsFirstFit(df: DataFrame, idCol: String, tokenCol: String,
                       budget: Int, nShards: Int, order: Seq[Column]): DataFrame =
    assignBinsFirstFit(df, idCol, tokenCol, budget, nShards, order)
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col(tokenCol)).as("sum_tokens"),
           min(col(idCol)).as("first_doc"),
           max(col(idCol)).as("last_doc"))
}
