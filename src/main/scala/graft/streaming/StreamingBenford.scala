package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Profiler

/** Streaming Benford monitor — the continuously-running twin of
  * [[Profiler.benfordAudit]]: every micro-batch's first-digit counts
  * fold into a persistent 9-row running state, and each batch appends
  * one audit row carrying BOTH the batch-local and the cumulative
  * maximum deviation from the Benford line. A feed whose digits drift
  * (an upstream unit change, a filled-in default, fabricated numbers)
  * trips the batch deviation immediately, while the cumulative column
  * says whether the corpus as a whole is still healthy.
  *
  * State is integer digit counts — exactly mergeable, so the streamed
  * cumulative readout is BIT-IDENTICAL to a batch
  * [[Profiler.benfordAudit]] over all data ever seen (the q128/
  * StreamingStats contract, asserted by StreamingBenfordSpec across a
  * checkpoint restart). foreachBatch + read-merge-overwrite of the
  * tiny state table (≤ 9 rows), one map-side-combined aggregation per
  * batch regardless of batch size. */
object StreamingBenford {

  private def devExpr = abs(
    round(col("n").cast("double") / col("__tot").cast("double"), 6) -
      round(log(10.0, lit(1.0) + lit(1.0) / col("digit")), 6))

  /** Max |observed share − Benford share| of a (digit, n) frame. */
  private def maxDev(counts: DataFrame): DataFrame = {
    val tot = counts.agg(sum(col("n")).as("__tot"))
    counts.crossJoin(broadcast(tot))
      .agg(first(col("__tot")).as("n_rows"),
           round(max(devExpr), 6).as("max_abs_dev"))
  }

  /** Drain available batches: fold each batch's digit counts into the
    * running state at `statePath` and append
    * (batch_id, n_batch, dev_batch, n_total, dev_cum) to `auditPath`. */
  def monitor(stream: DataFrame, valueCol: String, statePath: String,
              auditPath: String, checkpoint: String): StreamingQuery =
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val batchCounts = Profiler.firstDigitCounts(batch, valueCol)
          .localCheckpoint() // read twice (batch dev + state merge)
        val merged = (if (new java.io.File(statePath).exists())
            spark.read.parquet(statePath).unionByName(batchCounts)
          else batchCounts)
          .groupBy(col("digit")).agg(sum(col("n")).as("n"))
          .localCheckpoint() // sever lineage from the file being overwritten
        merged.coalesce(1).write.mode("overwrite").parquet(statePath)
        maxDev(batchCounts).select(
            lit(batchId).as("batch_id"),
            col("n_rows").as("n_batch"),
            col("max_abs_dev").as("dev_batch"))
          .crossJoin(maxDev(merged).select(
            col("n_rows").as("n_total"),
            col("max_abs_dev").as("dev_cum")))
          .write.mode("append").parquet(auditPath)
      }
      .start()

  /** The cumulative audit as a batch frame — for asserting streamed ==
    * monolithic ([[Profiler.benfordAudit]] over everything seen). */
  def currentState(spark: SparkSession, statePath: String): DataFrame =
    spark.read.parquet(statePath)
}
