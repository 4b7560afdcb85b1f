package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Profiler

/** Streaming maintenance of correlation sufficient statistics — the
  * continuously-running twin of [[Profiler.corrMatrix]]: each
  * micro-batch reduces to its one-row exact-DECIMAL state
  * ([[Profiler.corrStats]]) and folds into the persisted state by
  * exact addition ([[Profiler.corrMergeStats]]) — history is NEVER
  * rescanned, and because the state is decimal (not float), the
  * maintained statistics are BIT-IDENTICAL to a monolithic recompute
  * over everything ever seen (the q128-proven contract; the spec
  * asserts it end-to-end through the stream).
  *
  * foreachBatch read-merge-write, not a stateful aggregation: the
  * state is ONE global row, so mapGroupsWithState machinery buys
  * nothing — the per-batch cost is the batch's own map-side-combined
  * aggregation plus a 1-row parquet rewrite, regardless of history
  * size. The correlation matrix itself is derived on demand from the
  * state row via [[Profiler.corrFromStats]] (closed form, no data
  * touch). */
object StreamingStats {

  /** Drain available batches, folding each into the state row at
    * `statePath`. */
  def corrMaintain(stream: DataFrame, cols: Seq[String], scale: Int,
                   statePath: String, checkpoint: String): StreamingQuery =
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, cols, scale, statePath)
      }
      .start()

  /** One micro-batch fold, IDEMPOTENT under replay. foreachBatch is
    * at-least-once: a batch replayed after a crash between the state
    * overwrite and the checkpoint commit must NOT fold in twice. The
    * last-applied batchId rides in the state row; a batch with
    * batchId <= lastApplied is a no-op. */
  private[graft] def applyBatch(batch: DataFrame, batchId: Long,
                                    cols: Seq[String], scale: Int,
                                    statePath: String): Unit = {
    import org.apache.spark.sql.functions.lit
    val spark = batch.sparkSession
    val dir = new java.io.File(statePath)
    val prior =
      if (dir.exists && dir.listFiles != null && dir.listFiles.nonEmpty)
        Some(spark.read.parquet(statePath))
      else None
    val lastApplied = prior
      .map(_.select("__last_batch").head.getLong(0)).getOrElse(-1L)
    if (batchId > lastApplied) {
      val batchStats = Profiler.corrStats(batch, cols, scale)
      val merged = prior match {
        case Some(p) =>
          Profiler.corrMergeStats(p.drop("__last_batch"), batchStats)
        case None => batchStats
      }
      val stamped = merged.withColumn("__last_batch", lit(batchId))
      // 1-row frame: collect-and-rewrite is O(state), not O(data)
      val row = stamped.collect()
      val out = spark.createDataFrame(
        spark.sparkContext.parallelize(row.toIndexedSeq, 1), stamped.schema)
      out.write.mode("overwrite").parquet(statePath)
    }
  }

  /** The current correlation matrix from the maintained state. */
  def currentCorr(spark: SparkSession, statePath: String,
                  cols: Seq[String]): DataFrame =
    Profiler.corrFromStats(
      spark.read.parquet(statePath).drop("__last_batch"), cols)
}
