package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Profiler
import graft.streaming.StreamingStats

/** Streaming correlation-state maintenance: micro-batch folds must be
  * BIT-IDENTICAL to a monolithic recompute over all data ever seen
  * (the q128 contract, here proven end-to-end through the stream,
  * checkpoint restart included). */
class StreamingStatsSpec extends SparkSpec {
  import spark.implicits._

  test("streamed state folds == monolithic recompute, across restarts") {
    implicit val sq = spark.sqlContext
    val statePath = tmpDir("corr-state") + "/state"
    val ckpt = tmpDir("corr-ckpt")
    val cols = Seq("x", "y", "z")

    def rows(r: Range) = r.map { i =>
      (i.toDouble, (2 * i + 1).toDouble, ((i * i) % 89).toDouble)
    }

    val mem = MemoryStream[(Double, Double, Double)]
    mem.addData(rows(1 to 60): _*)
    mem.addData(rows(61 to 140): _*)
    val stream = mem.toDF().toDF("x", "y", "z")

    val q1 = StreamingStats.corrMaintain(stream, cols, scale = 2,
                                         statePath, ckpt)
    q1.awaitTermination(60000)

    // restart from the checkpoint with more data: only the new batch folds
    mem.addData(rows(141 to 200): _*)
    val q2 = StreamingStats.corrMaintain(stream, cols, scale = 2,
                                         statePath, ckpt)
    q2.awaitTermination(60000)

    val streamed = StreamingStats.currentCorr(spark, statePath, cols)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val monolithic = Profiler.corrMatrix(rows(1 to 200).toDF("x", "y", "z"),
                                         cols, scale = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(streamed == monolithic)
    assert(streamed(("x", "y"))._1 == 200L)
    assert(streamed(("x", "y"))._2 == 1.0) // y = 2x+1: exactly linear

    // At-least-once replay: re-applying an ALREADY-APPLIED batchId (a
    // crash between state overwrite and checkpoint commit) must be a
    // no-op — the state folds each batch exactly once.
    val lastBatch = spark.read.parquet(statePath)
      .select("__last_batch").head.getLong(0)
    val before = spark.read.parquet(statePath).collect().toSeq
    StreamingStats.applyBatch(rows(141 to 200).toDF("x", "y", "z"),
                              lastBatch, cols, scale = 2, statePath)
    val after = spark.read.parquet(statePath).collect().toSeq
    assert(after == before, "replayed batch must not fold into state twice")
  }
}
