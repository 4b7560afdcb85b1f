package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Profiler
import graft.streaming.StreamingBenford

/** Streamed cumulative digit state must be BIT-IDENTICAL to a batch
  * benfordAudit over all data ever seen — across a checkpoint
  * restart — and the per-batch audit row must flag a drifted batch
  * that the cumulative view still absorbs. */
class StreamingBenfordSpec extends SparkSpec {
  import spark.implicits._

  test("streamed digit folds == monolithic audit, restart included; drift flags per batch") {
    implicit val sq = spark.sqlContext
    val statePath = tmpDir("benford-state") + "/state"
    val auditPath = tmpDir("benford-audit") + "/audit"
    val ckpt = tmpDir("benford-ckpt")

    // batch 1: roughly Benford-ish (geometric-ish spread of magnitudes)
    val healthy = (1 to 300).map(i => math.pow(1.04, i) % 9000 + 1.0)
    // batch 2: all values share first digit 7 — blatant drift
    val drifted = (1 to 200).map(i => 7000.0 + i)

    val mem = MemoryStream[Double]
    mem.addData(healthy: _*)
    val q1 = StreamingBenford.monitor(mem.toDF().toDF("v"), "v",
      statePath, auditPath, ckpt)
    q1.awaitTermination(60000)

    // restart from the checkpoint: only the new batch folds
    mem.addData(drifted: _*)
    val q2 = StreamingBenford.monitor(mem.toDF().toDF("v"), "v",
      statePath, auditPath, ckpt)
    q2.awaitTermination(60000)

    val streamed = StreamingBenford.currentState(spark, statePath)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val monolithic = Profiler
      .firstDigitCounts((healthy ++ drifted).toDF("v"), "v")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(streamed == monolithic, "cumulative state must equal batch recompute")

    val audit = spark.read.parquet(auditPath)
      .orderBy("batch_id").collect()
    assert(audit.length == 2)
    val (devB1, devB2) = (audit(0).getAs[Double]("dev_batch"),
      audit(1).getAs[Double]("dev_batch"))
    // all-sevens batch: obs share 1.0 vs benford(7) ~= 0.058 -> dev ~ 0.94
    assert(devB2 > 0.9, s"drifted batch must flag hard, got $devB2")
    assert(devB1 < devB2)
    // cumulative view absorbs the drifted batch partially
    val devCum = audit(1).getAs[Double]("dev_cum")
    assert(devCum < devB2 && devCum > devB1)
    assert(audit(1).getAs[Long]("n_total") == 500L)
  }
}
