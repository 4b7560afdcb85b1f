package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingHeavyHitters

/** Streaming heavy hitters: keyed state accumulates across batches
  * and restarts; the derived top-k equals the batch recompute. */
class StreamingHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("running counts accumulate across batches; top-k == batch truth") {
    implicit val sq = spark.sqlContext
    val ckpt = tmpDir("hh-ckpt")
    val log = tmpDir("hh-log") + "/log"
    val mem = MemoryStream[Long]
    // batch 1: key 7 hot; batch 2: key 9 overtakes
    mem.addData(Seq.fill(5)(7L) ++ Seq(1L, 2L, 3L): _*)
    mem.addData(Seq.fill(9)(9L) ++ Seq.fill(2)(7L) ++ Seq(1L): _*)
    val q1 = StreamingHeavyHitters.track(mem.toDS(), log, ckpt)
    q1.awaitTermination(60000)

    val top = StreamingHeavyHitters.currentTopK(spark, log, 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(top.toSeq == Seq((1, 9L, 9L), (2, 7L, 7L), (3, 1L, 2L)))

    // restart from checkpoint: state survives, only new data folds
    mem.addData(Seq.fill(6)(7L): _*)
    val q2 = StreamingHeavyHitters.track(mem.toDS(), log, ckpt)
    q2.awaitTermination(60000)
    val top2 = StreamingHeavyHitters.currentTopK(spark, log, 1)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(top2.head == (7L, 13L)) // 5 + 2 + 6, across a restart
  }
}
