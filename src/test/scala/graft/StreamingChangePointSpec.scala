package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.ChangePoint
import graft.streaming.StreamingChangePoint
import graft.streaming.StreamingChangePoint.Point

/** Streaming CUSUM maintenance must equal the batch chart over all
  * data ever seen — bit for bit, across a checkpoint restart. */
class StreamingChangePointSpec extends SparkSpec {
  import spark.implicits._

  test("streamed charts == batch cusumSummary, across restart") {
    implicit val sq = spark.sqlContext
    val path = tmpDir("cusum-log") + "/log"
    val ckpt = tmpDir("cusum-ckpt")

    // deterministic series per key; values swing around target+slack=60
    def pts(r: Range) = r.map { i =>
      Point(i % 7L, i.toLong, (i * 37 % 113).toDouble)
    }

    val mem = MemoryStream[Point]
    mem.addData(pts(1 to 400): _*)
    mem.addData(pts(401 to 900): _*)
    val q1 = StreamingChangePoint.maintain(mem.toDS(), 50.0, 10.0, 60.0,
                                           path, ckpt)
    q1.awaitTermination(60000)

    // restart from checkpoint; only the new batch folds in
    mem.addData(pts(901 to 1200): _*)
    val q2 = StreamingChangePoint.maintain(mem.toDS(), 50.0, 10.0, 60.0,
                                           path, ckpt)
    q2.awaitTermination(60000)

    val streamed = StreamingChangePoint.current(spark, path)
      .select($"key", $"n_points", $"n_alarms",
              round($"peak_cusum", 6).as("peak"),
              when($"first_alarm_seq" < 0, lit(null)).otherwise($"first_alarm_seq")
                .as("first"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) -1L else r.getLong(4))).toMap

    val batch = ChangePoint.cusumSummary(
        pts(1 to 1200).toDF().toDF("k", "seq", "x"),
        "k", Seq(col("seq")), "x", "seq", 50.0, 10.0, 60.0)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) -1L else r.getLong(4))).toMap

    assert(streamed == batch)
    assert(streamed.keySet == (0L to 6L).toSet)
    assert(streamed.values.map(_._1).sum == 1200L)
    assert(streamed.values.exists(_._2 > 0), "series should alarm somewhere")
  }
}
