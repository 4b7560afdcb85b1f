package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Scd
import graft.streaming.StreamingScd

class StreamingScdSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  test("streaming PSI monitor: stable batch scores low, shifted batch alarms") {
    implicit val sq = spark.sqlContext
    val path = tmpDir("drift-table")
    val ckpt = tmpDir("drift-ckpt")
    val reference = (1 to 100).map(_.toDouble).toDF("x")

    val mem = MemoryStream[Double]
    val stream = mem.toDF().toDF("x")
    mem.addData((1 to 100).map(_.toDouble): _*)    // same distribution
    graft.streaming.StreamingDrift.psiMonitor(stream, reference, "x",
        0, 100, 10, path, ckpt).awaitTermination(60000)
    mem.addData((51 to 150).map(_.toDouble): _*)   // half the mass leaves
    graft.streaming.StreamingDrift.psiMonitor(stream, reference, "x",
        0, 100, 10, path, ckpt).awaitTermination(60000)

    val audit = spark.read.parquet(path)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(audit(0L) === 0.0)
    assert(audit(1L) > 0.25)
  }

  test("streamed SCD2 over two micro-batches equals the batch rebuild") {
    implicit val sq = spark.sqlContext
    val path = tmpDir("scd2-table")
    val ckpt = tmpDir("scd2-ckpt")

    val b1 = Seq(
      (1L, ts("2024-01-01"), 1L, "A"),
      (1L, ts("2024-01-02"), 2L, "B"),
      (2L, ts("2024-01-01"), 3L, "X"))
    val b2 = Seq(
      (1L, ts("2024-02-01"), 10L, "A"),  // new version for key 1
      (2L, ts("2024-02-01"), 11L, "X"),  // repeat state: collapses
      (9L, ts("2024-02-01"), 12L, "N"))  // brand-new key

    val mem = MemoryStream[(Long, Timestamp, Long, String)]
    val stream = mem.toDF().toDF("k", "at", "seq", "state")

    mem.addData(b1: _*)
    StreamingScd.availableNowScd2(stream, path, ckpt, Seq("k"), "at",
                                  "seq", Seq("state"))
      .awaitTermination(60000)
    mem.addData(b2: _*)
    StreamingScd.availableNowScd2(stream, path, ckpt, Seq("k"), "at",
                                  "seq", Seq("state"))
      .awaitTermination(60000)

    val streamed = spark.read.parquet(path)
    val full = Scd.scd2((b1 ++ b2).toDF("k", "at", "seq", "state"),
                        Seq("k"), col("at"), Seq(col("seq")), Seq("state"))
    assert(streamed.exceptAll(full).count() === 0L)
    assert(full.exceptAll(streamed).count() === 0L)
    assert(streamed.filter($"is_current").count() === 3L) // keys 1, 2, 9
  }
}
