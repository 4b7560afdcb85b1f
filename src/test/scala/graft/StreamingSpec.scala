package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sources.PartitionedParquetStore
import graft.streaming.MicroBatchUpsert

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("available-now micro-batch + foreachBatch upsert (§2.9)") {
    implicit val sq = spark.sqlContext
    val root = tmpDir("stream-store")
    val ckpt = tmpDir("stream-ckpt")
    val store = new PartitionedParquetStore(spark, root)

    val mem = MemoryStream[(Long, String, Timestamp)]
    mem.addData(
      (1L, "a", Timestamp.valueOf("2024-01-05 10:00:00")),
      (1L, "a", Timestamp.valueOf("2024-01-05 10:00:00")), // in-batch dup
      (2L, "b", Timestamp.valueOf("2024-02-05 10:00:00")))
    val stream = mem.toDF().toDF("id", "v", "timestamp")

    val q1 = MicroBatchUpsert.availableNowUpsert(stream, store, "timestamp", ckpt)
    q1.awaitTermination(60000)
    assert(store.read().count() === 2) // dup collapsed by distinct upsert

    // second trigger: replays nothing (checkpoint), new data merges
    mem.addData((3L, "c", Timestamp.valueOf("2024-02-07 10:00:00")))
    val q2 = MicroBatchUpsert.availableNowUpsert(stream, store, "timestamp", ckpt)
    q2.awaitTermination(60000)
    assert(store.read().count() === 3)
    assert(store.read(months = Seq((2024, 2))).count() === 2)
  }

  test("watermarked streaming dedup drops in-stream duplicates") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val deduped = MicroBatchUpsert.dedupedStream(
      mem.toDF().toDF("id", "ts"), "ts", "1 hour", Seq("id"))
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    mem.addData((1L, Timestamp.valueOf("2024-01-01 00:00:00")),
                (1L, Timestamp.valueOf("2024-01-01 00:10:00")),
                (2L, Timestamp.valueOf("2024-01-01 00:20:00")))
    q.processAllAvailable()
    q.stop()
    assert(spark.table("dedup_out").count() === 2)
  }
}
