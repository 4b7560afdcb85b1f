package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.sources.PartitionedParquetStore

class PartitionedParquetStoreSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def batch1 = Seq(
    (1L, "a", ts("2024-01-05 10:00:00")),
    (2L, "b", ts("2024-01-15 10:00:00")),
    (3L, "c", ts("2024-02-01 10:00:00"))
  ).toDF("id", "v", "timestamp")

  test("upsertDistinct: double-run is byte-idempotent (K2+A1)") {
    val root = tmpDir("store-distinct")
    val store = new PartitionedParquetStore(spark, root)
    store.upsertDistinct(batch1, "timestamp")
    assert(store.read().count() === 3)
    store.upsertDistinct(batch1, "timestamp") // re-run: no dup rows
    assert(store.read().count() === 3)
    // new row in existing month merges, history preserved
    store.upsertDistinct(
      Seq((1L, "a2", ts("2024-01-06 10:00:00"))).toDF("id", "v", "timestamp"),
      "timestamp")
    assert(store.read().count() === 4)
  }

  test("upsertKeepLatest: newest timestamp wins per key (K2+A2)") {
    val root = tmpDir("store-latest")
    val store = new PartitionedParquetStore(spark, root)
    store.upsertKeepLatest(batch1, Seq("id"), "timestamp")
    store.upsertKeepLatest(
      Seq((1L, "a-new", ts("2024-01-20 10:00:00"))).toDF("id", "v", "timestamp"),
      Seq("id"), "timestamp")
    val out = store.read().orderBy("id").select("v").as[String].collect()
    assert(out.toSeq === Seq("a-new", "b", "c"))
  }

  test("upsertNewestBatch matches upsertKeepLatest under the live-collection contract") {
    val rootFast = tmpDir("store-fast")
    val rootSlow = tmpDir("store-slow")
    val fast = new PartitionedParquetStore(spark, rootFast)
    val slow = new PartitionedParquetStore(spark, rootSlow)
    // batch 2 is newer than batch 1 for every key it touches, and has
    // an internal dup on id=1 (the batch-local dedup path)
    val batch2 = Seq(
      (1L, "a-new", ts("2024-01-20 10:00:00")),
      (1L, "a-old", ts("2024-01-19 10:00:00")),
      (4L, "d", ts("2024-02-10 10:00:00"))
    ).toDF("id", "v", "timestamp")
    for (store <- Seq(fast, slow)) {
      if (store eq fast) { store.upsertNewestBatch(batch1, Seq("id"), "timestamp")
                           store.upsertNewestBatch(batch2, Seq("id"), "timestamp") }
      else               { store.upsertKeepLatest(batch1, Seq("id"), "timestamp")
                           store.upsertKeepLatest(batch2, Seq("id"), "timestamp") }
    }
    val f = fast.read().orderBy("id").select("id", "v").collect().map(_.toSeq)
    val s = slow.read().orderBy("id").select("id", "v").collect().map(_.toSeq)
    assert(f.toSeq === s.toSeq)
    assert(f.map(_(1)).toSeq === Seq("a-new", "b", "c", "d"))
    // idempotent re-run
    fast.upsertNewestBatch(batch2, Seq("id"), "timestamp")
    assert(fast.read().count() === 4)
  }

  test("dynamic overwrite leaves untouched partitions alone") {
    val root = tmpDir("store-dynamic")
    val store = new PartitionedParquetStore(spark, root)
    store.upsertDistinct(batch1, "timestamp")
    val febFilesBefore = new java.io.File(s"$root/year=2024/month=2")
      .listFiles().map(_.getName).toSet
    // touch only January
    store.upsertDistinct(
      Seq((9L, "z", ts("2024-01-25 10:00:00"))).toDF("id", "v", "timestamp"),
      "timestamp")
    val febFilesAfter = new java.io.File(s"$root/year=2024/month=2")
      .listFiles().map(_.getName).toSet
    assert(febFilesBefore === febFilesAfter) // February never rewritten
    assert(store.read().count() === 4)
  }

  test("one-file-per-month-partition layout contract (K1)") {
    val root = tmpDir("store-onefile")
    val store = new PartitionedParquetStore(spark, root)
    store.upsertDistinct(batch1, "timestamp")
    for (m <- Seq(1, 2)) {
      val files = new java.io.File(s"$root/year=2024/month=$m")
        .listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1, s"month $m should hold exactly one file")
    }
  }

  test("month-pruned, column-projected read shows partition filters (S5/P3/P4)") {
    val root = tmpDir("store-prune")
    val store = new PartitionedParquetStore(spark, root)
    store.upsertDistinct(batch1, "timestamp")
    val q = store.read(months = Seq((2024, 1)), columns = Seq("id", "v"))
    assert(q.count() === 2)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("year"),
      s"expected partition pruning in plan:\n$plan")
    assert(plan.contains("ReadSchema") && !plan.contains("timestamp:"),
      "projection should prune the timestamp column from the scan")
  }

  test("missing table reads as None (start-fresh semantics)") {
    val store = new PartitionedParquetStore(spark, tmpDir("nope") + "/does-not-exist")
    assert(store.readOpt().isEmpty)
  }
}
