package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.sources.BucketedStateStore

class BucketedStateStoreSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def row(k: Long, id: Long, t: String, v: Double) =
    (k, id, ts(t), v)

  private val order = Seq(col("ts").desc, col("id").desc)

  test("merge chain equals one full-rebuild keep-latest, out-of-order batches included") {
    val root = tmpDir("bucketed-merge")
    val store = new BucketedStateStore(spark, root, Seq("k"), 8)
    // batch 2 carries OLDER rows for key 1 than batch 1 — the stale
    // row must lose (mergeSmallUpdates' newest-batch precondition
    // does not hold; this is the general path)
    val b1 = Seq(row(1L, 10L, "2024-06-05 00:00:00", 1.0),
                 row(2L, 11L, "2024-06-01 00:00:00", 2.0))
      .toDF("k", "id", "ts", "v")
    val b2 = Seq(row(1L, 9L, "2024-06-04 00:00:00", 9.9), // stale for k=1
                 row(3L, 12L, "2024-06-02 00:00:00", 3.0))
      .toDF("k", "id", "ts", "v")
    store.merge(b1, order)
    store.merge(b2, order)
    val got = store.read().select(col("k"), col("id"), col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val rebuild = graft.operators.Dedup
      .keepLatest(b1.unionByName(b2), Seq("k"), order)
      .select(col("k"), col("id"), col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got == rebuild)
    assert(got == Set((1L, 10L, 1.0), (2L, 11L, 2.0), (3L, 12L, 3.0)))
  }

  test("replaying a batch is a no-op (newest-wins idempotence)") {
    val root = tmpDir("bucketed-idem")
    val store = new BucketedStateStore(spark, root, Seq("k"), 8)
    val b1 = Seq(row(1L, 10L, "2024-06-05 00:00:00", 1.0),
                 row(2L, 11L, "2024-06-01 00:00:00", 2.0))
      .toDF("k", "id", "ts", "v")
    store.merge(b1, order)
    val before = store.read().orderBy("k").collect().toSeq
    store.merge(b1, order)
    assert(store.read().orderBy("k").collect().toSeq == before)
  }

  test("a merge never touches buckets its batch does not hit (the 100 TB economics)") {
    val root = tmpDir("bucketed-prune")
    val store = new BucketedStateStore(spark, root, Seq("k"), 64)
    // seed many keys across many buckets
    val seed = (1L to 200L)
      .map(k => row(k, k, "2024-06-01 00:00:00", k.toDouble))
      .toDF("k", "id", "ts", "v")
    store.merge(seed, order)
    val bucketOf = spark.range(1)
      .select(pmod(hash(lit(777L)), lit(64))).head().getInt(0)
    def listing(): Map[String, Long] = {
      val base = new java.io.File(root)
      base.listFiles().filter(_.getName.startsWith("bucket="))
        .filterNot(_.getName == s"bucket=$bucketOf")
        .flatMap(d => d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => f.getPath -> f.lastModified()))
        .toMap
    }
    val before = listing()
    assert(before.nonEmpty)
    // one new key -> exactly one touched bucket
    store.merge(Seq(row(777L, 999L, "2024-06-09 00:00:00", 7.0))
      .toDF("k", "id", "ts", "v"), order)
    assert(listing() == before,
      "untouched bucket directories were rewritten — pruning regressed")
    // and the new row is present
    assert(store.read().filter(col("k") === 777L).count() == 1L)
  }

  test("streamed keyed merge over two micro-batches equals the batch keep-latest; replay converges") {
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = tmpDir("stream-merge-table")
    val b1 = Seq(row(1L, 10L, "2024-06-05 00:00:00", 1.0),
                 row(2L, 11L, "2024-06-01 00:00:00", 2.0))
    val b2 = Seq(row(1L, 9L, "2024-06-04 00:00:00", 9.9), // stale: loses
                 row(3L, 12L, "2024-06-02 00:00:00", 3.0))
    val mem = MemoryStream[(Long, Long, java.sql.Timestamp, Double)]
    val stream = mem.toDF().toDF("k", "id", "ts", "v")
    val ckpt = tmpDir("stream-merge-ckpt")
    mem.addData(b1: _*)
    graft.streaming.StreamingKeyedMerge.availableNowMerge(
      stream, root, ckpt, Seq("k"), order, nBuckets = 8)
      .awaitTermination(60000)
    mem.addData(b2: _*)
    graft.streaming.StreamingKeyedMerge.availableNowMerge(
      stream, root, ckpt, Seq("k"), order, nBuckets = 8)
      .awaitTermination(60000)
    def state() = spark.read.parquet(root)
      .select(col("k"), col("id"), col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val expected = graft.operators.Dedup
      .keepLatest((b1 ++ b2).toDF("k", "id", "ts", "v"), Seq("k"), order)
      .select(col("k"), col("id"), col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(state() == expected)
    // at-least-once replay (failure between store write and checkpoint
    // commit): a fresh checkpoint re-delivers EVERYTHING; newest-wins
    // idempotence converges to the same state
    val mem2 = MemoryStream[(Long, Long, java.sql.Timestamp, Double)]
    mem2.addData((b1 ++ b2): _*)
    graft.streaming.StreamingKeyedMerge.availableNowMerge(
      mem2.toDF().toDF("k", "id", "ts", "v"), root,
      tmpDir("stream-merge-ckpt2"), Seq("k"), order, nBuckets = 8)
      .awaitTermination(60000)
    assert(state() == expected)
  }

  test("rescale is identity on contents; the bucket layout actually changes; merges continue") {
    val root = tmpDir("bucketed-rescale")
    val store = new BucketedStateStore(spark, root, Seq("k"), 8)
    val seed = (1L to 120L)
      .map(k => row(k, k, "2024-06-01 00:00:00", k.toDouble))
      .toDF("k", "id", "ts", "v")
    store.merge(seed, order)
    def rows(s: BucketedStateStore) =
      s.read().select(col("k"), col("id"), col("v"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
    val before = rows(store)
    def bucketDirs() = new java.io.File(root).listFiles()
      .map(_.getName).filter(_.startsWith("bucket=")).toSet
    assert(bucketDirs().size == 8) // 120 keys hit all 8 buckets
    val grown = store.rescale(24)
    assert(grown.nBuckets == 24)
    assert(rows(grown) == before, "rescale moved row contents")
    assert(bucketDirs().size > 8, "bucket layout did not change")
    assert(!new java.io.File(root + ".rescale.tmp").exists(),
      "rescale left its temp directory behind")
    // shrink back down: still identity
    val shrunk = grown.rescale(3)
    assert(rows(shrunk) == before)
    assert(bucketDirs().size == 3)
    // merges keep working at the new bucketing, newest-wins intact
    shrunk.merge(Seq(row(7L, 999L, "2024-06-09 00:00:00", 70.0))
      .toDF("k", "id", "ts", "v"), order)
    val after = rows(shrunk)
    assert(after == before - ((7L, 7L, 7.0)) + ((7L, 999L, 70.0)))
  }

  test("an interrupted rescale is recovered by the NEXT READ, not just the next rescale") {
    // crash window: rescale renamed root -> .rescale.old and died
    // before renaming .tmp -> root. The sole complete copy sits at
    // .old; a readOpt()/merge() that treated root-missing as
    // brand-new would strand it and rebuild state from one batch.
    val root = tmpDir("bucketed-crash")
    val store = new BucketedStateStore(spark, root, Seq("k"), 8)
    val seed = (1L to 40L)
      .map(k => row(k, k, "2024-06-01 00:00:00", k.toDouble))
      .toDF("k", "id", "ts", "v")
    store.merge(seed, order)
    val before = store.read().select(col("k"), col("id"), col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    // simulate the mid-swap crash
    assert(new java.io.File(root)
      .renameTo(new java.io.File(root + ".rescale.old")))
    assert(!new java.io.File(root).exists())
    // a plain read recovers the surviving copy first
    val got = store.read().select(col("k"), col("id"), col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got == before, "recovery lost rows")
    assert(new java.io.File(root).exists())
    assert(!new java.io.File(root + ".rescale.old").exists())
    // and a merge after the same crash folds INTO the recovered state
    assert(new java.io.File(root)
      .renameTo(new java.io.File(root + ".rescale.old")))
    store.merge(Seq(row(99L, 500L, "2024-06-09 00:00:00", 9.0))
      .toDF("k", "id", "ts", "v"), order)
    assert(store.read().count() == 41L,
      "merge after an interrupted rescale rebuilt state from one batch")
  }

  test("refusals: empty keys, absurd bucket counts, read before first merge") {
    intercept[IllegalArgumentException] {
      new BucketedStateStore(spark, tmpDir("x"), Nil, 8)
    }
    intercept[IllegalArgumentException] {
      new BucketedStateStore(spark, tmpDir("x"), Seq("k"), 0)
    }
    intercept[IllegalStateException] {
      new BucketedStateStore(spark, tmpDir("empty-state") + "/none",
        Seq("k"), 8).read()
    }
  }
}
