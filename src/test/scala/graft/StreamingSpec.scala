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

  test("mapGroupsWithState: keyed state accumulates across micro-batches") {
    implicit val sq = spark.sqlContext
    import graft.streaming.StatefulAggregate
    import graft.streaming.StatefulAggregate.Ev
    val mem = MemoryStream[Ev]
    val q = StatefulAggregate.runningUserStats(mem.toDS())
      .writeStream.format("memory").queryName("stateful_out")
      .outputMode("update").start()
    mem.addData(Ev(1L, 10.0), Ev(1L, 20.0), Ev(2L, 5.0))
    q.processAllAvailable()
    val b1 = spark.table("stateful_out").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(b1(1L) === ((2, 30.0)) && b1(2L) === ((1, 5.0)))
    mem.addData(Ev(1L, 5.0)) // second batch: state must carry over
    q.processAllAvailable()
    q.stop()
    val b2 = spark.table("stateful_out").collect()
      .filter(_.getLong(0) == 1L).map(r => (r.getInt(1), r.getDouble(2))).toSeq
    assert(b2.contains((3, 35.0)), s"state did not accumulate: $b2")
  }

  test("transformWithState: per-source token budget persists across batches") {
    implicit val sq = spark.sqlContext
    import graft.streaming.BudgetedIntake
    import graft.streaming.BudgetedIntake.Doc
    // The new arbitrary-state API requires the RocksDB state store.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Doc]
      val q = BudgetedIntake.budgetedIntake(mem.toDS(), budget = 100L)
        .writeStream.format("memory").queryName("budget_out")
        .outputMode("append").start()
      // Batch 1: src_a consumes 90 of its 100-token budget.
      mem.addData(Doc("src_a", 1L, 60L), Doc("src_b", 2L, 10L))
      q.processAllAvailable()
      mem.addData(Doc("src_a", 3L, 30L))
      q.processAllAvailable()
      // Batch 3: src_a is at 90 < 100 → doc 4 still accepted (greedy,
      // crosses the line); src_b is far under budget and keeps going.
      mem.addData(Doc("src_a", 4L, 50L), Doc("src_b", 6L, 20L))
      q.processAllAvailable()
      // Batch 4: src_a is now at 140 >= 100 → doc 5 must be rejected.
      mem.addData(Doc("src_a", 5L, 1L))
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("budget_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows === Set(
        ("src_a", 1L, 60L), ("src_b", 2L, 10L),
        ("src_a", 3L, 90L),
        ("src_a", 4L, 140L), ("src_b", 6L, 30L)))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("transformWithState: budget state survives a query restart") {
    implicit val sq = spark.sqlContext
    import graft.streaming.BudgetedIntake
    import graft.streaming.BudgetedIntake.Doc
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ckpt = tmpDir("budget-ckpt")
      val mem = MemoryStream[Doc]
      // The memory sink can't recover from a checkpoint; foreachBatch
      // is the recoverable sink shape (same as MicroBatchUpsert).
      val acc = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
      def start() = BudgetedIntake.budgetedIntake(mem.toDS(), budget = 100L)
        .writeStream
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[BudgetedIntake.Accepted], _: Long) =>
            val rows = batch.collect()
            acc.synchronized {
              acc ++= rows.map(a => (a.source, a.docId, a.cumTokens))
            }
            ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      val q1 = start()
      mem.addData(Doc("s", 1L, 95L))
      q1.processAllAvailable()
      q1.stop()
      // Restart from the checkpoint: the RocksDB counter (95) must be
      // recovered, so doc 2 is accepted AT 105 (not at 10) and doc 3
      // is rejected.
      val q2 = start()
      mem.addData(Doc("s", 2L, 10L))
      q2.processAllAvailable()
      mem.addData(Doc("s", 3L, 1L))
      q2.processAllAvailable()
      q2.stop()
      val rows = acc.synchronized(acc.toSet)
      assert(rows === Set(("s", 1L, 95L), ("s", 2L, 105L)))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
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

  test("sliding-window streaming aggregation: events count into overlapping windows") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val agg = mem.toDF().toDF("id", "ts")
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 day", "12 hours").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(date_format($"w.start", "yyyy-MM-dd HH:mm").as("w_start"), $"n")
    val q = agg.writeStream.format("memory").queryName("slide_out")
      .outputMode("complete").start()
    mem.addData((1L, Timestamp.valueOf("2024-01-01 13:00:00")),
                (2L, Timestamp.valueOf("2024-01-01 23:00:00")),
                (3L, Timestamp.valueOf("2024-01-02 01:00:00")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("slide_out").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 13:00 + 23:00 -> windows starting 01-01 00:00 and 12:00;
    // 01-02 01:00 -> windows starting 01-01 12:00 and 01-02 00:00.
    assert(got === Map(
      "2024-01-01 00:00" -> 2L, "2024-01-01 12:00" -> 3L,
      "2024-01-02 00:00" -> 1L))
  }

  test("stream-static enrichment join: batch dim broadcast into each micro-batch") {
    implicit val sq = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("uid", "tier")
    val mem = MemoryStream[(Long, Double)]
    val enriched = mem.toDF().toDF("uid", "amt")
      .join(broadcast(dim), Seq("uid"), "left")
      .select($"uid", $"amt", coalesce($"tier", lit("unknown")).as("tier"))
    val q = enriched.writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    mem.addData((1L, 10.0), (2L, 5.0), (3L, 1.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("enrich_out").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    assert(got === Set((1L, 10.0, "gold"), (2L, 5.0, "basic"),
                       (3L, 1.0, "unknown")))
  }

  test("sliding-window append mode emits only watermark-closed windows") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val agg = mem.toDF().toDF("id", "ts")
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 day", "12 hours").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(date_format($"w.start", "yyyy-MM-dd HH:mm").as("w_start"), $"n")
    val q = agg.writeStream.format("memory").queryName("slide_append")
      .outputMode("append").start()
    mem.addData((1L, Timestamp.valueOf("2024-01-01 13:00:00")),
                (2L, Timestamp.valueOf("2024-01-01 23:00:00")))
    q.processAllAvailable()
    // watermark 22:00 < earliest window end (01-02 00:00): nothing final
    assert(spark.table("slide_append").count() === 0)
    mem.addData((3L, Timestamp.valueOf("2024-01-03 12:30:00")))
    q.processAllAvailable()
    q.stop()
    // watermark 01-03 11:30 closes both day-1 windows; event 3's own
    // windows end after it and stay open (append never emits them)
    val got = spark.table("slide_append").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("2024-01-01 00:00" -> 2L, "2024-01-01 12:00" -> 2L))
  }

  test("flatMapGroupsWithState sessionization: in-batch and timeout closure (§2.9)") {
    implicit val sq = spark.sqlContext
    import graft.streaming.StreamingSessionize
    import graft.streaming.StreamingSessionize.Click
    val mem = MemoryStream[Click]
    val q = StreamingSessionize.closedSessions(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    // batch 1: two close events then a >30min jump — the jump closes
    // the first session IN BATCH
    mem.addData(
      Click(1L, Timestamp.valueOf("2024-01-01 10:00:00")),
      Click(1L, Timestamp.valueOf("2024-01-01 10:10:00")),
      Click(1L, Timestamp.valueOf("2024-01-01 12:00:00")))
    q.processAllAvailable()
    val afterB1 = spark.table("sessions_out").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getInt(3)))
    assert(afterB1.toSeq === Seq((1L, "2024-01-01 10:00:00.0", 2)))
    // batches 2-3: another user's events push the watermark past
    // user 1's open-session timeout (12:00 + 30min) → TIMEOUT closure
    mem.addData(Click(2L, Timestamp.valueOf("2024-01-01 14:00:00")))
    q.processAllAvailable()
    mem.addData(Click(2L, Timestamp.valueOf("2024-01-01 14:01:00")))
    q.processAllAvailable()
    q.stop()
    val u1 = spark.table("sessions_out").collect()
      .filter(_.getLong(0) == 1L)
      .map(r => (r.getTimestamp(1).toString, r.getTimestamp(2).toString, r.getInt(3)))
    assert(u1.toSet === Set(
      ("2024-01-01 10:00:00.0", "2024-01-01 10:10:00.0", 2),
      ("2024-01-01 12:00:00.0", "2024-01-01 12:00:00.0", 1)),
      s"got $u1")
  }

  test("sessionization merges admitted out-of-order events, lowering session start") {
    implicit val sq = spark.sqlContext
    import graft.streaming.StreamingSessionize
    import graft.streaming.StreamingSessionize.Click
    val mem = MemoryStream[Click]
    val q = StreamingSessionize.closedSessions(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions_ooo")
      .outputMode("append").start()
    mem.addData(Click(1L, Timestamp.valueOf("2024-01-01 12:00:00")))
    q.processAllAvailable() // watermark after batch: 11:30
    // late-but-admitted event BEFORE the open session start must extend
    // the span backwards, exactly as q44's sorted batch semantics would
    mem.addData(Click(1L, Timestamp.valueOf("2024-01-01 11:35:00")))
    q.processAllAvailable()
    // advance the watermark past 12:30 with another user → timeout close
    mem.addData(Click(2L, Timestamp.valueOf("2024-01-01 14:00:00")))
    q.processAllAvailable()
    mem.addData(Click(2L, Timestamp.valueOf("2024-01-01 14:01:00")))
    q.processAllAvailable()
    q.stop()
    val u1 = spark.table("sessions_ooo").collect()
      .filter(_.getLong(0) == 1L)
      .map(r => (r.getTimestamp(1).toString, r.getTimestamp(2).toString, r.getInt(3)))
    assert(u1.toSeq === Seq(("2024-01-01 11:35:00.0", "2024-01-01 12:00:00.0", 2)),
      s"got ${u1.toSeq}")
  }

  test("corpus dedup: micro-batches dedup against ALL accepted history") {
    implicit val sq = spark.sqlContext
    import graft.streaming.StreamingCorpusDedup
    val store = tmpDir("corpus-hashes") + "/hashes"
    val ckpt = tmpDir("corpus-ckpt")
    val accepted = scala.collection.mutable.Buffer.empty[String]
    def acceptInto(batch: org.apache.spark.sql.DataFrame): Unit =
      accepted ++= batch.select("text").collect().map(_.getString(0))

    val mem = MemoryStream[(Long, String)]
    mem.addData((1L, "the quick fox"), (2L, "the quick fox"), (3L, "doc two"))
    val q1 = StreamingCorpusDedup.run(
      mem.toDF().toDF("doc_id", "text"), "text", store, ckpt)(acceptInto)
    q1.awaitTermination(60000)
    assert(accepted.sorted === Seq("doc two", "the quick fox")) // in-batch dup dropped

    // a LATER run (fresh trigger, same checkpoint+store): the repeat of
    // batch-1 content is rejected against the persisted history, far
    // outside any watermark window
    mem.addData((4L, "the quick fox"), (5L, "doc three"))
    val q2 = StreamingCorpusDedup.run(
      mem.toDF().toDF("doc_id", "text"), "text", store, ckpt)(acceptInto)
    q2.awaitTermination(60000)
    assert(accepted.sorted === Seq("doc three", "doc two", "the quick fox"))
    // the store carries exactly the accepted hashes
    assert(spark.read.parquet(store).distinct().count() === 3)
  }

  test("bucketed corpus dedup: correct across runs, store side never shuffles") {
    implicit val sq = spark.sqlContext
    import graft.streaming.StreamingCorpusDedup
    import spark.implicits._
    val table = "corpus_hashes_bucketed"
    val ckpt = tmpDir("bcorpus-ckpt")
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val accepted = scala.collection.mutable.Buffer.empty[String]
    def acceptInto(batch: org.apache.spark.sql.DataFrame): Unit =
      accepted ++= batch.select("text").collect().map(_.getString(0))

    val mem = MemoryStream[(Long, String)]
    mem.addData((1L, "alpha doc"), (2L, "alpha doc"), (3L, "beta doc"))
    val q1 = StreamingCorpusDedup.runBucketed(
      mem.toDF().toDF("doc_id", "text"), "text", table, nBuckets = 8, ckpt)(acceptInto)
    q1.awaitTermination(60000)
    assert(accepted.sorted === Seq("alpha doc", "beta doc"))

    // later run, same store table: history rejects the repeat
    mem.addData((4L, "alpha doc"), (5L, "gamma doc"))
    val q2 = StreamingCorpusDedup.runBucketed(
      mem.toDF().toDF("doc_id", "text"), "text", table, nBuckets = 8, ckpt)(acceptInto)
    q2.awaitTermination(60000)
    assert(accepted.sorted === Seq("alpha doc", "beta doc", "gamma doc"))
    assert(spark.table(table).distinct().count() === 3)

    // THE plan contract this variant exists for: with broadcast off
    // (at scale the store side is 300 GB — never broadcastable), the
    // anti-join plans as sort-merge with exactly ONE Exchange — the
    // batch shuffling into the store's buckets. Appends went through
    // the same bucket spec, so the multi-append store still qualifies.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val batch = Seq("alpha doc", "delta doc").toDF("text")
        .withColumn("content_hash", org.apache.spark.sql.functions.md5($"text"))
      val fresh = StreamingCorpusDedup.freshVsBucketedStore(batch, table)
      assert(fresh.collect().map(_.getAs[String]("text")).toSeq === Seq("delta doc"))
      // Count exchanges by walking the FINAL plan tree (the plan's
      // toString also prints AQE's initial plan, double-counting).
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
      def countExchanges(p: SparkPlan): Int = p match {
        case a: AdaptiveSparkPlanExec => countExchanges(a.executedPlan)
        case s: QueryStageExec        => countExchanges(s.plan)
        case e: ShuffleExchangeLike   => 1 + e.children.map(countExchanges).sum
        case other                    => other.children.map(countExchanges).sum
      }
      val nExchanges = countExchanges(fresh.queryExecution.executedPlan)
      assert(nExchanges === 1,
        s"expected exactly 1 Exchange (batch side only), got $nExchanges:\n" +
          fresh.queryExecution.executedPlan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  test("streaming EMBEDDING near-dup: in-batch cosine pairs + SRP bucket history") {
    implicit val sq = spark.sqlContext
    import graft.streaming.StreamingCorpusDedup
    val vA = Array(10.0f, 0.0f, 0.0f, 0.0f)
    val vB = Array(10.0f, 0.1f, 0.0f, 0.0f) // cos(A,B) ≈ 0.99995
    val vC = Array(0.0f, 10.0f, 0.0f, 0.0f)
    val vD = Array(0.0f, 0.0f, 10.0f, 0.0f)
    val store = tmpDir("embdedup-store") + "/buckets"
    val ckpt = tmpDir("embdedup-ckpt")
    val accepted = scala.collection.mutable.Buffer.empty[Long]
    def acceptInto(batch: org.apache.spark.sql.DataFrame): Unit =
      accepted ++= batch.select("vec_id").collect().map(_.getLong(0))

    val mem = MemoryStream[(Long, Array[Float])]
    // batch 1: B collides with A in its SRP bucket at cos >= 0.9 →
    // keep-lowest-id keeps 1; C is a different direction.
    mem.addData((1L, vA), (2L, vB), (3L, vC))
    val q1 = StreamingCorpusDedup.runEmbeddingNearDup(
      mem.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      store, ckpt, dim = 4)(acceptInto)
    q1.awaitTermination(60000)
    assert(accepted.sorted === Seq(1L, 3L))

    // batch 2 (later run, same store): another near-parallel of A hits
    // the persisted bucket history; D is a fresh direction.
    mem.addData((4L, vA), (5L, vD))
    val q2 = StreamingCorpusDedup.runEmbeddingNearDup(
      mem.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      store, ckpt, dim = 4)(acceptInto)
    q2.awaitTermination(60000)
    assert(accepted.sorted === Seq(1L, 3L, 5L))
    // store holds one bucket row per accepted doc
    assert(spark.read.parquet(store).select("doc").distinct()
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L, 5L))
  }

  test("streaming NEAR-dup dedup: in-batch components + bucket history") {
    implicit val sq = spark.sqlContext
    import graft.streaming.StreamingCorpusDedup
    val docA = "the quick brown fox jumps over the lazy dog near the river bank today"
    val docB = "the quick brown fox jumps over the lazy dog near the river bank tonight"
    val docC = "completely different words about spark engines and columnar execution plans"
    val docD = "another entirely unrelated document describing weather and travel patterns"
    val store = tmpDir("neardup-store") + "/buckets"
    val ckpt = tmpDir("neardup-ckpt")
    val accepted = scala.collection.mutable.Buffer.empty[Long]
    def acceptInto(batch: org.apache.spark.sql.DataFrame): Unit =
      accepted ++= batch.select("doc_id").collect().map(_.getLong(0))

    val mem = MemoryStream[(Long, String)]
    // batch 1: A and its near-dup collide in-batch → only min id (1)
    // survives; C is distinct.
    mem.addData((1L, docA), (2L, docB), (3L, docC))
    val q1 = StreamingCorpusDedup.runNearDup(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", store, ckpt)(acceptInto)
    q1.awaitTermination(60000)
    assert(accepted.sorted === Seq(1L, 3L))

    // batch 2 (later run, same store): another near-dup of A is caught
    // by the persisted bucket history; D is fresh.
    mem.addData((4L, docB), (5L, docD))
    val q2 = StreamingCorpusDedup.runNearDup(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", store, ckpt)(acceptInto)
    q2.awaitTermination(60000)
    assert(accepted.sorted === Seq(1L, 3L, 5L))
    // store holds bucket rows only for accepted docs
    assert(spark.read.parquet(store).select("doc").distinct()
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L, 5L))
  }

  test("stream-stream interval join: clicks attribute within the window") {
    implicit val sq = spark.sqlContext
    import graft.streaming.StreamJoins
    val imps = MemoryStream[(Long, Timestamp)]
    val clks = MemoryStream[(Long, Timestamp)]
    val impDf = imps.toDF().toDF("ad_id", "imp_ts")
      .withWatermark("imp_ts", "1 hour")
    val clkDf = clks.toDF().toDF("ad_id", "clk_ts")
      .withWatermark("clk_ts", "1 hour")
    val q = StreamJoins
      .joinWithin(impDf, clkDf, "ad_id", "imp_ts", "clk_ts", "30 MINUTES")
      .select(col("ad_id"), col("imp_ts"), col("clk_ts"))
      .writeStream.format("memory").queryName("attrib_out")
      .outputMode("append").start()
    imps.addData((1L, Timestamp.valueOf("2024-01-01 10:00:00")),
                 (2L, Timestamp.valueOf("2024-01-01 10:00:00")))
    clks.addData(
      (1L, Timestamp.valueOf("2024-01-01 10:20:00")), // inside window
      (2L, Timestamp.valueOf("2024-01-01 11:30:00")), // outside window
      (3L, Timestamp.valueOf("2024-01-01 10:10:00"))) // no impression
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("attrib_out").collect().map(_.getLong(0)).toSeq
    assert(rows === Seq(1L))
  }

  test("streaming content-hash dedup within watermark (LLM exact-dedup, streamed)") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val docs = mem.toDF().toDF("doc_id", "text", "ts")
      .withColumn("content_hash", org.apache.spark.sql.functions.md5($"text"))
    val deduped = MicroBatchUpsert.dedupedWithinWatermark(
      docs, "ts", "1 hour", Seq("content_hash"))
    val q = deduped.writeStream.format("memory").queryName("doc_dedup_out")
      .outputMode("append").start()
    // same text at different event times within the watermark → one row
    mem.addData(
      (1L, "the quick fox", Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, "the quick fox", Timestamp.valueOf("2024-01-01 00:30:00")),
      (3L, "a different doc", Timestamp.valueOf("2024-01-01 00:20:00")))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("doc_dedup_out").select("doc_id").collect().map(_.getLong(0))
    assert(kept.length === 2 && kept.contains(3L))
  }

  test("streaming decontamination flags overlap at ingest, batch parity") {
    implicit val sq = spark.sqlContext
    import graft.streaming.StreamingDecontaminate
    val bench = Seq((100L, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val flagged = scala.collection.mutable.Buffer.empty[(Long, Long)]
    def sinkInto(out: org.apache.spark.sql.DataFrame): Unit =
      flagged ++= out.select("doc_id", "n_hits").collect()
        .map(r => (r.getLong(0), r.getLong(1)))

    val mem = MemoryStream[(Long, String)]
    val ckpt = tmpDir("decon-ckpt")
    mem.addData((1L, "z alpha beta gamma delta y"),
                (2L, "nothing in common here at all"))
    val q1 = StreamingDecontaminate.run(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
      bench, n = 3, minHits = 2, ckpt)(sinkInto)
    q1.awaitTermination(60000)
    assert(flagged.toSet == Set((1L, 2L))) // clean doc absent

    // a later batch through the SAME checkpoint: pure per-batch audit,
    // no history store — new overlap flagged, old batch not replayed
    mem.addData((3L, "beta gamma delta extended run"))
    val q2 = StreamingDecontaminate.run(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
      bench, n = 3, minHits = 2, ckpt)(sinkInto)
    q2.awaitTermination(60000)
    assert(flagged.toSet == Set((1L, 2L), (3L, 1L)))

    // parity: the streamed flags equal the batch operator's output
    val batchOut = graft.llm.Decontaminate.overlapAudit(
        Seq((1L, "z alpha beta gamma delta y"),
            (2L, "nothing in common here at all"),
            (3L, "beta gamma delta extended run")).toDF("doc_id", "text"),
        bench, "doc_id", "text", n = 3, minHits = 2)
      .select("doc_id", "n_hits").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batchOut == flagged.toSet)
  }
}
