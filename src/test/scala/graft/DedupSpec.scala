package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def events = Seq(
    (1L, "a", 10, 100.0), (1L, "a", 20, 200.0), // key (1,a): ts 20 wins
    (1L, "b", 15, 150.0),
    (2L, "a", 5, 50.0), (2L, "a", 5, 60.0)      // ts tie → larger value? no: tiebreak col
  ).toDF("user", "typ", "ts", "value")

  test("keepLatest keeps exactly the newest row per key (A2/W1)") {
    val out = Dedup.keepLatest(events, Seq("user", "typ"),
      Seq($"ts".desc, $"value".desc))
      .orderBy("user", "typ").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getDouble(3)))
    assert(out.toSeq === Seq((1L, "a", 20, 200.0), (1L, "b", 15, 150.0),
                             (2L, "a", 5, 60.0)))
  }

  test("distinctUnion is idempotent (A1 upsert re-run safety)") {
    val once = Dedup.distinctUnion(events, events)
    assert(once.count() === events.count())
    val twice = Dedup.distinctUnion(once, events)
    assert(twice.count() === events.count())
  }

  test("distinctUnion aligns columns by name with null-fill (O2)") {
    val extra = Seq((3L, "c", 1, 1.0, "x")).toDF("user", "typ", "ts", "value", "note")
    val out = Dedup.distinctUnion(events, extra)
    assert(out.columns.contains("note"))
    assert(out.count() === events.count() + 1)
    assert(out.filter($"user" === 1L).select("note").collect().forall(_.isNullAt(0)))
  }

  test("asOfLatest picks newest row at or before cutoff (W2)") {
    val out = Dedup.asOfLatest(events, Seq("user"), $"ts", lit(15), Seq($"value".desc))
      .orderBy("user").collect().map(r => (r.getLong(0), r.getInt(2)))
    assert(out.toSeq === Seq((1L, 15), (2L, 5)))
  }

  test("keepLatest groups null keys together (pandas NaN-equality parity)") {
    // pandas drop_duplicates treats NaN keys as equal; Spark's window
    // partitionBy also groups nulls — semantics must match (SURVEY A2).
    val df = Seq[(Option[String], Int)](
      (None, 1), (None, 5), (Some("k"), 2)).toDF("key", "ts")
    val out = Dedup.keepLatest(df, Seq("key"), Seq($"ts".desc))
      .collect().map(r => (Option(r.getString(0)), r.getInt(1))).toSet
    assert(out === Set((None, 5), (Some("k"), 2)))
  }

  test("box scores: per-year union aligns by name, CSV sink round-trips (S8/K4)") {
    import graft.sources.BoxScores
    val y2023 = Seq((1L, "KC", 27)).toDF("game_id", "team", "pts")
    val y2024 = Seq((2L, "BUF", 24, "dome")).toDF("game_id", "team", "pts", "venue")
    val all = BoxScores.perYearUnion(Seq(y2023, y2024))
    assert(all.count() === 2 && all.columns.contains("venue"))
    val dir = tmpDir("boxcsv")
    BoxScores.writeCsv(all, dir)
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.count() === 2 && back.columns.toSet === all.columns.toSet)
  }

  test("merge: updates overwrite matching keys, newest version wins (K2)") {
    val existing = Seq((1L, "x", 1), (2L, "y", 1)).toDF("id", "v", "version")
    val updates = Seq((2L, "y2", 2), (3L, "z", 2)).toDF("id", "v", "version")
    val out = Dedup.merge(existing, updates, Seq("id"), Seq($"version".desc))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq === Seq((1L, "x"), (2L, "y2"), (3L, "z")))
  }

  test("merge picks the version-priority winner among duplicate keys") {
    // duplicate keys within a version + updates overlapping existing.
    val existing = Seq((1L, "a", 5, 1), (1L, "b", 7, 1), (2L, "c", 3, 1))
      .toDF("id", "v", "score", "version")
    val updates = Seq((1L, "d", 6, 2), (3L, "e", 9, 2))
      .toDF("id", "v", "score", "version")
    val w = Dedup.merge(existing, updates, Seq("id"),
      Seq($"version".desc, $"score".desc, $"v".desc))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    // version has priority: the v2 update beats the higher-score v1 row
    assert(w.toSeq === Seq((1L, "d"), (2L, "c"), (3L, "e")))
  }

  test("mergeSmallUpdates replaces rows with null key columns (null-safe anti-join)") {
    // the rankings upsert keys on ALL stat columns of a nullable wide
    // frame — an existing row with a null key must still be replaced
    // when the batch carries the same (null-equal) key.
    val existing = Seq[(Option[String], Option[Int], Int)](
      (Some("kc"), None, 1), (None, Some(7), 1), (Some("buf"), Some(3), 1))
      .toDF("team", "stat", "version")
    val updates = Seq[(Option[String], Option[Int], Int)](
      (Some("kc"), None, 2), (None, Some(7), 2))
      .toDF("team", "stat", "version")
    val out = Dedup.mergeSmallUpdates(existing, updates, Seq("team", "stat"))
      .collect().map(r => (Option(r.getString(0)),
        if (r.isNullAt(1)) None else Some(r.getInt(1)), r.getInt(2))).toSet
    // no duplicate (team, stat) survivors: batch rows won their keys
    assert(out === Set((Some("kc"), None, 2), (None, Some(7), 2),
                       (Some("buf"), Some(3), 1)))
    // idempotent: re-merging the same batch changes nothing
    val again = Dedup.mergeSmallUpdates(
      Dedup.mergeSmallUpdates(existing, updates, Seq("team", "stat")),
      updates, Seq("team", "stat"))
    assert(again.count() === 3)
  }

  test("mergeSmallUpdates: batch wins its keys, zero shuffle exchanges") {
    val existing = Seq((1L, "a", 1), (2L, "b", 1), (3L, "c", 1))
      .toDF("id", "v", "version")
    val updates = Seq((2L, "b2", 2), (4L, "d", 2)).toDF("id", "v", "version")
    val merged = Dedup.mergeSmallUpdates(existing, updates, Seq("id"))
    val out = merged.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(out.toSeq === Seq((1L, "a", 1), (2L, "b2", 2), (3L, "c", 1), (4L, "d", 2)))
    // agrees with the general window merge when the batch is newest
    val general = Dedup.merge(existing, updates, Seq("id"), Seq($"version".desc))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(general.toSeq === out.toSeq)
    // the big side must not shuffle: broadcast exchanges only
    merged.count()
    val plan = merged.queryExecution.executedPlan.toString
    val shuffles = plan.linesIterator
      .count(l => l.contains("Exchange") && !l.contains("BroadcastExchange"))
    assert(shuffles === 0, s"expected no shuffle exchange:\n$plan")
  }
}
