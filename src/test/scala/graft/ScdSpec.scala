package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Scd

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  // A change log for two keys: key 1 runs A,A,B,B,A (three versions),
  // key 2 a single state (one open version).
  private def log = Seq(
    (1L, ts("2024-01-01"), 10L, "A"),
    (1L, ts("2024-01-02"), 11L, "A"),
    (1L, ts("2024-01-03"), 12L, "B"),
    (1L, ts("2024-01-04"), 13L, "B"),
    (1L, ts("2024-01-05"), 14L, "A"),
    (2L, ts("2024-02-01"), 20L, "X"))
    .toDF("k", "at", "seq", "state")

  test("consecutive same-state rows collapse into one version") {
    val out = Scd.scd2(log, Seq("k"), col("at"), Seq(col("seq")), Seq("state"))
      .orderBy($"k", $"version")
      .select($"k", $"state", $"version",
              date_format($"valid_from", "MM-dd").as("vf"),
              date_format($"valid_to", "MM-dd").as("vt"), $"is_current")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
                           r.getString(3), Option(r.getString(4)), r.getBoolean(5)))
    assert(out.toSeq === Seq(
      (1L, "A", 1, "01-01", Some("01-03"), false),
      (1L, "B", 2, "01-03", Some("01-05"), false),
      (1L, "A", 3, "01-05", None, true),
      (2L, "X", 1, "02-01", None, true)))
  }

  test("intervals are contiguous: each valid_to equals the next valid_from") {
    val out = Scd.scd2(log, Seq("k"), col("at"), Seq(col("seq")), Seq("state"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"k").orderBy($"version")
    val gaps = out
      .withColumn("next_from", lead($"valid_from", 1).over(w))
      .filter($"next_from".isNotNull && !($"valid_to" <=> $"next_from"))
    assert(gaps.count() === 0L)
  }

  test("null-valued state columns change-detect null-safely") {
    val df = Seq(
      (1L, ts("2024-01-01"), 1L, null.asInstanceOf[String]),
      (1L, ts("2024-01-02"), 2L, null.asInstanceOf[String]), // no change
      (1L, ts("2024-01-03"), 3L, "A"),                       // null -> A
      (1L, ts("2024-01-04"), 4L, null.asInstanceOf[String])) // A -> null
      .toDF("k", "at", "seq", "state")
    val out = Scd.scd2(df, Seq("k"), col("at"), Seq(col("seq")), Seq("state"))
      .orderBy($"version")
      .collect().map(r => (r.getInt(r.fieldIndex("version")),
                           Option(r.getString(r.fieldIndex("state")))))
    assert(out.toSeq === Seq((1, None), (2, Some("A")), (3, None)))
  }

  test("asOf returns the version containing the lookup instant") {
    val dim = Scd.scd2(log, Seq("k"), col("at"), Seq(col("seq")), Seq("state"))
    val hit = Scd.asOf(dim, lit(ts("2024-01-03 12:00:00".take(10))))
    // at 2024-01-03 exactly: key 1 is in version 2 (B, [01-03, 01-05));
    // key 2's interval hasn't opened yet.
    val rows = hit.select($"k", $"state", $"version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(rows.toSeq === Seq((1L, "B", 2)))
  }

  test("multi-column state: a change in ANY tracked column opens a version") {
    val df = Seq(
      (1L, ts("2024-01-01"), 1L, "A", 100),
      (1L, ts("2024-01-02"), 2L, "A", 200), // second col changes
      (1L, ts("2024-01-03"), 3L, "A", 200)) // no change
      .toDF("k", "at", "seq", "s1", "s2")
    val out = Scd.scd2(df, Seq("k"), col("at"), Seq(col("seq")), Seq("s1", "s2"))
    assert(out.count() === 2L)
  }

  test("merge == full rebuild: changed, unchanged, untouched, and new keys") {
    // history: key 1 runs A,B; key 2 stays X; key 3 untouched by batch
    val history = Seq(
      (1L, ts("2024-01-01"), 1L, "A"),
      (1L, ts("2024-01-02"), 2L, "B"),
      (2L, ts("2024-01-01"), 3L, "X"),
      (3L, ts("2024-01-01"), 4L, "Q"))
      .toDF("k", "at", "seq", "state")
    // batch: key 1 changes back to A; key 2 repeats X (no new
    // version); key 9 is brand new
    val batch = Seq(
      (1L, ts("2024-02-01"), 10L, "A"),
      (2L, ts("2024-02-01"), 11L, "X"),
      (9L, ts("2024-02-01"), 12L, "N"))
      .toDF("k", "at", "seq", "state")

    val hist = Scd.scd2(history, Seq("k"), col("at"), Seq(col("seq")),
                        Seq("state"))
    val merged = Scd.merge(hist, batch, Seq("k"), col("at"), col("seq"),
                           Seq("state"))
    val full = Scd.scd2(history.unionByName(batch), Seq("k"), col("at"),
                        Seq(col("seq")), Seq("state"))
    assert(merged.exceptAll(full).count() === 0L)
    assert(full.exceptAll(merged).count() === 0L)
    // spot semantics: key 2 still has ONE version (repeat collapsed),
    // key 1 gained a third, key 3 passed through untouched
    val byKey = merged.groupBy($"k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byKey === Map(1L -> 3L, 2L -> 1L, 3L -> 1L, 9L -> 1L))
  }

  test("the build plans a single exchange (both windows share it)") {
    val out = Scd.scd2(log, Seq("k"), col("at"), Seq(col("seq")), Seq("state"))
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected 1 exchange, plan:\n$plan")
  }
}
