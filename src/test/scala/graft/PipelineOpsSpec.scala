package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.llm.{Bm25, QualityRules, Sampling}
import graft.operators.{ChangePoint, Cohort}

/** Hand-case semantics for the round-6 operator family (the oracle gate
  * proves engine equivalence; these prove the NUMBERS are the intended
  * ones). */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("stratifiedExact: total hit exactly, shares within one row, kept == quota") {
    val df = (1L to 1000L).map(i => (i, s"s${i % 7}")).toDF("id", "g")
    for (total <- Seq(10L, 97L, 500L, 1000L)) {
      val audit = Sampling.stratifiedExact(df, "id", Seq("g"), total).collect()
      val quotas = audit.map(r => r.getString(0) -> r.getLong(2)).toMap
      val kept = audit.map(r => r.getLong(3)).toSeq
      assert(quotas.values.sum === total, s"total=$total")
      assert(audit.map(r => r.getLong(2)).toSeq == kept, "kept != quota")
      audit.foreach { r =>
        val nDocs = r.getLong(1).toDouble
        val ideal = total * nDocs / 1000.0
        assert(math.abs(r.getLong(2) - ideal) <= 1.0,
          s"quota ${r.getLong(2)} vs ideal $ideal (total=$total)")
      }
    }
  }

  test("cusum: accumulates sustained shift, resets at zero, alarms past threshold") {
    // target+slack = 10; increments: x - 10
    val rows = Seq(
      (1L, 1L, 5.0),   // s = max(0, -5) = 0
      (1L, 2L, 12.0),  // s = 2
      (1L, 3L, 14.0),  // s = 6
      (1L, 4L, 2.0),   // s = max(0, -2) = 0  <- reset
      (1L, 5L, 25.0),  // s = 15 > 12 -> alarm
      (2L, 6L, 9.0)    // other key: s = 0, no bleed-over
    ).toDF("k", "id", "x")
    val got = ChangePoint.cusum(rows, "k", Seq(col("id")), "x",
        target = 8.0, slack = 2.0, threshold = 12.0)
      .orderBy($"id")
      .collect().map(r => (r.getLong(1), r.getDouble(3), r.getBoolean(4)))
    assert(got.toSeq == Seq(
      (1L, 0.0, false), (2L, 2.0, false), (3L, 6.0, false),
      (4L, 0.0, false), (5L, 15.0, true), (6L, 0.0, false)))
    val summary = ChangePoint.cusumSummary(rows, "k", Seq(col("id")), "x",
        "id", 8.0, 2.0, 12.0)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(summary(1L) === ((5L, 1L, 15.0, 5L)))
    assert(summary(2L) === ((1L, 0L, 0.0, -1L)))
  }

  test("weeklyRetention: cohorts anchored to first event, offsets in weeks") {
    def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    val events = Seq(
      (1L, ts(1)), (1L, ts(10)),            // cohort wk Jan-1; active wk0, wk1
      (2L, ts(9)), (2L, ts(23)), (2L, ts(24)), // cohort wk Jan-8; wk0, wk2 (dup week collapses)
      (3L, ts(2))                            // cohort wk Jan-1; wk0 only
    ).toDF("user_id", "ts")
    val got = Cohort.weeklyRetention(events, "user_id", "ts")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map(
      ("2024-01-01", 0L) -> 2L, ("2024-01-01", 1L) -> 1L,
      ("2024-01-08", 0L) -> 1L, ("2024-01-08", 2L) -> 1L))
  }

  test("gopherMetrics: each rule trips on its designed offender") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs far away home"), // passes all
      (2L, "short text the end"),                               // too few words
      (3L, ("a " * 30).trim),                                   // mean_wl too low
      (4L, Seq.fill(30)("zyx").mkString(" "))                   // no stopword
    ).toDF("doc_id", "text")
    val m = QualityRules.gopherMetrics(docs, "text",
        minWords = 10, maxWords = 50, minWl = 2.0, maxWl = 10.0,
        maxSymbolRatio = 0.1)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getAs[Boolean]("keep"))
    assert(!m(2L).getAs[Boolean]("pass_words"))
    assert(!m(3L).getAs[Boolean]("pass_wl"))
    assert(m(4L).getAs[Boolean]("pass_words") && !m(4L).getAs[Boolean]("has_stopword"))
    assert(Seq(2L, 3L, 4L).forall(i => !m(i).getAs[Boolean]("keep")))
    // the filter form keeps exactly the keepers, without a join
    val kept = QualityRules.gopherFilter(docs, "text").select($"doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(1L))
    val plan = QualityRules.gopherFilter(docs, "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
  }

  test("bm25: tf raises score sublinearly, shorter docs outrank at equal tf") {
    val docs = Seq(
      (1L, "apple " * 1 + "pear " * 19),   // tf=1, len 20
      (2L, "apple " * 5 + "pear " * 15),   // tf=5, len 20
      (3L, "apple " * 1 + "pear " * 4),    // tf=1, len 5 (short)
      (4L, "pear " * 20)                   // tf=0
    ).map { case (i, t) => (i, t.trim) }.toDF("doc_id", "text")
    val got = Bm25.topK(docs, "doc_id", "text", Seq("apple"), topK = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!got.contains(4L))            // no term, no row
    assert(got(2L) > got(1L))            // higher tf wins...
    assert(got(2L) < 5 * got(1L))        // ...but saturates below linear
    assert(got(3L) > got(1L))            // same tf, shorter doc wins
  }

  test("saltedJoin: row-identical to the plain join, hot key spread across salts") {
    import graft.operators.Skew
    // one hot key (90% of rows) + a long tail
    val fact = (1L to 2000L).map(i => (if (i % 10 != 0) 7L else i % 50, i))
      .toDF("k", "rid")
    val dim = (0L to 49L).map(i => (i, s"d$i")).toDF("k", "name")
    val salted = Skew.saltedJoin(fact, dim, "k", col("rid"), saltBuckets = 8)
      .select($"k", $"rid", $"name")
    val plain = fact.join(dim, "k").select($"k", $"rid", $"name")
    assert(salted.exceptAll(plain).count() === 0L)
    assert(plain.exceptAll(salted).count() === 0L)
    // the hot key's rows really use >1 salt value
    val saltsUsed = fact.filter($"k" === 7L)
      .select(pmod($"rid".cast("long"), lit(8L))).distinct().count()
    assert(saltsUsed === 8L)
  }

  test("cupedByArm: perfectly predictive covariate collapses variance, means unbiased") {
    import graft.operators.AbTest
    // post = pre + arm-effect: CUPED removes ALL pre-driven variance
    val units = (1L to 400L).map { i =>
      val arm = i % 2
      val pre = (i % 37).toDouble + 10.0
      (arm, pre, pre + arm * 2.0)
    }.toDF("arm", "pre", "post")
    val got = AbTest.cupedByArm(units, "arm", "pre", "post")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val (m0, a0, v0, c0) = got(0L)
    val (m1, a1, v1, c1) = got(1L)
    assert(math.abs((a1 - a0) - 2.0) < 1e-4, s"adjusted effect ${a1 - a0}")
    assert(math.abs((m1 - m0) - 2.0) < 0.6)   // raw diff is noisy but near 2
    assert(c0 < v0 / 100 && c1 < v1 / 100,
      s"cuped variance should collapse: $c0 vs $v0, $c1 vs $v1")
  }
}
