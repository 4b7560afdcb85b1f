package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Histogram, Windows}

class WindowOpsSpec extends SparkSpec {
  import spark.implicits._

  test("timeRolling: RANGE frame by clock time, not row position") {
    def ts(s: String) = Timestamp.valueOf(s)
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10.0),
      (1L, ts("2024-01-01 01:00:00"), 20.0),
      (1L, ts("2024-01-02 00:30:00"), 40.0)) // 24.5h after row 1
      .toDF("u", "at", "v")
    val out = Windows.timeRolling(df, Seq("u"), col("at"), col("v"),
                                  lookbackMicros = 86400000000L)
      .orderBy($"at").collect()
    assert(out.map(_.getLong(3)).toSeq === Seq(1L, 2L, 2L))
    // last row's frame holds rows 2+3 (row 1 fell off the 24h edge)
    assert(out(2).getDouble(4) === 60.0)
  }

  test("timeRolling: the frame edge is inclusive at exactly lookback") {
    def ts(s: String) = Timestamp.valueOf(s)
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1.0),
      (1L, ts("2024-01-02 00:00:00"), 2.0)) // exactly 24h later
      .toDF("u", "at", "v")
    val out = Windows.timeRolling(df, Seq("u"), col("at"), col("v"),
                                  lookbackMicros = 86400000000L)
      .orderBy($"at").collect()
    assert(out(1).getLong(3) === 2L) // 24h-old row still inside
  }

  test("histogram: closed right edge, sentinel under/overflow buckets") {
    val df = Seq(-5.0, 0.0, 4.9, 5.0, 9.9, 10.0, 10.1).toDF("x")
    val out = Histogram.histogram(df, "x", lo = 0.0, hi = 10.0, nBuckets = 2)
      .collect().map(r => r.getInt(0) -> ((r.getLong(3), r.getDouble(4))))
      .toMap
    assert(out(-1) === ((1L, -5.0)))        // below lo
    assert(out(0) === ((2L, 4.9)))          // [0, 5): 0.0, 4.9
    assert(out(1) === ((3L, 24.9)))         // [5, 10]: 5.0, 9.9, 10.0 (hi closed)
    assert(out(2) === ((1L, 10.1)))         // above hi
  }

  test("histogram: nulls are excluded, not counted anywhere") {
    val df = Seq(Some(1.0), None, Some(2.0)).toDF("x")
    val out = Histogram.histogram(df, "x", 0.0, 10.0, 5).collect()
    assert(out.map(_.getLong(3)).sum === 2L)
  }

  test("medianImpute: nulls take the group median; all-null groups stay null") {
    val df = Seq(("A", Some(1.0)), ("A", Some(3.0)), ("A", None),
                 ("B", None), ("B", None)).toDF("g", "x")
    val out = graft.operators.Impute.medianImpute(df, Seq("g"), "x")
      .collect().map(r => (r.getString(0), Option(r.get(2)), r.getBoolean(3)))
    val aRepair = out.filter(r => r._1 == "A" && r._3)
    assert(aRepair.toSeq === Seq(("A", Some(2.0), true))) // median of 1,3
    assert(out.filter(_._1 == "B").forall(r => r._2.isEmpty && r._3))
  }

  test("psi: identical samples score ~0; a shifted sample scores high") {
    val ref = (1 to 100).map(_.toDouble).toDF("x")
    val same = graft.operators.Drift.psi(ref, ref, "x", 0, 100, 10)
      .select($"psi_total").distinct().collect().head.getDouble(0)
    assert(same === 0.0)
    val shifted = (51 to 150).map(_.toDouble).toDF("x")
    val moved = graft.operators.Drift.psi(ref, shifted, "x", 0, 100, 10)
      .select($"psi_total").distinct().collect().head.getDouble(0)
    assert(moved > 0.25) // half the mass left the domain: act
  }

  test("winsorize: tails clamp to the group's own percentiles") {
    // group A: 1..100, ASYMMETRIC [p10, p80] so the clamp visibly
    // moves the sum: p10 = 10.9, p80 = 80.2 (linear interpolation);
    // group B constant -> p10 = p80 = 5, nothing clamps
    val df = ((1 to 100).map(i => ("A", i.toDouble)) ++
              Seq.fill(10)(("B", 5.0))).toDF("g", "x")
    val out = graft.operators.Winsorize
      .winsorize(df, Seq("g"), "x", pLo = 0.1, pHi = 0.8)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4),
          r.getLong(5), r.getDouble(6)))).toMap
    val (nA, loA, hiA, cLoA, cHiA, sumA) = out("A")
    assert(nA === 100L && loA === 10.9 && hiA === 80.2)
    assert(cLoA === 10L && cHiA === 20L) // 1..10 below, 81..100 above
    // sum: 10·10.9 + (11+..+80) + 20·80.2 = 109 + 3185 + 1604 = 4898
    assert(sumA === 4898.0)
    val (nB, loB, hiB, cLoB, cHiB, sumB) = out("B")
    assert(nB === 10L && loB === 5.0 && hiB === 5.0)
    assert(cLoB === 0L && cHiB === 0L && sumB === 50.0)
  }
}
