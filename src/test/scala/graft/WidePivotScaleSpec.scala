package graft

import org.apache.spark.sql.functions._

import graft.operators.WideStats

/** Plan-size control for the 221-table wide schema (SURVEY §7.4 risk 1):
  * the pivot reformulation must assemble the full registry-width table
  * in ONE shuffle with a plan Catalyst analyzes in bounded time —
  * the chained-join formulation grows superlinearly. */
class WidePivotScaleSpec extends SparkSpec {
  import spark.implicits._

  test("221-stat wide table assembles in one shuffle with a flat plan") {
    val teams = (1 to 32).map(i => s"team$i")
    val stats = (1 to 221).map(i => f"cat${i % 15}%d_table$i%d_stat")
    // long frame: 32 teams × 221 stats
    val long = teams.flatMap(t => stats.map(s => (t, s, t.length * s.length * 1.0)))
      .toDF("team", "stat", "value")
    val t0 = System.nanoTime()
    val wide = WideStats.pivotWide(long, "team", stats)
    val n = wide.count()
    val elapsed = (System.nanoTime() - t0) / 1e9
    assert(n === 32)
    assert(wide.columns.length === 222) // team + 221 stats
    // exactly one exchange in the plan (the pivot's groupBy)
    val plan = wide.queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 2, s"expected <=2 exchanges (AQE pair), got $exchanges")
    assert(elapsed < 60.0, s"wide pivot took ${elapsed}s")
    // spot-check a value
    val r = wide.filter($"team" === "team7").collect().head
    assert(r.getAs[Double](stats.head) === "team7".length * stats.head.length * 1.0)
  }

  test("analyzer cost of the pivot plan stays bounded at registry width") {
    // SURVEY §7.4 risk 1 is not just shuffle count — a 1,400-column plan
    // can also blow up ANALYSIS time (the chained-join formulation grows
    // superlinearly in Catalyst). Assert the pivot form's full
    // analyze+optimize+plan pass over 221 stats finishes in seconds.
    val teams = (1 to 32).map(i => s"team$i")
    val stats = (1 to 221).map(i => f"cat${i % 15}%d_table$i%d_stat")
    val long = teams.flatMap(t => stats.map(s => (t, s, t.length * s.length * 1.0)))
      .toDF("team", "stat", "value")
    val t0 = System.nanoTime()
    val wide = WideStats.pivotWide(long, "team", stats)
    wide.queryExecution.executedPlan // forces analysis + optimization + planning
    val planSec = (System.nanoTime() - t0) / 1e9
    assert(wide.queryExecution.analyzed.output.length === 222)
    // generous bound: observed ~1s on local[4]; a superlinear regression
    // (chained-join shape) lands in minutes, far past this
    assert(planSec < 30.0, s"pivot plan analysis took ${planSec}s")
  }
}
