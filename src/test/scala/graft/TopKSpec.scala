package graft

import org.apache.spark.sql.functions._

import graft.operators.TopK

/** Aggregation-shaped per-group top-k: correctness against the window
  * form, determinism of the tiebreak, and the partial-aggregation plan
  * shape that is the operator's whole reason to exist. */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def sample = Seq(
    // (grp, id, score) — includes a score tie inside g1
    ("g1", 1L, 5.0), ("g1", 2L, 9.0), ("g1", 3L, 9.0), ("g1", 4L, 1.0),
    ("g1", 5L, 7.0),
    ("g2", 6L, 2.0), ("g2", 7L, 2.0),
    ("g3", 8L, 4.0) // fewer rows than k
  ).toDF("g", "id", "score")

  test("matches the window form; ties break by id asc; short groups kept whole") {
    val got = TopK.perGroupTopK(sample, Seq("g"), col("score"), col("id"), 3)
      .orderBy($"g", $"rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val expected = Seq(
      ("g1", 1L, 2L, 9.0), ("g1", 2L, 3L, 9.0), ("g1", 3L, 5L, 7.0),
      ("g2", 1L, 6L, 2.0), ("g2", 2L, 7L, 2.0),
      ("g3", 1L, 8L, 4.0))
    assert(got.toSeq == expected)
  }

  test("plan is an aggregation with a partial (map-side) phase, no Window") {
    val out = TopK.perGroupTopK(sample, Seq("g"), col("score"), col("id"), 3)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window sort crept in:\n$plan")
    // typed-buffer aggregates plan as ObjectHashAggregate with a
    // partial_ phase before the exchange: <=k rows per group per
    // partition cross the wire, not the corpus
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_topkagg"), plan)
  }

  test("buffer stays bounded: reduce fast-path rejects below-cutoff rows") {
    val agg = new operators.TopKAgg(2)
    val full = operators.TopKBuf(Seq((9.0, 1L), (8.0, 2L)))
    assert(agg.reduce(full, (1.0, 3L)) eq full)           // reject, no copy
    assert(agg.reduce(full, (8.5, 4L)).items == Seq((9.0, 1L), (8.5, 4L)))
    // merge re-truncates
    val m = agg.merge(full, operators.TopKBuf(Seq((10.0, 5L))))
    assert(m.items == Seq((10.0, 5L), (9.0, 1L)))
  }
}
