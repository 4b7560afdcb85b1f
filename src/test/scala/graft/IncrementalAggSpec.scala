package graft

import org.apache.spark.sql.functions._

import graft.operators.IncrementalAgg

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("k")
  private val sums = Seq("x")

  private def rows(tuples: (String, Double)*) = tuples.toDF("k", "x")

  test("merged batch states equal the monolithic aggregation") {
    val a = rows("a" -> 1.5, "a" -> 2.25, "b" -> 10.0)
    val b = rows("a" -> 0.25, "c" -> -3.5)
    val merged = IncrementalAgg.readout(
      IncrementalAgg.merge(
        Seq(IncrementalAgg.state(a, keys, sums),
            IncrementalAgg.state(b, keys, sums)), keys, sums), keys, sums)
    val direct = IncrementalAgg.readout(
      IncrementalAgg.state(a.unionByName(b), keys, sums), keys, sums)
    assert(merged.orderBy("k").collect().toSeq ===
      direct.orderBy("k").collect().toSeq)
  }

  test("state merge is commutative and associative") {
    val parts = Seq(rows("a" -> 1.0, "b" -> 2.0), rows("a" -> 3.0),
                    rows("b" -> -1.0, "c" -> 4.0))
      .map(IncrementalAgg.state(_, keys, sums))
    def out(states: Seq[org.apache.spark.sql.DataFrame]) =
      IncrementalAgg.readout(IncrementalAgg.merge(states, keys, sums),
                             keys, sums)
        .orderBy("k").collect().toSeq
    val expected = out(parts)
    assert(out(parts.reverse) === expected)
    // associativity: pre-merge a prefix, then merge the rest
    val pre = IncrementalAgg.merge(parts.take(2), keys, sums)
    assert(out(Seq(pre, parts(2))) === expected)
  }

  test("keys absent from one batch still merge") {
    val onlyA = IncrementalAgg.state(rows("a" -> 1.0), keys, sums)
    val onlyB = IncrementalAgg.state(rows("b" -> 2.0), keys, sums)
    val got = IncrementalAgg.readout(
      IncrementalAgg.merge(Seq(onlyA, onlyB), keys, sums), keys, sums)
      .orderBy("k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq(("a", 1L, 1.0), ("b", 1L, 2.0)))
  }
}
