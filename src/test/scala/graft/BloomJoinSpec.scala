package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomJoin

/** Bloom-pruned join: losslessness vs the plain join, actual pruning
  * power on disjoint keys, and the narrow (no-shuffle) prune plan. */
class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pruned join result == plain join result, row for row") {
    val fact = (1L to 5000L).map(i => (i, i % 97)).toDF("fk", "v")
    val dim = (1L to 5000L).filter(_ % 13 == 0).map(i => (i, s"d$i"))
      .toDF("dk", "name")
    val pruned = BloomJoin.prunedJoin(fact, "fk", dim, "dk")
      .select($"fk", $"v", $"name")
    val plain = fact.join(dim, $"fk" === $"dk").select($"fk", $"v", $"name")
    assert(pruned.exceptAll(plain).count() === 0L)
    assert(plain.exceptAll(pruned).count() === 0L)
    assert(pruned.count() === plain.count())
  }

  test("bloom actually prunes: disjoint keys mostly rejected before the join") {
    val dim = (1L to 500L).map(i => (i, 0)).toDF("dk", "u")
    val words = BloomJoin.buildBits(dim, $"dk")
    // fact keys far outside the dim's range: only bloom false positives
    // survive the filter; with m=65536, k=4, n=500 the fp rate is ~1e-5
    val far = (1000000L to 1010000L).toDF("fk")
    val survivors = far.filter(BloomJoin.mightContain(words, $"fk")).count()
    assert(survivors <= 20L, s"bloom passed $survivors of 10001 disjoint keys")
    // and present keys ALWAYS pass (no false negatives, ever)
    val present = (1L to 500L).toDF("fk")
    assert(present.filter(BloomJoin.mightContain(words, $"fk")).count() === 500L)
  }

  test("the prune is a narrow filter: no exchange before the fact-side scan filter") {
    val dim = (1L to 100L).map(i => (i, 0)).toDF("dk", "u")
    val words = BloomJoin.buildBits(dim, $"dk")
    val fact = (1L to 1000L).toDF("fk")
    val filtered = fact.filter(BloomJoin.mightContain(words, $"fk"))
    val plan = filtered.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"prune must not shuffle:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("SQLUDF"), plan)
  }
}
