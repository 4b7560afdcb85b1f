package graft

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank star graph: hand-computed two-iteration ranks") {
    // Star 1-2, 1-3 (symmetrized): N=3, deg(1)=2, deg(2)=deg(3)=1.
    // pr0 = 1/3 each. After two damped (0.85) rounds:
    // pr2(1) = 0.15/3 + 0.85·(pr1(2)+pr1(3)) = 0.375833
    // pr2(2) = pr2(3) = 0.15/3 + 0.85·pr1(1)/2 = 0.312083
    val edges = Seq((1L, 2L), (1L, 3L)).toDF("a", "b")
    val pr = Graph.pageRank(edges, "a", "b", iterations = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(pr(1L) === ((2L, 0.375833)))
    assert(pr(2L) === ((1L, 0.312083)))
    assert(pr(3L) === ((1L, 0.312083)))
  }

  test("pageRank conserves total mass and respects symmetry") {
    // Two disjoint symmetric pairs: every node keeps rank 1/4 forever.
    val edges = Seq((1L, 2L), (3L, 4L)).toDF("a", "b")
    val pr = Graph.pageRank(edges, "a", "b", iterations = 3)
      .collect().map(_.getDouble(2))
    assert(pr.length === 4)
    assert(pr.forall(_ === 0.25))
  }

  test("pageRank: higher-degree hubs outrank leaves on a path") {
    // Path 1-2-3: the middle node must outrank the endpoints.
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val pr = Graph.pageRank(edges, "a", "b", iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(pr(2L) > pr(1L) && pr(2L) > pr(3L))
    assert(pr(1L) === pr(3L))
  }
}
