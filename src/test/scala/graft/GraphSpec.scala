package graft

import graft.operators.Graph
import org.apache.spark.sql.functions.max

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

  test("trianglesOriented equals canonical triangles on a random graph") {
    // Deterministic pseudo-random canonical edge list with plenty of
    // triangles (ids 0..29, ~25% density).
    val edges = (for {
      a <- 0L until 30L; b <- (a + 1) until 30L
      if (a * 2654435761L + b * 40503L) % 4 == 0
    } yield (a, b)).toDF("src", "dst")
    val canon = Graph.triangles(edges, "src", "dst")
    val orient = Graph.trianglesOriented(edges, "src", "dst")
    assert(canon.count() > 20, "graph must actually contain triangles")
    assert(orient.except(canon).isEmpty && canon.except(orient).isEmpty)
  }

  test("degree orientation bounds hub wedges: star graph out-degree 1") {
    // Star: hub 0 — canonical-id orientation gives the hub out-degree
    // 1000 (≈500k wedges); degree orientation points every edge AT
    // the hub, so max out-degree is 1 and the wedge join sees zero
    // wedge pairs. Triangle set (empty) must agree either way.
    val star = (1L to 1000L).map(i => (0L, i)).toDF("src", "dst")
    val maxOut = Graph.orientByDegree(star, "src", "dst")
      .groupBy($"lo").count().agg(max($"count")).as[Long].collect().head
    assert(maxOut === 1L)
    assert(Graph.trianglesOriented(star, "src", "dst").count() === 0L)
    assert(Graph.triangles(star, "src", "dst").count() === 0L)
  }

  test("trianglesOriented counts C(n,3) on a clique (all-ties ordering)") {
    // K6: every degree equal — the ≺ tie-break by id must still
    // orient acyclically. C(6,3) = 20 triangles.
    val k6 = (for { a <- 0L until 6L; b <- (a + 1) until 6L } yield (a, b))
      .toDF("src", "dst")
    assert(Graph.trianglesOriented(k6, "src", "dst").count() === 20L)
  }
}
