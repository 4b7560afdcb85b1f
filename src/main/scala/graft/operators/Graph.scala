package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph centrality over an edge list — the link-graph quality signal
  * a web-crawl curation pipeline feeds into document scoring (rank of
  * the page a document came from), computed here directly over the
  * engine's own verified near-dup/citation pair output.
  *
  * [[pageRank]] runs a FIXED number of power iterations of the
  * classic damped walk over the undirected (symmetrized) graph:
  * pr'(v) = (1−α)/N + α · Σ_{u∈in(v)} pr(u)/deg(u). Fixed iteration
  * count (not convergence-driven) keeps the operator a pure, finite
  * dataflow an external engine can replay CTE-by-CTE.
  *
  * Determinism across engines: each contribution pr(u)/deg(u) is an
  * IEEE-deterministic double; contributions QUANTIZE to 1e-15 and sum
  * in DECIMAL(38,0) (the engine-wide exact-sum trick), so the
  * aggregated inflow — the only order-sensitive float reduction — is
  * exact and identical however partitions combine.
  *
  * Scale shape: per iteration, ONE join of the rank frame against the
  * edge list (both keyed on node — the exchange carries the EDGE
  * list, never a corpus) + one destination-keyed aggregation of the
  * quantized contributions. Degrees are computed once. The edge list
  * should be localCheckpoint'ed by the caller if it is itself an
  * expensive pipeline (the q70 pattern); iterations deepen the plan
  * linearly, which a handful of fixed rounds keeps cheap.
  */
object Graph {

  /** Ranks after `iterations` damped power steps over the symmetrized
    * edge set. Returns (node, degree, pagerank) for every node that
    * appears in an edge (isolated nodes have no edges to walk — by
    * construction every graph node has degree ≥ 1, so there is no
    * dangling-mass term). */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, "pageRank needs at least one iteration")
    val sym = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .unionByName(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
    val deg = sym.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("degree"))
    val n = deg.agg(count(lit(1)).as("__n"))

    // pr0 = 1/N for every node
    val init = deg.crossJoin(n)
      .select(col("node"), col("degree"),
              (lit(1.0) / col("__n").cast("double")).as("pr"))

    val quantum = 1e15
    val ranks = (1 to iterations).foldLeft(init) { case (prev, _) =>
      val contrib = prev
        .join(sym, prev("node") === sym("src"))
        .select(col("dst").as("node"),
                round(col("pr") / col("degree").cast("double") * quantum, 0)
                  .cast("decimal(38,0)").as("__q"))
        .groupBy(col("node"))
        .agg(sum(col("__q")).as("__inflow"))
      deg.join(contrib, Seq("node"))
        .crossJoin(n)
        .select(col("node"), col("degree"),
                (lit((1.0 - damping)) / col("__n").cast("double") +
                  lit(damping) * (col("__inflow").cast("double") / quantum))
                  .as("pr"))
    }
    ranks.select(col("node"), col("degree"), round(col("pr"), 6).as("pagerank"))
  }

  /** Triangle enumeration over an undirected edge list stored in
    * canonical (src < dst) orientation — the clustering-coefficient /
    * community-density primitive. Each triangle {a < b < c} is its
    * three canonical edges (a,b), (b,c), (a,c); joining wedge
    * (a,b)+(b,c) and semi-checking the closing edge (a,c) emits every
    * triangle exactly once with no orientation bookkeeping.
    *
    * Scale shape: two equi-joins on node keys — the exchanges carry
    * the EDGE list, never a corpus. Wedge count is Σ_v deg²(v), the
    * quadratic term a hub node dominates; the production hardening
    * for power-law graphs is degree orientation (point each edge at
    * its higher-degree endpoint before the wedge join) which bounds
    * wedges at O(m^1.5) — same output set, so the canonical-id form
    * here is also its correctness oracle. AQE skew-join covers the
    * moderate-hub middle ground. */
  def triangles(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(col(srcCol).as("__s"), col(dstCol).as("__d"))
    val wedges = e.select(col("__s").as("a"), col("__d").as("b"))
      .join(e.select(col("__s").as("b"), col("__d").as("c")), "b")
    wedges.join(e.select(col("__s").as("a"), col("__d").as("c")),
                Seq("a", "c"), "left_semi")
      .select(col("a"), col("b"), col("c"))
  }
}
