package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over a pair graph — the step that turns
  * near-duplicate PAIRS (NearDup.lshCandidatePairs et al.) into dedup
  * GROUPS so a pipeline can keep one canonical document per group.
  * Pairs alone don't dedup: if a~b and b~c, dropping "the second of
  * each pair" would drop b and c even though a~c may not hold; the
  * group representative must be chosen per component.
  *
  * Algorithm: iterative min-label propagation with pointer jumping.
  * Each round does (1) propagate: label(x) := min(label(x), min over
  * neighbors y of label(y)) — one join + one aggregation on the edge
  * list; (2) jump: label(x) := label(label(x)) — a self-join that
  * halves chain depth, so rounds are O(log diameter) rather than
  * O(diameter). Labels only ever decrease and are node ids, so the
  * fixpoint assigns every node the MINIMUM id in its component —
  * deterministic, no rng, engine-portable.
  *
  * Scale notes (100 TB): each round is two shuffles bounded by the
  * EDGE list, not the corpus — near-dup graphs are tiny relative to
  * the input (most docs are singletons and never enter this operator).
  * LSH-banded components are near-cliques (diameter 1–3), so 2–3
  * rounds close them; the per-round convergence check is one count on
  * the changed-label set. For adversarial long-chain graphs the
  * pointer jump bounds rounds at log₂(diameter); beyond that the
  * two-phase large-star/small-star formulation (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) is the
  * same joins with a different grouping and the same O(log) bound.
  * The edge list is cached across rounds; each round's labels are
  * localCheckpoint'ed to truncate lineage (iterative plans otherwise
  * grow a round's plan depth per iteration and re-execute history).
  */
object Components {

  /** Labels every node of the undirected pair graph `edges` with the
    * minimum node id reachable from it. Returns (node, label) for
    * nodes that appear in at least one edge (singletons never enter
    * the graph; their "component" is themselves by definition).
    * `maxIter` is a safety bound — with pointer jumping it allows
    * components of diameter 2^maxIter. */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 16): DataFrame =
    connectedComponentsWithRounds(edges, aCol, bCol, maxIter)._1

  /** [[connectedComponents]] plus the number of label-update rounds it
    * ran (including the final no-change round that witnesses the
    * fixpoint) — the observable for the O(log diameter) claim: a path
    * graph of diameter 2^k must close in ≤ k+2 rounds, which
    * `ComponentsSpec` asserts adversarially. */
  def connectedComponentsWithRounds(edges: DataFrame, aCol: String,
                                    bCol: String,
                                    maxIter: Int = 16): (DataFrame, Int) = {
    val a = col(aCol).cast("long")
    val b = col(bCol).cast("long")
    // Symmetrize with ONE pass over `edges` (an explode, not a
    // self-union — a union would evaluate the upstream pair pipeline
    // once per branch when first materialized into the cache).
    val sym = edges
      .select(explode(array(struct(a.as("node"), b.as("nbr")),
                            struct(b.as("node"), a.as("nbr")))).as("e"))
      .select(col("e.node").as("node"), col("e.nbr").as("nbr"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Labels only ever DECREASE, so the exact label sum is a monotone
    // convergence witness: an unchanged sum means no label moved.
    // The sum rides the checkpoint materialization itself as an
    // `observe()` metric (CollectMetrics folds into the same job that
    // persists the round's labels), so each round runs exactly ONE
    // action — not checkpoint + a separate aggregation job.
    // DECIMAL(38,0) keeps the sum exact at any node count (a long sum
    // would overflow under ANSI at ~10^10 snowflake-scale ids).
    def checkpointWithSum(df: DataFrame)
        : (DataFrame, java.math.BigDecimal) = {
      val obs = org.apache.spark.sql.Observation()
      val out = df
        .observe(obs, sum(col("label").cast("decimal(38,0)")).as("__ls"))
        .localCheckpoint()
      val s = obs.get.get("__ls")
        .collect {
          case d: java.math.BigDecimal => d
          case d: scala.math.BigDecimal => d.bigDecimal
        }
        .getOrElse(java.math.BigDecimal.ZERO) // empty edge set
      (out, s)
    }

    // Round 0: label(x) = min(x, min neighbor).
    var (labels, prevSum) = checkpointWithSum(
      sym.groupBy(col("node"))
        .agg(min(col("nbr")).as("__mn"))
        .select(col("node"), least(col("node"), col("__mn")).as("label")))

    var converged = false
    var round = 0
    while (!converged && round < maxIter) {
      // Propagate the neighbor minimum one hop along every edge.
      val prop = sym
        .join(labels.withColumnRenamed("node", "__n"), col("nbr") === col("__n"))
        .groupBy(col("node")).agg(min(col("label")).as("nbr_label"))
      // Pin the propagated labels BEFORE the pointer-jump self-join:
      // both join sides would otherwise re-evaluate the whole
      // edge-join + aggregation (two extra edge-bounded shuffles per
      // round, and a broadcast-build job that replays them again).
      // The pinned frame is the node-label frame — the loop's own
      // working set, already materialized once per round below.
      val stepped = labels.join(prop, Seq("node"))
        .select(col("node"), least(col("label"), col("nbr_label")).as("label"))
        .localCheckpoint()
      // Pointer jump: follow the label's own label (labels are node
      // ids and only decrease, so label(label(x)) <= label(x)).
      val (next, curSum) = checkpointWithSum(
        stepped.as("x")
          .join(stepped.as("y"), col("x.label") === col("y.node"), "left")
          .select(col("x.node").as("node"),
                  least(col("x.label"),
                        coalesce(col("y.label"), col("x.label")))
                    .as("label")))
      labels = next
      converged = curSum.compareTo(prevSum) == 0
      prevSum = curSum
      round += 1
    }
    sym.unpersist()
    (labels, round)
  }

  /** Dedup-group summary over [[connectedComponents]]: one row per
    * group with its representative (the minimum doc id — the row a
    * dedup keeps), member count and id checksum. */
  def dedupGroups(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    connectedComponents(pairs, aCol, bCol)
      .groupBy(col("label").as("group_rep"))
      // checksum accumulates in DECIMAL(38,0) — a long accumulator
      // would throw ANSI overflow mid-aggregation for snowflake-scale
      // ids (same guard as labelSum); the final bigint cast can only
      // fail if the TRUE per-group sum exceeds a long, which is a
      // contract limit of the output column, not an accumulation
      // artifact.
      .agg(count(lit(1)).as("n_docs"),
           sum(col("node").cast("decimal(38,0)")).cast("long")
             .as("id_checksum"),
           max(col("node")).as("max_id"))

  /** Dedup groups with a QUALITY-chosen survivor: per component, keep
    * the member maximizing (quality desc, id asc) — the "keep the
    * longest / cleanest copy" policy production dedup uses instead of
    * min-id. `quality` maps ids to a per-row quality score; only
    * graph members join it (singletons are their own survivors by
    * definition and never enter). Members with NO quality row are
    * kept, not dropped (left join): they still count toward n_docs,
    * and rank after every scored member (desc ordering puts nulls
    * last), so a coverage gap in `quality` surfaces as a null
    * survivor_quality instead of a silently deflated — or vanished —
    * component. One extra key-partitioned window over the (tiny)
    * member set on top of the component labels. */
  def dedupSurvivors(pairs: DataFrame, aCol: String, bCol: String,
                     quality: DataFrame, idCol: String,
                     qualityCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val members = connectedComponents(pairs, aCol, bCol)
      .join(quality, col("node") === quality(idCol), "left")
    val w = Window.partitionBy(col("label"))
      .orderBy(col(qualityCol).desc, col("node").asc)
    members.withColumn("__rn", row_number().over(w))
      .groupBy(col("label").as("group_rep"))
      .agg(count(lit(1)).as("n_docs"),
           max(when(col("__rn") === 1, col("node"))).as("survivor_id"),
           max(when(col("__rn") === 1, col(qualityCol)))
             .as("survivor_quality"))
  }
}
