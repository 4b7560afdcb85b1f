package graft

/** Plan-shape audit over the FULL query registry: every claimed shape
  * ("one exchange", "broadcast only", "no global ordered pass",
  * "builds once") is asserted against the ACTUAL physical plan at
  * sf0.001, so a regression that silently re-introduces a
  * scale-killer — above all a single-partition Sort/Window over a
  * corpus-scale frame — fails `sbt test`, not a 100×-scale
  * production run.
  *
  * The generic sweep flags any Sort or Window whose direct child is an
  * `Exchange SinglePartition`: that is the "global ordered statistic in
  * one task" anti-pattern the two-phase bucketed cumsum
  * (OrderedStats.cumsumExclusive) exists to remove. Queries where the
  * single-partition frame is PROVABLY bounded (a contingency table of
  * category pairs, a vocabulary, a per-domain weight table) are
  * whitelisted with the bound named.
  */
class PlanShapeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** Queries whose plans legitimately order a SMALL bounded frame in
    * one partition; value = the bound that keeps it safe at 100 TB. */
  private val boundedGlobalSort: Map[String, String] = Map(
    "q135_chi_square" -> "contingency cells: |cat_a| x |cat_b|",
    "q101_temperature_mix" -> "per-domain weight table: |domains| rows",
    "q113_prefix_join" -> "token-frequency vocabulary, then broadcast",
    "q149_stratified_sample" -> "per-stratum quota frame: |strata| rows"
  )

  private def qNum(name: String): Int =
    name.drop(1).takeWhile(_.isDigit).toInt

  /** (op, childOp) pairs from the executedPlan tree string: the tree
    * renders children one line below their parent at deeper indent. */
  private def sortFedBySinglePartition(plan: String): Boolean = {
    val lines = plan.linesIterator.toVector
    lines.zipWithIndex.exists { case (l, i) =>
      (l.contains("Sort ") || l.contains("Window ")) &&
        i + 1 < lines.length &&
        lines(i + 1).contains("Exchange SinglePartition")
    }
  }

  test("full registry: no corpus-scale single-partition ordered pass anywhere") {
    graft.Graft.init(spark)
    val names = SparkEntry.queries.keys.toSeq.sortBy(qNum)
    assert(names.size >= 296) // registry shrinkage is loud
    val offenders = names.filterNot(boundedGlobalSort.contains).flatMap { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      if (sortFedBySinglePartition(plan)) Some(n) else None
    }
    assert(offenders.isEmpty,
      s"single-partition Sort/Window (the scale-killer shape) in: $offenders")
  }

  test("q180 dbscan: candidate pipeline builds once — at most one Generate, no re-evaluated explode") {
    val plan = SparkEntry.queries("q180_dbscan")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val generates = "Generate ".r.findAllIn(plan).size
    assert(generates <= 1,
      s"the 9-cell explode pipeline is re-evaluated ($generates Generates) " +
        s"— checkpoint `pairs` before the fan-out:\n$plan")
  }

  test("q214/q217 banded phash: pair stage is a band equi-join — never the q213 all-pairs shape") {
    for (n <- Seq("q214_phash_banded", "q217_png_phash_pipeline")) {
      val plan = SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$n: banded Hamming pair stage regressed to an all-pairs join:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"$n:\n$plan")
    }
  }

  test("q229 negative sampling: draws meet intervals by bucket equi-join, not an inequality join") {
    val plan = SparkEntry.queries("q229_neg_sampling")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the only broadcast-NLJ-shaped thing allowed is the 1-row total-
    // mass crossJoin; the draw-interval match itself must be a hash
    // join on the bucket (the rank-select economics)
    assert(plan.contains("BroadcastHashJoin"),
      s"bucketed rank-select must hash-join on the mass bucket:\n$plan")
    assert(!sortFedBySinglePartition(plan),
      s"cumulative mass must ride the bucketed cumsum:\n$plan")
  }

  test("build-once ceilings: a lost checkpoint cannot silently multiply lineage") {
    // name -> (max Generates, max Exchanges) pinned at the measured
    // checkpoint-disciplined plan. The iterative / multi-consumer
    // pipelines here localCheckpoint their fan-out frames; losing one
    // re-evaluates the whole upstream per consumer (or per pointer-
    // jumping round) and shows up FIRST as extra Generate/Exchange
    // nodes in the physical plan. q28's and q202's single BNLJ each
    // join a 1-row / k-row bounded aggregate — not pair fan-out.
    val ceilings = Map(
      "q70_corpus_build"     -> (1, 9),
      "q84_dedup_survivors"  -> (0, 2),
      "q28_minhash_pairs"    -> (6, 23),
      "q93_ngram_jaccard"    -> (2, 4),
      "q202_cv_ols"          -> (0, 6),
      "q180_dbscan"          -> (1, 2),
      "q214_phash_banded"    -> (2, 6),
      // r10 wave: q221 staged its ranked frame (112 Exchanges / 31
      // BNLJs unstaged → 3 / 1); the others pinned at their measured
      // checkpoint-disciplined plans
      "q221_delong_auc"      -> (0, 3),
      "q224_cdc_chunks"      -> (1, 2),
      "q233_kneser_ney"      -> (5, 12),
      "q235_bleu"            -> (2, 6),
      "q236_rouge"           -> (2, 5),
      "q239_bpe_packing"     -> (0, 2),
      "q240_unigram_lm"      -> (0, 8)
    )
    // Disable the opt-in small-input spread (Tables.spreadSmall) for
    // this sweep: its deliberate RoundRobin exchanges would otherwise
    // confound the lost-checkpoint signal these ceilings guard. The
    // spread's own correctness is covered by the oracle gate; its
    // plan placement by TablesSpec.
    spark.conf.set("spark.graft.scanSpread", "false")
    val broken =
      try ceilings.toSeq.sortBy(_._1).flatMap {
        case (n, (maxGen, maxEx)) =>
          val plan = SparkEntry.queries(n)(spark, sfDir)
            .queryExecution.executedPlan.toString
          val g = "Generate ".r.findAllIn(plan).size
          val ex = "Exchange ".r.findAllIn(plan).size
          if (g > maxGen || ex > maxEx)
            Some(s"$n: generates=$g (<= $maxGen), exchanges=$ex (<= $maxEx)")
          else None
      } finally spark.conf.unset("spark.graft.scanSpread")
    assert(broken.isEmpty,
      s"lineage multiplied — a checkpoint before a fan-out was lost:\n" +
        broken.mkString("\n"))
  }

  test("q118 target encode: category stats aggregate once, fact side never shuffles") {
    val plan = SparkEntry.queries("q118_target_encode")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx <= 1, s"fact-side shuffle crept in ($hashEx):\n$plan")
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q129 skew profile: heavy keys via TakeOrdered, Gini via bucketed cumsum") {
    val plan = SparkEntry.queries("q129_skew_profile")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be TakeOrdered, not a global window:\n$plan")
    assert(!sortFedBySinglePartition(plan),
      s"Gini rank-sum must use the bucketed two-phase cumsum:\n$plan")
  }

  test("q137 AUC: ordered pass is bucket-partitioned, never one task") {
    val plan = SparkEntry.queries("q137_auc")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!sortFedBySinglePartition(plan),
      s"AUC cumsum must be bucket-partitioned:\n$plan")
  }

  test("q142 oriented triangles: wedge build carries no cartesian product") {
    val plan = SparkEntry.queries("q142_triangles_oriented")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q159 decontamination: benchmark side broadcasts, corpus never shuffles by shingle") {
    val plan = SparkEntry.queries("q159_decontaminate")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark shingle set must broadcast:\n$plan")
    // at most ONE shingle-keyed exchange — the BENCHMARK side's tiny
    // distinct feeding its broadcast; the corpus's own exchanges are
    // all doc-keyed (shingle windows + per-doc count)
    val shingleKeyed = "Exchange hashpartitioning\\(__t".r
      .findAllIn(plan).size
    assert(shingleKeyed <= 1, s"corpus shuffled by shingle:\n$plan")
  }

}
