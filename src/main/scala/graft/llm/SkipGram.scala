package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skip-gram co-occurrence pair generation — the (center, context)
  * training-pair extraction of word2vec-style embedding pipelines
  * (Mikolov et al. 2013): every token pairs with its neighbors at
  * distance 1..window on BOTH sides, and the global pair counts are
  * the co-occurrence statistics downstream embedding / PMI stages
  * consume (the q115 PMI query is the natural consumer).
  *
  * Reference scope: no reference counterpart (its corpus is typed
  * columns, not text); training-data pipeline mandate.
  *
  * Scale shape: tokens explode narrowly to (doc, pos, word); forward
  * neighbors come from ONE equi-join of the ×window-exploded probe
  * side against the position frame on (doc, pos+δ) — never a
  * per-document crossJoin or a collected vocabulary. The symmetric
  * direction is a projection flip (no second join), and the closing
  * count is map-side combined on (center, context). At 100 TB the
  * join shuffles token-cardinality rows exactly twice (probe + build
  * sides of one exchange pair), each row a (long, int, word) triple.
  */
object SkipGram {

  /** Global (center, context, cnt) pairs with |pos(center) −
    * pos(context)| ≤ window within a document, both directions
    * counted, pruned to cnt ≥ minCount (the word2vec min-count
    * convention — drops the hapax tail that would dominate the
    * output's cardinality). */
  def pairs(docs: DataFrame, idCol: String, textCol: String,
            window: Int, minCount: Long): DataFrame = {
    require(window >= 1 && window <= 16,
      s"SkipGram.pairs: window in [1, 16], got $window")
    val pos = docs
      .select(col(idCol).as("__doc"),
              posexplode(TextStats.tokens(col(textCol)))
                .as(Seq("__pos", "__w")))
    val probes = pos
      .select(col("__doc"), col("__pos"), col("__w").as("center"),
              explode(sequence(lit(1), lit(window))).as("__delta"))
      .withColumn("__pos2", col("__pos") + col("__delta"))
    val right = pos.select(col("__doc"), col("__pos").as("__pos2"),
                           col("__w").as("context"))
    val fwd = probes.join(right, Seq("__doc", "__pos2"))
      .select(col("center"), col("context"))
    val sym = fwd.unionByName(
      fwd.select(col("context").as("center"), col("center").as("context")))
    sym.groupBy(col("center"), col("context"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
  }

  /** Negative-sampling draw table — word2vec's noise distribution
    * (unigram^0.75, Mikolov et al. 2013) materialized as an audited
    * draw count per vocabulary word: `nDraws` deterministic 62-bit
    * LCG points land in the integer-mass interval [cum, cum+u) of
    * exactly one word.
    *
    * Determinism contract: the 3/4 power is sqrt(c·sqrt(c)) — sqrt is
    * IEEE-correctly-rounded (pow is not), so the micro-unit weights
    * are bit-identical in any IEEE engine — and all interval
    * arithmetic is 64-bit integer.
    *
    * Scale shape: the corpus folds once to the word-type frame; the
    * cumulative mass rides [[graft.operators.OrderedStats
    * .cumsumExclusive]] (no single-partition window); and draws meet
    * intervals through a BUCKET equi-join (each word explodes only to
    * the mass buckets its interval overlaps, each draw computes its
    * bucket directly) — never an inequality join, so the plan carries
    * no BroadcastNestedLoopJoin at any vocabulary size. Output one
    * row per word: (word, cnt, weight_micro, n_drawn). */
  def negativeTable(docs: DataFrame, textCol: String, nDraws: Int,
                    buckets: Int = 64): DataFrame = {
    require(nDraws >= 1 && nDraws <= 1000000,
      s"SkipGram.negativeTable: nDraws in [1, 1e6], got $nDraws")
    val words = docs
      .select(explode(TextStats.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .withColumn("u",
        round(sqrt(col("c").cast("double") * sqrt(col("c").cast("double")))
          * 1e6, 0).cast("long"))
    // logScale: "c" is Zipfian — linear bucketing would drop nearly the
    // whole vocabulary into bucket 0 and degenerate phase 3 to a
    // near-single-partition window; log-spacing spreads the tail.
    val cum = graft.operators.OrderedStats.cumsumExclusive(
      words, sortCol = "c", tieCols = Seq("w"), valueCol = "u",
      outCol = "cum", logScale = true)
    val tot = words.agg(sum(col("u")).cast("long").as("uu"))
    // Bucket via a precomputed width W = uu div buckets + 1 (divide
    // BEFORE multiply): bucket(x) = x div W stays in Int64 for any
    // uu < 2^63, where the naive (x * buckets) div uu form wraps
    // negative once uu exceeds ~1.4e17 micro-units (~1.4e11 tokens).
    // x < uu ⇒ x div W ≤ (uu-1) div W < buckets, so the range holds.
    val wb = cum.crossJoin(broadcast(tot))
      .withColumn("__bw", expr(s"uu div $buckets + 1"))
      .withColumn("b", explode(expr(
        "sequence(cum div __bw, (cum + u - 1) div __bw)")))
      .drop("__bw")
    val draws = docs.sparkSession.range(0, nDraws)
      .select(col("id").as("j")).crossJoin(broadcast(tot))
      .withColumn("tt", pmod(
        Similarity.lcg(col("j") * 2) * lit(2147483648L) +
          Similarity.lcg(col("j") * 2 + 1), col("uu")))
      .withColumn("b", expr(s"tt div (uu div $buckets + 1)"))
    val assigned = draws.join(wb, Seq("b"))
      .filter(col("tt") >= col("cum") && col("tt") < col("cum") + col("u"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
    words.join(assigned, Seq("w"), "left")
      .select(col("w").as("word"), col("c").as("cnt"),
        col("u").as("weight_micro"),
        coalesce(col("n"), lit(0L)).as("n_drawn"))
  }
}
