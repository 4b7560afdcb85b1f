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
}
