package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting and shard assignment for training
  * pipelines. Every assignment is a pure function of the row's id —
  * reproducible across runs, engines, and repartitionings (no
  * rand()), and a narrow projection with zero shuffle.
  */
object Sampling {

  /** Uniform-ish fraction in [0, 1) from a numeric id via the shared
    * plain-arithmetic LCG (see Similarity.lcg — recomputable by any
    * SQL engine). Bit 16 and up are the well-mixed ones, so the
    * fraction uses the state's high bits. */
  def idFraction(id: Column): Column =
    shiftright(Similarity.lcg(id), 8).cast("double") / lit(8388608.0) // 2^23

  /** Assign each row to a named split by cumulative weight over
    * [[idFraction]]. `splits` e.g. Seq("train" -> 0.8, "val" -> 0.1,
    * "test" -> 0.1); weights must sum to 1. */
  def assignSplit(id: Column, splits: Seq[(String, Double)]): Column = {
    val frac = idFraction(id)
    val cuts = splits.scanLeft(0.0)(_ + _._2).tail
    splits.init.zip(cuts.init).foldRight(lit(splits.last._1): Column) {
      case (((name, _), cut), rest) => when(frac < cut, lit(name)).otherwise(rest)
    }
  }

  /** Deterministic shard id in [0, nShards). */
  def shardOf(id: Column, nShards: Int): Column =
    pmod(Similarity.lcg(id), lit(nShards.toLong))
}
