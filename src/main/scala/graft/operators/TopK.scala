package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-group top-k WITHOUT a window sort — the aggregation-shaped form.
  *
  * The standard `row_number() OVER (PARTITION BY g ORDER BY s DESC) <= k`
  * shuffles EVERY row to its group's partition and sorts whole groups,
  * even though only k rows per group survive: at 100 TB with millions of
  * rows per group that is a full-corpus shuffle + sort for a k-row
  * answer. This operator aggregates instead: a bounded k-element buffer
  * per group means map-side partial aggregation keeps at most k rows
  * per (partition, group) BEFORE the exchange — the shuffle moves
  * O(k · |groups| · |partitions|) buffered rows, not the corpus, and no
  * per-group sort ever happens (each insert is an O(k) merge into a
  * sorted bounded buffer, the ExpWeightedMeanAgg economics).
  *
  * Total order: (score DESC, id ASC) — the id tiebreak makes the result
  * deterministic under any partitioning, the q6 keep-latest contract.
  * Ref behavior this generalizes: the reference's per-team "last N
  * games" selections (feature_generator.py) are bounded keep-newest
  * picks of exactly this shape.
  */
case class TopKBuf(items: Seq[(Double, Long)])

class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), TopKBuf, TopKBuf] {

  override def zero: TopKBuf = TopKBuf(Nil)

  // (score desc, id asc): total, deterministic
  private def lt(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def trim(items: Seq[(Double, Long)]): TopKBuf = {
    val sorted = items.sortWith(lt)
    TopKBuf(if (sorted.length > k) sorted.take(k) else sorted)
  }

  override def reduce(b: TopKBuf, a: (Double, Long)): TopKBuf =
    // fast reject: a full buffer whose worst element beats `a` skips the sort
    if (b.items.length == k && lt(b.items.last, a)) b
    else trim(b.items :+ a)

  override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf =
    trim(b1.items ++ b2.items)

  override def finish(b: TopKBuf): TopKBuf = TopKBuf(b.items.sortWith(lt))

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}

object TopK {

  /** Top `k` rows per group by (`scoreCol` DESC, `idCol` ASC).
    * Returns (groupCols*, rank, id, score), rank 1-based. */
  def perGroupTopK(df: DataFrame, groupCols: Seq[String], scoreCol: Column,
                   idCol: Column, k: Int): DataFrame = {
    val topk = udaf(new TopKAgg(k))
    df.groupBy(groupCols.map(col): _*)
      .agg(topk(scoreCol, idCol).as("__top"))
      .select(groupCols.map(col) :+ posexplode(col("__top.items")): _*)
      .select(groupCols.map(col) ++ Seq(
        (col("pos") + 1).cast("long").as("rank"),
        col("col._2").as("id"),
        col("col._1").as("score")): _*)
  }
}
