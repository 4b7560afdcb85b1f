package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A3 as a packaged typed aggregate: `expWeightedMean(decay, n)` over
  * (orderKey, value) pairs — newest (largest orderKey) first, weight
  * decay^i, truncated to the `n` newest. Reference semantics:
  * `src/config.py:3-5` (GAME_SAMPLE=16, DECAY_FACTOR=0.88,
  * AGGREGATION_METHOD="exp_weighted_mean").
  *
  * The buffer keeps only the top-`n` (by orderKey) seen so far, so the
  * aggregation is bounded-memory and merge-safe for distributed partial
  * aggregation (map-side combine works; buffers merge by re-truncating).
  * For n=16 this is a 16-element insertion sort per row — cheap, and it
  * avoids materializing per-key sorted groups.
  *
  * The buffer is a product-encoded case class (array<struct<_1,_2>> in
  * Tungsten), not Kryo blobs — serialized natively, no opaque byte[]
  * round-trip per merge.
  */
case class EwmBuf(items: Seq[(Long, Double)])

class ExpWeightedMeanAgg(decay: Double, n: Int)
    extends Aggregator[(Long, Double), EwmBuf, Double] {

  override def zero: EwmBuf = EwmBuf(Nil)

  private def trim(items: Seq[(Long, Double)]): EwmBuf = {
    val sorted = items.sortBy(-_._1) // newest first
    EwmBuf(if (sorted.length > n) sorted.take(n) else sorted)
  }

  override def reduce(b: EwmBuf, a: (Long, Double)): EwmBuf =
    trim(b.items :+ a)

  override def merge(b1: EwmBuf, b2: EwmBuf): EwmBuf =
    trim(b1.items ++ b2.items)

  override def finish(b: EwmBuf): Double = {
    val sorted = b.items.sortBy(-_._1).take(n)
    var sw = 0.0; var swx = 0.0; var i = 0
    while (i < sorted.length) {
      val w = math.pow(decay, i)
      sw += w; swx += w * sorted(i)._2; i += 1
    }
    if (sw == 0.0) Double.NaN else swx / sw
  }

  override def bufferEncoder: Encoder[EwmBuf] = Encoders.product[EwmBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
