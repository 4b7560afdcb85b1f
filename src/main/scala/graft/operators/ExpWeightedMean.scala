package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable.ArrayBuffer

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
  */
class ExpWeightedMeanAgg(decay: Double, n: Int)
    extends Aggregator[(Long, Double), ArrayBuffer[(Long, Double)], Double] {

  override def zero: ArrayBuffer[(Long, Double)] = ArrayBuffer.empty

  private def trim(b: ArrayBuffer[(Long, Double)]): ArrayBuffer[(Long, Double)] = {
    val sorted = b.sortBy(-_._1) // newest first
    if (sorted.length > n) sorted.take(n) else sorted
  }

  override def reduce(b: ArrayBuffer[(Long, Double)], a: (Long, Double)) =
    trim(b += a)

  override def merge(b1: ArrayBuffer[(Long, Double)], b2: ArrayBuffer[(Long, Double)]) =
    trim(b1 ++= b2)

  override def finish(b: ArrayBuffer[(Long, Double)]): Double = {
    val sorted = b.sortBy(-_._1).take(n)
    var sw = 0.0; var swx = 0.0; var i = 0
    while (i < sorted.length) {
      val w = math.pow(decay, i)
      sw += w; swx += w * sorted(i)._2; i += 1
    }
    if (sw == 0.0) Double.NaN else swx / sw
  }

  override def bufferEncoder: Encoder[ArrayBuffer[(Long, Double)]] =
    Encoders.kryo[ArrayBuffer[(Long, Double)]]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
