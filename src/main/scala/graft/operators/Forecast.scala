package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Holt's linear-trend exponential smoothing per key — the sequential
  * forecasting fold (level + trend state, the metric-forecast sibling
  * of [[ChangePoint]]'s drift fold):
  *
  *   l_t = α·y_t + (1−α)·(l_{t−1} + b_{t−1})
  *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
  *
  * initialized l_1 = y_1, b_1 = 0. The recurrence couples two states,
  * so it is not a window expression; each key's ordered series folds
  * inside `flatMapSortedGroups` (the CUSUM treatment — parallelism
  * across keys, sequentiality inherent to the semantics).
  *
  * Float portability: the complements (1−α), (1−β) are computed ONCE
  * and the per-step op sequence is fixed, so a recursive replay
  * performing the identical expressions (the q185 oracle mirrors
  * `(1.0 − α)` literally) is bit-identical without quantization —
  * the q150 contract. */
object Forecast {

  /** Adds (level, trend) to each row. `orderCols` must be a TOTAL
    * order within a key. */
  def holt(df: DataFrame, keyCol: String, orderCols: Seq[Column],
           valueCol: String, alpha: Double, beta: Double): DataFrame = {
    val valIdx = df.schema.fieldIndex(valueCol)
    val keyIdx = df.schema.fieldIndex(keyCol)
    val ca = 1.0 - alpha
    val cb = 1.0 - beta
    val outEnc = Encoders.row(
      df.schema.add("level", DoubleType, nullable = false)
        .add("trend", DoubleType, nullable = false))
    df.groupByKey(_.get(keyIdx).toString)(Encoders.STRING)
      .flatMapSortedGroups(orderCols: _*) { (_, rows) =>
        var first = true
        var l = 0.0
        var b = 0.0
        rows.map { r =>
          val y = r.getDouble(valIdx)
          if (first) { l = y; b = 0.0; first = false }
          else {
            val lPrev = l
            l = alpha * y + ca * (l + b)
            b = beta * (l - lPrev) + cb * b
          }
          Row.fromSeq(r.toSeq ++ Seq(l, b))
        }
      }(outEnc)
  }

  /** Per-key summary: points, final level/trend, and the one-step
    * forecast — emitted directly from the sequential fold (ONE row
    * per key out of flatMapSortedGroups; a groupBy + last() would
    * reintroduce order-nondeterminism after the exchange). */
  def holtSummary(df: DataFrame, keyCol: String, orderCols: Seq[Column],
                  valueCol: String, alpha: Double,
                  beta: Double): DataFrame = {
    val spark = df.sparkSession
    val valIdx = df.schema.fieldIndex(valueCol)
    val keyIdx = df.schema.fieldIndex(keyCol)
    val ca = 1.0 - alpha
    val cb = 1.0 - beta
    val outEnc = Encoders.row(org.apache.spark.sql.types.StructType(Seq(
      df.schema(keyCol),
      org.apache.spark.sql.types.StructField("n_points",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("level", DoubleType, false),
      org.apache.spark.sql.types.StructField("trend", DoubleType, false),
      org.apache.spark.sql.types.StructField("forecast_next", DoubleType,
        false))))
    import graft.util.Exact.round6
    df.groupByKey(_.get(keyIdx).toString)(Encoders.STRING)
      .flatMapSortedGroups(orderCols: _*) { (_, rows) =>
        var first = true
        var l = 0.0
        var b = 0.0
        var n = 0L
        var key: Any = null
        rows.foreach { r =>
          val y = r.getDouble(valIdx)
          key = r.get(keyIdx)
          n += 1
          if (first) { l = y; b = 0.0; first = false }
          else {
            val lPrev = l
            l = alpha * y + ca * (l + b)
            b = beta * (l - lPrev) + cb * b
          }
        }
        Iterator.single(
          Row(key, n, round6(l), round6(b), round6(round6(l) + round6(b))))
      }(outEnc)
  }
}
