package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DoubleType}

/** One-sided CUSUM control chart per key — sequential change-point
  * detection (Page 1954): S_t = max(0, S_{t-1} + (x_t − target −
  * slack)), alarm when S_t > threshold. Small sustained shifts
  * accumulate where a fixed per-point threshold (q130's z-score) only
  * sees isolated spikes — the standard drift detector for metric
  * streams.
  *
  * The recurrence has a RESET (the max with 0), so it is not a window
  * cumsum — same class as first-fit packing (Packing.scala:83), and it
  * gets the same treatment: each key's ordered series folds
  * sequentially inside `flatMapSortedGroups` (Spark's group-sort
  * machinery does the ordering; the fold is a streaming iterator,
  * nothing materializes per group). Parallelism is across keys —
  * per-key sequentiality is inherent to the semantics, not a plan
  * accident; a metrics feed has many keys and bounded points per key.
  *
  * Float portability: one add and one max per step, in series order
  * (ts, then id as total tiebreak) — the identical operation sequence
  * any engine's recursive evaluation performs, so results are
  * bit-identical without quantization (the q59 recursive-CTE oracle
  * contract).
  */
object ChangePoint {

  /** Adds (cusum, alarm) to each row. `orderCols` must be a TOTAL
    * order within a key (e.g. ts, then event id). */
  def cusum(df: DataFrame, keyCol: String, orderCols: Seq[Column],
            valueCol: String, target: Double, slack: Double,
            threshold: Double): DataFrame = {
    val valIdx = df.schema.fieldIndex(valueCol)
    val keyIdx = df.schema.fieldIndex(keyCol)
    val outEnc = Encoders.row(
      df.schema.add("cusum", DoubleType, nullable = false)
        .add("alarm", BooleanType, nullable = false))
    df.groupByKey(_.get(keyIdx).toString)(Encoders.STRING)
      .flatMapSortedGroups(orderCols: _*) { (_, rows) =>
        var s = 0.0
        rows.map { r =>
          val x = r.getDouble(valIdx)
          s = math.max(0.0, s + (x - target - slack))
          Row.fromSeq(r.toSeq ++ Seq(s, s > threshold))
        }
      }(outEnc)
  }

  /** Per-key alarm summary: points, alarms, peak statistic, first
    * alarmed row id (null when the chart never fires). */
  def cusumSummary(df: DataFrame, keyCol: String, orderCols: Seq[Column],
                   valueCol: String, idCol: String, target: Double,
                   slack: Double, threshold: Double): DataFrame =
    cusum(df, keyCol, orderCols, valueCol, target, slack, threshold)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_points"),
           sum(when(col("alarm"), 1L).otherwise(0L)).as("n_alarms"),
           round(max(col("cusum")), 6).as("peak_cusum"),
           min(when(col("alarm"), col(idCol))).as("first_alarm_id"))
}
