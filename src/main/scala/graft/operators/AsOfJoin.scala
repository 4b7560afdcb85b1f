package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — the generalization of W2 that J3 implies:
  * for every left row, attach the right row with the greatest right
  * time <= the left row's time, per key ("stats known as of game
  * date", reference README.md:63-67 + config.py matchup features).
  *
  * Spark has no ASOF JOIN; the preference order (compose built-ins
  * before custom plans) is satisfied here with the union-window
  * formulation: tag both sides, union, ONE window pass per key ordered
  * by (time, side) carrying the last-seen right payload forward, keep
  * left rows. Cost: one shuffle on the keys, O(n log n) per key — no
  * range-join pair blowup, no per-left-row scan. This is the
  * 100 TB-safe shape (a naive join on key + time-inequality explodes
  * to |L|x|R| per key before filtering).
  */
object AsOfJoin {

  /** Backward as-of join. Right columns in `rightPayload` are attached
    * to each left row from the newest right row with
    * `right(rightTime) <= left(leftTime)` for the same `keys` (null if
    * none). Right payload names must not collide with left columns.
    * `rightTiebreak` orders equal-time right rows (last wins). */
  def asOfBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTime: String, rightTime: String,
                   rightPayload: Seq[String],
                   rightTiebreak: Seq[Column] = Nil): DataFrame = {
    val leftCols = left.columns.toSeq
    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1)) // left sorts after right at equal t → inclusive
    val rTagged = right.select(
      (keys.map(col) ++ Seq(col(rightTime).as("__t"), lit(0).as("__side")) ++
        rightPayload.map(c => col(c))): _*)
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((col("__t").asc +: col("__side").asc +: rightTiebreak): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightPayload.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1)
      .select((leftCols ++ rightPayload).map(col): _*)
  }
}
