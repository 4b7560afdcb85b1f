package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sweep-line interval concurrency — "how many sessions/calls/jobs
  * were active at once, and when did the peak happen": each interval
  * explodes to a (+1 at start, −1 at end) delta, a running sum over
  * the time-ordered deltas inside each group is the concurrency
  * curve, and its max is the peak. The half-open [start, end)
  * convention makes an interval ending exactly when another starts
  * NOT overlap: at equal timestamps the −1 sorts before the +1.
  *
  * Scale shape: the explode is narrow (2 rows per interval); ONE
  * exchange on the group key serves the ordered running-sum window
  * AND the per-group max aggregation (subset clustering). The window
  * orders within a group only — nothing serializes globally. A group
  * whose event count exceeds task memory is the salting case, same
  * as every Windows operator. */
object Sweep {

  /** Per-group peak concurrency: (group cols, peak_concurrent,
    * peak_at — the earliest instant the peak is reached). */
  def maxConcurrent(df: DataFrame, groups: Seq[String], startCol: Column,
                    endCol: Column): DataFrame = {
    val g = groups.map(col)
    val deltas = df.select(
        (g :+ explode(array(
          struct(startCol.as("t"), lit(1).as("d")),
          struct(endCol.as("t"), lit(-1).as("d")))).as("e")): _*)
      .select((g :+ col("e.t").as("t") :+ col("e.d").as("d")): _*)
    // at equal t the -1 sorts first: [start, end) half-open semantics
    val w = Window.partitionBy(g: _*)
      .orderBy(col("t").asc, col("d").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val curve = deltas.withColumn("conc", sum(col("d")).over(w))
    // the unordered group window reuses the same partitioning — no
    // second exchange for the peak lookup
    val withPeak = curve.withColumn("__peak",
      max(col("conc")).over(Window.partitionBy(g: _*)))
    withPeak.groupBy(g: _*)
      .agg(max(col("conc")).as("peak_concurrent"),
           min(when(col("conc") === col("__peak"), col("t"))).as("peak_at"))
  }
}
