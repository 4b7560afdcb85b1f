package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.util.Exact

/** User-journey operators over an event stream: the first-order
  * Markov view of behavior (where do users go next?) and the
  * Kaplan–Meier survival view (how long do they stay?) — the two
  * readouts a product-analytics pipeline derives from the same
  * per-unit event sequences that the funnel (q104) and sessionize
  * (q44/q155) operators consume.
  */
object Journey {

  /** First-order Markov transition matrix: for each observed
    * (from_state, to_state) pair of CONSECUTIVE events within a unit,
    * the transition count and row-normalized probability.
    *
    * Scale shape: ONE unit-keyed exchange feeds the per-unit lead()
    * window (per-task memory bounds at the largest single unit's
    * events — the engine-wide window contract); transition counts
    * map-side combine to ≤ |states|² rows, and the row normalizer is
    * a broadcast join of per-from totals on that bounded frame. */
  def transitionMatrix(df: DataFrame, unitCol: String, stateCol: String,
                       orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(unitCol))
      .orderBy(orderCols.map(col(_).asc): _*)
    val pairs = df
      .select(col(unitCol), col(stateCol).as("from_state"),
              lead(col(stateCol), 1).over(w).as("to_state"))
      .filter(col("to_state").isNotNull)
      .groupBy(col("from_state"), col("to_state"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("from_state"))
      .agg(sum(col("n")).as("__tot"))
    pairs.join(broadcast(totals), Seq("from_state"))
      .select(col("from_state"), col("to_state"), col("n"),
              round(col("n").cast("double") / col("__tot").cast("double"), 6)
                .as("p"))
  }

  /** Kaplan–Meier survival over per-unit lifetimes: T = days between
    * a unit's first and last event; units whose last event falls at
    * or after `censorCutoff` are right-CENSORED (still alive at the
    * observation edge), everyone else is a death at T. Per distinct
    * lifetime t: units at risk, deaths, censorings, and the product-
    * limit estimate S(t) = Π_{s≤t} (1 − d_s/n_s).
    *
    * Scale shape: one unit-keyed aggregation reduces the stream to a
    * per-unit row; the risk table groups that to LIFETIME cardinality
    * (bounded by the observation window in days — 31 here, never
    * corpus-scale), which is collected and walked on the driver for
    * the sequential product (the bounded-state iteration precedent).
    * Each factor and running product quantizes to 9 decimals so a SQL
    * recursive replay lands on identical survival values. */
  def kaplanMeier(df: DataFrame, unitCol: String, tsCol: String,
                  censorCutoff: String,
                  maxTimePoints: Int = 100000): DataFrame = {
    val spark = df.sparkSession
    val perUnit = df.groupBy(col(unitCol))
      .agg(min(col(tsCol)).as("__first"), max(col(tsCol)).as("__last"))
      .select(datediff(col("__last"), col("__first")).cast("long").as("t"),
              (col("__last") >= to_timestamp(lit(censorCutoff)))
                .as("censored"))
    // risk-set rows = distinct event-time DAYS, bounded by the
    // observation window, never corpus-scale — `maxTimePoints` makes
    // that contract a loud failure instead of a driver OOM (100k
    // day-granularity points ≈ a 274-year window).
    val risk = graft.util.Bounded.collect(
      perUnit.groupBy(col("t"))
        .agg(sum(when(col("censored"), 0L).otherwise(1L)).as("d"),
             sum(when(col("censored"), 1L).otherwise(0L)).as("c"))
        .orderBy(col("t")),
      maxTimePoints, "Journey.kaplanMeier risk-set frame")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    var atRisk = risk.map(r => r._2 + r._3).sum
    var s = 1.0
    val rows = risk.map { case (t, d, c) =>
      s = Exact.round9(s * (1.0 - d.toDouble / atRisk.toDouble))
      val row = Row(t, atRisk, d, c, Exact.round6(s))
      atRisk -= (d + c)
      row
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      StructType(Seq(
        StructField("t", LongType, nullable = false),
        StructField("n_risk", LongType, nullable = false),
        StructField("n_death", LongType, nullable = false),
        StructField("n_censored", LongType, nullable = false),
        StructField("survival", DoubleType, nullable = false))))
  }
}
