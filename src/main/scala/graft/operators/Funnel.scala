package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered conversion-funnel analysis over an event log: for a step
  * sequence like signup → click → purchase, a user converts step k
  * iff an event of step k's type occurs STRICTLY AFTER their step-k−1
  * conversion instant (the classic ordered-funnel semantics — a
  * purchase before the signup doesn't count). Returns one audit row
  * per step: users reaching it, conversion vs the previous step, and
  * the mean hours taken from the previous step.
  *
  * Scale shape: ONE scan and ONE user-keyed exchange. Step instants
  * are CHAINED whole-partition window aggregates — t_k = min event
  * time of step k's type after t_{k−1}, each referencing the previous
  * window column — so Catalyst plans k Window operators back-to-back
  * over the same partitioning (a first draft materialized each step
  * as its own agg+join branch; the physical plan re-scanned the log
  * once per step and once per audit row — 7 scans for 3 steps). The
  * per-user reduction reuses the same partitioning (no new exchange),
  * and all per-step counts/sums ride one final 1-row aggregation
  * stacked to long form (the Profiler pattern). Time deltas aggregate
  * as exact integer microsecond sums, so means are order-independent
  * across engines.
  */
object Funnel {

  /** One row per step: (step, step_name, n_users, conversion_from_prev,
    * mean_hours_from_prev); the first step's conversion/delta are null. */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy(col("__u"))
    val log = events
      .select(col(userCol).as("__u"), col(typeCol).as("__t"),
              col(tsCol).as("__ts"))
      .filter(col("__t").isin(steps: _*))

    // chained conditional-min windows: t_k = first step-k event
    // strictly after t_{k-1}; all k windows share one exchange
    val stepped = steps.zipWithIndex.foldLeft(log) { case (df, (s, i)) =>
      val qualifies =
        if (i == 0) col("__t") === s
        else col("__t") === s && col("__ts") > col(s"t${i - 1}")
      df.withColumn(s"t$i", min(when(qualifies, col("__ts"))).over(w))
    }
    // one row per user (every row of a user carries identical t_i)
    val perUser = stepped.groupBy(col("__u"))
      .agg(min(col("t0")).as("t0"),
           steps.indices.tail.map(i => min(col(s"t$i")).as(s"t$i")): _*)

    // every step's count + delta sum in ONE 1-row aggregation
    val aggs = steps.indices.flatMap { i =>
      val n = count(col(s"t$i")).as(s"n$i")
      if (i == 0) Seq(n)
      else Seq(n, sum((unix_micros(col(s"t$i")) -
                        unix_micros(col(s"t${i - 1}")))
                       .cast("decimal(38,0)")).as(s"d$i"))
    }
    val wide = perUser.agg(aggs.head, aggs.tail: _*)

    val audit: Seq[Column] = steps.zipWithIndex.flatMap { case (name, i) =>
      val conv =
        if (i == 0) lit(null).cast("double")
        else when(col(s"n${i - 1}") > 0,
          round(col(s"n$i").cast("double") / col(s"n${i - 1}").cast("double"),
                4)).cast("double")
      val meanH =
        if (i == 0) lit(null).cast("double")
        else when(col(s"n$i") > 0,
          round(col(s"d$i").cast("double") / col(s"n$i").cast("double")
                  / lit(3.6e9), 4)).cast("double")
      Seq(struct(lit(i + 1).as("step"), lit(name).as("step_name"),
                 col(s"n$i").as("n_users"),
                 conv.as("conversion_from_prev"),
                 meanH.as("mean_hours_from_prev")))
    }
    wide.select(explode(array(audit: _*)).as("__s")).select(col("__s.*"))
  }
}
