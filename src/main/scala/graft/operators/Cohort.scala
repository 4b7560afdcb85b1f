package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cohort retention — the activation/stickiness table every product
  * and data-collection pipeline reports: users grouped by the period
  * of their FIRST event, counted in each later period they remain
  * active. (The reference's collection-history tables support exactly
  * this per-collection freshness readout; this generalizes it to the
  * standard cohort triangle.)
  *
  * Scale shape: one corpus exchange at runtime. The two consumers of
  * the user-id repartition (first-event aggregation; (user, period)
  * activity distinct) plan as identical exchange subtrees that AQE's
  * stage reuse executes once; the per-user first-event frame is tiny
  * and broadcasts into the join, so no third shuffle exists. The final
  * (cohort, offset) aggregation moves only partial-agg rows, already
  * distinct per (user, period), so the count needs no countDistinct.
  * Period truncation is date_trunc — identical semantics in any SQL
  * engine (ISO Monday weeks). */
object Cohort {

  /** Weekly cohort triangle: (cohort_week yyyy-MM-dd, week_offset,
    * n_users). */
  def weeklyRetention(df: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    val u = df.select(col(userCol).as("__u"), col(tsCol).as("__ts"))
      .repartition(col("__u"))
    val firstTs = u.groupBy(col("__u"))
      .agg(date_trunc("week", min(col("__ts"))).as("__cw"))
    val activity = u
      .select(col("__u"), date_trunc("week", col("__ts")).as("__aw"))
      .distinct()
    activity.join(firstTs, "__u")
      .select(
        date_format(col("__cw"), "yyyy-MM-dd").as("cohort_week"),
        (datediff(col("__aw"), col("__cw")) / 7).cast("long").as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
