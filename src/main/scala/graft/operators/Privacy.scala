package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Privacy-governance operators — the audits a dataset goes through
  * before release or training: re-identification risk of a
  * quasi-identifier combination, and per-unit contribution bounding
  * (the sensitivity-control step every user-level DP mechanism and
  * every fair-influence training pipeline runs BEFORE aggregation or
  * noise).
  */
object Privacy {

  /** k-anonymity / l-diversity audit: group by the quasi-identifier
    * columns; k = the smallest equivalence class (any external join
    * can single someone out iff k is small), l = the least diversity
    * of `sensitiveCol` within a class (a k-anonymous class still
    * leaks when everyone in it shares the sensitive value). One
    * map-side-combined aggregation to QI-cell cardinality, then a
    * 1-row fold. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String): DataFrame = {
    val cells = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__n"),
           countDistinct(col(sensitiveCol)).as("__l"))
    cells.agg(
      sum(col("__n")).cast("long").as("n_rows"),
      count(lit(1)).as("n_cells"),
      min(col("__n")).as("k_anonymity"),
      min(col("__l")).as("l_diversity"),
      sum(when(col("__n") < 5, 1L).otherwise(0L)).as("n_cells_k_lt_5"))
  }

  /** Per-unit contribution capping: keep at most `cap` rows per unit,
    * chosen deterministically as the FIRST `cap` in (`orderCols`)
    * order — the bounded-sensitivity preprocessing of user-level DP
    * (Δf becomes `cap`, not a power user's whole history) and the
    * standard guard against one entity dominating a training mix.
    * Returns the capped frame; rows beyond the cap are dropped, not
    * sampled, so reruns are idempotent.
    *
    * Scale shape: one unit-keyed exchange for the rank window
    * (per-task memory bounds at the largest unit); the filter then
    * prunes before anything downstream shuffles. */
  def capContributions(df: DataFrame, unitCol: String,
                       orderCols: Seq[String], cap: Int): DataFrame = {
    val w = Window.partitionBy(col(unitCol))
      .orderBy(orderCols.map(col(_).asc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .drop("__rn")
  }
}
