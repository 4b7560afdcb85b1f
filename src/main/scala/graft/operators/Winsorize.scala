package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group winsorization — the robust-statistics tail clamp feature
  * pipelines apply before z-scoring or regressing on heavy-tailed
  * values (cap each group's values at its own [pLo, pHi] exact
  * percentiles). Returns the per-group audit row: count, the two
  * (rounded) thresholds, how many rows clamped at each tail, and the
  * exact sum of the winsorized values.
  *
  * Thresholds are EXACT percentiles (Spark's sort-based `percentile`,
  * linear interpolation) ROUNDED to 4 decimals before any comparison
  * or clamp — comparisons against an unrounded threshold would hang
  * engine-portability on the last ulp of two engines' interpolation
  * arithmetic; after rounding, both engines clamp against the
  * identical constant. Clamped sums ride DECIMAL(30,6).
  *
  * Scale shape: ONE corpus exchange — the group repartition feeds the
  * percentile aggregation AND the audit aggregation (subset
  * clustering); thresholds are a groups-sized frame broadcast back;
  * the clamp is a narrow projection. Exact percentile sorts within
  * the aggregation buffer — the honest verification-scale mode; at
  * 100 TB swap `approx_percentile` in (the q81 sketch contract) and
  * the buffer becomes bounded. */
object Winsorize {

  def winsorize(df: DataFrame, keys: Seq[String], valueCol: String,
                pLo: Double, pHi: Double): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, "need 0 <= pLo < pHi <= 1")
    val x = col(valueCol).cast("double")
    val prepared = df.select((keys.map(col) :+ x.as("__x")): _*)
      .filter(col("__x").isNotNull)
      .repartition(keys.map(col): _*)
    val thresholds = prepared
      .groupBy(keys.map(col): _*)
      .agg(round(expr(s"percentile(__x, $pLo)"), 4).as("p_lo"),
           round(expr(s"percentile(__x, $pHi)"), 4).as("p_hi"))
    val clamped = prepared
      .join(broadcast(thresholds), keys)
      .withColumn("__w", least(greatest(col("__x"), col("p_lo")), col("p_hi")))
    clamped
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
           min(col("p_lo")).as("p_lo"),
           min(col("p_hi")).as("p_hi"),
           sum(when(col("__x") < col("p_lo"), 1L).otherwise(0L))
             .as("n_clamped_lo"),
           sum(when(col("__x") > col("p_hi"), 1L).otherwise(0L))
             .as("n_clamped_hi"),
           sum(col("__w").cast("decimal(30,6)")).cast("double")
             .as("winsorized_sum"))
  }
}
