package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two samples of one feature —
  * the train/serve skew monitor an ML pipeline runs between a
  * reference window and a live window. Population Stability Index
  * over a fixed equi-width bucketing:
  *
  *   PSI = Σ_buckets (p_i − q_i) · ln(p_i / q_i)
  *
  * with shares clamped to `floor` (1e-6) so empty buckets contribute
  * a large-but-finite term instead of ±∞ (standard PSI practice).
  * Rule of thumb: < 0.1 stable, 0.1–0.25 moderate shift, > 0.25 act.
  *
  * Returns one row per bucket (counts, shares, PSI term) plus the
  * total on every row — the per-bucket breakdown IS the diagnosis
  * (which part of the distribution moved), the total is the alarm.
  *
  * Determinism: shares and log terms are IEEE arithmetic on exact
  * integer counts — identical in any engine; the 20-term total sums
  * through the 1e-12 decimal quantum so partition order can't leak.
  * Scale shape: one bucket aggregation per side (map-side combined to
  * ≤ nBuckets+2 partials each — the [[Histogram]] economics), joined
  * on bucket; nothing row-sized crosses the exchange. */
object Drift {

  def psi(reference: DataFrame, live: DataFrame, valueCol: String,
          lo: Double, hi: Double, nBuckets: Int,
          floor: Double = 1e-6): DataFrame = {
    val a = bucketCounts(reference, valueCol, lo, hi, nBuckets, "n_ref")
    val b = bucketCounts(live, valueCol, lo, hi, nBuckets, "n_live")
    val joined = a.join(b, Seq("bucket"), "full")
      .select(col("bucket"),
              coalesce(col("n_ref"), lit(0L)).as("n_ref"),
              coalesce(col("n_live"), lit(0L)).as("n_live"))
    val tot = joined.agg(sum(col("n_ref")).as("__ta"),
                         sum(col("n_live")).as("__tb"))
    val share = (n: Column, t: Column) =>
      greatest(n.cast("double") / t.cast("double"), lit(floor))
    val terms = joined.crossJoin(broadcast(tot))
      .withColumn("p_ref", share(col("n_ref"), col("__ta")))
      .withColumn("p_live", share(col("n_live"), col("__tb")))
      .withColumn("psi_term",
        (col("p_ref") - col("p_live")) * log(col("p_ref") / col("p_live")))
    val total = terms
      .agg(sum(round(col("psi_term") * lit(1e12), 0).cast("decimal(38,0)"))
             .as("__q"))
      .select((col("__q").cast("double") / lit(1e12)).as("__psi"))
    terms.crossJoin(broadcast(total))
      .select(col("bucket"), col("n_ref"), col("n_live"),
              round(col("p_ref"), 6).as("p_ref"),
              round(col("p_live"), 6).as("p_live"),
              round(col("psi_term"), 6).as("psi_term"),
              round(col("__psi"), 6).as("psi_total"))
  }

  private def bucketCounts(df: DataFrame, valueCol: String, lo: Double,
                           hi: Double, nBuckets: Int,
                           as: String): DataFrame =
    Histogram.histogram(df, valueCol, lo, hi, nBuckets)
      .select(col("bucket"), col("n").as(as))
}
