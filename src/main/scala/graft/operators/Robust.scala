package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust per-group outlier scoring via MAD (median absolute
  * deviation) — the heavy-tail-safe alternative to mean/stddev
  * z-scores (one extreme value drags a mean and inflates a stddev;
  * medians ignore it). robust_z = (x − med) / (1.4826·mad), where
  * 1.4826 rescales MAD to estimate σ under normality.
  *
  * Portability contract (the Winsorize pattern): both medians are
  * exact percentiles ROUNDED to 4 decimals before any downstream
  * arithmetic, so the score never hangs on the last ulp of two
  * engines' interpolation; the z itself rounds to 4. mad == 0
  * (constant group) yields NULL rather than ±Inf.
  *
  * Scale shape: ONE corpus exchange — the group repartition feeds the
  * median aggregation, the deviation-median aggregation, AND the
  * final projection (subset clustering); both aggregation outputs are
  * groups-sized frames broadcast back. Exact in-buffer percentile is
  * the verification-scale mode; at 100 TB swap `approx_percentile`
  * (the q81 sketch contract) and the buffer becomes bounded. */
object Robust {

  /** All input columns + `med`, `mad`, `robust_z`. */
  def madScore(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    val x = col(valueCol).cast("double")
    val k = keys.map(col)
    val prepared = df.filter(x.isNotNull).repartition(k: _*)
    val med = prepared.groupBy(k: _*)
      .agg(round(expr(s"percentile(CAST($valueCol AS DOUBLE), 0.5)"), 4).as("med"))
    val withMed = prepared.join(broadcast(med), keys)
    val mad = withMed.groupBy(k: _*)
      .agg(round(expr(s"percentile(abs(CAST($valueCol AS DOUBLE) - med), 0.5)"), 4)
        .as("mad"))
    withMed.join(broadcast(mad), keys)
      .withColumn("robust_z",
        round((x - col("med")) /
              (lit(1.4826) * when(col("mad") =!= 0.0, col("mad"))), 4))
  }

  /** Rows whose |robust_z| exceeds `zCut` (constant-value groups never
    * flag: their robust_z is NULL). */
  def madOutliers(df: DataFrame, keys: Seq[String], valueCol: String,
                  zCut: Double): DataFrame =
    madScore(df, keys, valueCol).filter(abs(col("robust_z")) > zCut)
}
