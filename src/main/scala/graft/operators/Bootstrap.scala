package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.llm.Sampling

/** One-pass Poisson bootstrap (Chamandy et al. 2012) — the bootstrap
  * that works at any scale: instead of drawing B full resamples
  * (impossible distributed — each classical resample needs global
  * coordination), every row independently contributes a
  * Poisson(1)-distributed integer weight to each of B replicates; the
  * B weighted means then estimate the sampling distribution of the
  * statistic, and their quantiles are the confidence interval.
  *
  * Determinism: the per-(row, replicate) weight is the inverse-CDF of
  * Poisson(1) applied to the engine-wide id-keyed LCG fraction
  * (Sampling.idFraction of id·B + b) — no rng, reproducible across
  * runs, engines, and partitionings, so the q176 oracle replays the
  * EXACT interval, not a statistical cousin. Weights cap at 7
  * (P ≈ 8e-5 truncated — the documented approximation).
  *
  * Scale shape: one explode(B) → per-replicate map-side-combined
  * aggregation of quantized-decimal weighted sums (B rows total), then
  * rank selection on the B-row frame (windows on a bounded frame, the
  * q157 class). The corpus is read ONCE for all replicates. */
object Bootstrap {

  /** Cumulative Poisson(1) inverse-CDF thresholds, k = 0..7. */
  private val cum = Seq(0.3678794412, 0.7357588824, 0.9196986030,
    0.9810118431, 0.9963401532, 0.9994058152, 0.9999167589, 1.0)

  private def q6(c: Column): Column =
    round(c * lit(1e6), 0).cast("decimal(19,0)")

  /** 95% CI for the mean of `valueCol`: one row
    * (n, mean, ci_lo, ci_hi) — ci bounds are the 2nd-smallest and
    * (B−1)-th replicate means (the standard percentile bootstrap at
    * B = 64). `idCol` must be a stable numeric row id. */
  def meanCi(df: DataFrame, idCol: String, valueCol: String,
             b: Int = 64): DataFrame = {
    val x = col(valueCol).cast("double")
    val u = Sampling.idFraction(col(idCol) * b + col("rep"))
    val w = cum.init.zipWithIndex.foldRight(lit(cum.size - 1): Column) {
      case ((t, k), acc) => when(u < t, k).otherwise(acc)
    }.cast("long")
    val reps = df
      .select(col(idCol), x.as("__x"),
              explode(array((0 until b).map(lit): _*)).as("rep"))
      .select(col("rep"), w.as("__w"), col("__x"))
      .groupBy(col("rep"))
      .agg(sum(q6(col("__w") * col("__x"))).cast("decimal(38,0)").as("__swx"),
           sum(col("__w")).as("__sw"))
      .select(col("rep"),
              round(col("__swx").cast("double") / 1e6 /
                    col("__sw").cast("double"), 9).as("__m"))
    val ranked = reps.withColumn("__rk",
      row_number().over(Window.orderBy(col("__m").asc, col("rep").asc)))
    val base = df.agg(
      count(lit(1)).as("n"),
      round(sum(q6(x)).cast("decimal(38,0)").cast("double") / 1e6 /
            count(lit(1)).cast("double"), 6).as("mean"))
    base.crossJoin(
        ranked.filter(col("__rk") === 2)
          .select(round(col("__m"), 6).as("ci_lo")))
      .crossJoin(
        ranked.filter(col("__rk") === b - 1)
          .select(round(col("__m"), 6).as("ci_hi")))
  }
}
