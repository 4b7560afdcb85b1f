package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Split-conformal prediction intervals — the distribution-free
  * uncertainty wrapper (Vovk; Lei et al. 2018) a serving pipeline
  * puts around ANY point predictor: on a held-out calibration split,
  * take q̂ = the ⌈(n+1)(1−α)⌉-th smallest absolute residual; the band
  * prediction ± q̂ then covers fresh points with probability ≥ 1−α,
  * no matter how wrong the model is. The operator returns the
  * calibration readout AND the empirical coverage on a test split —
  * the guarantee, audited rather than trusted.
  *
  * Scale shape: the predictor table is one map-side-combined
  * aggregation (unit-cardinality, broadcast back); the k-th order
  * statistic — the scale hazard, residual cardinality ≈ rows — rides
  * [[OrderedStats.cumsumExclusive]] (two-phase bucketed rank, NO
  * single-partition window) and is selected by rank equality; q̂ and
  * the global fallback mean travel as 1-row broadcasts. Residuals
  * round to 6 decimals so rank ties are engine-portable. */
object Conformal {

  /** `splitCol` must be 0 (train), 1 (calibration), 2 (test) — a pure
    * function of a row id upstream. Returns 1 row:
    * (n_cal, k, qhat, n_test, coverage). */
  def splitConformal(df: DataFrame, unitCol: String, idCol: String,
                     valueCol: String, splitCol: String,
                     alpha: Double): DataFrame = {
    val x = col(valueCol).cast("double")
    val perUnit = df.filter(col(splitCol) === 0)
      .groupBy(col(unitCol))
      .agg(round(graft.util.Exact.exactAvg(x), 6).as("__pred"))
    val global = df.filter(col(splitCol) === 0)
      .agg(round(graft.util.Exact.exactAvg(x), 6).as("__gpred"))
    def withPred(part: DataFrame): DataFrame = part
      .join(broadcast(perUnit), Seq(unitCol), "left")
      .crossJoin(broadcast(global))
      .withColumn("__res",
        round(abs(x - coalesce(col("__pred"), col("__gpred"))), 6))

    val cal = withPred(df.filter(col(splitCol) === 1))
      .select(col(idCol), col("__res"))
    val nCal = cal.agg(count(lit(1)).as("n_cal"))
    val ranked = OrderedStats.cumsumExclusive(
      cal.withColumn("__one", lit(1L)),
      sortCol = "__res", tieCols = Seq(idCol),
      valueCol = "__one", outCol = "__rank0")
    // k clamps to n_cal: when ⌈(1−α)(n+1)⌉ > n_cal (tiny calibration
    // set or α < 1/(n_cal+1)) the textbook band is infinite — the
    // rank-equality filter would match NO row and the final crossJoin
    // would silently emit 0 rows. Clamping takes the max residual
    // (the widest finite band the data supports); the guarantee then
    // holds only at the achievable level 1 − k/(n_cal+1), which the
    // returned (n_cal, k) make auditable rather than silent.
    val qhat = ranked.crossJoin(broadcast(nCal))
      .withColumn("__k", least(
        ceil(lit(1.0 - alpha) * (col("n_cal") + 1)).cast("long"),
        col("n_cal")))
      .filter(col("__rank0") + 1 === col("__k"))
      .select(col("n_cal"), col("__k").as("k"), col("__res").as("qhat"))

    val test = withPred(df.filter(col(splitCol) === 2))
    test.crossJoin(broadcast(qhat))
      .agg(first(col("n_cal")).as("n_cal"), first(col("k")).as("k"),
           first(col("qhat")).as("qhat"),
           count(lit(1)).as("n_test"),
           round(sum(when(col("__res") <= col("qhat"), 1L).otherwise(0L))
                   .cast("double") / count(lit(1)).cast("double"), 6)
             .as("coverage"))
  }
}
