package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function operators (SURVEY §2.5).
  *
  * W3 / A3: the reference's declared downstream aggregation is an
  * exponentially-weighted mean over the last `n` games with decay 0.88
  * (reference `src/config.py:3-5`). Expressed here as a pure window
  * formulation (built-ins only, codegen-friendly); the typed
  * `Aggregator` packaging lives in ExpWeightedMean.scala and is
  * cross-checked against this in tests.
  */
object Windows {

  /** Exp-weighted mean of `value` per `keys`, over the `n` newest rows
    * under `order` (newest first). weight_i = decay^i for the i-th
    * newest row; result = sum(w*x)/sum(w). Returns one row per key with
    * column `ewm`. One shuffle on `keys`. */
  def expWeightedMean(df: DataFrame, keys: Seq[String], order: Seq[Column],
                      value: Column, decay: Double, n: Int): DataFrame = {
    val w  = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val rn = row_number().over(w)
    df.withColumn("__rn", rn)
      .filter(col("__rn") <= n)
      .withColumn("__w", pow(lit(decay), col("__rn") - 1))
      .groupBy(keys.map(col): _*)
      .agg((sum(col("__w") * value) / sum(col("__w"))).as("ewm"))
  }

  /** Rolling mean column (last `lookback`+1 rows including current). */
  def rollingAvg(keys: Seq[String], order: Seq[Column], value: Column,
                 lookback: Int): Column =
    avg(value).over(
      Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
        .rowsBetween(-lookback, Window.currentRow))

  /** Rank within `keys` by `order` — reproduces the reference's scraped
    * ranking tables natively (SURVEY §2.5 note). */
  def rankBy(keys: Seq[String], order: Seq[Column]): Column =
    rank().over(Window.partitionBy(keys.map(col): _*).orderBy(order: _*))

  /** TIME-range rolling aggregation: for each row, count and exact sum
    * of `value` over the trailing `lookbackMicros` window of EVENT
    * TIME — `RANGE BETWEEN`, not `ROWS BETWEEN`, so gaps and bursts
    * weight by clock time, not row position (the trailing-24h-spend
    * shape rowsBetween can't express). Ordering is exact integer
    * microseconds (`unix_micros`), so frame membership is
    * engine-portable — no float epoch. The sum routes through
    * DECIMAL(30,6): sliding-frame sums are otherwise free to
    * accumulate in whatever incremental order the engine's segment
    * tree picks. One exchange on `keys`; every added column shares it. */
  def timeRolling(df: DataFrame, keys: Seq[String], tsCol: Column,
                  value: Column, lookbackMicros: Long): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(unix_micros(tsCol).asc)
      .rangeBetween(-lookbackMicros, Window.currentRow)
    df.withColumn("n_window", count(lit(1)).over(w))
      .withColumn("sum_window",
        sum(value.cast("decimal(30,6)")).over(w).cast("double"))
  }
}
