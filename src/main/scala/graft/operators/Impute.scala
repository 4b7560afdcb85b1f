package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group median imputation — the feature-engineering null repair
  * (fill each group's missing numerics with that group's own median,
  * robust to the heavy tails a mean would chase). Returns the input
  * with `<valueCol>_imputed` plus a per-row `was_imputed` flag —
  * surfaced, not silent, so downstream quality checks can count
  * repairs.
  *
  * The median is the exact percentile(0.5), ROUNDED to 4 decimals
  * before substitution (the [[Winsorize]] portability contract).
  * Scale shape: one group aggregation to a groups-sized median frame,
  * broadcast back, narrow coalesce — the corpus shuffles only if the
  * caller's downstream needs it. Groups whose values are ALL null
  * have no median; their rows keep null and flag true (visible, not
  * invented). */
object Impute {

  def medianImpute(df: DataFrame, keys: Seq[String],
                   valueCol: String): DataFrame = {
    val x = col(valueCol).cast("double")
    val medians = df.filter(x.isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(round(expr(s"percentile(CAST($valueCol AS DOUBLE), 0.5)"), 4)
             .as("__median"))
    df.join(broadcast(medians), keys, "left")
      .withColumn(s"${valueCol}_imputed", coalesce(x, col("__median")))
      .withColumn("was_imputed", x.isNull)
      .drop("__median")
  }
}
