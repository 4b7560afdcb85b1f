package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch attribution — which channel gets credit for a
  * conversion, under the three standard models at once: FIRST touch,
  * LAST touch, and LINEAR (1/n to each touch) over the lookback
  * window preceding each conversion. The side-by-side readout is the
  * point: channels that open journeys vs channels that close them
  * disagree exactly where the models disagree.
  *
  * Conversions with NO touch in the window are credited to the
  * '(none)' channel — dropped conversions would silently understate
  * totals (the engine-wide loud-edges rule).
  *
  * Scale shape: one unit-keyed range join (touch within
  * [conv − lookback, conv]) — per-task cost bounds at one unit's
  * events; first/last picks are per-CONVERSION row_number windows
  * (conversion-bounded frames); linear credits quantize to 9 decimals
  * and decimal-sum per channel. Deterministic: (ts, id) total order
  * breaks touch ties. */
object Attribution {

  def credits(events: DataFrame, unitCol: String, tsCol: String,
              idCol: String, typeCol: String, conversionType: String,
              touchTypes: Seq[String], lookbackDays: Int): DataFrame = {
    val conv = events.filter(col(typeCol) === conversionType)
      .select(col(unitCol).as("__u"), col(tsCol).as("__cts"),
              col(idCol).as("__cid"))
    val touch = events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(unitCol).as("__u"), col(tsCol).as("__tts"),
              col(idCol).as("__tid"), col(typeCol).as("channel"))
    val joined = conv.join(touch, Seq("__u"))
      .filter(col("__tts") <= col("__cts") &&
              col("__tts") > col("__cts") - expr(s"INTERVAL $lookbackDays DAYS"))
    val w = Window.partitionBy(col("__u"), col("__cid"))
    val ranked = joined
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__rnF", row_number().over(
        w.orderBy(col("__tts").asc, col("__tid").asc)))
      .withColumn("__rnL", row_number().over(
        w.orderBy(col("__tts").desc, col("__tid").desc)))
    val attributed = ranked.groupBy(col("channel"))
      .agg(sum(when(col("__rnF") === 1, 1L).otherwise(0L)).as("conv_first"),
           sum(when(col("__rnL") === 1, 1L).otherwise(0L)).as("conv_last"),
           round(sum(round(lit(1.0) / col("__n").cast("double"), 9)
                       .cast("decimal(19,9)")).cast("double"), 6)
             .as("conv_linear"))
    val unattributed = conv
      .join(joined.select(col("__cid")).distinct(), Seq("__cid"), "left_anti")
      .agg(count(lit(1)).as("conv_first"))
      .select(lit("(none)").as("channel"), col("conv_first"),
              col("conv_first").as("conv_last"),
              col("conv_first").cast("double").as("conv_linear"))
      .filter(col("conv_first") > 0)
    attributed.unionByName(unattributed)
  }
}
