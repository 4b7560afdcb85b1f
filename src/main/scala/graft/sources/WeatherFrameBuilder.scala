package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TimeFns

/** S6/S7: the weather-API frame shape (reference weather_client.py:
  * 28-151 historical, 153-236 forecast) — an hourly tz-aware time
  * index with one double column per weather variable.
  *
  * The HTTP fetch is a driver-side shim; given the API's parallel
  * per-variable value arrays, the frame is built with one
  * sequence+explode (no driver loop) and `from_utc_timestamp` for the
  * reference's tz-localized index (F12).
  */
object WeatherFrameBuilder {

  val historicalVariables: Seq[String] = Seq(
    "temperature_2m", "relative_humidity_2m", "apparent_temperature",
    "rain", "snowfall", "snow_depth", "cloud_cover", "wind_speed_10m",
    "wind_gusts_10m")

  val forecastVariables: Seq[String] =
    historicalVariables ++ Seq("precipitation_probability", "precipitation", "showers")

  /** Build the hourly frame from parallel per-variable arrays (the
    * API response shape): values(v)(i) is variable v at hour i. */
  def fromArrays(spark: SparkSession, startUtc: String, endUtc: String,
                 tz: String, values: Map[String, Seq[Double]]): DataFrame = {
    val vars = values.keys.toSeq.sorted
    val idx = TimeFns.hourlyIndex(spark, startUtc, endUtc)
      .withColumn("__i", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("hour_ts"))) - 1)
    val withVals = vars.foldLeft(idx) { (df, v) =>
      val arr = array(values(v).map(lit): _*)
      df.withColumn(v, element_at(arr, col("__i") + 1))
    }
    withVals
      .withColumn("local_time", from_utc_timestamp(col("hour_ts"), tz))
      .drop("__i")
  }

  /** Deterministic synthetic frame for tests/demos (no codecs or HTTP
    * in this container): variable v at hour i = sin(seed + i) * scale. */
  def synthetic(spark: SparkSession, startUtc: String, endUtc: String,
                tz: String, variables: Seq[String] = historicalVariables): DataFrame = {
    val idx = TimeFns.hourlyIndex(spark, startUtc, endUtc)
    variables.zipWithIndex.foldLeft(idx) { case (df, (v, i)) =>
      df.withColumn(v, round(sin(unix_timestamp(col("hour_ts")) / 3600 + i) * 10, 4))
    }.withColumn("local_time", from_utc_timestamp(col("hour_ts"), tz))
  }
}
