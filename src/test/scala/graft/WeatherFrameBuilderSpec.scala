package graft

import graft.sources.WeatherFrameBuilder

class WeatherFrameBuilderSpec extends SparkSpec {
  import spark.implicits._

  test("hourly index + per-variable columns from API-shaped arrays (S6)") {
    val vals = Map(
      "temperature_2m" -> Seq(1.0, 2.0, 3.0),
      "rain" -> Seq(0.0, 0.5, 0.0))
    val df = WeatherFrameBuilder.fromArrays(spark,
      "2024-01-01 00:00:00", "2024-01-01 02:00:00", "America/Chicago", vals)
    assert(df.count() === 3)
    assert(df.columns.toSet === Set("hour_ts", "temperature_2m", "rain", "local_time"))
    val r = df.orderBy("hour_ts").collect()
    assert(r.map(_.getAs[Double]("temperature_2m")).toSeq === Seq(1.0, 2.0, 3.0))
    // F12: UTC midnight = 18:00 previous day in Chicago (CST, UTC-6)
    assert(r.head.getAs[java.sql.Timestamp]("local_time").toString
      === "2023-12-31 18:00:00.0")
  }

  test("synthetic frame is deterministic and fully populated (S7 shape)") {
    val a = WeatherFrameBuilder.synthetic(spark,
      "2024-06-01 00:00:00", "2024-06-02 00:00:00", "America/Chicago",
      WeatherFrameBuilder.forecastVariables)
    assert(a.count() === 25)
    assert(WeatherFrameBuilder.forecastVariables.forall(a.columns.contains))
    val b = WeatherFrameBuilder.synthetic(spark,
      "2024-06-01 00:00:00", "2024-06-02 00:00:00", "America/Chicago",
      WeatherFrameBuilder.forecastVariables)
    assert(a.collect().toSeq === b.collect().toSeq)
  }
}
