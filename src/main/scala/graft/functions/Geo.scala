package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F13: haversine distance — the reference's implied `travel_delta`
  * training feature (config.py:100). Pure built-in math expressions
  * (codegen'd); no UDF.
  */
object Geo {
  private val EarthRadiusKm = 6371.0088

  /** Great-circle distance in km between (lat1,lon1) and (lat2,lon2),
    * in degrees. asin formulation (fewer ops than atan2). */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dlat = radians(lat2 - lat1) / 2
    val dlon = radians(lon2 - lon1) / 2
    val a = pow(sin(dlat), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dlon), 2)
    lit(2 * EarthRadiusKm) * asin(sqrt(a))
  }
}
