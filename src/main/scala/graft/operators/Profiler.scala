package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType, TimestampNTZType, TimestampType}

/** One-pass column profiler — the data-profiling utility a 100 TB
  * pipeline runs before trusting a new table: per column, the
  * non-null count, distinct count, and min/max (numerics and
  * timestamps as doubles — timestamps via epoch seconds, so the
  * numeric column is uniform; strings as strings; other types count
  * only).
  *
  * Shape: ONE aggregation pass over the table — every column's six
  * statistics are aggregate expressions in a single `agg`, and the
  * wide 1-row result pivots to long form with a `stack` projection
  * (driver-free, k rows). The exact `count_distinct` per column makes
  * Spark plan an Expand (input × #columns before partial aggregation)
  * — the honest exact mode at verification scale; at 100 TB swap
  * `approx_count_distinct` in via `exact = false` and the Expand
  * disappears (HLL sketches merge map-side). */
object Profiler {

  def profile(df: DataFrame, exact: Boolean = true): DataFrame = {
    val fields = df.schema.fields
    require(fields.nonEmpty, "profile of a zero-column frame")
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      val numC = f.dataType match {
        case _: NumericType | _: TimestampType => c.cast("double")
        // NTZ has no double cast; route through a session-tz timestamp
        // (epoch seconds — callers run UTC sessions, as Verify/Bench do)
        case _: TimestampNTZType => c.cast("timestamp").cast("double")
        case _ => lit(null).cast("double")
      }
      val strC = f.dataType match {
        case StringType => c
        case _ => lit(null).cast("string")
      }
      Seq(count(c).as(s"${f.name}#nn"),
          (if (exact) count_distinct(c)
           else approx_count_distinct(c)).as(s"${f.name}#nd"),
          min(numC).as(s"${f.name}#mnn"), max(numC).as(s"${f.name}#mxn"),
          min(strC).as(s"${f.name}#mns"), max(strC).as(s"${f.name}#mxs"))
    }
    val one = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*)
    val stackArgs = fields.map(f =>
      s"'${f.name}', `${f.name}#nn`, `${f.name}#nd`, `${f.name}#mnn`, " +
        s"`${f.name}#mxn`, `${f.name}#mns`, `${f.name}#mxs`").mkString(", ")
    one.selectExpr(
      s"stack(${fields.length}, $stackArgs) AS " +
        "(column, n_nonnull, n_distinct, min_num, max_num, min_str, max_str)")
  }
}
