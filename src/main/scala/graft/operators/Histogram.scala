package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Equi-width histogram — the distribution companion to
  * [[Profiler]]: fixed `[lo, hi]` domain split into `nBuckets` equal
  * buckets, per bucket the row count and exact value sum. Values
  * outside the domain are REPORTED (bucket −1 below, `nBuckets`
  * above), never silently dropped — at audit scale a silent filter
  * reads as "covered everything" when it didn't; `x = hi` lands in
  * the last regular bucket (the standard closed-right-edge rule).
  *
  * Scale: bucket assignment is a narrow floor-arithmetic projection
  * (codegen'd, no UDF); the aggregation partial-combines map-side to
  * ≤ nBuckets+2 rows per partition. ONE exchange carrying bucket
  * partials. Sums route through DECIMAL(30,6) so they are
  * order-independent and engine-portable.
  */
object Histogram {

  def histogram(df: DataFrame, valueCol: String,
                lo: Double, hi: Double, nBuckets: Int): DataFrame = {
    require(nBuckets > 0 && hi > lo, "need hi > lo and nBuckets > 0")
    val width = (hi - lo) / nBuckets
    val x = col(valueCol).cast("double")
    val bucket = when(x < lo, lit(-1))
      .when(x > hi, lit(nBuckets))
      .otherwise(least(floor((x - lit(lo)) / lit(width)).cast("int"),
                       lit(nBuckets - 1)))
    // NaN is excluded with null: it satisfies neither range predicate,
    // and ANSI mode would throw casting floor(NaN) to int — a poisoned
    // row must not kill the audit job
    df.filter(x.isNotNull && !isnan(x))
      .select(bucket.as("bucket"), x.as("__x"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
           sum(col("__x").cast("decimal(30,6)")).cast("double").as("sum_x"))
      .select(col("bucket"),
              round(lit(lo) + col("bucket").cast("double") * lit(width), 6)
                .as("bucket_lo"),
              round(lit(lo) + (col("bucket").cast("double") + 1d) * lit(width), 6)
                .as("bucket_hi"),
              col("n"), col("sum_x"))
  }

  /** Equi-depth (equi-height) histogram — the optimizer-statistics
    * form every cost-based planner keeps per column: `nBuckets`
    * buckets of (near-)equal ROW count, so selectivity estimates stay
    * accurate under skew where equi-width buckets collapse. Per
    * bucket: row count, value envelope [lo, hi], and distinct-value
    * count (the NDV the planner divides by).
    *
    * Bucket rule: global 0-based rank under the total order
    * (`valueCol` asc, `tieCols` asc) → bucket = rank·nBuckets DIV n —
    * pure integer arithmetic, no doubles, so any engine replaying the
    * same total order lands on identical buckets (sizes differ by at
    * most 1).
    *
    * Scale shape: the global rank is [[OrderedStats.cumsumExclusive]]
    * with weight 1 — coarse value buckets, per-bucket offsets via the
    * tiny triangular join, partitioned within-bucket windows — NO
    * single-partition window anywhere; then one map-side-combined
    * aggregation to nBuckets rows. n arrives by 1-row broadcast. */
  def equiDepth(df: DataFrame, valueCol: String, tieCols: Seq[String],
                nBuckets: Int): DataFrame = {
    require(nBuckets > 0, "need nBuckets > 0")
    val ranked = OrderedStats.cumsumExclusive(
      df.filter(col(valueCol).isNotNull)
        .withColumn("__one", lit(1L)),
      sortCol = valueCol, tieCols = tieCols,
      valueCol = "__one", outCol = "__rank0")
    val n = ranked.agg(count(lit(1)).as("__n"))
    ranked.crossJoin(broadcast(n))
      .select(expr(s"(__rank0 * $nBuckets) DIV __n").as("bucket"),
              col(valueCol).as("__x"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
           min(col("__x")).as("lo"),
           max(col("__x")).as("hi"),
           countDistinct(col("__x")).as("n_distinct"))
  }
}
