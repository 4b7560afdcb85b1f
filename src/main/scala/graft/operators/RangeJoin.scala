package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join without an equi key, made shuffle-joinable by
  * bucketing — Spark plans a bare `p BETWEEN lo AND hi` join as a
  * BroadcastNestedLoopJoin (O(|points|·|intervals|) comparisons, and a
  * driver OOM once the interval side outgrows the broadcast limit).
  * Discretizing the value domain into fixed-width buckets turns it
  * into an equi-join: an interval is replicated to every bucket it
  * overlaps (`explode(sequence(...))` — replication factor
  * len/width + 1), a point hashes to exactly one bucket, and the
  * bucket equi-join plus the residual BETWEEN filter yields each
  * qualifying pair exactly once (no dedup needed: a point lives in
  * ONE bucket, an interval appears at most once per bucket).
  *
  * Scale notes (100 TB): the bucket join is a plain shuffle
  * hash/sort-merge join — AQE handles skewed buckets (a hot value
  * range) like any other skewed key, and the residual filter runs
  * inside the join's codegen stage. Pick `bucketWidth` near the median
  * interval length: width >> len wastes the filter (many false bucket
  * mates), width << len inflates the interval side by len/width
  * copies. Both inputs stay columnar end-to-end; nothing is collected
  * to the driver.
  */
object RangeJoin {

  /** Join `points` to every interval of `intervals` whose
    * [lo, hi] (inclusive) contains the point value. Column names of
    * the two frames must be disjoint; the helper bucket columns are
    * dropped from the result. Degenerate rows are safe: an inverted
    * interval (lo > hi) replicates to a descending bucket sequence but
    * matches nothing (the residual filter rejects every point), and a
    * null bound or point never equi-joins. */
  def pointInInterval(points: DataFrame, pointCol: Column,
                      intervals: DataFrame, loCol: Column, hiCol: Column,
                      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val ivb = intervals.withColumn("__iv_bucket",
      explode(sequence(
        floor(loCol.cast("double") / bucketWidth).cast("long"),
        floor(hiCol.cast("double") / bucketWidth).cast("long"))))
    val ptb = points.withColumn("__pt_bucket",
      floor(pointCol.cast("double") / bucketWidth).cast("long"))
    ptb.join(ivb,
        col("__pt_bucket") === col("__iv_bucket") &&
          pointCol >= loCol && pointCol <= hiCol)
      .drop("__pt_bucket", "__iv_bucket")
  }
}
