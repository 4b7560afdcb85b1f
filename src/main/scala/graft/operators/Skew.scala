package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys at scale.
  *
  * `saltedAgg`: two-phase aggregation — rows are spread over
  * `saltBuckets` sub-keys (deterministic hash of the whole row via
  * monotonic partition-local salt is NOT used: a random-looking but
  * deterministic spread from spark_partition_id keeps the op
  * reproducible), partially aggregated per (key, salt), then finally
  * combined per key. For sum/count/min/max-shaped aggregates this is
  * semantics-preserving and turns one hot-key reducer into
  * `saltBuckets` parallel reducers.
  *
  * Spark's AQE skew-join handling covers the join case at runtime;
  * this operator covers aggregation skew, which AQE does not split.
  */
object Skew {

  /** Salted sum/count aggregation: semantically identical to
    * `df.groupBy(keys).agg(sum/count)`, but resistant to hot keys.
    * `sums` maps output name → column to sum; count output is `cnt`. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], sums: Map[String, Column],
                     saltBuckets: Int = 32): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id(), lit(saltBuckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__cnt"),
           sums.toSeq.map { case (n, c) => sum(c).as(s"__s_$n") }: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__cnt")).as("cnt"),
           sums.keys.toSeq.map(n => sum(col(s"__s_$n")).as(n)): _*)
  }
}
