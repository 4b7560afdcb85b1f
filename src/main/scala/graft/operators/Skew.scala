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

  /** Key-skew diagnostics — the profile a pipeline checks BEFORE a
    * big join/agg decides between plain hash partitioning, salting
    * ([[saltedSumCount]]), and AQE skew splitting: the `topK`
    * heaviest keys with their row shares, plus the global skew
    * summary (distinct keys, max/mean ratio, Gini coefficient of the
    * key-count distribution — 0 = uniform, → 1 = one key owns
    * everything).
    *
    * Gini via the exact rank formula over counts sorted ascending
    * (ties broken by key, so the rank — and the statistic — is
    * deterministic): G = 2·Σ(i·cᵢ)/(n·Σcᵢ) − (n+1)/n, with Σ(i·cᵢ)
    * in DECIMAL so the result is partition-order-independent.
    *
    * Scale shape: the per-key count partial-aggregates map-side to a
    * key-cardinality frame; everything after (the global rank window,
    * the top-k TakeOrdered, the 1-row summary crossJoin) runs on that
    * frame, never the corpus. The rank window is a single total order
    * over KEY COUNTS — vocabulary-sized by construction; a key space
    * too large to sort in one partition is exactly the case where
    * the approx sketch (q36 contract) replaces the exact profile. */
  def keyProfile(df: DataFrame, keyCol: String, topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt"))
    val ranked = counts.withColumn("__i",
      row_number().over(Window.orderBy(col("cnt").asc, col("key").asc)))
    val summary = ranked.agg(
        count(lit(1)).as("n_keys"),
        sum(col("cnt")).as("n_rows"),
        max(col("cnt")).as("max_cnt"),
        sum((col("__i").cast("decimal(38,0)") * col("cnt")))
          .cast("double").as("__ic"))
      .select(col("n_keys"), col("n_rows"),
        round(col("max_cnt").cast("double") /
              (col("n_rows").cast("double") / col("n_keys").cast("double")), 4)
          .as("max_to_mean"),
        round(lit(2.0) * col("__ic") /
              (col("n_keys").cast("double") * col("n_rows").cast("double")) -
              (col("n_keys").cast("double") + 1.0) /
              col("n_keys").cast("double"), 6).as("gini"))
    counts
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col("key").asc)))
      .filter(col("rank") <= topK)
      .crossJoin(broadcast(summary))
      .select(col("rank"), col("key"), col("cnt").as("n_rows_key"),
              round(col("cnt").cast("double") / col("n_rows").cast("double"), 6)
                .as("key_frac"),
              col("n_keys"), col("n_rows"), col("max_to_mean"), col("gini"))
  }
}
