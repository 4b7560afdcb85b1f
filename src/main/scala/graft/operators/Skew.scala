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

  /** Salted equi-join for a skewed FACT key: each fact row gets a salt
    * from `saltSource` (any roughly-uniform per-row column — an id,
    * not the join key), the dim side replicates `saltBuckets` ways,
    * and the join runs on (key, salt) — a hot key's rows now land on
    * `saltBuckets` reducers instead of one. Result row set is
    * IDENTICAL to the plain join (every fact row meets exactly one
    * dim replica); the cost is dim·saltBuckets, the standard trade
    * when the dim is small-ish but past broadcast size. AQE's skew
    * handling covers sort-merge cases adaptively; this is the
    * explicit, plan-stable form (and works under any join strategy).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltSource: Column, saltBuckets: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(saltSource.cast("long"), lit(saltBuckets.toLong)).cast("int"))
    val dimExp = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedFact.join(dimExp, Seq(key, "__salt")).drop("__salt")
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
    * deterministic): G = 2·Σ(i·cᵢ)/(n·Σcᵢ) − (n+1)/n, with the rank
    * sum in DECIMAL so the result is partition-order-independent.
    *
    * Scale shape — deliberately free of single-partition windows,
    * because this operator's own use case is a SKEWED,
    * HIGH-CARDINALITY key (billions of distinct user ids):
    *
    *   - Σ(i·cᵢ) never materializes per-key ranks. Keys sharing a
    *     count value c occupy a contiguous rank block, and the block's
    *     rank sum is closed-form: Σi = m·S + m(m+1)/2 (m = block
    *     size, S = #keys with smaller count) — independent of the
    *     within-block key order. So the ordered pass runs over the
    *     DISTINCT-COUNT frame (≪ keys for any skewed distribution),
    *     and its exclusive cumsum S comes from
    *     [[OrderedStats.cumsumExclusive]] (log-scale buckets — count
    *     frames are power-law), never a global window.
    *   - top-k = `orderBy(cnt desc).limit(k)` — per-partition
    *     TakeOrdered, merged once; ranks over the ≤k survivors come
    *     from a triangular broadcast join, not row_number.
    *
    * The per-key count partial-aggregates map-side; everything after
    * runs on the key-count frame, never the corpus. */
  def keyProfile(df: DataFrame, keyCol: String, topK: Int): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt"))

    // Tie-group rank sum over distinct count values: 2·Σ(i·cᵢ) =
    // Σ_c c·(2·m·S + m·(m+1)), exact in DECIMAL. Working with the
    // doubled sum keeps every intermediate an integer (no /2), and
    // double(2x) = 2·double(x) exactly, so the final statistic is
    // bit-identical to the per-rank formulation.
    val byCnt = counts.groupBy(col("cnt")).agg(count(lit(1)).as("m"))
    val withBelow = OrderedStats.cumsumExclusive(
      byCnt, sortCol = "cnt", tieCols = Nil,
      valueCol = "m", outCol = "keys_below", logScale = true)
    val cD = col("cnt").cast("decimal(38,0)")
    val mD = col("m").cast("decimal(38,0)")
    val sD = col("keys_below").cast("decimal(38,0)")
    val summary = withBelow.agg(
        sum(col("m")).as("n_keys"),
        sum(cD * mD).cast("long").as("n_rows"),
        max(col("cnt")).as("max_cnt"),
        sum(cD * (mD * sD * lit(2) + mD * (mD + lit(1))))
          .cast("double").as("__ic2"))
      .select(col("n_keys"), col("n_rows"),
        round(col("max_cnt").cast("double") /
              (col("n_rows").cast("double") / col("n_keys").cast("double")), 4)
          .as("max_to_mean"),
        round(col("__ic2") /
              (col("n_keys").cast("double") * col("n_rows").cast("double")) -
              (col("n_keys").cast("double") + 1.0) /
              col("n_keys").cast("double"), 6).as("gini"))

    // Heavy keys: TakeOrdered (orderBy+limit), then ranks over the
    // ≤topK survivors via a triangular broadcast join — window-free.
    val top = counts.orderBy(col("cnt").desc, col("key").asc).limit(topK)
    val other = top.select(col("key").as("__k2"), col("cnt").as("__c2"))
    top
      .join(broadcast(other),
            col("__c2") > col("cnt") ||
              (col("__c2") === col("cnt") && col("__k2") < col("key")),
            "left")
      .groupBy(col("key"), col("cnt"))
      .agg((count(col("__k2")) + lit(1)).cast("int").as("rank"))
      .crossJoin(broadcast(summary))
      .select(col("rank"), col("key"), col("cnt").as("n_rows_key"),
              round(col("cnt").cast("double") / col("n_rows").cast("double"), 6)
                .as("key_frac"),
              col("n_keys"), col("n_rows"), col("max_to_mean"), col("gini"))
  }
  /** Hill tail-index estimator over a count/frequency frame — the
    * quantitative form of "how Zipfian is this key?": for the top k
    * order statistics f₁ ≥ … ≥ f_k above the threshold f_{k+1},
    * α̂ = k / Σ ln(f_i / f_{k+1}); a token/key distribution with
    * α ≈ 1 is classic Zipf, larger α means a thinner tail (salting
    * and cap budgets key off exactly this).
    *
    * Scale shape: the ONLY ordered work is TakeOrdered(k+1) on the
    * count frame (deterministic tie-break on `tieCol`); the k
    * retained rows are a bounded local frame, each ln-term quantized
    * to 9 decimals and summed in exact decimal so the estimate is
    * engine-portable. Returns 1 row: (k, f_threshold, alpha). */
  def hillTailIndex(counts: DataFrame, valueCol: String, tieCol: String,
                    k: Int): DataFrame = {
    require(k >= 2 && k <= 100000,
      s"Skew.hillTailIndex: k must be in [2, 100000], got $k")
    val top = counts
      .select(col(valueCol).cast("long").as("f"), col(tieCol).as("t"))
      .orderBy(col("f").desc, col("t").asc)
      .limit(k + 1)
    val thr = top.agg(min(col("f")).as("__thr"))
    top.crossJoin(broadcast(thr))
      .filter(col("f") > col("__thr"))
      .agg(count(lit(1)).as("k"), first(col("__thr")).as("f_threshold"),
        round(count(lit(1)).cast("double") /
          sum(round(log(col("f").cast("double") /
                        col("__thr").cast("double")), 9)
            .cast(org.apache.spark.sql.types.DecimalType(38, 9)))
            .cast("double"), 6).as("alpha"))
  }

}
