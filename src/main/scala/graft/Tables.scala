package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated synthetic tables at
  * "/root/testdata/sfN/name.parquet" — see TESTDATA.md / FIXTURES.md §5.
  * One parquet per table; Catalyst handles column pruning + predicate
  * pushdown on these scans, so callers just `.select`/`.filter`.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** OPT-IN scale-adaptive spread of a small input before a CPU-heavy
    * per-row pipeline (opt guide §2.5 "input skew … otherwise
    * repartition immediately after the read" / §6.1).
    *
    * An input whose estimated bytes fit inside one scan split
    * (`spark.sql.files.maxPartitionBytes`) cannot parallelize past its
    * row-group count no matter how splits are tuned — and single-file
    * parquet tables often ship as ONE row group, so a downstream
    * per-row pipeline (micro-unit quantization, tokenize, ×64 label
    * explodes, moment products) runs on one core of N: measured at
    * sf0.1/local[32], scan-fused stages showed task_max ≈ 2–17 s vs
    * task_med ≈ 20 ms. Spreading costs one bounded round-robin
    * exchange (≤ one split of bytes) and unlocks full parallelism;
    * the width follows the session's own defaultParallelism — no
    * constant tuned for local or cluster.
    *
    * Deliberately NOT applied in the loader: a blanket spread adds an
    * exchange to every scan of every query, and on shuffle-latency-
    * bound environments the tail pays more than the head saves
    * (measured r15: suite 208 s → 304 s with a loader-level spread,
    * −21 s on CPU-bound queries vs +117 s of added exchanges). Callers
    * opt in exactly where the per-row work dominates. At scale the
    * branch is self-disabling: anything estimated above one split
    * keeps its native partitioning and never pays the exchange.
    * `spark.graft.scanSpread=false` opts out globally (plan-shape
    * specs that pin exact exchange counts use it). */
  def spreadSmall(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    if (df.isStreaming) return df // streaming twins: no mid-plan stats
    if (!spark.conf.get("spark.graft.scanSpread", "true").toBoolean) return df
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est <= BigInt(spark.sessionState.conf.filesMaxPartitionBytes))
      df.repartition(spark.sparkContext.defaultParallelism)
    else df
  }

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** events.ts has shipped as parquet TIMESTAMP(NANOS) in some testdata
    * generations and TIMESTAMP(MICROS) in others, so the loader adapts
    * to whichever this dataset carries:
    *  - NANOS: Spark refuses to read it natively; read as long (legacy
    *    conf) and truncate ns → µs — exactly what DuckDB's TIMESTAMP
    *    (µs) view of the same file does, keeping the oracle comparable.
    *  - MICROS (isAdjustedToUTC=false): arrives as TIMESTAMP_NTZ; cast
    *    to TIMESTAMP (sessions run UTC, so the µs value is unchanged)
    *    so downstream ops see the same type either way. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", expr("timestamp_micros(CAST(ts DIV 1000 AS LONG))"))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
