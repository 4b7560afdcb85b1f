package graft.sources

import org.apache.spark.sql.{AnalysisException, Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Generic keyed MERGE over BUCKETED state — SURVEY §7.4's scale path
  * for K2 beyond time-partitioned tables: when the upsert key is not
  * time-correlated (team ids, document keys, user ids), month-pruned
  * dynamic overwrite stops helping and a naive keep-latest merge
  * rewrites (and shuffles) the WHOLE state table per batch. Here state
  * lives Hive-partitioned by `bucket = pmod(hash(keys), nBuckets)`, so
  * one merge:
  *
  *   1. buckets the batch and collects its touched bucket ids (≤
  *      nBuckets driver ints — the PartitionedParquetStore months
  *      pattern);
  *   2. reads ONLY those bucket directories (planning-time partition
  *      pruning — untouched state is never even scanned);
  *   3. resolves newest-wins per key over (touched buckets ∪ batch) —
  *      the general [[Dedup.merge]] window, NO newest-batch
  *      precondition, so a stale or out-of-order batch row correctly
  *      loses to a newer stored row;
  *   4. dynamically overwrites only the touched bucket partitions.
  *
  * Per-merge cost is bounded by (touched buckets × bucket size), not
  * the table: at 100 TB state with a batch touching 0.1% of keys,
  * ~0.1–few % of buckets rewrite (nBuckets sizes the granularity).
  * Same row-level semantics as [[Dedup.merge]] over the full table —
  * the q241 oracle proves merge-chain ≡ full rebuild, and replaying a
  * batch is a no-op (newest-wins is idempotent; the q241 chain replays
  * one batch and still hash-matches).
  *
  * Reference scope: generalizes the reference's monthly read-merge-
  * write loop (odds_data_collector.py:31-51) from time keys to
  * arbitrary keys; no direct reference counterpart.
  */
class BucketedStateStore(spark: SparkSession, root: String,
                         keys: Seq[String], nBuckets: Int) {
  require(keys.nonEmpty, "BucketedStateStore: at least one key column")
  require(nBuckets >= 1 && nBuckets <= 65536,
    s"BucketedStateStore: nBuckets in [1, 65536], got $nBuckets")

  private def withBucket(df: DataFrame): DataFrame =
    df.withColumn("bucket", pmod(hash(keys.map(col): _*), lit(nBuckets)))

  /** None when the state table doesn't exist yet (first merge). */
  def readOpt(): Option[DataFrame] =
    try Some(spark.read.parquet(root))
    catch {
      case e: AnalysisException if e.getMessage.contains("PATH_NOT_FOUND") ||
        e.getMessage.contains("UNABLE_TO_INFER_SCHEMA") ||
        e.getMessage.contains("Path does not exist") => None
    }

  /** Full state, `bucket` partition column included. */
  def read(): DataFrame = readOpt().getOrElse(
    throw new IllegalStateException(s"no state table at $root"))

  /** Fold one batch in: newest row per `keys` wins under `order`
    * (e.g. Seq($"ts".desc, $"id".desc)); only touched buckets are
    * read and rewritten. */
  def merge(batchRaw: DataFrame, order: Seq[Column]): Unit = {
    // localCheckpoint: the batch is consumed three times (touched-set
    // collect, merge union, write) — and the touched-bucket collect
    // must see the SAME rows the merge does.
    val batch = withBucket(batchRaw).localCheckpoint()
    val touched = batch.select(col("bucket")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    val merged = readOpt() match {
      case Some(existing) =>
        Dedup.merge(existing.filter(col("bucket").isin(touched: _*)),
                    batch, keys, order)
      case None => Dedup.keepLatest(batch, keys, order)
    }
    merged.repartition(col("bucket"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket")
      .parquet(root)
  }
}
