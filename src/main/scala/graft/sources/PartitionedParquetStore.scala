package graft.sources

import org.apache.spark.sql.{AnalysisException, Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** The reference's "storage engine" (SURVEY §1.4, §2.4, §2.8):
  * Hive-partitioned Parquet (`year=YYYY/month=MM`) with two upsert
  * flavors — history-preserving distinct (odds, K2+A1) and keyed
  * keep-latest (team-rankings, K2+A2).
  *
  * Spark-first mapping:
  *  - partitions derived from the timestamp column at write
  *    (`partitionBy("year","month")`) → readers get automatic partition
  *    pruning for time-range queries (the reference computes month keys
  *    by hand, README.md:120-140);
  *  - upsert = read ONLY the partitions the fresh batch touches
  *    (pruned scan), union+dedup, write with
  *    partitionOverwriteMode=dynamic so untouched months never rewrite
  *    — the reference's read-modify-write of one monthly S3 object,
  *    generalized (odds_data_collector.py:31-51);
  *  - missing table/partition ⇒ empty frame (s3_client.py:141-145's
  *    None ⇒ start-fresh semantics).
  *
  * At 100 TB the per-upsert cost stays bounded by the touched months,
  * not the table; the dedup shuffle is also partition-bounded. A
  * log-structured MERGE (Delta-style) would avoid the rewrite entirely,
  * but dynamic overwrite reproduces reference semantics exactly.
  */
class PartitionedParquetStore(spark: SparkSession, root: String) {

  private def withPartitionCols(df: DataFrame, tsCol: String): DataFrame =
    df.withColumn("year", year(col(tsCol)))
      .withColumn("month", month(col(tsCol)))

  /** Read the table (empty frame with no schema match if absent).
    * Returns None when the table doesn't exist yet. */
  def readOpt(): Option[DataFrame] =
    try {
      val df = spark.read.parquet(root)
      Some(df)
    } catch {
      case e: AnalysisException if e.getMessage.contains("PATH_NOT_FOUND") ||
                                   e.getMessage.contains("UNABLE_TO_INFER_SCHEMA") ||
                                   e.getMessage.contains("Path does not exist") => None
    }

  /** S5/P3/P4: projected, partition-pruned read. `months` filters on the
    * partition columns (pruned at planning — no data touched outside);
    * `columns` projects (pruned at the parquet scan). */
  def read(months: Seq[(Int, Int)] = Nil, columns: Seq[String] = Nil): DataFrame = {
    val base = readOpt().getOrElse(
      throw new IllegalStateException(s"no table at $root"))
    val pruned =
      if (months.isEmpty) base
      else base.filter(
        months.map { case (y, m) => col("year") === y && col("month") === m }
          .reduce(_ || _))
    if (columns.isEmpty) pruned else pruned.select(columns.map(col): _*)
  }

  /** Reference layout contract: ONE file per month partition
    * (odds_data_collector.py:28 — a single S3 object per month).
    * `repartition(year, month)` routes each month to exactly one task,
    * so each partition directory gets one file; a month is bounded by
    * the collection cadence, so this holds at scale (unlike a global
    * coalesce(1)). */
  private def writeDynamic(df: DataFrame): Unit =
    df.repartition(col("year"), col("month"))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("year", "month")
      .parquet(root)

  /** Existing rows in exactly the partitions `fresh` touches — a pruned
    * scan driven by the fresh batch's distinct (year,month) set. The
    * collect is tiny (months, not rows) and buys planning-time pruning. */
  private def existingTouched(fresh: DataFrame): Option[DataFrame] =
    readOpt().map { existing =>
      val touched = fresh.select(col("year"), col("month")).distinct()
        .collect().map(r => (r.getInt(0), r.getInt(1)))
      existing.filter(
        touched.map { case (y, m) => col("year") === y && col("month") === m }
          .reduceOption(_ || _).getOrElse(lit(false)))
    }

  /** K2+A1: history-preserving upsert — full-row distinct on the merged
    * partitions. Idempotent: re-running the same batch is a no-op. */
  def upsertDistinct(freshRaw: DataFrame, tsCol: String): Unit = {
    val fresh = withPartitionCols(freshRaw, tsCol)
    val merged = existingTouched(fresh) match {
      case Some(existing) => Dedup.distinctUnion(existing, fresh)
      case None           => fresh.distinct()
    }
    writeDynamic(merged)
  }

  /** K2+A2: keyed keep-latest upsert — newest `tsCol` wins per `keys`
    * (all non-timestamp columns in the reference,
    * team_rankings_data_collector.py:42-45). */
  def upsertKeepLatest(freshRaw: DataFrame, keys: Seq[String], tsCol: String,
                       tiebreak: Seq[Column] = Nil): Unit = {
    val fresh = withPartitionCols(freshRaw, tsCol)
    val unioned = existingTouched(fresh) match {
      case Some(existing) => existing.unionByName(fresh, allowMissingColumns = true)
      case None           => fresh
    }
    writeDynamic(
      Dedup.keepLatest(unioned, keys, col(tsCol).desc +: tiebreak))
  }

  /** K2+A2 fast path for the live-collection contract: the fresh batch
    * carries the NEWEST timestamp for every key it touches (true for
    * every scheduled collection run — `tsCol` is stamped at collection
    * time), so keep-latest degenerates to "batch wins its keys". The
    * batch is key-deduped with a window over the batch alone (tiny),
    * then merged with a broadcast anti-join: the existing table's plan
    * is scan → anti → union — ZERO shuffle of stored data, vs
    * [[upsertKeepLatest]]'s window over the whole touched partition.
    * Result is identical to upsertKeepLatest whenever the
    * newest-batch precondition holds. */
  def upsertNewestBatch(freshRaw: DataFrame, keys: Seq[String], tsCol: String,
                        tiebreak: Seq[Column] = Nil): Unit = {
    val fresh = Dedup.keepLatest(
      withPartitionCols(freshRaw, tsCol), keys, col(tsCol).desc +: tiebreak)
    val merged = existingTouched(fresh) match {
      case Some(existing) => Dedup.mergeSmallUpdates(existing, fresh, keys)
      case None           => fresh
    }
    writeDynamic(merged)
  }
}
