package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dedup / upsert-merge operators.
  *
  * Re-expresses the reference's two merge semantics (SURVEY §2.4):
  *  - A1 `distinctUnion`: full-row dedup on union — the odds upsert
  *    (reference `odds_data_collector.py:31-45`): history-preserving,
  *    idempotent under re-runs.
  *  - A2 `keepLatest`: keyed dedup, newest-wins — the team-rankings
  *    upsert (reference `team_rankings_data_collector.py:34-46`).
  *    Deliberately a `row_number` window, NOT `dropDuplicates(subset)`:
  *    Spark's dropDuplicates keeps an *arbitrary* row per key, which is
  *    not "keep latest". The window shuffles once on the key columns and
  *    is deterministic given a total tiebreak ordering.
  *  - W2 `asOfLatest`: newest row per key with ordering column <= cutoff
  *    (the "stats as of date D" read, reference `README.md:63-67`).
  *
  * Scale notes (100 TB): all three are single-shuffle on the dedup keys.
  * With heavily skewed keys, salt the key or enable AQE skew handling;
  * for the upsert use-case the shuffle is bounded by the merged
  * partition, not the full table, when combined with
  * PartitionedParquetStore's dynamic partition overwrite.
  */
object Dedup {

  /** A1: union by name (pandas-concat alignment semantics) + full-row
    * distinct. `allowMissingColumns` matches pandas' null-fill of
    * missing columns. */
  def distinctUnion(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b, allowMissingColumns = true).distinct()

  /** A2: keep exactly one row per `keys`, the first under `order`
    * (pass e.g. Seq($"ts".desc, $"id".desc) for newest-wins with a
    * deterministic tiebreak). */
  def keepLatest(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** W2: as-of selection — newest row per key among rows with
    * `ordering <= cutoff`. */
  def asOfLatest(df: DataFrame, keys: Seq[String], ordering: Column,
                 cutoff: Column, tiebreak: Seq[Column] = Nil): DataFrame =
    keepLatest(df.filter(ordering <= cutoff), keys, ordering.desc +: tiebreak)

  /** K2-shaped merge: upsert `updates` into `existing` keyed by `keys`,
    * newest `version` wins (ties broken by extra `order` columns).
    *
    * Deliberately the row_number-window form: ONE exchange on the keys,
    * then a streaming per-group pick. An aggregation-shaped variant
    * (`max_by(struct(*), ord)`) was built in round 2 and removed in
    * round 3: Spark plans any aggregate whose buffer carries a struct
    * as SortAggregate — HashAggregate requires mutable fixed-width
    * buffer fields, and the full-row payload struct rides in max_by's
    * buffer no matter how the ordering key is packed — so it paid
    * per-partition sorts plus per-row struct copies on both sides of
    * the exchange and lost to this window form under the forked bench
    * (BENCH_r02 q34: 32.5 s aggregation vs ~2 s window on the same
    * shape). For the small-fresh-batch upsert every collection cycle
    * actually has, use [[mergeSmallUpdates]] — zero shuffle of the
    * stored side. */
  def merge(existing: DataFrame, updates: DataFrame, keys: Seq[String],
            order: Seq[Column]): DataFrame =
    keepLatest(existing.unionByName(updates, allowMissingColumns = true), keys, order)

  /** ZERO-shuffle merge for the common upsert shape — a small fresh
    * batch into a large table, where the batch wins every key it
    * touches (K2's newest-wins contract: the fresh collection IS the
    * newest version). Rows of `existing` whose key appears in
    * `updates` are dropped with a BROADCAST left-anti join, then the
    * updates union on: the large side streams scan → anti → union with
    * no exchange, no window, no aggregation. This is the merge to use
    * at 100 TB when the batch is one collection cycle; [[merge]]
    * remains the general row-level newest-wins form for
    * comparable-size or out-of-order inputs.
    *
    * `updates` must already be key-deduped (one row per key) — which
    * also means no distinct() here, so not even the broadcast side
    * shuffles.
    *
    * The anti-join uses null-safe equality (`<=>`): a null key column
    * must match a null key column, the same grouping the window forms
    * use (partitionBy groups nulls; pandas NaN-equality parity). Plain
    * equality would never match rows with a null in any key column, so
    * re-collections would silently accumulate duplicates for them —
    * the rankings upsert keys on ALL stat columns and the pivoted wide
    * frame is nullable, so this is a real shape, not a corner case. */
  def mergeSmallUpdates(existing: DataFrame, updates: DataFrame,
                        keys: Seq[String]): DataFrame = {
    val batchKeys = updates.select(keys.map(k => col(k).as(s"__u_$k")): _*)
    val cond = keys.map(k => col(k) <=> col(s"__u_$k")).reduce(_ && _)
    existing
      .join(broadcast(batchKeys), cond, "left_anti")
      .unionByName(updates, allowMissingColumns = true)
  }
}
