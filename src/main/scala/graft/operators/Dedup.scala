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
    * newest `version` wins (ties broken by extra `order` columns). */
  def merge(existing: DataFrame, updates: DataFrame, keys: Seq[String],
            order: Seq[Column]): DataFrame =
    keepLatest(existing.unionByName(updates, allowMissingColumns = true), keys, order)

  /** Aggregation-shaped merge: same semantics as [[merge]] when `ord`
    * is a total order, but as `max_by(struct(*), ord)` — the winner
    * per key is folded with a partial aggregate, so the shuffle
    * carries one pre-combined row per (partition, key) instead of
    * every input row. (Spark plans the struct-buffer max_by as a
    * SortAggregate, so a per-partition sort is still paid — the win
    * over the window form is the map-side combine before the exchange
    * and skipping the post-shuffle row_number projection; measured
    * ~2.5x on the q34 shape.) Preferred at scale for upserts, where
    * groups are tiny (typically 2 rows) and numerous.
    *
    * `ord` must be a struct whose lexicographic MAXIMUM identifies the
    * winning row (encode "ascending" fields by negation); include
    * enough fields to make it total or the kept row is
    * nondeterministic under ties. */
  def mergeAgg(existing: DataFrame, updates: DataFrame, keys: Seq[String],
               ord: Column): DataFrame = {
    val u = existing.unionByName(updates, allowMissingColumns = true)
    val all = struct(u.columns.map(col).toIndexedSeq: _*)
    u.groupBy(keys.map(col): _*)
      .agg(max_by(all, ord).as("__row"))
      .select(col("__row.*"))
  }

  /** ZERO-shuffle merge for the common upsert shape — a small fresh
    * batch into a large table, where the batch wins every key it
    * touches (K2's newest-wins contract: the fresh collection IS the
    * newest version). Rows of `existing` whose key appears in
    * `updates` are dropped with a BROADCAST left-anti join, then the
    * updates union on: the large side streams scan → anti → union with
    * no exchange, no window, no aggregation. This is the merge to use
    * at 100 TB when the batch is one collection cycle; [[mergeAgg]] /
    * [[merge]] remain the general row-level newest-wins forms for
    * comparable-size or out-of-order inputs.
    *
    * `updates` must already be key-deduped (one row per key) — which
    * also means no distinct() here, so not even the broadcast side
    * shuffles. */
  def mergeSmallUpdates(existing: DataFrame, updates: DataFrame,
                        keys: Seq[String]): DataFrame =
    existing
      .join(broadcast(updates.select(keys.map(col): _*)), keys, "left_anti")
      .unionByName(updates, allowMissingColumns = true)
}
