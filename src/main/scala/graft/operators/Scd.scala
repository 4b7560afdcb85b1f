package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension build: collapse a change log into
  * versioned validity intervals.
  *
  * The reference materializes each collection as a full snapshot and
  * re-reads "latest" (keep-latest semantics, `upsert_db.py` — A2/W1);
  * a warehouse consuming those snapshots needs the history form too:
  * one row per (key, state-run) with `[valid_from, valid_to)` bounds,
  * a version number, and an `is_current` flag. That build is pure
  * window algebra — no self-join, no collect:
  *
  *  1. order rows within each key by (`seqCol`, tiebreaks);
  *  2. change-detect: keep a row iff any state column differs from the
  *     previous row's (null-safe `<=>`, so null→value and value→null
  *     both count as changes); the first row always survives;
  *  3. over the surviving change rows, `valid_to = lead(valid_from)`
  *     and `version = row_number`.
  *
  * Scale: ONE exchange on `keys` and ONE sort serve all three steps —
  * both windows use the same (partition, order), and the intermediate
  * filter preserves partitioning and order, so Catalyst plans a single
  * Exchange+Sort followed by two Window operators back-to-back. At
  * 100 TB the cost is the unavoidable key shuffle of any
  * history-building operator; nothing is quadratic in versions and no
  * row leaves its key partition.
  */
object Scd {

  /** Build the SCD2 interval table.
    *
    * @param keys      dimension key columns (partition)
    * @param seqCol    event-sequence column (becomes valid_from)
    * @param tiebreaks extra ordering columns making the log order total
    * @param stateCols tracked attribute columns; a change in ANY opens
    *                  a new version
    * @return keys ++ stateCols ++ (version, valid_from, valid_to,
    *         is_current); valid_to is null on the open (current) row
    */
  def scd2(df: DataFrame, keys: Seq[String], seqCol: Column,
           tiebreaks: Seq[Column], stateCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(seqCol.asc +: tiebreaks.map(_.asc): _*)
    val changed = stateCols
      .map(c => !(col(c) <=> lag(col(c), 1).over(w)))
      .reduce(_ || _)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__chg", col("__rn") === 1 || changed)
      .filter(col("__chg"))
      .withColumn("version", row_number().over(w))
      .withColumn("valid_from", seqCol)
      .withColumn("valid_to", lead(seqCol, 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keys ++ stateCols).map(col) ++
        Seq(col("version"), col("valid_from"), col("valid_to"),
            col("is_current")): _*)
  }

  /** Incremental SCD2 maintenance: fold a batch of NEW change events
    * into an existing SCD2 table without rebuilding untouched keys.
    * Rows for keys absent from the batch pass through via anti-join;
    * touched keys rebuild from (their existing change points ∪ the
    * batch) — the existing table already IS the collapsed change log
    * (one row per state run, ordered by version), so replaying
    * [[scd2]] over that union reproduces exactly what a full rebuild
    * over the complete original log would emit: late-version closes,
    * run-collapsing across the boundary (a batch event repeating the
    * open state adds no version), and first-version opens for
    * brand-new keys all fall out of the same window algebra.
    *
    * CONTRACT: batch events must be strictly later than every history
    * event of the same key (the append-only warehouse feed). Under it
    * the incremental result is hash-identical to a full rebuild — the
    * oracle for the q108 gate query IS the full-rebuild SQL.
    *
    * Scale shape: the batch's key set drives everything — untouched
    * history streams through one anti-join (broadcast when the batch
    * is small), and the rebuild windows run over change points of
    * touched keys only (versions + batch rows), never the full
    * history. */
  def merge(scd2Table: DataFrame, batch: DataFrame, keys: Seq[String],
            seqCol: Column, batchTiebreak: Column,
            stateCols: Seq[String]): DataFrame = {
    val touched = batch.select(keys.map(col): _*).distinct()
    val untouched = scd2Table.join(touched, keys, "left_anti")
    // existing change points as a log: seq = valid_from, tiebreak =
    // version (preserves original intra-date change order); batch
    // rows use their own tiebreak (no cross-group ties by contract)
    val histLog = scd2Table.join(touched, keys, "left_semi")
      .select((keys ++ stateCols).map(col) ++
        Seq(col("valid_from").as("__seq"),
            col("version").cast("long").as("__tb")): _*)
    val batchLog = batch
      .select((keys ++ stateCols).map(col) ++
        Seq(seqCol.as("__seq"), batchTiebreak.cast("long").as("__tb")): _*)
    val rebuilt = scd2(histLog.unionByName(batchLog), keys, col("__seq"),
                       Seq(col("__tb")), stateCols)
    untouched.unionByName(rebuilt)
  }

  /** Point-in-time lookup against an SCD2 table built by [[scd2]]:
    * the version whose `[valid_from, valid_to)` interval contains
    * `at` (open intervals extend to +inf). Plain predicate — composes
    * with any join strategy the caller picks. */
  def asOf(scd2Table: DataFrame, at: Column): DataFrame =
    scd2Table.filter(
      col("valid_from") <= at &&
        (col("valid_to").isNull || col("valid_to") > at))
}
