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

  /** Point-in-time lookup against an SCD2 table built by [[scd2]]:
    * the version whose `[valid_from, valid_to)` interval contains
    * `at` (open intervals extend to +inf). Plain predicate — composes
    * with any join strategy the caller picks. */
  def asOf(scd2Table: DataFrame, at: Column): DataFrame =
    scd2Table.filter(
      col("valid_from") <= at &&
        (col("valid_to").isNull || col("valid_to") > at))
}
