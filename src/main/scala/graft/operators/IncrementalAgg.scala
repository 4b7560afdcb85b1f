package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Incremental aggregate maintenance: per-key MERGEABLE aggregate
  * states instead of recomputed aggregates.
  *
  * The reference recomputes its rollups from the full monthly file on
  * every collection (read-modify-write, `odds_data_collector.py:31-51`)
  * — fine at Lambda scale, a full-history rescan at 100 TB. The scale
  * answer is the classic partial-aggregation contract Spark itself
  * uses inside a shuffle, lifted to STORAGE: keep `(count, exact sum)`
  * state per key, aggregate only the incoming batch, and merge states
  * key-wise. Count/sum states are associative and commutative, so
  * batches can arrive in any order, be re-merged idempotently from a
  * partial failure (merge the batch once — the operator is
  * deterministic), and the merge cost is bounded by the number of
  * GROUPS, never the history row count.
  *
  * Sums are carried as DECIMAL(30,6) (see [[graft.util.Exact]]):
  * decimal addition is exact and order-independent, which is what
  * makes `merge(stateA, stateB)` bit-equal to a from-scratch
  * aggregation — the invariant q72's oracle checks end-to-end.
  * Derived measures (avg) are computed from the merged state at read
  * time, never stored — states must stay mergeable.
  */
object IncrementalAgg {

  private def sumCol(c: String) = s"sum_$c"

  /** The mergeable state of `rows` per `keys`: `n_rows` plus one
    * exact decimal sum per entry of `sumCols`. One partial-agg
    * shuffle over the batch — at 100 TB the batch is a collection
    * increment, not history. */
  def state(rows: DataFrame, keys: Seq[String], sumCols: Seq[String]): DataFrame =
    rows.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
           sumCols.map(c =>
             sum(col(c).cast(DecimalType(30, 6))).as(sumCol(c))): _*)

  /** Key-wise merge of any number of state frames (same schema):
    * union + re-sum. States are tiny relative to their inputs, so
    * the one shuffle here is bounded by group cardinality; keys
    * present in only some states merge correctly because a missing
    * state row simply contributes nothing. */
  def merge(states: Seq[DataFrame], keys: Seq[String],
            sumCols: Seq[String]): DataFrame =
    states.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n_rows")).as("n_rows"),
           sumCols.map(c => sum(col(sumCol(c))).as(sumCol(c))): _*)

  /** Read-time view of a state: sums surfaced as doubles plus a
    * derived mean per summed column — the aggregate a consumer would
    * have gotten from a monolithic groupBy over all history. */
  def readout(state: DataFrame, keys: Seq[String],
              sumCols: Seq[String]): DataFrame = {
    val derived: Seq[Column] = sumCols.flatMap { c =>
      Seq(col(sumCol(c)).cast(DoubleType).as(sumCol(c)),
          round(col(sumCol(c)).cast(DoubleType) / col("n_rows"), 4)
            .as(s"avg_$c"))
    }
    state.select(keys.map(col) ++ (col("n_rows") +: derived): _*)
  }
}
