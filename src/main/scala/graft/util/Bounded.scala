package graft.util

import org.apache.spark.sql.{DataFrame, Row}

/** Loud driver-side bound for sufficient-stat collects — the
  * [[graft.sources.ExcelStatsDb]] maxRows precedent made reusable.
  *
  * Operators that iterate a recurrence on the driver (Bradley–Terry,
  * histogram GMM-EM, Kaplan–Meier, …) are correct ONLY because the
  * frame they collect is bounded by construction (k² pairs, nBins
  * bins, a 31-day risk set). Fed an unbounded frame at 100 TB they
  * would OOM the driver SILENTLY. This helper makes the contract a
  * loud, testable failure: `limit(maxRows + 1)` bounds the transfer
  * itself (at most maxRows+1 rows ever reach the driver, whatever the
  * true cardinality), then a `require` names the operator and the
  * violated bound. When the frame fits, `limit` is a no-op and the
  * collected rows are exactly the frame. */
object Bounded {

  def collect(df: DataFrame, maxRows: Int, what: String): Array[Row] = {
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"$what: driver-side sufficient-stat frame exceeds its bound of " +
        s"$maxRows rows — refusing to collect a corpus-scale frame onto " +
        "the driver; raise the bound only if the frame is provably small")
    rows
  }
}
