package graft.sources

import org.apache.spark.sql.DataFrame

/** S8 + K4: the reference's box-score stub (box_score_cllector.py:12-38)
  * — fetch one frame per year, concat, CSV sink. The fetch is a
  * driver-side shim; the operators are the per-year name-aligned union
  * (O2) and the CSV writer. */
object BoxScores {

  /** Per-year frames → one table; pandas-concat alignment semantics
    * (columns matched by name, missing null-filled). */
  def perYearUnion(frames: Seq[DataFrame]): DataFrame =
    frames.reduce(_.unionByName(_, allowMissingColumns = true))

  /** K4: CSV sink (header, no index column — to_csv(index=False)). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)
}
