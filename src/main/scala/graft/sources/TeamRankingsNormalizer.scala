package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Cleaning

/** S2/S3 + the per-table normalization pipeline (SURVEY §3.3 step 1b,
  * reference `_postprocess_df`, team_rankings_scraper.py:172-195).
  *
  * The HTML fetch itself is a driver-side shim (tests inject fixture
  * frames); everything after the fetch is the real operator chain:
  *   F1 strip "(W-L-T)" from Team → F3 split record columns → F4
  *   lowercase → F6 despace → F7 year renames → F5 category_table_
  *   prefix.
  * The final cross-table pass (F8 scrub → F9 percent → ''→null) runs
  * once over the assembled wide frame (team_rankings_scraper.py:236-239).
  */
object TeamRankingsNormalizer {

  /** One row of the scrape registry (the reference's 221-row xlsx,
    * team_rankings_scraper.py:15-16) — category/table name the column
    * prefix; recordCols name "W-L[-T]" columns to split. */
  case class TableSpec(category: String, tableName: String, baseUrl: String,
                       colsToKeep: Seq[String], recordCols: Seq[String])

  /** A small representative registry slice (shape of xlsx rows 1-16 +
    * 17-221) for tests and demos. */
  val sampleRegistry: Seq[TableSpec] = Seq(
    TableSpec("rankings", "predictive", "https://example/rankings/predictive",
      Seq("Team", "Rating", "v 1-5"), Seq("v 1-5")),
    TableSpec("offense", "scoring", "https://example/stats/points-per-game",
      Seq("Team", "2025", "Last 3", "Home", "2024"), Nil))

  /** Normalize one scraped table per its spec. */
  def normalizeTable(raw: DataFrame, spec: TableSpec): DataFrame = {
    // F1: team name carries a "(W-L-T)" suffix on ranking tables
    val named =
      if (raw.columns.contains("Team"))
        raw.withColumn("Team", Cleaning.stripRecordSuffix(col("Team")))
      else raw
    // F3: split each declared record column into 4 int columns
    val split = spec.recordCols.foldLeft(named)((df, c) => Cleaning.recordSplit(df, c))
    // F4 → F6 → F7 → F5 (schema transforms, in reference order)
    Cleaning.prefixCols(
      Cleaning.renameYearCols(
        Cleaning.despaceCols(
          Cleaning.lowercaseCols(split))),
      s"${spec.category}_${spec.tableName}_", except = Set("team"))
  }

  /** The final wide-frame pass (F8 scrub, F9 percent, P6 empty→null)
    * over every string column. */
  def finalPass(wide: DataFrame): DataFrame =
    Cleaning.mapStringCols(wide, c =>
      Cleaning.emptyToNull(
        Cleaning.percentParse(Cleaning.scrubSymbols(c))))
}
