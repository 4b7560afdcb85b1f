package graft

import org.apache.spark.sql.functions._

import graft.functions.Cleaning

class CleaningSpec extends SparkSpec {
  import spark.implicits._

  test("recordSplit: W-L and W-L-T, non-matching → zeros (F3)") {
    val df = Seq("5-3", "2-1-1", "garbage").toDF("rec")
    val out = Cleaning.recordSplit(df, "rec")
      .select("rec_wins", "rec_losses", "rec_ties", "rec_games_played")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(out.toSeq === Seq((5, 3, 0, 8), (2, 1, 1, 4), (0, 0, 0, 0)))
    assert(!Cleaning.recordSplit(df, "rec").columns.contains("rec"))
  }

  test("percentParse: percent → fraction string, others untouched (F9)") {
    val out = Seq("75.5%", "100%", "0.5", "junk").toDF("v")
      .select(Cleaning.percentParse($"v").as("p")).collect()
      .map(r => Option(r.get(0)))
    assert(out.toSeq === Seq(Some("0.755"), Some("1.0"), Some("0.5"), Some("junk")))
  }

  test("percentToDouble: numeric coercion variant") {
    val out = Seq("75.5%", "100%", "0.5", "junk").toDF("v")
      .select(Cleaning.percentToDouble($"v").as("p")).collect()
      .map(r => Option(r.get(0)))
    assert(out.toSeq === Seq(Some(0.755), Some(1.0), Some(0.5), None))
  }

  test("scrubSymbols + emptyToNull (F8/P6)") {
    val out = Seq("--", "+3.5", "10").toDF("v")
      .select(Cleaning.emptyToNull(Cleaning.scrubSymbols($"v")).as("s"))
      .collect().map(r => Option(r.getString(0)))
    assert(out.toSeq === Seq(None, Some("3.5"), Some("10")))
  }

  test("stripRecordSuffix (F1)") {
    val out = Seq("Kansas City (10-2)", "Buffalo").toDF("t")
      .select(Cleaning.stripRecordSuffix($"t")).as[String].collect()
    assert(out.toSeq === Seq("Kansas City", "Buffalo"))
  }

  test("schema renames: lower, despace, prefix, year cols (F4-F7)") {
    val df = Seq((1, 2, 3, 4)).toDF("Rank", "My Stat", "2025", "2024")
    val lowered = Cleaning.lowercaseCols(df)
    assert(lowered.columns.toSeq === Seq("rank", "my stat", "2025", "2024"))
    val despaced = Cleaning.despaceCols(lowered)
    assert(despaced.columns.contains("mystat"))
    val yeared = Cleaning.renameYearCols(despaced)
    assert(yeared.columns.toSeq === Seq("rank", "mystat", "this_yr", "last_yr"))
    val prefixed = Cleaning.prefixCols(yeared, "offense_scoring_", Set("rank"))
    assert(prefixed.columns.toSeq ===
      Seq("rank", "offense_scoring_mystat", "offense_scoring_this_yr",
          "offense_scoring_last_yr"))
  }

  test("nullOutMarkers (F11 tail)") {
    val out = Seq("None", "nan", "<NA>", "NaN", "ok").toDF("v")
      .select(Cleaning.nullOutMarkers($"v")).collect().map(r => Option(r.getString(0)))
    assert(out.toSeq === Seq(None, None, None, None, Some("ok")))
  }
}
