package graft

import graft.operators.WideStats
import graft.sources.TeamRankingsNormalizer
import graft.sources.TeamRankingsNormalizer.TableSpec

/** End-to-end §3.3 pipeline on fixture frames (FIXTURES.md §3 shapes). */
class TeamRankingsNormalizerSpec extends SparkSpec {
  import spark.implicits._

  test("ranking-table normalization: F1+F3+F4+F6+F5 chain") {
    val raw = Seq(
      ("Kansas City (10-2)", 9.5, "2-1"),
      ("Buffalo (9-3-1)", 8.0, "1-2")
    ).toDF("Team", "Rating", "v 1-5")
    val spec = TableSpec("rankings", "predictive", "u", Seq("Team", "Rating", "v 1-5"), Seq("v 1-5"))
    val out = TeamRankingsNormalizer.normalizeTable(raw, spec)
    assert(out.columns.toSet === Set("team", "rankings_predictive_rating",
      "rankings_predictive_v1-5_wins", "rankings_predictive_v1-5_losses",
      "rankings_predictive_v1-5_ties", "rankings_predictive_v1-5_games_played"))
    val kc = out.filter($"team" === "Kansas City").collect().head
    assert(kc.getAs[Int]("rankings_predictive_v1-5_wins") === 2)
    assert(kc.getAs[Int]("rankings_predictive_v1-5_games_played") === 3)
  }

  test("stat-table normalization: year columns → this_yr/last_yr (F7)") {
    val raw = Seq(("Kansas City", "28.5", "30.1", "27.0", "26.0"))
      .toDF("Team", "2025", "Last 3", "Home", "2024")
    val spec = TableSpec("offense", "scoring", "u",
      Seq("Team", "2025", "Last 3", "Home", "2024"), Nil)
    val out = TeamRankingsNormalizer.normalizeTable(raw, spec)
    assert(out.columns.toSet === Set("team", "offense_scoring_this_yr",
      "offense_scoring_last3", "offense_scoring_home", "offense_scoring_last_yr"))
  }

  test("full wide assembly + final pass: percent/scrub/empty handling") {
    val rating = Seq(("KC", "75.5%"), ("BUF", "--")).toDF("team", "value")
    val ppg = Seq(("KC", "+28.5"), ("BUF", "")).toDF("team", "value")
    // stack+pivot (strings pass through first(value))
    val wide = rating.withColumnRenamed("value", "a")
      .join(ppg.withColumnRenamed("value", "b"), Seq("team"), "left")
    val out = TeamRankingsNormalizer.finalPass(wide).orderBy("team").collect()
    // BUF: "--" scrubbed → "" → null; "" → null
    assert(out(0).isNullAt(1) && out(0).isNullAt(2))
    // KC: percent → 0.755 (stringified by the pass, re-typed by F11 later)
    assert(out(1).getString(1) === "0.755")
    assert(out(1).getString(2) === "28.5")
  }
}
