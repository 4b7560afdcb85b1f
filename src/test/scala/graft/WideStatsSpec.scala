package graft

import graft.operators.WideStats

class WideStatsSpec extends SparkSpec {
  import spark.implicits._

  test("stack + single pivot reproduces the chained-join wide table (J1)") {
    val rating = Seq(("KC", 9.5), ("BUF", 8.0)).toDF("team", "value")
    val ppg = Seq(("KC", 28.0), ("BUF", 26.5)).toDF("team", "value")
    val wide = WideStats.wideTable(
      Seq("rankings_predictive_rating" -> rating, "offense_ppg" -> ppg),
      "team", "value")
    assert(wide.columns.toSeq === Seq("team", "rankings_predictive_rating", "offense_ppg"))
    val kc = wide.filter($"team" === "KC").collect().head
    assert(kc.getDouble(1) === 9.5 && kc.getDouble(2) === 28.0)
  }

  test("missing rows in a later table yield nulls (left-join parity)") {
    val a = Seq(("KC", 1.0), ("BUF", 2.0)).toDF("team", "value")
    val b = Seq(("KC", 3.0)).toDF("team", "value") // BUF missing
    val wide = WideStats.wideTable(Seq("a" -> a, "b" -> b), "team", "value")
    assert(wide.filter($"team" === "BUF").collect().head.isNullAt(2))
  }

  test("matchup features: home/road join + differentials (J3)") {
    val games = Seq(("g1", "KC", "BUF")).toDF("game_id", "home", "road")
    val stats = Seq(("KC", 28.0, 9.5), ("BUF", 26.5, 8.0))
      .toDF("team", "ppg", "rating")
    val out = WideStats.matchupFeatures(games, stats, "team", "home", "road",
      Seq("ppg", "rating")).collect().head
    assert(out.getAs[Double]("home_ppg") === 28.0)
    assert(out.getAs[Double]("road_ppg") === 26.5)
    assert(math.abs(out.getAs[Double]("ppg_matchup_differential") - 1.5) < 1e-12)
    assert(math.abs(out.getAs[Double]("rating_matchup_differential") - 1.5) < 1e-12)
  }
}
