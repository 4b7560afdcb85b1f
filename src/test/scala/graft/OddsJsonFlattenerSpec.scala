package graft

import org.apache.spark.sql.functions._

import graft.queries.ScalarQueries
import graft.sources.OddsJsonFlattener

/** Golden contract for the odds flatten (reference
  * test_odds_collector.py:131-182: exact column set; :46-109: market
  * and outcome coverage). */
class OddsJsonFlattenerSpec extends SparkSpec {
  import spark.implicits._

  private lazy val flat =
    OddsJsonFlattener.flatten(Seq(ScalarQueries.oddsFixtureJson).toDF("json"))

  test("exact column set (the schema contract)") {
    assert(flat.columns.toSet === Set("game_id", "game_time", "home_team",
      "away_team", "book", "market", "outcome", "price", "point"))
  }

  test("all three markets, one row per outcome") {
    val rows = flat.collect()
    assert(rows.length === 6)
    val markets = rows.map(_.getAs[String]("market")).toSet
    assert(markets === Set("h2h", "spreads", "totals"))
    val totals = rows.filter(_.getAs[String]("market") == "totals")
      .map(_.getAs[String]("outcome")).toSet
    assert(totals === Set("Over", "Under"))
  }

  test("missing point null-fills to 0.0 (get_odds.py:61)") {
    val h2h = flat.filter($"market" === "h2h").collect()
    assert(h2h.forall(_.getAs[Double]("point") == 0.0))
  }

  test("5-key mixed-direction sort (get_odds.py:62-66)") {
    val spreads = flat.filter($"market" === "spreads")
      .collect().map(r => (r.getAs[String]("outcome"), r.getAs[Double]("point")))
    // outcome asc: Chiefs (-7.5) before Raiders (7.5)
    assert(spreads.head._1 === "Kansas City Chiefs")
  }

  test("typed Dataset surface: flattenTyped round-trips the fixed schema") {
    val ds = OddsJsonFlattener.flattenTyped(
      Seq(ScalarQueries.oddsFixtureJson).toDF("json"))
    val rows = ds.collect()
    assert(rows.length === 6)
    assert(rows.forall(_.game_id == "test_game_1"))
    assert(rows.filter(_.market == "spreads").map(_.point).sorted.toSeq
      === Seq(-7.5, 7.5))
  }

  test("market-coverage check flags missing markets (A4)") {
    assert(OddsJsonFlattener.missingMarkets(flat) === Set.empty)
    assert(OddsJsonFlattener.missingMarkets(flat.filter($"market" =!= "h2h"))
      === Set("h2h"))
  }
}
