package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.features.TrainingFrame

/** Feature-assembly queries: the reference's spread-model training
  * frame composition (config.py:6-101) exercised end-to-end on the
  * synthetic testdata — events as the per-team stats history, nations
  * as the 25 teams, key-derived venue coordinates (same scheme as
  * q19). The full 96-column NFL frame is covered by TrainingFrameSpec
  * on fixture data; this query hash-checks the same composition
  * (ewm(0.88, 16) → lag delta → pivot → matchup join → differentials →
  * travel_delta) against a DuckDB oracle.
  */
object FeatureQueries {

  private val statNames =
    Seq("stat_click", "stat_error", "stat_purchase", "stat_signup", "stat_view")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q50_training_frame" -> ((s, d) => {
      val history = events(s, d).select(
        (col("user_id") % 25).as("team"),
        concat(lit("stat_"), col("event_type")).as("stat"),
        col("value"), col("ts"), col("event_id"))
      val smoothed = TrainingFrame.smoothStats(
        history, "team", "stat", "value",
        Seq(col("ts").desc, col("event_id").desc), statNames)
      // matchupFeatures emits its own home_team/road_team key columns
      // from the stats side, so the game-side keys use bare names.
      val games = nation(s, d).select(
        col("n_nationkey").as("home"),
        ((col("n_nationkey") + 7) % 25).as("road"))
      val venues = nation(s, d).select(
        col("n_nationkey").as("team"),
        (col("n_nationkey") * 7 % 180 - 90).cast("double").as("lat"),
        (col("n_nationkey") * 13 % 360 - 180).cast("double").as("lon"))
      val assembled = TrainingFrame.assemble(
        games, "home", "road",
        smoothed, "team", statNames ++ statNames.map(_ + "_delta"),
        venues, "team", "lat", "lon")
      assembled.select(
        col("home").as("home_team"), col("road").as("road_team"),
        round(col("home_stat_click"), 4).as("home_stat_click"),
        round(col("road_stat_click"), 4).as("road_stat_click"),
        round(col("stat_click_matchup_differential"), 4)
          .as("stat_click_matchup_differential"),
        round(col("home_stat_view_delta"), 4).as("home_stat_view_delta"),
        round(col("stat_view_delta_matchup_differential"), 4)
          .as("stat_view_delta_matchup_differential"),
        round(col("travel_delta"), 3).as("travel_delta"))
    }))

  def oracles: Map[String, String] = Map(

    "q50_training_frame" ->
      """WITH r AS (
        |  SELECT user_id % 25 AS team, 'stat_' || event_type AS stat, value,
        |    row_number() OVER (PARTITION BY user_id % 25, 'stat_' || event_type
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events),
        |sm AS (
        |  SELECT team, stat,
        |    SUM(POWER(0.88, rn-1) * value) / SUM(POWER(0.88, rn-1)) AS v,
        |    SUM(CASE WHEN rn = 1 THEN value END)
        |      - SUM(CASE WHEN rn = 2 THEN value END) AS delta
        |  FROM r WHERE rn <= 16 GROUP BY team, stat),
        |w AS (
        |  SELECT team,
        |    MAX(CASE WHEN stat = 'stat_click' THEN v END) AS click_v,
        |    MAX(CASE WHEN stat = 'stat_view' THEN delta END) AS view_delta
        |  FROM sm GROUP BY team),
        |g AS (
        |  SELECT n_nationkey AS home_team, (n_nationkey + 7) % 25 AS road_team,
        |    CAST(n_nationkey*7%180-90 AS DOUBLE) AS hlat,
        |    CAST(n_nationkey*13%360-180 AS DOUBLE) AS hlon,
        |    CAST((n_nationkey+7)%25*7%180-90 AS DOUBLE) AS rlat,
        |    CAST((n_nationkey+7)%25*13%360-180 AS DOUBLE) AS rlon
        |  FROM nation)
        |SELECT g.home_team, g.road_team,
        |  ROUND(hw.click_v, 4) AS home_stat_click,
        |  ROUND(rw.click_v, 4) AS road_stat_click,
        |  ROUND(hw.click_v - rw.click_v, 4) AS stat_click_matchup_differential,
        |  ROUND(hw.view_delta, 4) AS home_stat_view_delta,
        |  ROUND(hw.view_delta - rw.view_delta, 4)
        |    AS stat_view_delta_matchup_differential,
        |  ROUND(12742.0176 * asin(sqrt(
        |    power(sin(radians(g.hlat - g.rlat)/2), 2)
        |    + cos(radians(g.rlat)) * cos(radians(g.hlat))
        |      * power(sin(radians(g.hlon - g.rlon)/2), 2))), 3) AS travel_delta
        |FROM g
        |JOIN w hw ON g.home_team = hw.team
        |JOIN w rw ON g.road_team = rw.team""".stripMargin)
}
