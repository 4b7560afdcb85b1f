package graft.features

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Geo
import graft.operators.WideStats

/** The reference's actual downstream product: the spread-model training
  * frame (reference `src/config.py:6-101` declares the column list;
  * `config.py:3-5` declares the aggregation — exp_weighted_mean, decay
  * 0.88 over the last GAME_SAMPLE=16 observations).
  *
  * The reference repo declares these columns but assembles them in a
  * separate (non-public) training repo, so the composition semantics
  * here are this engine's documented contract:
  *
  *  - `home_X` / `road_X`: stat X for that side's team, exp-weighted
  *    mean (decay 0.88) over its 16 newest observations.
  *  - `X_delta` (before the home_/road_ prefix): in the reference's
  *    registry these are their own scraped tables (e.g.
  *    `offense_scoring/points_per_game_delta` = the scoring-margin
  *    page), so a wide table built from the registry carries them
  *    natively. For histories that lack them, [[smoothStats]] derives
  *    a momentum stand-in: newest raw observation minus the previous
  *    one (lag-1 delta).
  *  - `X_matchup_differential`: home-side value minus road-side value
  *    of X (including delta stats: `X_delta_matchup_differential`).
  *  - `travel_delta`: road team's great-circle km to the game venue
  *    minus the home team's (zero when the game is at the home venue).
  *
  * Scale shape: one shuffle on (team, stat) for the smoothing, one
  * pivot shuffle to go wide (stat universe is static — the registry —
  * so pivot skips its distinct-collect job), then two broadcast joins
  * onto the games (per-date stats are 32 rows; at 100 TB the games
  * fact streams through unshuffled).
  */
object TrainingFrame {

  /** SPREAD_MODEL_TRAINING_COLUMNS, verbatim (config.py:6-101). */
  val spreadModelTrainingColumns: Seq[String] = Seq(
    "road_defense_passing_ypa",
    "road_defense_passing_ypc",
    "road_defense_passing_pass_rtg",
    "road_defense_passing_sacks",
    "road_defense_rushing_attempts",
    "road_defense_rushing_ypg",
    "road_defense_scoring_yards_per_point",
    "road_defense_scoring_rz_attempts",
    "road_def_turnovers_takeaways",
    "road_def_turnovers_int_pcnt",
    "road_defense_total_yards_per_play",
    "road_defense_total_3rd_downs",
    "road_defense_total_4th_downs",
    "home_off_turnovers_fumbles",
    "home_off_turnovers_int_pcnt",
    "off_turnovers_fumbles_matchup_differential",
    "off_turnovers_int_pcnt_matchup_differential",
    "home_offense_passing_completion_pcnt",
    "home_offense_passing_ypa",
    "home_offense_passing_ypc",
    "home_offense_passing_sack_pcnt",
    "home_offense_passing_pass_rtg",
    "home_offense_scoring_points_per_game",
    "home_offense_scoring_points_per_game_delta",
    "home_offense_scoring_yards_per_point",
    "home_offense_scoring_yards_per_point_delta",
    "home_offense_scoring_points_per_play",
    "offense_scoring_points_per_game_delta_matchup_differential",
    "offense_scoring_yards_per_point_delta_matchup_differential",
    "home_offense_total_yards",
    "home_offense_total_plays",
    "home_offense_total_yards_per_play",
    "home_offense_total_1st_downs",
    "home_offense_total_1st_downs_per_play",
    "home_offense_total_punts_per_play",
    "home_offense_total_punts_per_score",
    "home_penalties_opponent_penalty_yards",
    "home_penalties_opponent_penalty_1st_downs",
    "home_penalties_opponent_yards_per_penalty",
    "home_penalties_penalties",
    "penalties_penalties_matchup_differential",
    "home_rankings_home_rating",
    "road_rankings_home_rating",
    "rankings_home_rating_matchup_differential",
    "home_rankings_luck_rating",
    "road_rankings_luck_rating",
    "rankings_luck_rating_matchup_differential",
    "home_rankings_road_rating",
    "road_rankings_road_rating",
    "home_rankings_predictive_rating",
    "road_rankings_predictive_rating",
    "rankings_predictive_rating_matchup_differential",
    "home_defense_passing_ypa",
    "home_defense_passing_ypc",
    "home_defense_passing_pass_rtg",
    "home_defense_passing_sacks",
    "home_defense_rushing_attempts",
    "home_defense_rushing_ypg",
    "home_defense_scoring_yards_per_point",
    "home_defense_scoring_rz_attempts",
    "home_def_turnovers_takeaways",
    "home_def_turnovers_int_pcnt",
    "home_defense_total_yards_per_play",
    "home_defense_total_3rd_downs",
    "home_defense_total_4th_downs",
    "road_off_turnovers_fumbles",
    "road_off_turnovers_int_pcnt",
    "def_turnovers_fumbles_matchup_differential",
    "def_turnovers_int_pcnt_matchup_differential",
    "road_offense_passing_attempts",
    "road_offense_passing_incompletions",
    "road_offense_passing_completion_pcnt",
    "road_offense_passing_ypa",
    "road_offense_passing_ypc",
    "road_offense_passing_sack_pcnt",
    "road_offense_passing_pass_rtg",
    "road_offense_scoring_points_per_game",
    "road_offense_scoring_points_per_game_delta",
    "road_offense_scoring_yards_per_point",
    "road_offense_scoring_yards_per_point_delta",
    "road_offense_scoring_points_per_play",
    "road_offense_total_yards",
    "road_offense_total_plays",
    "road_offense_total_yards_per_play",
    "road_offense_total_1st_downs",
    "road_offense_total_1st_downs_per_play",
    "road_offense_total_punts_per_play",
    "road_offense_total_punts_per_score",
    "defense_total_1st_downs_matchup_differential",
    "road_penalties_opponent_penalty_yards",
    "road_penalties_opponent_penalty_1st_downs",
    "road_penalties_opponent_yards_per_penalty",
    "road_penalties_penalties",
    "travel_delta")

  /** The base per-team stats implied by the declared list: strip
    * home_/road_ prefixes and the _matchup_differential suffix. A name
    * ending in `_delta` is derived from the base stat without the
    * suffix, so both the plain stat and its delta trace to one base. */
  val baseStats: Seq[String] = spreadModelTrainingColumns
    .filterNot(_ == "travel_delta")
    .map(_.stripSuffix("_matchup_differential"))
    .map(c => c.stripPrefix("home_").stripPrefix("road_"))
    .map(_.stripSuffix("_delta"))
    .distinct

  /** Smooth a long stats history into one wide row per team.
    *
    * Input: (`teamCol`, `statCol`, `valueCol`) plus ordering columns
    * (newest first under `order`). Output: one row per team with, for
    * each stat X in `stats`, column `X` = exp-weighted mean (decay,
    * over the n newest observations) and `X_delta` = newest raw value
    * minus previous raw value.
    *
    * One shuffle on (team, stat); the ewm and the delta fold in the
    * same aggregate pass. The pivot is the second (and last) shuffle,
    * against the STATIC stat list — no distinct-collect job. */
  def smoothStats(history: DataFrame, teamCol: String, statCol: String,
                  valueCol: String, order: Seq[Column], stats: Seq[String],
                  decay: Double = 0.88, n: Int = 16): DataFrame = {
    val w  = Window.partitionBy(col(teamCol), col(statCol)).orderBy(order: _*)
    val smoothed = history
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .withColumn("__w", pow(lit(decay), col("__rn") - 1))
      .groupBy(col(teamCol), col(statCol))
      .agg((sum(col("__w") * col(valueCol)) / sum(col("__w"))).as("v"),
           (sum(when(col("__rn") === 1, col(valueCol))) -
            sum(when(col("__rn") === 2, col(valueCol)))).as("delta"))
    val wide = smoothed.groupBy(col(teamCol))
      .pivot(statCol, stats)
      .agg(first(col("v")).as("v"), first(col("delta")).as("delta"))
    // pivot with multiple aggregates names columns "<stat>_v"; strip
    // the marker so the plain stat keeps its own name.
    stats.foldLeft(wide)((df, s) => df.withColumnRenamed(s"${s}_v", s))
  }

  /** Join per-team wide stats onto both sides of `games` (home_/road_
    * prefixes + `*_matchup_differential`), then add `travel_delta` from
    * a (team, lat, lon) venue table: road-team km to the game venue
    * minus home-team km, where the game venue is the home team's. */
  def assemble(games: DataFrame, homeCol: String, roadCol: String,
               teamStats: DataFrame, teamCol: String, statCols: Seq[String],
               venues: DataFrame, venueTeamCol: String,
               latCol: String, lonCol: String): DataFrame = {
    val matchup = WideStats.matchupFeatures(
      games, teamStats, teamCol, homeCol, roadCol, statCols)
    val v = broadcast(venues.select(
      col(venueTeamCol).as("__vteam"), col(latCol).as("__vlat"),
      col(lonCol).as("__vlon")))
    matchup
      .join(v.select(col("__vteam").as("__ht"), col("__vlat").as("home_lat"),
                     col("__vlon").as("home_lon")), col(homeCol) === col("__ht"))
      .join(v.select(col("__vteam").as("__rt"), col("__vlat").as("road_lat"),
                     col("__vlon").as("road_lon")), col(roadCol) === col("__rt"))
      // game venue = home venue, so the home side travels 0 km and the
      // delta reduces to the road team's great-circle distance.
      .withColumn("travel_delta",
        Geo.haversineKm(col("road_lat"), col("road_lon"),
                        col("home_lat"), col("home_lon")))
      .drop("__ht", "__rt", "home_lat", "home_lon", "road_lat", "road_lon")
  }

  /** Project the assembled frame down to the declared training columns
    * that are computable from the provided stat universe, keeping
    * `keep` (id/team columns) in front. */
  def selectTraining(assembled: DataFrame, keep: Seq[String]): DataFrame = {
    val available = assembled.columns.toSet
    val cols = keep ++ spreadModelTrainingColumns.filter(available.contains)
    assembled.select(cols.map(col): _*)
  }
}
