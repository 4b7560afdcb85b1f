package graft

import org.apache.spark.sql.functions._

import graft.features.TrainingFrame

/** The reference's declared training frame (config.py:6-101): all 94
  * SPREAD_MODEL_TRAINING_COLUMNS assembled from a fixture stats
  * history via smoothStats (ewm 0.88/16 + lag delta) → matchup join →
  * differentials → travel_delta.
  */
class TrainingFrameSpec extends SparkSpec {
  import spark.implicits._

  private val base = TrainingFrame.baseStats

  // v(team, stat, age): age 1 = newest observation.
  private def v(team: String, stat: String, age: Int): Double =
    (math.abs(stat.hashCode) % 50) / 10.0 +
      (if (team == "KC") 1.0 else 0.0) + age

  private lazy val history = {
    val rows = for {
      team <- Seq("KC", "BUF"); stat <- base; age <- 1 to 3
    } yield (team, stat, v(team, stat, age), 4 - age)
    rows.toDF("team", "stat", "value", "ts")
  }

  test("declared column list parses to a sane base-stat set") {
    assert(TrainingFrame.spreadModelTrainingColumns.size === 94)
    assert(base.nonEmpty && base.forall(s => !s.startsWith("home_") && !s.startsWith("road_")))
    assert(!base.exists(_.contains("matchup_differential")))
    assert(!base.contains("travel_delta"))
  }

  test("all 94 declared training columns assemble from a smoothed history") {
    val smoothed = TrainingFrame.smoothStats(
      history, "team", "stat", "value", Seq(col("ts").desc), base)
    val games = Seq(("g1", "KC", "BUF")).toDF("game_id", "home", "road")
    val venues = Seq(("KC", 0.0, 0.0), ("BUF", 0.0, 3.0)).toDF("team", "lat", "lon")
    val assembled = TrainingFrame.assemble(
      games, "home", "road", smoothed, "team",
      base ++ base.map(_ + "_delta"), venues, "team", "lat", "lon")
    val training = TrainingFrame.selectTraining(assembled, Seq("game_id"))

    assert(training.columns.toSeq ===
      "game_id" +: TrainingFrame.spreadModelTrainingColumns)

    val r = training.collect().head
    // ewm over ages 1..3 with weights 1, .88, .7744
    val stat = base.head
    val wsum = 1.0 + 0.88 + 0.7744
    val expEwm = (v("KC", stat, 1) + 0.88 * v("KC", stat, 2) +
      0.7744 * v("KC", stat, 3)) / wsum
    val homeCol = s"home_$stat"
    if (training.columns.contains(homeCol))
      assert(math.abs(r.getAs[Double](homeCol) - expEwm) < 1e-9)
    // every matchup differential of a plain stat is exactly home - road = 1.0
    val diffCols = TrainingFrame.spreadModelTrainingColumns
      .filter(c => c.endsWith("_matchup_differential") && !c.contains("_delta"))
    for (c <- diffCols)
      assert(math.abs(r.getAs[Double](c) - 1.0) < 1e-9, s"differential $c")
    // lag delta = v(age1) - v(age2) = -1.0 for every team/stat
    val deltaCols = TrainingFrame.spreadModelTrainingColumns
      .filter(c => c.endsWith("_delta") && c != "travel_delta" &&
        (c.startsWith("home_") || c.startsWith("road_")))
    for (c <- deltaCols)
      assert(math.abs(r.getAs[Double](c) + 1.0) < 1e-9, s"delta $c")
    // BUF is 3 degrees of longitude from KC on the equator: ~333.6 km
    assert(math.abs(r.getAs[Double]("travel_delta") - 333.6) < 1.0)
  }
}
