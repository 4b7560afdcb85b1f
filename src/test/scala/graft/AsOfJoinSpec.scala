package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("backward as-of: newest right row at-or-before each left row per key") {
    val games = Seq( // (team, game_time, game_id)
      ("KC", 10, "g1"), ("KC", 20, "g2"), ("KC", 5, "g0"),
      ("BUF", 10, "g3")
    ).toDF("team", "gt", "game_id")
    val stats = Seq( // (team, collected_at, rating)
      ("KC", 8, 7.0), ("KC", 10, 8.0), ("KC", 15, 9.0)
      // BUF: no stats at all
    ).toDF("team", "st", "rating")

    val out = AsOfJoin.asOfBackward(games, stats, Seq("team"), "gt", "st",
        Seq("rating"))
      .orderBy("game_id").collect()
      .map(r => (r.getAs[String]("game_id"), Option(r.getAs[Any]("rating"))))
    assert(out.toSeq === Seq(
      ("g0", None),           // before any stats
      ("g1", Some(8.0)),      // inclusive: stat at t=10 visible at gt=10
      ("g2", Some(9.0)),      // newest <= 20 is t=15
      ("g3", None)))          // key with no right rows
  }

  test("one shuffle: plan has a single exchange on the key") {
    val l = Seq((1L, 10, "x")).toDF("k", "t", "p")
    val r = Seq((1L, 5, 1.0)).toDF("k", "t2", "v")
    val out = AsOfJoin.asOfBackward(l, r, Seq("k"), "t", "t2", Seq("v"))
    val exchanges = out.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 2, "as-of join must not introduce extra shuffles")
  }
}
