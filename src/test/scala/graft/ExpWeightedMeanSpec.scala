package graft

import org.apache.spark.sql.functions._

import graft.operators.{ExpWeightedMeanAgg, Windows}

class ExpWeightedMeanSpec extends SparkSpec {
  import spark.implicits._

  // team A: values 10 (newest, ord 3), 20 (ord 2), 30 (ord 1)
  private def df = Seq(
    ("A", 3L, 10.0), ("A", 2L, 20.0), ("A", 1L, 30.0),
    ("B", 1L, 5.0)
  ).toDF("team", "ord", "value")

  private val decay = 0.88
  private val expectedA = {
    val w = Seq(1.0, decay, decay * decay)
    val x = Seq(10.0, 20.0, 30.0)
    (w, x).zipped.map(_ * _).sum / w.sum
  }

  test("window formulation matches hand-computed values (A3)") {
    val out = Windows.expWeightedMean(df, Seq("team"), Seq($"ord".desc),
        $"value", decay, 16)
      .orderBy("team").collect().map(r => r.getDouble(1))
    assert(math.abs(out(0) - expectedA) < 1e-12)
    assert(out(1) === 5.0)
  }

  test("truncates to the n newest rows") {
    val out = Windows.expWeightedMean(df, Seq("team"), Seq($"ord".desc),
        $"value", decay, 2)
      .filter($"team" === "A").collect().head.getDouble(1)
    val expected = (10.0 + decay * 20.0) / (1.0 + decay)
    assert(math.abs(out - expected) < 1e-12)
  }

  test("typed Aggregator agrees with the window formulation") {
    val agg = new ExpWeightedMeanAgg(decay, 16).toColumn
    val out = df.as[(String, Long, Double)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(agg.name("ewm"))
      .collect().toMap
    assert(math.abs(out("A") - expectedA) < 1e-12)
    assert(out("B") === 5.0)
  }
}
