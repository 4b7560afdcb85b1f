package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val intervals = Seq(
    (1L, 0.0, 10.0),    // spans many buckets at width 3
    (2L, 4.0, 4.5),     // inside one bucket
    (3L, 9.0, 9.0),     // degenerate single point
    (4L, 50.0, 60.0)    // matches nothing
  ).toDF("iv_id", "lo", "hi")

  private val points = Seq(
    (100L, 0.0),   // lower boundary inclusive
    (101L, 4.2),
    (102L, 9.0),   // upper boundary of 3, inside 1
    (103L, 10.0),  // upper boundary inclusive
    (104L, 11.0),  // outside all
    (105L, -2.0)   // negative value, outside
  ).toDF("pt_id", "p")

  private def pairsAt(width: Double): Set[(Long, Long)] =
    RangeJoin.pointInInterval(points, col("p"), intervals,
                              col("lo"), col("hi"), width)
      .select($"pt_id", $"iv_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("bucketed range join equals the naive cross-join filter, once per pair") {
    val expected = points.crossJoin(intervals)
      .filter($"p" >= $"lo" && $"p" <= $"hi")
      .select($"pt_id", $"iv_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected === Set((100L, 1L), (101L, 1L), (101L, 2L),
                            (102L, 1L), (102L, 3L), (103L, 1L)))
    // Bucket width must not change the result — intervals replicate to
    // more/fewer buckets but each (point, interval) pair appears once.
    for (w <- Seq(0.5, 3.0, 100.0)) {
      val got = RangeJoin.pointInInterval(points, col("p"), intervals,
                                          col("lo"), col("hi"), w)
        .groupBy($"pt_id", $"iv_id").count()
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      assert(got.map(_._1).toSet === expected, s"width $w")
      assert(got.forall(_._2 == 1L), s"width $w produced duplicate pairs")
    }
  }

  test("negative-domain buckets floor correctly") {
    val iv = Seq((1L, -7.0, -2.0)).toDF("iv_id", "lo", "hi")
    val pts = Seq((10L, -7.0), (11L, -2.0), (12L, -1.9), (13L, -8.0))
      .toDF("pt_id", "p")
    val got = RangeJoin.pointInInterval(pts, col("p"), iv,
                                        col("lo"), col("hi"), 3.0)
      .select($"pt_id").as[Long].collect().toSet
    assert(got === Set(10L, 11L))
  }
}
