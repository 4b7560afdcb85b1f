package graft

import java.sql.Timestamp

import graft.operators.Funnel

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int = 0) =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("strictly-after ordering: a purchase before the signup doesn't convert") {
    val events = Seq(
      // u1 converts fully: signup 01:00 -> click 03:00 -> purchase 04:00
      (1L, "signup", ts(1)), (1L, "click", ts(3)), (1L, "purchase", ts(4)),
      // u2: purchase BEFORE signup — must stop at step 1
      (2L, "purchase", ts(1)), (2L, "signup", ts(2)),
      // u3: signup + click only; the click at the same instant as
      // signup does NOT count (strictly after), the later one does
      (3L, "signup", ts(5)), (3L, "click", ts(5)), (3L, "click", ts(7)),
      // u4: clicks without any signup — never enters the funnel
      (4L, "click", ts(1)), (4L, "purchase", ts(2)))
      .toDF("user_id", "event_type", "ts")
    val out = Funnel.funnel(events, "user_id", "event_type", "ts",
                            Seq("signup", "click", "purchase"))
      .orderBy($"step").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(3L, 2L, 1L)) // n_users
    assert(out(0).isNullAt(3) && out(0).isNullAt(4))
    assert(out(1).getDouble(3) === 0.6667)  // 2/3 converted to click
    assert(out(2).getDouble(3) === 0.5)     // 1/2 converted to purchase
    // u1 clicked 2h after signup, u3 2h after: mean 2h
    assert(out(1).getDouble(4) === 2.0)
    // u1 purchased 1h after the click
    assert(out(2).getDouble(4) === 1.0)
  }

  test("the earliest qualifying event wins each step") {
    val events = Seq(
      (1L, "signup", ts(1)), (1L, "click", ts(2)), (1L, "click", ts(9)),
      (1L, "purchase", ts(3)))
      .toDF("user_id", "event_type", "ts")
    val out = Funnel.funnel(events, "user_id", "event_type", "ts",
                            Seq("signup", "click", "purchase"))
      .orderBy($"step").collect()
    // purchase at 03 follows the FIRST click (02), not the later one
    assert(out(2).getLong(2) === 1L)
    assert(out(2).getDouble(4) === 1.0)
  }
}
