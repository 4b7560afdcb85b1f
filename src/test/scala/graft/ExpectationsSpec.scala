package graft

import org.apache.spark.sql.functions._

import graft.operators.Expectations._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  test("check: planted null/range/set/regex violations count per rule") {
    val df = Seq(
      (Some(1L), Some(10.0), "O", "1-URGENT"),
      (None, Some(-5.0), "X", "bogus"),
      (Some(3L), None, "F", "5-LOW"))
      .toDF("k", "price", "status", "prio")
    val out = check(df, Seq(
        notNull("k"),
        inRange("price", 0.0, 100.0),
        inSet("status", Seq("O", "F", "P")),
        matches("prio", "^[1-5]-")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out("not_null_k") === ((3L, 1L, false)))
    assert(out("range_price") === ((3L, 1L, false)))  // null price passes
    assert(out("in_set_status") === ((3L, 1L, false)))
    assert(out("matches_prio") === ((3L, 1L, false)))
  }

  test("check: all rules ride one aggregation (single exchange)") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    val plan = check(df, Seq(notNull("k"), notNull("s")))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected 1 exchange, plan:\n$plan")
  }

  test("unique: rows beyond the first per duplicated key are violations") {
    val df = Seq(1L, 2L, 2L, 3L, 3L, 3L).toDF("k")
    val r = unique(df, Seq("k"), "unique_k").collect().head
    assert(r.getLong(1) === 6L && r.getLong(2) === 3L && !r.getBoolean(3))
  }

  test("refIntegrity: orphan child ROWS count; null child keys are ignored") {
    val child = Seq(Some(1L), Some(1L), Some(9L), Some(9L), Some(9L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val r = refIntegrity(child, "fk", parent, "pk", "fk_check")
      .collect().head
    assert(r.getLong(1) === 6L)  // all child rows counted in n_rows
    assert(r.getLong(2) === 3L)  // the three 9s; the null is not an orphan
    assert(!r.getBoolean(3))
  }

  test("report unions audit rows; a clean table passes everything") {
    val o = Seq((1L, "O"), (2L, "F")).toDF("k", "st")
    val l = Seq(1L, 1L, 2L).toDF("fk")
    val rep = report(
        check(o, Seq(notNull("k"), inSet("st", Seq("O", "F", "P")))),
        unique(o, Seq("k"), "unique_k"),
        refIntegrity(l, "fk", o, "k", "fk_l_o"))
      .collect()
    assert(rep.length === 4)
    assert(rep.forall(_.getBoolean(3)))
    assert(rep.forall(_.getLong(2) === 0L))
  }
}
