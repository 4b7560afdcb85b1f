package graft

import org.apache.spark.sql.functions._

import graft.llm.TextClassify

/** Hand-case semantics for the supervised text-classification family
  * (q230–q232): the oracle gate proves engine equivalence; these prove
  * the numbers are the intended Naive Bayes / chi-square values. */
class TextClassifySpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a a b", "en"), (2L, "a b b", "en"),
    (3L, "c c d", "fr"), (4L, "c d d", "fr"))
    .toDF("doc_id", "text", "lang")

  test("naiveBayesModel: Laplace-smoothed grid with zero counts") {
    val m = TextClassify.naiveBayesModel(docs, "text", "lang")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // full 2x4 grid materialized, zero counts included
    assert(m.size == 8)
    // en: a=3, b=3, tc=6, V=4 -> (3+1)/(6+4) = 0.4; unseen c -> 1/10
    assert(m(("en", "a"))._1 == 3L)
    assert(math.abs(m(("en", "a"))._2 - math.log(0.4)) < 1e-6)
    assert(m(("en", "c"))._1 == 0L)
    assert(math.abs(m(("en", "c"))._2 - math.log(0.1)) < 1e-6)
    // priors: 2 of 4 docs each class
    assert(math.abs(m(("fr", "d"))._3 - math.log(0.5)) < 1e-6)
  }

  test("naiveBayesClassify: argmax recovers the true class; score is " +
    "the 6-dp quantized decimal sum") {
    val r = TextClassify.naiveBayesClassify(docs, "doc_id", "text", "lang")
      .collect().map(x => x.getLong(0) ->
        (x.getString(1), x.getString(2), x.getDouble(3), x.getBoolean(4)))
      .toMap
    assert(r.size == 4)
    r.foreach { case (_, (lang, pred, _, correct)) =>
      assert(pred == lang); assert(correct)
    }
    // doc 1 "a a b": en score = 3 * round9(ln 0.4) + round9(ln 0.5),
    // quantized at 6 dp AFTER the decimal sum
    val expected = BigDecimal(3 * BigDecimal(math.log(0.4))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
      .+(BigDecimal(BigDecimal(math.log(0.5))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r(1L)._3 - expected) < 1e-9,
      s"score=${r(1L)._3} expected=$expected")
  }

  test("chi2Tokens: 2x2 contingency on document presence; degenerate " +
    "margin -> NULL; repeats count once") {
    val d2 = Seq(
      (1L, "a a a a x", true), (2L, "a x", true),
      (3L, "c x", false), (4L, "c x", false))
      .toDF("doc_id", "text", "y")
    val r = TextClassify.chi2Tokens(d2, "doc_id", "text", col("y"))
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2),
         if (x.isNullAt(3)) None else Some(x.getDouble(3)))).toMap
    // 'a' repeated 4x in doc 1 still counts once: n_pos = 2
    assert(r("a") == ((2L, 0L, Some(4.0))))
    assert(r("c") == ((0L, 2L, Some(4.0))))
    // 'x' present in every doc -> zero column margin -> NULL
    assert(r("x")._3.isEmpty)
  }
}
