package graft

import org.apache.spark.sql.functions._
import graft.llm.Dsir

/** DSIR: the Spark fit vs an independent plain-Scala reference
  * (MessageDigest md5, BigInt hex, exact BigDecimal quantization) on
  * a corpus where target-like docs must outrank divergent ones. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val target = Seq(
    (0L, "the cat sat on the mat"),
    (1L, "a cat and a dog"),
    (2L, "the dog sat on the rug"))
  private val raw = Seq(
    (10L, "the cat sat on the rug"),   // target-like
    (11L, "stock market crash today"), // divergent
    (12L, "a dog sat on a mat"),       // target-like
    (13L, "quantum flux capacitor"),   // divergent
    (14L, "the cat and the dog"))      // target-like

  private val B = 64

  // ---- independent reference ------------------------------------------
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def bucket(gram: String): Int =
    (BigInt(md5hex(gram).take(14), 16) % B).toInt

  private def grams(text: String): Seq[String] = {
    val ws = text.trim.split("\\s+").toSeq
    ws ++ ws.sliding(2).filter(_.size == 2).map(_.mkString(" "))
  }

  private def refScores: Map[Long, Double] = {
    val tb = target.flatMap { case (_, t) => grams(t) }.map(bucket)
    val rb = raw.flatMap { case (id, t) => grams(t).map(g => (id, bucket(g))) }
    val tc = tb.groupBy(identity).view.mapValues(_.size).toMap
    val rc = rb.groupBy(_._2).view.mapValues(_.size).toMap
    val tt = tb.size; val rt = rb.size
    def lr(b: Int): Double =
      math.log((tc.getOrElse(b, 0) + 1.0) / (tt + B)) -
        math.log((rc.getOrElse(b, 0) + 1.0) / (rt + B))
    raw.map { case (id, t) =>
      val byBucket = grams(t).map(bucket).groupBy(identity)
        .view.mapValues(_.size).toMap
      val s = byBucket.toSeq.map { case (b, cnt) =>
        BigDecimal(cnt * lr(b)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      id -> s.setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
  }

  test("importance scores match the independent reference exactly") {
    val got = Dsir.importanceScores(raw.toDF("doc_id", "text"),
        target.toDF("doc_id", "text"), "doc_id", "text", buckets = B)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val want = refScores
    assert(got.keySet == want.keySet)
    for ((id, s) <- want)
      assert(math.abs(got(id) - s) < 1e-9, s"doc $id: ${got(id)} vs $s")
    // n_grams: unigrams + bigrams = 2 * len - 1 for these 4/6-word docs
    val ng = Dsir.importanceScores(raw.toDF("doc_id", "text"),
        target.toDF("doc_id", "text"), "doc_id", "text", buckets = B)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ng(10L) == 11 && ng(13L) == 5)
  }

  test("target-like docs outrank divergent ones; top-k is deterministic") {
    val sel = Dsir.selectTopK(raw.toDF("doc_id", "text"),
        target.toDF("doc_id", "text"), "doc_id", "text",
        buckets = B, k = 3).collect()
    assert(sel.map(_.getLong(1)).toSet == Set(10L, 12L, 14L),
      s"selected ${sel.mkString(",")}")
    assert(sel.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val scores = sel.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("model plan broadcasts and the score path has no window sort") {
    val df = Dsir.importanceScores(raw.toDF("doc_id", "text"),
      target.toDF("doc_id", "text"), "doc_id", "text", buckets = B)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), "model join should broadcast")
    assert(!plan.contains("Window"), "no window in the scoring path")
  }
}
