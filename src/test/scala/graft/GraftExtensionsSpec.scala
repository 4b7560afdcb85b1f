package graft

import org.apache.spark.sql.functions._

import graft.llm.Similarity
import graft.plans.FuseCosineRule

/** The optional optimizer rule: the composable HOF cosine fuses into
  * the native expression with unchanged results. Installed here via
  * `experimental.extraOptimizations` (production installs the same
  * rule with spark.sql.extensions=graft.plans.GraftExtensions).
  */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = (0L until 30L).map { i =>
    (i, Array.tabulate(16)(j => math.sin(i * 16 + j).toFloat))
  }.toDF("vec_id", "embedding")

  test("HOF cosine pattern fuses to cosine_native with identical results") {
    // queryExecution caches per DataFrame — build a fresh plan per phase
    def q = {
      val df = vecs
      df.as("x").join(df.as("y"), $"x.vec_id" < $"y.vec_id")
        .select($"x.vec_id".as("a"), $"y.vec_id".as("b"),
                Similarity.cosine($"x.embedding", $"y.embedding").as("cos"))
    }
    val before = q.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ FuseCosineRule
    try {
      val fused = q
      val fusedPlan = fused.queryExecution.optimizedPlan.toString
      assert(fusedPlan.contains("cosine_native") || fusedPlan.contains("CosineSimilarity"),
        s"rule did not fire:\n$fusedPlan")
      assert(!fusedPlan.contains("aggregate("), "HOF tree should be gone")
      val after = fused.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(after === before) // bit-identical (same accumulation order)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == FuseCosineRule)
    }
  }

  test("rule leaves double-native arrays alone (precision guard)") {
    val df = Seq((1L, Array(1.0, 2.0)), (2L, Array(3.0, 4.0))).toDF("id", "v")
    val q = df.as("x").join(df.as("y"), $"x.id" < $"y.id")
      .select(Similarity.cosine($"x.v", $"y.v").as("cos"))
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ FuseCosineRule
    try {
      val plan = q.queryExecution.optimizedPlan.toString
      assert(!plan.contains("cosine_native"), "must not rewrite double inputs")
      assert(math.abs(q.collect().head.getDouble(0) - 11.0 / (math.sqrt(5) * 5)) < 1e-12)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == FuseCosineRule)
    }
  }
}
