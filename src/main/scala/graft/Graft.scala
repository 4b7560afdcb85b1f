package graft

import org.apache.spark.sql.SparkSession

/** One-call engine setup for an EXISTING session: registers the native
  * expressions (cosine_native, minhash_native, simhash64_native) as
  * temp SQL functions, so notebooks and spark-shell users get the full
  * surface without rebuilding the session. The production path is
  * `spark.sql.extensions=graft.plans.GraftExtensions` at session build
  * (which also installs the FuseCosineRule optimizer rule — optimizer
  * rules cannot be injected post-hoc, so `init` adds the rule via
  * `experimental.extraOptimizations` instead).
  */
object Graft {
  def init(spark: SparkSession): SparkSession = {
    plans.NativeFunctions.register(spark)
    plans.MinHashNative.register(spark)
    plans.SimHashNative.register(spark)
    plans.AffineMinHashNative.register(spark)
    plans.PqNative.register(spark)
    if (!spark.experimental.extraOptimizations.contains(plans.FuseCosineRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ plans.FuseCosineRule
    spark
  }
}
