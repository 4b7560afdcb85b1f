package graft

import org.apache.spark.sql.functions._

/** Spark's runtime bloom-filter injection — the join-pruning layer the
  * engine leans on at 100 TB (a selective dim filter becomes a bloom
  * probe on the fact scan, dropping rows BEFORE the shuffle). No graft
  * code implements this; the spec pins that the bundled Spark build
  * injects it for the engine's canonical selective-join shape, so the
  * SCALING.md claim stays tested rather than assumed.
  */
class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  test("selective dim filter injects a bloom probe on the fact side") {
    val dir = tmpDir("bloomtest")
    (0L until 50000L).map(i => (i, i % 97)).toDF("k", "v")
      .write.parquet(s"$dir/fact")
    (0L until 50000L).map(i => (i, i % 7)).toDF("k2", "p")
      .write.parquet(s"$dir/dim")
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // thresholds sized for a unit-test dataset (defaults assume GBs)
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter($"p" === 3)
      val joined = fact.join(dim, $"k" === $"k2")
        .groupBy($"v").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.toLowerCase.contains("bloom"),
        s"no bloom filter injected:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
