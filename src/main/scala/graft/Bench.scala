package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Each query is run once untimed (plan + codegen + JIT warmup — cost
  * that amortizes away in any long-lived engine) and then timed. The
  * reported number is the warm run; `warmup_sec` reports the total
  * first-run cost separately so cold-start is still visible.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    var warmupTotal = 0.0
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val w0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => }
      warmupTotal += (System.nanoTime() - w0) / 1e9
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"warmup_sec":$warmupTotal,"sf":"$sfDir"}""")
    spark.stop()
  }
}
