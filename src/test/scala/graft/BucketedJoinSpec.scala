package graft

import org.apache.spark.sql.functions._

/** Bucketing: the co-located-join scale path (SURVEY optimize notes) —
  * two tables bucketed+sorted on the join key join with ZERO exchanges. */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle") {
    val a = (1L to 1000L).map(i => (i, s"a$i")).toDF("k", "va")
    val b = (1L to 1000L).map(i => (i, i * 2.0)).toDF("k", "vb")
    a.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bj_a")
    b.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bj_b")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bj_a").join(spark.table("bj_b"), "k")
      assert(joined.count() === 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bj_a")
      spark.sql("DROP TABLE IF EXISTS bj_b")
    }
  }
}
