package graft

import org.apache.spark.sql.functions._

import graft.llm.NearDup

/** r15 optimization internals: the opt-in small-input scan spread
  * (Tables.spreadSmall) and the native sorted-merge Jaccard kernel
  * (plans.SortedJaccard) that replaced the per-pair
  * array_intersect/array_union verify. */
class TablesSpreadSpec extends SparkSpec {
  import spark.implicits._

  private def roundRobins(df: org.apache.spark.sql.DataFrame): Int =
    "RoundRobinPartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).size

  test("spreadSmall repartitions a sub-split input to the session parallelism") {
    val df = (1L to 100L).toDF("id")
    val spread = Tables.spreadSmall(df)
    assert(roundRobins(spread) === 1, "expected one round-robin exchange")
    assert(spread.rdd.getNumPartitions ===
      spark.sparkContext.defaultParallelism)
    // values untouched
    assert(spread.agg(sum(col("id"))).head.getLong(0) === 5050L)
  }

  test("spreadSmall is an identity above one split (the 100 TB self-disable)") {
    // shrink the split size below the frame's estimate: the condition
    // that disables the spread at scale must fire
    val old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "1")
      val df = (1L to 100L).toDF("id")
      assert(roundRobins(Tables.spreadSmall(df)) === 0,
        "an input larger than one split must keep its native partitioning")
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", old)
  }

  test("spark.graft.scanSpread=false opts out") {
    try {
      spark.conf.set("spark.graft.scanSpread", "false")
      assert(roundRobins(Tables.spreadSmall((1L to 10L).toDF("id"))) === 0)
    } finally spark.conf.unset("spark.graft.scanSpread")
  }

  test("sortedJaccard is bit-identical to the composable jaccard on sorted distinct arrays") {
    // longs (the hashed-shingle path) and strings (the token path),
    // with controlled overlap; plus the empty/empty NaN contract the
    // size/size division has, and null-array propagation.
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { i =>
      val a = rnd.shuffle((0 to 40).toList).take(rnd.nextInt(12) + 1)
      val b = rnd.shuffle((0 to 40).toList).take(rnd.nextInt(12) + 1)
      (i.toLong, a.distinct.sorted.map(_.toLong).toArray,
        b.distinct.sorted.map(_.toLong).toArray)
    }
    val df = rows.toDF("id", "a", "b")
    val both = df.select(
      NearDup.jaccard(col("a"), col("b")).as("ref"),
      NearDup.sortedJaccard(spark, col("a"), col("b")).as("nat"))
    assert(both.filter(col("ref") =!= col("nat")).count() === 0)

    val sdf = rows.map { case (i, a, b) =>
      (i, a.map(v => f"t$v%02d"), b.map(v => f"t$v%02d")) }
      .toDF("id", "a", "b")
    val sboth = sdf.select(
      NearDup.jaccard(col("a"), col("b")).as("ref"),
      NearDup.sortedJaccard(spark, col("a"), col("b")).as("nat"))
    assert(sboth.filter(col("ref") =!= col("nat")).count() === 0)

    val edge = Seq((Array.empty[Long], Array.empty[Long])).toDF("a", "b")
      .select(NearDup.sortedJaccard(spark, col("a"), col("b")).as("j"))
      .head
    assert(edge.getDouble(0).isNaN, "empty/empty must be NaN (0/0 parity)")

    val nulls = Seq((Some(Array(1L, 2L)), Option.empty[Array[Long]]))
      .toDF("a", "b")
      .select(NearDup.sortedJaccard(spark, col("a"), col("b")).as("j"))
      .head
    assert(nulls.isNullAt(0), "null array must yield null")
  }
}
