package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Coreset selection over an embedding column — greedy k-center
  * (Gonzalez 1985, the farthest-point heuristic): starting from the
  * lowest-id point, repeatedly add the point FARTHEST from the chosen
  * set. The selected points 2-approximate the optimal k-center cover,
  * which is why active-learning and data-pruning pipelines use the
  * sweep to pick a maximally-diverse training subset.
  *
  * Scale shape: the corpus never shuffles — each of the k rounds is
  * one scan-local `least()` update of the running min-distance column
  * against the single NEW center (a broadcast array literal) plus one
  * max() aggregation (map-side combined) to find the next farthest
  * point; driver state is k center vectors (config-bounded, the IVF
  * centroid precedent). Lineage grows by one narrow projection per
  * round, bounded by k.
  *
  * Determinism across engines: squared distances quantize to 1e-9
  * (BIGINT) and the argmax rides the single integer key
  * qd2·10⁶ + (999999 − id) — farthest wins, ties break to the SMALLER
  * id, and the winner is decodable from the key alone, so a SQL
  * replay (the q165 recursive-CTE oracle) picks the identical center
  * sequence. A chosen center has qd2 = 0 to itself, so re-selection
  * is impossible without any explicit exclusion set. Requires ids in
  * [0, 999999] (the key packing); widen the packing constant for
  * larger id spaces. */
object Coreset {

  /** Returns the selection trace: (step 1..k, center_id, r2q) where
    * r2q is the quantized squared distance that made the pick (the
    * covering radius² at that step; 0 for the seed). */
  def kCenterGreedy(points: DataFrame, idCol: String, vecCol: String,
                    k: Int): DataFrame = {
    // k rounds of driver-looped jobs and k center vectors of driver
    // state — bound both loudly (the IVF-centroid contract: selection
    // sets are config-sized, never corpus-sized)
    require(k >= 1 && k <= 4096,
      s"Coreset.kCenterGreedy: k must be in [1, 4096], got $k")
    val spark = points.sparkSession
    val pts = points.select(col(idCol).cast("long").as("id"),
                            col(vecCol).cast("array<double>").as("v"))

    def qd2(center: Array[Double]): Column = {
      val c = array(center.map(lit): _*)
      round((Similarity.dot(col("v"), col("v")) +
             lit(center.map(x => x * x).sum) -
             lit(2.0) * Similarity.dot(col("v"), c)) * lit(1e9), 0)
        .cast(LongType)
    }

    def vecOf(id: Long): Array[Double] =
      pts.filter(col("id") === id).head().getSeq[Double](1).toArray

    val seedId = pts.agg(min(col("id"))).head().getLong(0)
    var chosen = Vector((seedId, 0L))
    var cur = pts.withColumn("qmin", qd2(vecOf(seedId)))
    for (_ <- 2 to k) {
      val key = cur.agg(max(col("qmin") * lit(1000000L) +
                            (lit(999999L) - col("id")))).head().getLong(0)
      val nextId = 999999L - key % 1000000L
      val r2q = key / 1000000L
      chosen = chosen :+ (nextId, r2q)
      cur = cur.withColumn("qmin", least(col("qmin"), qd2(vecOf(nextId))))
    }
    val rows = chosen.zipWithIndex.map { case ((id, r2q), i) =>
      Row((i + 1).toLong, id, r2q)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("step", LongType, nullable = false),
        StructField("center_id", LongType, nullable = false),
        StructField("r2q", LongType, nullable = false))))
  }
}
