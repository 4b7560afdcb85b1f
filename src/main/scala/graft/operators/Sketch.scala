package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.llm.Similarity

/** Count-min sketch (Cormode & Muthukrishnan 2005) — sub-linear-state
  * frequency estimation for key spaces where even 8 bytes per key
  * (StreamingHeavyHitters) is too much: d·w counters total,
  * independent of key cardinality. Estimates only ever OVER-count
  * (each of the d cells holds the key's true count plus its hash
  * collisions; the min over d rows is the tightest), so
  * `est >= exact` is a hard invariant and `est − exact` is bounded in
  * expectation by N/w per row — q154 AUDITS both against the exact
  * counts on real data.
  *
  * Scale shape: the build is ONE map-side-combined aggregation to
  * d·w rows (the explode is a constant d-way fan-out, the bucket
  * hash is [[Similarity.mix32Col]] — codegen'd, portable, oracle-
  * replayable); estimation joins the queried keys' d probes to the
  * sketch (broadcast — the sketch is KBs) and takes min per key.
  * Sketches from disjoint batches MERGE by cell-wise addition (same
  * (r, bucket) space), the corrStats incremental contract. */
object Sketch {

  private val RowSeed = 1000003L // prime stride separating hash rows

  def cmsBucket(key: Column, row: Int, width: Int): Column =
    pmod(Similarity.mix32Col(lit(row.toLong * RowSeed) + key),
         lit(width.toLong))

  /** Build the (row, bucket, cnt) sketch table from a key column —
    * d·w rows max, regardless of input size. */
  def cmsBuild(df: DataFrame, keyCol: String, depth: Int = 4,
               width: Int = 1024): DataFrame =
    df.select(posexplode(array((0 until depth).map(r =>
        cmsBucket(col(keyCol), r, width)): _*)).as(Seq("row", "bucket")))
      .groupBy(col("row"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Point estimates for each distinct key in `keys`: min over the d
    * probed cells. The sketch side broadcasts. */
  def cmsEstimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
                  depth: Int = 4, width: Int = 1024): DataFrame = {
    val probes = keys.select(col(keyCol)).distinct()
      .select(col(keyCol), posexplode(array((0 until depth).map(r =>
        cmsBucket(col(keyCol), r, width)): _*)).as(Seq("row", "bucket")))
    probes.join(broadcast(sketch), Seq("row", "bucket"))
      .groupBy(col(keyCol))
      .agg(min(col("cnt")).as("cms_est"))
  }

  /** Cell-wise merge of sketches built with the same (depth, width). */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("row"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
}
