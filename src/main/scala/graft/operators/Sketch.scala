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

  /** Linear-counting distinct estimate per group (Whang et al. 1990):
    * hash each key into m buckets, count occupied buckets V_occ, and
    * estimate n̂ = −m·ln(1 − V_occ/m). Unlike HLL (whose register
    * layout is engine-private, so q36 can only envelope-check it),
    * the occupied-bucket SET is a pure function of [[Similarity
    * .mix32Col]] — an external engine replays the ESTIMATE itself bit
    * for bit. State is the bucket set (≤ m per group, OR-mergeable =
    * the distinct union); one exchange on (group, bucket) partial-
    * aggregated map-side. Accuracy needs m ≳ a few × the true
    * cardinality (load < ~1.5); past m the formula saturates — that
    * regime shift is exactly what the q156 audit shows. */
  def linearCount(df: DataFrame, groupCols: Seq[String], keyCol: String,
                  m: Int = 16384): DataFrame = {
    val gc = groupCols.map(col)
    df.select(gc :+ pmod(Similarity.mix32Col(col(keyCol)), lit(m.toLong))
        .as("__b"): _*)
      .distinct()
      .groupBy(gc: _*)
      .agg(count(lit(1)).as("__occ"))
      .select(gc :+
        round(lit(-m.toDouble) *
          log(lit(1.0) - col("__occ").cast("double") / m.toDouble), 4)
          .as("lc_est"): _*)
  }
}
