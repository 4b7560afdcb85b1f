package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage (entity resolution) via blocking + edit distance —
  * the dedup pass for ENTITIES rather than documents: two records
  * that refer to the same customer/supplier/venue rarely match
  * byte-for-byte, but their names sit within a small edit distance.
  * The all-pairs Levenshtein matrix is O(n²·len²) and never viable;
  * the standard shape is BLOCKING: records join only within a cheap
  * equi-key block (here a caller-chosen block column; phonetic keys,
  * name prefixes, and sorted-neighborhood windows are the usual
  * choices), then the expensive distance runs on the few candidates
  * per block.
  *
  * Scale shape: ONE equi-join exchange on the block key — blocks
  * bound the quadratic stage at Σ|block|² exactly the way LSH bands
  * bound MinHash (skewed blocks are AQE's skew-join case; a runaway
  * block means the blocking key is too coarse, and the fix is a
  * finer key, not more memory). Levenshtein itself is Spark's
  * codegen'd built-in — no UDF. */
object Linkage {

  /** Candidate pairs (id_a < id_b) within the same block whose
    * `nameCol` values sit within `maxDist` edits. Emits the distance
    * for downstream scoring/clustering (the match-decision layer —
    * thresholding, weighted field agreement — composes on top). */
  def fuzzyPairs(df: DataFrame, idCol: String, nameCol: String,
                 blockCol: String, maxDist: Int): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(nameCol).as("name_a"),
                      col(blockCol).as("__blk"))
    val b = df.select(col(idCol).as("id_b"), col(nameCol).as("name_b"),
                      col(blockCol).as("__blk"))
    a.join(b, Seq("__blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"),
              col("dist"))
  }

  /** Graded variant of [[fuzzyPairs]]: Jaro-Winkler similarity (the
    * native codegen'd `graft.plans.JaroWinklerSim`) instead of edit
    * distance — prefix-weighted, length-normalized, the score match
    * DECISION layers threshold and combine. Same blocking economics;
    * the similarity rounds to 4 decimals BEFORE the threshold so both
    * engines cut the same pairs. */
  def jaroWinklerPairs(spark: org.apache.spark.sql.SparkSession,
                       df: DataFrame, idCol: String, nameCol: String,
                       blockCol: String, minSim: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(nameCol).as("name_a"),
                      col(blockCol).as("__blk"))
    val b = df.select(col(idCol).as("id_b"), col(nameCol).as("name_b"),
                      col(blockCol).as("__blk"))
    a.join(b, Seq("__blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jw", round(graft.plans.JaroWinklerNative
        .jaroWinkler(spark, col("name_a"), col("name_b")), 4))
      .filter(col("jw") >= minSim)
      .select(col("id_a"), col("id_b"), col("jw"))
  }
}
