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

  /** Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter
    * 1969) — the match-DECISION layer the fuzzy/JW pair generators
    * feed: each blocked candidate pair gets a log-likelihood-ratio
    * score Σ_k w_k over K comparison fields, where
    *
    *   w_k = ln(m_k / u_k)              if the fields agree
    *   w_k = ln((1 − m_k) / (1 − u_k))  if they disagree
    *
    * m_k = P(agree | match) is the caller's field reliability (the
    * classic clerical prior); u_k = P(agree | random pair) is
    * ESTIMATED from the data by the standard frequency method:
    * u_k = Σ_v f_v² / N² over the field's value histogram — exact
    * integer algebra, no sampling.
    *
    * Scale shape: one equi-join exchange on the block key (the
    * [[fuzzyPairs]] economics — Σ|block|² bounds the pair stage);
    * each u_k is a field-cardinality-bounded aggregate folded to ONE
    * row and broadcast, so the scoring pass is scan-local over
    * candidates. Agreement is null-safe equality (two nulls agree —
    * the conservative clerical convention).
    *
    * Determinism: u_k is an integer ratio; each w_k is one ln of a
    * fixed-order double ratio; the K-term score sums left-to-right in
    * declaration order and rounds to 6 before the threshold, so both
    * engines cut identical pairs. Output: (id_a, id_b,
    * g_<field>..., score, is_match). */
  def fellegiSunter(df: DataFrame, idCol: String, blockCol: String,
                    fields: Seq[(String, Column, Double)],
                    threshold: Double): DataFrame = {
    require(fields.nonEmpty, "fellegiSunter: need at least one field")
    fields.foreach { case (n, _, m) =>
      require(m > 0 && m < 1, s"fellegiSunter: field $n needs 0 < m < 1") }
    val proj = df.select(col(idCol).as("__id") +: col(blockCol).as("__blk") +:
      fields.zipWithIndex.map { case ((_, c, _), k) => c.as(s"__f$k") }: _*)
    // u_k: P(two random records agree on field k) = sum f_v^2 / N^2,
    // from the value histogram (N = sum f_v rides the same fold — no
    // separate count action) — one row per field, all broadcast.
    val us = fields.indices.map { k =>
      proj.groupBy(col(s"__f$k")).agg(count(lit(1)).as("c"))
        .agg((sum(col("c") * col("c")).cast("double") /
          (sum(col("c")) * sum(col("c"))).cast("double")).as(s"__u$k"))
    }
    val a = proj.select(col("__id").as("id_a") +: col("__blk") +:
      fields.indices.map(k => col(s"__f$k").as(s"__a$k")): _*)
    val b = proj.select(col("__id").as("id_b") +: col("__blk") +:
      fields.indices.map(k => col(s"__f$k").as(s"__b$k")): _*)
    val withU = us.foldLeft(a.join(b, Seq("__blk"))
      .filter(col("id_a") < col("id_b")))((d, u) => d.crossJoin(broadcast(u)))
    val agrees = fields.indices.map(k =>
      col(s"__a$k") <=> col(s"__b$k"))
    val score = fields.zipWithIndex.map { case ((_, _, m), k) =>
      when(agrees(k), log(lit(m) / col(s"__u$k")))
        .otherwise(log(lit(1.0 - m) / (lit(1.0) - col(s"__u$k"))))
    }.reduce(_ + _)
    withU.select(
      col("id_a") +: col("id_b") +:
        fields.zipWithIndex.map { case ((nm, _, _), k) =>
          agrees(k).as(s"g_$nm") } :+
        round(score, 6).as("score"): _*)
      .withColumn("is_match", col("score") >= threshold)
  }
}
