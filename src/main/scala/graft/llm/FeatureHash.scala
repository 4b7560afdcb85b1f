package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hashing-trick text vectorization: each token maps to one of
  * `nBuckets` feature slots by a PORTABLE hash (first 14 md5 hex
  * chars as a long, mod buckets — the NearDup portable-twin hash), so
  * any engine reproduces the exact same sparse vectors. The fixed,
  * vocabulary-free feature space is what makes the trick streamable:
  * no dictionary build pass, no OOV handling, new tokens land in
  * existing slots.
  *
  * Scale shape: tokenize + hash is a narrow explode (digests, never
  * token text, feed the aggregation); the (id, bucket) count is one
  * partial-aggregated exchange whose row count is bounded by
  * corpus · nBuckets, not corpus · vocabulary. */
object FeatureHash {

  /** Sparse hashed bag-of-words: one row per (id, bucket) with the
    * token count; buckets with zero count are absent (sparse form). */
  def hashedBow(df: DataFrame, idCol: String, textCol: String,
                nBuckets: Int): DataFrame =
    df.select(col(idCol),
              explode(TextStats.tokens(col(textCol))).as("__tok"))
      .select(col(idCol),
              pmod(conv(substring(md5(col("__tok")), 1, 14), 16, 10)
                     .cast("long"),
                   lit(nBuckets.toLong)).as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("n"))
}
