package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Leave-one-out target encoding with additive smoothing — the
  * standard high-cardinality categorical feature for tabular models.
  * Each row's encoding is the mean of the TARGET over the OTHER rows
  * of its category, shrunk toward the global mean by a pseudo-count
  * `m`:
  *
  *   enc_i = (sum_cat − t_i + m·μ) / (n_cat − 1 + m)
  *
  * Leaving the row itself out is what makes the feature safe to train
  * on (plain category-mean encoding leaks the row's own label);
  * smoothing keeps rare categories from collapsing onto their one or
  * two observed targets.
  *
  * Scale shape: per-category sums/counts come from ONE partial
  * (map-side) aggregation whose output is category-cardinality, then
  * broadcast back — the fact table itself never shuffles; the global
  * mean is a 1-row crossJoin; the encoding is a narrow projection.
  * Portability: sums ride DECIMAL(30,6) (order-independent), the
  * final arithmetic is double with a fixed operation order, rounded
  * to 4 decimals. */
object TargetEncode {

  def looEncode(df: DataFrame, catCol: String, targetCol: String,
                m: Double, outCol: String = "target_enc"): DataFrame = {
    val t = col(targetCol).cast("double")
    val perCat = df.groupBy(col(catCol))
      .agg(sum(t.cast("decimal(30,6)")).cast("double").as("__sum_cat"),
           count(t).as("__n_cat"))
    val global = df.agg(
        (sum(t.cast("decimal(30,6)")).cast("double") /
         count(t).cast("double")).as("__mu"))
    df.join(broadcast(perCat), catCol)
      .crossJoin(broadcast(global))
      .withColumn(outCol,
        round((col("__sum_cat") - t + lit(m) * col("__mu")) /
              (col("__n_cat").cast("double") - 1.0 + lit(m)), 4))
      .drop("__sum_cat", "__n_cat", "__mu")
  }
}
