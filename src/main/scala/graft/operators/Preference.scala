package graft.operators

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bradley–Terry preference ratings — the pairwise-comparison model
  * behind preference-data pipelines (RLHF reward ranking, match-play
  * ratings): item i beats item j with probability r_i / (r_i + r_j);
  * the MLE maximizes Π over observed comparisons.
  *
  * Fitted by Hunter's (2004) MM iteration
  *
  *   r_i ← w_i / Σ_j n_ij / (r_i + r_j)
  *
  * (w_i = wins of i, n_ij = comparisons between i and j), which is
  * globally convergent whenever the comparison graph is connected.
  *
  * Scale shape — sufficient-statistics compression: the comparison
  * table (rows grow with the data; at 100 TB this is the big side)
  * folds ONCE through two map-side-combined aggregations into k win
  * counts and ≤ k(k−1)/2 pair counts; the iteration then runs on that
  * k²-bounded frame ON THE DRIVER (the k-means per-round-stats
  * precedent — k is item cardinality, a config-scale constant, not a
  * data-scale variable). No iteration ever touches the raw table.
  *
  * Portability: every update quantizes to 9 decimals via
  * BigDecimal(HALF_UP) — the same rule as Spark SQL's round() on
  * doubles — so a DuckDB recursive CTE replaying the identical
  * recurrence reproduces the ratings bit for bit; each per-item
  * denominator is a ≤(k−1)-term sum of quantized values accumulated
  * exactly in scale-9 decimal (order-independent). The oracle-exact
  * decimal path assumes per-pair counts ≤ ~1e4·k (scaled sums stay
  * under 2^53 through the decimal→double cast); beyond that the
  * operator is unchanged but the parity guarantee becomes approximate.
  */
object Preference {

  import graft.util.Exact.{round6, round9}

  /** `matches`: one row per comparison with long item columns `aCol`,
    * `bCol` and boolean `aWinsCol`. Returns one row per item:
    * (item, n_matches, wins, rating) with ratings normalized to mean 1
    * (Σ r = k) and rounded to 6 decimals. */
  def bradleyTerry(matches: DataFrame, aCol: String, bCol: String,
                   aWinsCol: String, iters: Int,
                   maxPairs: Int = 250000): DataFrame = {
    val spark = matches.sparkSession
    val m = matches.select(col(aCol).cast("long").as("a"),
                           col(bCol).cast("long").as("b"),
                           col(aWinsCol).as("awin"))
      .filter(col("a") =!= col("b"))
    // the ONLY passes over the big table: two bounded aggregations.
    // Both collects are k²-bounded BY CONTRACT (k distinct items →
    // ≤ k(k−1)/2 pair rows); `maxPairs` turns a contract violation
    // (10⁶ distinct items at corpus scale) into a loud require
    // instead of a silent driver OOM.
    val pairStats = graft.util.Bounded.collect(
      m.select(least(col("a"), col("b")).as("i"),
               greatest(col("a"), col("b")).as("j"))
        .groupBy(col("i"), col("j")).agg(count(lit(1)).as("n")),
      maxPairs, "Preference.bradleyTerry pair frame")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val winStats = graft.util.Bounded.collect(
      m.select(when(col("awin"), col("a")).otherwise(col("b")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c")),
      maxPairs, "Preference.bradleyTerry win frame")
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    val items = pairStats.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val neighbors: Map[Long, Array[(Long, Long)]] = // item -> (other, n)
      pairStats.flatMap { case (i, j, n) => Seq(i -> (j, n), j -> (i, n)) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sortBy(_._1) }
    val nMatches = items.map(i => i -> neighbors(i).map(_._2).sum).toMap

    var r: Map[Long, Double] = items.map(_ -> 1.0).toMap
    for (_ <- 1 to iters) {
      r = items.map { i =>
        // exact scale-9 decimal accumulation: order-independent, and
        // the DuckDB mirror (SUM(CAST(round(t,9) AS DECIMAL(38,9))))
        // lands on the identical value
        val denom = neighbors(i).foldLeft(JBigDecimal.ZERO) {
          case (acc, (j, n)) =>
            acc.add(new JBigDecimal(java.lang.Double.toString(
              round9(n.toDouble / (r(i) + r(j))))).setScale(9))
        }.doubleValue()
        i -> round9(winStats.getOrElse(i, 0L).toDouble / denom)
      }.toMap
    }
    val s = items.foldLeft(JBigDecimal.ZERO) { (acc, i) =>
      acc.add(new JBigDecimal(java.lang.Double.toString(r(i))).setScale(9))
    }.doubleValue()
    val k = items.length
    val rows = items.map { i =>
      Row(i, nMatches(i), winStats.getOrElse(i, 0L),
          round6(k.toDouble * r(i) / s))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      StructType(Seq(
        StructField("item", LongType, nullable = false),
        StructField("n_matches", LongType, nullable = false),
        StructField("wins", LongType, nullable = false),
        StructField("rating", DoubleType, nullable = false))))
  }
}
