package graft.operators

import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

import graft.util.Exact.{round6, round9}

/** Two-component 1-D Gaussian mixture via EM on a BINNED histogram —
  * the mixture-separation primitive (bimodal metric split, noise-vs-
  * signal threshold choice) made scale-free by the standard binning
  * trick: EM's E-step must touch every observation each round, which
  * at 100 TB means 10 full passes — binning first collapses the data
  * to `nBins` (midpoint, count) rows in ONE pass, and all EM rounds
  * run on that driver-bounded frame with weighted responsibilities.
  * The approximation is the bin width, chosen explicitly, not a
  * sample.
  *
  * Determinism: responsibilities and every updated parameter quantize
  * to 9 decimals per round (absorbing sub-ulp libm exp() differences
  * across engines), weighted M-step sums accumulate in scale-9
  * decimal (order-independent), so a recursive-CTE replay of the
  * identical recurrence lands on the same fit. The 1/√2π pdf factor
  * cancels in responsibilities and is omitted. */
object Gmm {

  private def dec9(x: Double): JBigDecimal =
    new JBigDecimal(java.lang.Double.toString(round9(x))).setScale(9)

  /** Returns 1 row: (n, pi1, mu1, sigma1, mu2, sigma2) after `iters`
    * EM rounds on an `nBins`-bin histogram of [lo, hi) (values
    * clamped into the edge bins). Init must separate the components:
    * (mu1, sigma1, mu2, sigma2, pi=0.5) are explicit arguments.
    * Degeneracy note: a component whose whole mass lands in ONE bin
    * collapses to σ = 0 and the next round's pdf divides by zero —
    * the classic GMM singularity, surfacing here as bin collapse.
    * Choose bins coarse enough that no real cluster is a point mass,
    * or floor σ upstream. */
  def fit2(df: DataFrame, valueCol: String, lo: Double, hi: Double,
           nBins: Int, mu1_0: Double, sigma1_0: Double, mu2_0: Double,
           sigma2_0: Double, iters: Int): DataFrame = {
    // nBins IS the driver-state bound (the histogram has ≤ nBins
    // rows by construction) — cap it loudly so a caller can't turn
    // the sufficient-stat frame into a corpus-scale collect.
    require(nBins >= 2 && nBins <= 100000,
      s"Gmm.fit2: nBins must be in [2, 100000] (driver-side histogram " +
        s"bound), got $nBins")
    val spark = df.sparkSession
    val width = (hi - lo) / nBins
    val x = col(valueCol).cast("double")
    val bin = greatest(least(floor((x - lo) / width).cast("long"),
                             lit(nBins - 1L)), lit(0L))
    val hist = graft.util.Bounded.collect(
      df.filter(x.isNotNull)
        .select(bin.as("__b"))
        .groupBy(col("__b")).agg(count(lit(1)).as("__n")),
      nBins, "Gmm.fit2 histogram frame")
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = hist.map(_._2).sum

    var (pi, mu1, s1, mu2, s2) = (0.5, mu1_0, sigma1_0, mu2_0, sigma2_0)
    for (_ <- 1 to iters) {
      val resp = hist.map { case (b, nb) =>
        val m = lo + b * width + width / 2.0
        val p1 = math.exp(-(m - mu1) * (m - mu1) / (2.0 * s1 * s1)) / s1
        val p2 = math.exp(-(m - mu2) * (m - mu2) / (2.0 * s2 * s2)) / s2
        val r = round9(pi * p1 / (pi * p1 + (1.0 - pi) * p2))
        (m, nb, r)
      }
      def wsum(f: ((Double, Long, Double)) => Double): Double =
        resp.foldLeft(JBigDecimal.ZERO)((acc, t) => acc.add(dec9(f(t))))
          .doubleValue()
      val w1 = wsum { case (_, nb, r) => nb * r }
      val w2 = wsum { case (_, nb, r) => nb * (1.0 - r) }
      val nmu1 = round9(wsum { case (m, nb, r) => nb * r * m } / w1)
      val nmu2 = round9(wsum { case (m, nb, r) => nb * (1.0 - r) * m } / w2)
      val v1 = wsum { case (m, nb, r) => nb * r * (m - nmu1) * (m - nmu1) }
      val v2 = wsum { case (m, nb, r) =>
        nb * (1.0 - r) * (m - nmu2) * (m - nmu2) }
      pi = round9(w1 / (w1 + w2))
      mu1 = nmu1; mu2 = nmu2
      s1 = round9(math.sqrt(v1 / w1))
      s2 = round9(math.sqrt(v2 / w2))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(
        n, round6(pi), round6(mu1), round6(s1), round6(mu2), round6(s2))), 1),
      StructType(Seq(
        StructField("n", LongType, nullable = false),
        StructField("pi1", DoubleType, nullable = false),
        StructField("mu1", DoubleType, nullable = false),
        StructField("sigma1", DoubleType, nullable = false),
        StructField("mu2", DoubleType, nullable = false),
        StructField("sigma2", DoubleType, nullable = false))))
  }
}
