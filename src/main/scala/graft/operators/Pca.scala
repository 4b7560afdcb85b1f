package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

import graft.util.Exact.round9

/** Principal-component extraction via power iteration — the dominant
  * eigenvector of the covariance matrix, the ML primitive behind
  * variance-based dimensionality reduction and drift directions.
  *
  * Scale shape — the [[Preference]] sufficient-statistics pattern one
  * level up: the corpus folds ONCE through a single map-side-combined
  * aggregation into d + d(d+1)/2 quantized-decimal moment sums (d is
  * a config-scale feature count, so this is one bounded row); the
  * covariance matrix and all `iters` power steps then run on the
  * driver. No iteration ever touches the data.
  *
  * Determinism: per-row cross products x_i·x_j are IEEE-deterministic
  * doubles quantized to 1e-6 and summed in DECIMAL(38,0)
  * (order-independent); the covariance entries and every iterate
  * quantize to 9 decimals; normalization divides by the SIGNED
  * component of maximum absolute value (ties → lowest index), fixing
  * both scale and sign, so a SQL recursive replay (q181) lands on the
  * identical loadings. The normalizer converges to the dominant
  * eigenvalue (v settles with its largest component at ±1, so
  * C·v's extreme component IS λ·(±1)).
  */
object Pca {

  private def q6(c: Column): Column =
    round(c * lit(1e6), 0).cast("decimal(19,0)")

  /** Returns d rows: (dim 0-based, loading, eigenvalue estimate). */
  def powerIteration(df: DataFrame, cols: Seq[String],
                     iters: Int): DataFrame = {
    val spark = df.sparkSession
    val d = cols.size
    val xs = cols.map(c => col(c).cast("double"))
    val sums =
      Seq(count(lit(1)).as("n")) ++
      xs.zipWithIndex.map { case (x, i) =>
        sum(q6(x)).cast("decimal(38,0)").as(s"s$i") } ++
      (for (i <- 0 until d; j <- i until d) yield
        sum(q6(xs(i) * xs(j))).cast("decimal(38,0)").as(s"p${i}_$j"))
    val row = df.agg(sums.head, sums.tail: _*).head()

    val n = row.getAs[Long]("n").toDouble
    val s = (0 until d).map(i =>
      row.getAs[java.math.BigDecimal](s"s$i").doubleValue() / 1e6)
    val cov = Array.tabulate(d, d) { (i, j) =>
      val (a, b) = (math.min(i, j), math.max(i, j))
      val pij = row.getAs[java.math.BigDecimal](s"p${a}_$b").doubleValue() / 1e6
      round9((pij - s(i) * s(j) / n) / n)
    }

    var v = Array.fill(d)(1.0)
    var lambda = 0.0
    for (_ <- 1 to iters) {
      // quantized matvec: per-term round9, exact decimal accumulation
      val w = Array.tabulate(d) { i =>
        (0 until d).foldLeft(java.math.BigDecimal.ZERO) { (acc, j) =>
          acc.add(new java.math.BigDecimal(
            java.lang.Double.toString(round9(cov(i)(j) * v(j))))
            .setScale(9))
        }.doubleValue()
      }
      val top = (0 until d).maxBy(i => (math.abs(w(i)), -i))
      lambda = w(top)
      v = w.map(x => round9(x / lambda))
    }
    val rows = (0 until d).map(i => Row(i.toLong, v(i), round9(lambda)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("dim", LongType, nullable = false),
        StructField("loading", DoubleType, nullable = false),
        StructField("eigenvalue", DoubleType, nullable = false))))
  }
}
