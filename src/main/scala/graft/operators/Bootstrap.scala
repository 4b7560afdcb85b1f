package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

import graft.util.Exact.{round6, round9}

/** One-pass Poisson bootstrap (Chamandy et al. 2012) — the bootstrap
  * that works at any scale: instead of drawing B full resamples
  * (impossible distributed — each classical resample needs global
  * coordination), every row independently contributes a
  * Poisson(1)-distributed integer weight to each of B replicates; the
  * B weighted means then estimate the sampling distribution of the
  * statistic, and their quantiles are the confidence interval.
  *
  * Execution is a TYPED AGGREGATOR holding one 2B-long buffer
  * (Σw·xq, Σw per replicate): each row updates all B slots in a tight
  * JVM loop — no explode, so the corpus is read AND materialized once
  * (the exploded form pays B× row amplification through the
  * aggregation; measured 4× slower at sf0.1 even with integer
  * weights). Partials merge map-side as plain long vectors.
  *
  * Determinism: the per-(row, replicate) draw is the 15-bit high half
  * of the engine-wide id-keyed LCG (Sampling.idFraction's bit
  * contract), compared against Poisson(1) inverse-CDF thresholds
  * pre-scaled to the same 15-bit grid — integers end to end, no rng:
  * the q176 oracle replays the EXACT interval, not a statistical
  * cousin. Weights cap at 7 (P ≈ 8e-5 truncated). Long partials are
  * exact while Σw·xq < 2^63 — beyond ~1e18 quantized mass per
  * replicate (far past any single-statistic use), widen the buffer to
  * decimal. */
object Bootstrap {

  /** weight k iff u15 < T(k), k = 0..6; else 7.
    * T(k) = floor(cumPoisson1(k)·32768) + 1. */
  private val thresholds15 =
    Array(12055L, 24110L, 30137L, 32146L, 32649L, 32749L, 32766L)

  /** Similarity.lcg's exact JVM mirror. */
  private def lcg(k: Long): Long = {
    val m = 2147483648L
    (1103515245L * (((k % m) + m) % m) + 12345L) % m
  }

  private def weight(u15: Long): Long = {
    var k = 0
    while (k < 7 && u15 >= thresholds15(k)) k += 1
    k.toLong
  }

  private class RepAgg(b: Int)
      extends Aggregator[(Long, Long), Array[Long], Array[Long]] {
    def zero: Array[Long] = new Array[Long](2 * b)
    def reduce(buf: Array[Long], row: (Long, Long)): Array[Long] = {
      val (id, xq) = row
      var rep = 0
      while (rep < b) {
        val w = weight(lcg(id * b + rep) >> 16)
        buf(rep) += w * xq
        buf(b + rep) += w
        rep += 1
      }
      buf
    }
    def merge(a: Array[Long], c: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += c(i); i += 1 }
      a
    }
    def finish(r: Array[Long]): Array[Long] = r
    def bufferEncoder = org.apache.spark.sql.Encoders.kryo[Array[Long]]
    def outputEncoder = org.apache.spark.sql.Encoders.kryo[Array[Long]]
  }

  /** 95% CI for the mean of `valueCol`: one row
    * (n, mean, ci_lo, ci_hi) — ci bounds are the 2nd-smallest and
    * (B−1)-th replicate means (the standard percentile bootstrap at
    * B = 64). `idCol` must be a stable numeric row id. */
  def meanCi(df: DataFrame, idCol: String, valueCol: String,
             b: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val x = col(valueCol).cast("double")
    val pre = df.select(col(idCol).cast("long").as("_1"),
                        round(x * lit(1e6), 0).cast("long").as("_2"))
      .as[(Long, Long)]
    val sums = pre.select(new RepAgg(b).toColumn).head()
    val ms = (0 until b).map { rep =>
      (round9(sums(rep).toDouble / 1e6 / sums(b + rep).toDouble), rep)
    }.sorted
    val ciLo = round6(ms(1)._1)
    val ciHi = round6(ms(b - 2)._1)
    val base = df.agg(
        count(lit(1)).as("n"),
        sum(round(x * lit(1e6), 0).cast("decimal(19,0)"))
          .cast("decimal(38,0)").as("__sx"))
      .head()
    val n = base.getAs[Long]("n")
    val mean = round6(
      base.getAs[java.math.BigDecimal]("__sx").doubleValue() / 1e6 / n)
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(n, mean, ciLo, ciHi)), 1),
      StructType(Seq(
        StructField("n", LongType, nullable = false),
        StructField("mean", DoubleType, nullable = false),
        StructField("ci_lo", DoubleType, nullable = false),
        StructField("ci_hi", DoubleType, nullable = false))))
  }
}
