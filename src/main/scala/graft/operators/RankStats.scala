package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Rank-based (distribution-free) statistics at corpus scale: the
  * robust cousins of Pearson/t-test/parametric drift checks a
  * curation pipeline reaches for when values are heavy-tailed
  * (token counts, prices, latencies) — Spearman's ρ, the
  * Mann-Whitney U test, and the two-sample Kolmogorov–Smirnov
  * statistic.
  *
  * All three reduce to the same scale shape: fold the corpus ONCE
  * into a per-distinct-value count frame (value cardinality, the
  * [[Eval.auc]] precedent), run the ordered pass over that frame with
  * [[OrderedStats.cumsumExclusive]] (two-phase bucketed prefix sum —
  * NO single-partition window), and compute the statistic from exact
  * integer/decimal arithmetic: tie-averaged ranks are half-integers
  * (2·rank is an exact BIGINT), KS distances compare as the integer
  * cross-products |cum1·n2 − cum2·n1|, and only the final statistic
  * touches doubles (identical expression order on both engines).
  */
object RankStats {

  /** Per-distinct-value tie-averaged (midrank) frame for `valueCol`
    * (6-dp-quantized): (v, cnt, avg_rank) where avg_rank = #below +
    * (cnt+1)/2 — a half-integer, exact in double. */
  private[graft] def midranks(df: DataFrame, valueCol: String): DataFrame = {
    val counts = df
      .select(round(col(valueCol).cast("double"), 6).as("v"))
      .filter(col("v").isNotNull)
      .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
    OrderedStats.cumsumExclusive(counts, sortCol = "v", tieCols = Seq(),
        valueCol = "cnt", outCol = "below")
      .select(col("v"), col("cnt"),
              (col("below") + (col("cnt") + lit(1L)) / lit(2.0))
                .as("avg_rank"))
  }

  /** Spearman rank correlation of two columns. Returns 1 row:
    * (n, rho) with ρ = Pearson over midranks, rounded to 6. Sums of
    * ranks and rank products are exact decimals (ranks are
    * half-integers), so ρ is engine-portable bit-for-bit. */
  def spearman(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val rows = df.select(
        round(col(xCol).cast("double"), 6).as("vx"),
        round(col(yCol).cast("double"), 6).as("vy"))
      .filter(col("vx").isNotNull && col("vy").isNotNull)
    val rx = midranks(rows, "vx")
      .select(col("v").as("vx"), col("avg_rank").as("rx"))
    val ry = midranks(rows, "vy")
      .select(col("v").as("vy"), col("avg_rank").as("ry"))
    // (18,1) factors: ranks fit to 10¹⁷ rows, and the (37,2) product
    // type is representable on BOTH engines (DuckDB errors out past
    // width 38 on multiply, so wider factor types are NOT portable)
    def dec(c: Column) = c.cast(DecimalType(18, 1))
    val m = rows.join(rx, Seq("vx")).join(ry, Seq("vy"))
      .agg(count(lit(1)).cast("double").as("n"),
           sum(dec(col("rx"))).cast("double").as("sx"),
           sum(dec(col("ry"))).cast("double").as("sy"),
           sum(dec(col("rx")) * dec(col("rx"))).cast("double").as("sxx"),
           sum(dec(col("ry")) * dec(col("ry"))).cast("double").as("syy"),
           sum(dec(col("rx")) * dec(col("ry"))).cast("double").as("sxy"))
    m.select(col("n").cast("long").as("n"),
      round((col("n") * col("sxy") - col("sx") * col("sy")) /
        sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
             (col("n") * col("syy") - col("sy") * col("sy"))), 6).as("rho"))
  }

  /** Mann-Whitney U test: is `valueCol` stochastically larger where
    * `group` holds? Returns 1 row: (n1, n2, u1, u2, z) — U for the
    * group (u1) and its complement (u2, = n1·n2 − u1), and the
    * tie-corrected normal approximation z, rounded to 6. The rank sum
    * folds over the pooled midrank frame (group counts per distinct
    * value — one ordered pass, no row-level ranking). */
  def mannWhitney(df: DataFrame, valueCol: String,
                  group: Column): DataFrame = {
    val vals = df
      .select(round(col(valueCol).cast("double"), 6).as("v"),
              when(group, 1L).otherwise(0L).as("g"))
      .filter(col("v").isNotNull)
    val counts = vals.groupBy(col("v"))
      .agg(count(lit(1)).as("cnt"), sum(col("g")).as("c1"))
    val ranked = OrderedStats.cumsumExclusive(counts, sortCol = "v",
      tieCols = Seq(), valueCol = "cnt", outCol = "below")
    // 2·rank-sum of group 1 stays integral: Σ c1·(2·below + cnt + 1).
    // Terms go through DECIMAL(38,0) BEFORE multiply/sum — a long
    // accumulator would throw ANSI overflow at ~10⁹ rows (rank ×
    // count products reach 10¹⁸ per term; t³ alone reaches 10²⁷).
    def d38(c: Column) = c.cast(DecimalType(38, 0))
    val m = ranked.agg(
      sum(col("c1")).as("n1"),
      sum(col("cnt") - col("c1")).as("n2"),
      sum(d38(col("c1")) * (d38(col("below")) * 2 + d38(col("cnt")) + 1))
        .cast("double").as("r1x2"),
      // tie correction: Σ (t³ − t) over tie groups
      sum(d38(col("cnt")) * d38(col("cnt")) * d38(col("cnt")) -
          d38(col("cnt"))).cast("double").as("ties"))
    m.select(col("n1"), col("n2"),
        (col("r1x2") / 2.0 - col("n1").cast("double") *
          (col("n1").cast("double") + 1.0) / 2.0).as("u1"),
        col("ties"))
      .select(col("n1"), col("n2"), col("u1"),
        (col("n1").cast("double") * col("n2").cast("double") - col("u1"))
          .as("u2"), col("ties"),
        (col("n1") + col("n2")).cast("double").as("nn"))
      .select(col("n1"), col("n2"),
        round(col("u1"), 1).as("u1"), round(col("u2"), 1).as("u2"),
        round((col("u1") - col("n1").cast("double") *
            col("n2").cast("double") / 2.0) /
          sqrt(col("n1").cast("double") * col("n2").cast("double") / 12.0 *
            ((col("nn") + 1.0) -
              col("ties") / (col("nn") * (col("nn") - 1.0)))), 6).as("z"))
  }

  /** Two-sample Kolmogorov–Smirnov: D = max |F₁(v) − F₂(v)| over the
    * pooled support. Returns 1 row: (n1, n2, d_num, ks) where d_num =
    * max |cum1·n2 − cum2·n1| is the EXACT integer numerator (the
    * whole ordered pass never touches floats) and ks = d_num/(n1·n2)
    * rounded to 6. */
  def ksTwoSample(df: DataFrame, valueCol: String,
                  group: Column): DataFrame = {
    val vals = df
      .select(round(col(valueCol).cast("double"), 6).as("v"),
              when(group, 1L).otherwise(0L).as("g"))
      .filter(col("v").isNotNull)
    val counts = vals.groupBy(col("v"))
      .agg(sum(col("g")).as("c1"), sum(lit(1L) - col("g")).as("c2"))
    val r1 = OrderedStats.cumsumExclusive(counts, sortCol = "v",
      tieCols = Seq(), valueCol = "c1", outCol = "below1")
    val r2 = OrderedStats.cumsumExclusive(r1, sortCol = "v",
      tieCols = Seq(), valueCol = "c2", outCol = "below2")
    val tot = counts.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    // cross-products in DECIMAL(38,0): cum·n reaches 10¹⁸ at 10⁹ rows
    // per side, the edge of a long under ANSI
    def d38(c: Column) = c.cast(DecimalType(38, 0))
    r2.crossJoin(broadcast(tot))
      .select(col("n1"), col("n2"),
        abs((d38(col("below1")) + d38(col("c1"))) * d38(col("n2")) -
            (d38(col("below2")) + d38(col("c2"))) * d38(col("n1")))
          .as("__d"))
      .groupBy(col("n1"), col("n2"))
      .agg(max(col("__d")).cast("long").as("d_num"))
      .select(col("n1"), col("n2"), col("d_num"),
        round(col("d_num").cast("double") /
          (col("n1").cast("double") * col("n2").cast("double")), 6).as("ks"))
  }
}
