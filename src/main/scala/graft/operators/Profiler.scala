package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType, TimestampNTZType, TimestampType}

/** Column profiler — the data-profiling utility a 100 TB pipeline
  * runs before trusting a new table: per column, the non-null count,
  * distinct count, and min/max (numerics and timestamps as doubles —
  * timestamps via epoch seconds, so the numeric column is uniform;
  * strings as strings; other types count only).
  *
  * Shape: the count/min/max statistics ride ONE aggregation pass with
  * map-side combine (a single wide row, pivoted to long form with a
  * driver-free `stack`). Exact distinct counts deliberately do NOT
  * use k-way `count_distinct` in that same agg — Spark plans that as
  * an Expand (input × #columns) feeding one giant multi-distinct hash
  * aggregate that barely combines map-side (measured 33.9 s on
  * sf0.1 lineitem). Instead the table melts to (column-index, value)
  * pairs which PARTIALLY AGGREGATE map-side (a 3-value flag column
  * reduces to 3 pairs per partition immediately), then counts per
  * column — measured 33.9 s → 3.2 s (10.5×) on the same input and
  * machine, same exact semantics
  * (values compare via their canonical string image, injective for
  * the atomic types profiled). At 100 TB pass `exact = false`:
  * distinct switches to `approx_count_distinct` inside the single
  * agg pass and the melt disappears entirely (HLL sketches merge
  * map-side).
  */
object Profiler {

  def profile(df: DataFrame, exact: Boolean = true): DataFrame = {
    val fields = df.schema.fields
    require(fields.nonEmpty, "profile of a zero-column frame")
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      val numC = f.dataType match {
        case _: NumericType | _: TimestampType => c.cast("double")
        // NTZ has no double cast; route through a session-tz timestamp
        // (epoch seconds — callers run UTC sessions, as Verify/Bench do)
        case _: TimestampNTZType => c.cast("timestamp").cast("double")
        case _ => lit(null).cast("double")
      }
      val strC = f.dataType match {
        case StringType => c
        case _ => lit(null).cast("string")
      }
      val base = Seq(
        count(c).as(s"${f.name}#nn"),
        min(numC).as(s"${f.name}#mnn"), max(numC).as(s"${f.name}#mxn"),
        min(strC).as(s"${f.name}#mns"), max(strC).as(s"${f.name}#mxs"))
      if (exact) base
      else base :+ approx_count_distinct(c).as(s"${f.name}#nd")
    }
    val one = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*)
    val stackArgs = fields.zipWithIndex.map { case (f, i) =>
      val nd = if (exact) "CAST(NULL AS BIGINT)" else s"`${f.name}#nd`"
      s"$i, '${f.name}', `${f.name}#nn`, $nd, `${f.name}#mnn`, " +
        s"`${f.name}#mxn`, `${f.name}#mns`, `${f.name}#mxs`"
    }.mkString(", ")
    val long = one.selectExpr(
      s"stack(${fields.length}, $stackArgs) AS " +
        "(__i, column, n_nonnull, n_distinct, min_num, max_num, min_str, max_str)")

    if (!exact) long.drop("__i")
    else {
      val images = fields.toIndexedSeq.map(f => col(f.name).cast("string"))
      val nd = df
        .select(posexplode(array(images: _*)).as(Seq("__i", "__v")))
        .filter(col("__v").isNotNull)
        .groupBy(col("__i"), col("__v")).agg(lit(1))
        .groupBy(col("__i")).agg(count(lit(1)).as("__nd"))
      long.drop("n_distinct")
        .join(nd, Seq("__i"), "left")
        .select(col("column"), col("n_nonnull"),
                coalesce(col("__nd"), lit(0L)).as("n_distinct"),
                col("min_num"), col("max_num"), col("min_str"),
                col("max_str"))
    }
  }

  /** Two-version data-contract diff — "did this refresh change the
    * table's shape": [[profile]] both versions, join per column, and
    * emit count/distinct deltas plus a `range_drift` flag (any
    * min/max moved, null-safely compared so a string column's NULL
    * numeric stats don't read as drift). FULL OUTER on the column
    * name, so added/dropped columns surface as one-sided rows rather
    * than vanishing. Cost: the two profile passes; the diff itself
    * is a #columns-sized join. */
  def diff(a: DataFrame, b: DataFrame, exact: Boolean = true): DataFrame = {
    def side(df: DataFrame, sfx: String) =
      profile(df, exact).select(col("column"),
        col("n_nonnull").as(s"n_$sfx"), col("n_distinct").as(s"nd_$sfx"),
        col("min_num").as(s"min_num_$sfx"), col("max_num").as(s"max_num_$sfx"),
        col("min_str").as(s"min_str_$sfx"), col("max_str").as(s"max_str_$sfx"))
    side(a, "a").join(side(b, "b"), Seq("column"), "full_outer")
      .select(col("column"),
        col("n_a"), col("n_b"), (col("n_b") - col("n_a")).as("delta_nonnull"),
        col("nd_a"), col("nd_b"),
        (col("nd_b") - col("nd_a")).as("delta_distinct"),
        (!(col("min_num_a") <=> col("min_num_b") &&
           col("max_num_a") <=> col("max_num_b") &&
           col("min_str_a") <=> col("min_str_b") &&
           col("max_str_a") <=> col("max_str_b"))).as("range_drift"))
  }

  /** Exact Pearson correlation matrix over the given numeric columns
    * (upper triangle, one row per pair). All O(k²) sufficient
    * statistics — Σx, Σx², Σxy — ride ONE aggregation pass with
    * map-side combine (a single wide row; the table is scanned once
    * regardless of how many pairs are requested), then the closed
    * form evaluates in a driver-free projection of that row.
    *
    * Portability: Pearson is invariant under affine scaling, so inputs
    * quantize to INTEGERS (value·10^scale, exact when the data has ≤
    * `scale` decimal places) and every sum is EXACT integer arithmetic
    * — partitioning-independent, engine-independent. `corr()`
    * built-ins accumulate in floats whose value depends on partition
    * order, which can never hash-match across engines. The closed
    * form runs in doubles with a fixed operation order:
    * (n·Σxy − Σx·Σy) / (√(n·Σx²−Σx²̄) · √(n·Σy²−Σy²̄)), rounded to 6.
    * Rows with a NULL in any profiled column are excluded up front so
    * all statistics cover the same row set. */
  def corrMatrix(df: DataFrame, cols: Seq[String],
                 scale: Int = 2): DataFrame =
    // spread HERE, not in corrStats: the incremental path (q128) calls
    // corrStats once per small batch and an exchange per batch nets
    // negative; the monolithic matrix is one CPU-bound pass
    // (Tables.spreadSmall; q124 3.4 s -> 1.4 s measured r15)
    corrFromStats(corrStats(graft.Tables.spreadSmall(df), cols, scale), cols)

  private def corrPairs(cols: Seq[String]): Seq[(String, String)] =
    for { i <- cols.indices; j <- cols.indices if i < j }
      yield (cols(i), cols(j))

  /** The MERGEABLE sufficient-statistic state behind [[corrMatrix]]:
    * one row of exact DECIMAL sums (n, Σx, Σx², Σxy per pair). Sums
    * stay decimal — never double — so states from disjoint batches
    * merge EXACTLY by addition ([[corrMergeStats]]): the incremental
    * maintenance contract (q72's story for second moments). */
  def corrStats(df: DataFrame, cols: Seq[String], scale: Int = 2): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val mult = math.pow(10, scale)
    // Quantized values stay decimal(19,0) so pairwise PRODUCTS fit
    // decimal(38,0) exactly. The cast NULLs on overflow (non-ANSI) and
    // sum() would silently drop the row while __n still counts it —
    // so any overflow (or NaN/Inf, which also casts to NULL; genuine
    // NULLs are filtered up front) raises loudly instead.
    val dec = (c: String) => {
      val q = round(col(c).cast("double") * lit(mult), 0).cast("decimal(19,0)")
      coalesce(q, raise_error(concat(
        lit(s"corrStats: $c * 10^$scale exceeds decimal(19,0): "),
        col(c).cast("string"))).cast("decimal(19,0)"))
    }
    val complete = df.filter(cols.map(col(_).isNotNull).reduce(_ && _))
    val aggs =
      cols.map(c => sum(dec(c)).cast("decimal(38,0)").as(s"__s_$c")) ++
      cols.map(c => sum(dec(c) * dec(c)).cast("decimal(38,0)").as(s"__ss_$c")) ++
      corrPairs(cols).map { case (a, b) =>
        sum(dec(a) * dec(b)).cast("decimal(38,0)").as(s"__sp_${a}__$b") }
    val allAggs = count(lit(1)).as("__n") +: aggs
    complete.agg(allAggs.head, allAggs.tail: _*)
  }

  /** Exact merge of two disjoint batches' [[corrStats]] rows: every
    * statistic is a plain decimal sum, so union + re-sum IS the state
    * of the concatenated data — no rescan of history. */
  def corrMergeStats(a: DataFrame, b: DataFrame): DataFrame = {
    val sums = a.columns.filterNot(_ == "__n")
      .map(c => sum(col(c)).cast("decimal(38,0)").as(c))
    val allAggs = sum(col("__n")).cast("long").as("__n") +: sums.toSeq
    a.unionByName(b).agg(allAggs.head, allAggs.tail: _*)
  }

  /** Closed-form Pearson from a [[corrStats]] row; doubles enter only
    * here, with a fixed operation order. */
  def corrFromStats(stats: DataFrame, cols: Seq[String]): DataFrame = {
    val d = (c: String) => col(c).cast("double")
    val rows = corrPairs(cols).map { case (a, b) =>
      val n = d("__n")
      val num = n * d(s"__sp_${a}__$b") - d(s"__s_$a") * d(s"__s_$b")
      val den = sqrt(n * d(s"__ss_$a") - d(s"__s_$a") * d(s"__s_$a")) *
                sqrt(n * d(s"__ss_$b") - d(s"__s_$b") * d(s"__s_$b"))
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
             round(num / den, 6).as("corr"))
    }
    stats.select(col("__n").cast("long").as("n"),
                 explode(array(rows: _*)).as("__p"))
      .select(col("__p.col_a"), col("__p.col_b"), col("n"), col("__p.corr"))
  }
  /** Benford first-digit audit — the classic fabricated-numbers /
    * broken-ETL smell test over any positive magnitude column
    * (amounts, counts, durations): natural multiplicative data puts
    * digit d first with probability log10(1 + 1/d); uniform or
    * truncated data does not. One map-side-combined 9-row
    * aggregation; the leading digit comes from the DECIMAL string
    * form (engine-portable — no log10-at-power-boundary hazard), and
    * rows with value < 1 are excluded (their leading digit is scale,
    * not signal). Returns one row per digit 1..9:
    * (digit, n, obs_share, benford_share, abs_dev). */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val digits = firstDigitCounts(df, valueCol)
    val tot = digits.agg(sum(col("n")).as("__tot"))
    digits.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") / col("__tot").cast("double"), 6)
          .as("obs_share"),
        round(log(10.0, lit(1.0) + lit(1.0) / col("digit")), 6)
          .as("benford_share"))
      .withColumn("abs_dev",
        round(abs(col("obs_share") - col("benford_share")), 6))
  }

  /** The mergeable core of [[benfordAudit]]: (digit, n) counts —
    * integers, so batch frames sum losslessly into a running state
    * (the streaming monitor's unit, [[graft.streaming
    * .StreamingBenford]]). */
  def firstDigitCounts(df: DataFrame, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    df.filter(v >= 1.0)
      .select(substring(round(v, 2).cast("decimal(30,2)").cast("string"),
                        1, 1).cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
  }

  /** Partial correlation r_xy·z — the dependence between x and y with
    * the common driver z held fixed (the confounder check run before
    * trusting a q124 correlation): r_xy·z = (r_xy − r_xz·r_yz) /
    * √((1 − r_xz²)(1 − r_yz²)). All three Pearson terms come from ONE
    * map-side-combined pass of exact micro-unit moments (the
    * Regression pattern); the closed form runs on the 1-row frame in
    * a fixed operation order. Returns 1 row:
    * (n, r_xy, r_xz, r_yz, r_xy_z), rounded to 6. */
  def partialCorr(df: DataFrame, xCol: String, yCol: String,
                  zCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def q(c: String) = round(col(c).cast("double") * 1000000.0, 0)
      .cast(DecimalType(19, 0))
    // spread: same decimal-moment shape as corrStats (q208 1.8 -> 0.8)
    val d = graft.Tables.spreadSmall(df)
      .filter(col(xCol).isNotNull && col(yCol).isNotNull &&
        col(zCol).isNotNull)
      .select(q(xCol).as("x"), q(yCol).as("y"), q(zCol).as("z"))
    val m = d.agg(
      count(lit(1)).cast("double").as("n"),
      (sum(col("x")).cast("double") / 1.0e6).as("sx"),
      (sum(col("y")).cast("double") / 1.0e6).as("sy"),
      (sum(col("z")).cast("double") / 1.0e6).as("sz"),
      (sum(col("x") * col("x")).cast("double") / 1.0e12).as("sxx"),
      (sum(col("y") * col("y")).cast("double") / 1.0e12).as("syy"),
      (sum(col("z") * col("z")).cast("double") / 1.0e12).as("szz"),
      (sum(col("x") * col("y")).cast("double") / 1.0e12).as("sxy"),
      (sum(col("x") * col("z")).cast("double") / 1.0e12).as("sxz"),
      (sum(col("y") * col("z")).cast("double") / 1.0e12).as("syz"))
    m.select(col("n").cast("long").as("n"),
        expr("(n*sxy - sx*sy) / sqrt((n*sxx - sx*sx)*(n*syy - sy*sy))")
          .as("rxy"),
        expr("(n*sxz - sx*sz) / sqrt((n*sxx - sx*sx)*(n*szz - sz*sz))")
          .as("rxz"),
        expr("(n*syz - sy*sz) / sqrt((n*syy - sy*sy)*(n*szz - sz*sz))")
          .as("ryz"))
      .select(col("n"),
        round(col("rxy"), 6).as("r_xy"), round(col("rxz"), 6).as("r_xz"),
        round(col("ryz"), 6).as("r_yz"),
        round(expr(
          "(rxy - rxz*ryz) / sqrt((1 - rxz*rxz)*(1 - ryz*ryz))"), 6)
          .as("r_xy_z"))
  }

}
