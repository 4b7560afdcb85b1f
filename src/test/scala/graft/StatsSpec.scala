package graft

import org.apache.spark.sql.functions._

import graft.operators.{Forecast, Profiler, RankStats, Regression, Skew,
  TargetEncode}

/** Hand-case semantics for the round-7 statistics family (q191–q200):
  * the oracle gate proves engine equivalence; these prove the numbers
  * are the intended ones. */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("olsTwoFeature: exact plane y = 2 + 3*x1 - x2 -> coefficients, r2 = 1") {
    val rows = for (x1 <- 0 to 5; x2 <- 0 to 5)
      yield (2.0 + 3.0 * x1 - x2, x1.toDouble, x2.toDouble)
    val r = Regression.olsTwoFeature(rows.toDF("y", "x1", "x2"),
      "y", "x1", "x2").head()
    assert(r.getAs[Long]("n") == 36L)
    assert(math.abs(r.getAs[Double]("b0") - 2.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("b1") - 3.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("b2") + 1.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("r2") - 1.0) < 1e-6)
  }

  test("logitBinned: separated classes learn a positive slope; mean matches base rate") {
    // x < 0.5 never positive, x > 0.5 always positive
    val rows = (1 to 200).map { i =>
      val x = (i % 100) / 100.0
      (x, x >= 0.5)
    }
    val r = Regression.logitBinned(rows.toDF("x", "y"), "x", col("y"),
      lo = 0.0, hi = 1.0, nBins = 16, lr = 2.0, iters = 50).head()
    assert(r.getAs[Long]("n") == 200L)
    assert(r.getAs[Double]("w1") > 1.0, "slope must point toward the positives")
    assert(r.getAs[Double]("loglik") < 0.0)
  }

  test("spearman: perfect monotone (nonlinear) -> rho 1; reversed -> -1") {
    val mono = (1 to 20).map(i => (i.toDouble, math.pow(i.toDouble, 3)))
    val r1 = RankStats.spearman(mono.toDF("x", "y"), "x", "y").head()
    assert(r1.getAs[Double]("rho") == 1.0)
    val rev = (1 to 20).map(i => (i.toDouble, -math.pow(i.toDouble, 3)))
    val r2 = RankStats.spearman(rev.toDF("x", "y"), "x", "y").head()
    assert(r2.getAs[Double]("rho") == -1.0)
  }

  test("mannWhitney: textbook ranks with ties") {
    // group A = {1, 2, 2}, group B = {2, 3}: midranks 1, 3, 3, 3, 5
    // R_A = 7 -> U_A = 7 - 3*4/2 = 1, U_B = 3*2 - 1 = 5
    val df = Seq((1.0, true), (2.0, true), (2.0, true),
                 (2.0, false), (3.0, false)).toDF("v", "g")
    val r = RankStats.mannWhitney(df, "v", col("g")).head()
    assert(r.getAs[Long]("n1") == 3L && r.getAs[Long]("n2") == 2L)
    assert(r.getAs[Double]("u1") == 1.0)
    assert(r.getAs[Double]("u2") == 5.0)
    assert(r.getAs[Double]("z") < 0.0) // group A stochastically smaller
  }

  test("ksTwoSample: disjoint supports -> D = 1; identical -> D = 0") {
    val disjoint = ((1 to 10).map(i => (i.toDouble, true)) ++
      (11 to 20).map(i => (i.toDouble, false))).toDF("v", "g")
    val r1 = RankStats.ksTwoSample(disjoint, "v", col("g")).head()
    assert(r1.getAs[Double]("ks") == 1.0)
    assert(r1.getAs[Long]("d_num") == 100L) // n1*n2 at the split point
    val same = ((1 to 10) ++ (1 to 10)).zipWithIndex
      .map { case (v, i) => (v.toDouble, i < 10) }.toDF("v", "g")
    val r2 = RankStats.ksTwoSample(same, "v", col("g")).head()
    assert(r2.getAs[Double]("ks") == 0.0)
  }

  test("benfordAudit: exact-Benford digit histogram scores near-zero deviation") {
    // 1000 values whose first-digit counts follow round(1000*log10(1+1/d))
    val counts = (1 to 9).map(d =>
      d -> math.round(1000 * math.log10(1.0 + 1.0 / d)).toInt)
    val vals = counts.flatMap { case (d, n) =>
      (0 until n).map(i => d * 100.0 + (i % 100)) } // keeps first digit d
    val out = Profiler.benfordAudit(vals.toDF("v"), "v")
      .collect().map(r => r.getInt(0) -> r.getAs[Double]("abs_dev")).toMap
    assert(out.size == 9)
    assert(out.values.max < 0.001, s"deviation too high: $out")
  }

  test("dailyAcf: alternating daily counts -> acf(1) = -1, acf(2) = +1") {
    val days = (0 until 40).flatMap { d =>
      val date = java.sql.Date.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(d))
      Seq.fill(if (d % 2 == 0) 3 else 1)(Tuple1(date))
    }
    val out = Forecast.dailyAcf(days.toDF("d"), "d", maxLag = 2)
      .collect().map(r => r.getInt(0) -> r.getAs[Double]("acf")).toMap
    // finite-sample edge terms shift the exact ±1 slightly
    assert(out(1) < -0.9, s"lag-1 should be strongly negative: $out")
    assert(out(2) > 0.9, s"lag-2 should be strongly positive: $out")
  }

  test("hillTailIndex: exact pareto counts recover alpha") {
    // f(rank r) = floor(1e6 / r^2): tail index alpha = 0.5 in the
    // Hill parametrization over frequencies (alpha_freq = 1/slope)
    val counts = (1 to 300).map(r => (s"t$r", (1e6 / (r * r)).toLong))
    val out = Skew.hillTailIndex(counts.toDF("w", "f"), "f", "w", k = 100)
      .head()
    assert(out.getAs[Long]("k") == 100L)
    val alpha = out.getAs[Double]("alpha")
    assert(alpha > 0.4 && alpha < 0.6, s"alpha=$alpha")
  }

  test("ridgeTwoFeature: lambda 0 equals OLS; large lambda shrinks slopes") {
    val rows = for (x1 <- 0 to 5; x2 <- 0 to 5)
      yield (2.0 + 3.0 * x1 - x2, x1.toDouble, x2.toDouble)
    val df = rows.toDF("y", "x1", "x2")
    val r0 = Regression.ridgeTwoFeature(df, "y", "x1", "x2", 0.0).head()
    assert(math.abs(r0.getAs[Double]("b1") - 3.0) < 1e-6)
    assert(math.abs(r0.getAs[Double]("r2") - 1.0) < 1e-6)
    val rBig = Regression.ridgeTwoFeature(df, "y", "x1", "x2", 1e6).head()
    assert(math.abs(rBig.getAs[Double]("b1")) < 0.2, "slope must shrink")
    assert(rBig.getAs[Double]("r2") < r0.getAs[Double]("r2"))
  }

  test("cvOls: exact plane -> every fold recovers it with rmse 0") {
    val rows = (0 until 60).map { i =>
      val x1 = (i % 7).toDouble; val x2 = (i % 5).toDouble
      (i.toLong, 2.0 + 3.0 * x1 - x2, x1, x2)
    }
    val out = Regression.cvOls(rows.toDF("id", "y", "x1", "x2"),
      "id", "y", "x1", "x2", k = 3).collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getAs[Long]("n_train") + r.getAs[Long]("n_test") == 60L)
      assert(math.abs(r.getAs[Double]("b1") - 3.0) < 1e-5)
      assert(r.getAs[Double]("rmse") < 1e-5)
    }
  }

  test("permutationTest: strong real effect -> small p; label-independent data -> large p") {
    val effect = (0 until 200).map(i => (i.toLong,
      if (i < 100) 10.0 + i % 3 else 50.0 + i % 3, i < 100))
    val r1 = graft.operators.AbTest.permutationTest(
      effect.toDF("id", "v", "g"), "id", "v", col("g"), b = 64).head()
    assert(r1.getAs[Double]("p_value") <= 0.02) // 1/65: no replicate beats it
    assert(r1.getAs[Long]("n_valid") == 64L)
    val noise = (0 until 200).map(i => (i.toLong, (i % 7).toDouble, i % 2 == 0))
    val r2 = graft.operators.AbTest.permutationTest(
      noise.toDF("id", "v", "g"), "id", "v", col("g"), b = 64).head()
    assert(r2.getAs[Double]("p_value") > 0.1)
  }

  test("hits: star graph — spokes are hubs, the center is the authority") {
    val edges = (1L to 5L).map(i => (i, 100L)).toDF("src", "dst")
    val out = graft.operators.Graph.hits(edges, "src", "dst", 2)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Double]("hub"), r.getAs[Double]("authority"))).toMap
    assert(out(100L)._2 == 1.0) // sole authority, max-normalized
    assert(out(100L)._1 == 0.0) // no out-edges
    (1L to 5L).foreach { i =>
      assert(out(i)._1 == 1.0, s"spoke $i must be a max hub")
      assert(out(i)._2 == 0.0)
    }
  }

  test("olsInfluence: a high-leverage wrong-y point tops Cook's distance") {
    // 20 near-perfect points on y = 1 + 2*x1 + 0*x2, plus one point
    // far out in x1 with a badly wrong y — textbook influence
    val base = (0 until 20).map(i =>
      (i.toLong, 1.0 + 2.0 * i + (i % 3) * 0.01, i.toDouble, (i % 4).toDouble))
    val outlier = Seq((99L, 500.0, 100.0, 1.0)) // true y would be 201
    val out = Regression.olsInfluence(
      (base ++ outlier).toDF("id", "y", "x1", "x2"),
      "id", "y", "x1", "x2", topK = 3).collect()
    assert(out.head.getAs[Long]("rid") == 99L,
      s"outlier must rank first: ${out.toSeq}")
    assert(out.head.getAs[Double]("cooks_d") >
      out(1).getAs[Double]("cooks_d") * 10)
    assert(out.head.getAs[Double]("leverage") > 0.5)
  }

  test("pairRules: hand-counted support, confidence and lift") {
    val baskets = Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "C"), (4L, "B"), (1L, "A") /* dup presence */)
      .toDF("bk", "it")
    val out = graft.operators.Association.pairRules(baskets, "bk", "it", 1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ab = out(("A", "B"))
    assert(ab.getAs[Long]("n_ab") == 2L)
    assert(ab.getAs[Double]("support") == 0.5) // 2 of 4 baskets
    assert(math.abs(ab.getAs[Double]("conf_a_b") - 2.0 / 3) < 1e-6)
    assert(math.abs(ab.getAs[Double]("lift") - 8.0 / 9) < 1e-6)
    assert(out(("A", "C")).getAs[Long]("n_ab") == 1L)
    assert(!out.contains(("B", "C")))
  }

  test("partialCorr: y = x + z with x ⟂ z -> partial correlation exactly 1") {
    val rows = (0 until 25).map { i =>
      val x = (i % 5).toDouble; val z = (i / 5).toDouble
      (x, x + z, z)
    }
    val r = graft.operators.Profiler.partialCorr(rows.toDF("x", "y", "z"),
      "x", "y", "z").head()
    assert(r.getAs[Double]("r_xz") == 0.0)
    assert(math.abs(r.getAs[Double]("r_xy") - 1.0 / math.sqrt(2)) < 1e-4)
    assert(math.abs(r.getAs[Double]("r_xy_z") - 1.0) < 1e-6)
  }

  test("levene: zero within-spread -> NULL (0/0); an inflated group -> W > 0") {
    // every |deviation| is exactly 1 in both groups: within-SS = 0,
    // the 0/0 degenerate case -> NULL, never an ANSI divide error
    val same = Seq(("a", 1.0), ("a", 3.0), ("b", 11.0), ("b", 13.0))
    val r1 = graft.operators.AbTest.leveneMeanCentered(
      same.toDF("g", "v"), "v", "g").head()
    assert(r1.isNullAt(r1.fieldIndex("w")))
    // break the degeneracy inside group a and inflate group c's spread
    val spread = Seq(("a", 1.0), ("a", 3.0), ("a", 2.2),
      ("b", 11.0), ("b", 13.0), ("c", 20.0), ("c", 26.0))
    val r2 = graft.operators.AbTest.leveneMeanCentered(
      spread.toDF("g", "v"), "v", "g").head()
    assert(r2.getAs[Long]("k") == 3L)
    assert(r2.getAs[Double]("w") > 0.0)
  }

  test("kendallTauB: hand-counted concordance with and without ties") {
    val plain = Seq((1.0, 1.0), (2.0, 3.0), (3.0, 2.0)).toDF("x", "y")
    val r1 = graft.operators.RankStats.kendallTauB(plain, "x", "y").head()
    assert(r1.getAs[Long]("n_c") == 2L && r1.getAs[Long]("n_d") == 1L)
    assert(math.abs(r1.getAs[Double]("tau_b") - 1.0 / 3) < 1e-6)
    // x-tie: pairs inside the tie drop from the denominator
    val tied = Seq((1.0, 1.0), (1.0, 2.0), (2.0, 3.0)).toDF("x", "y")
    val r2 = graft.operators.RankStats.kendallTauB(tied, "x", "y").head()
    assert(r2.getAs[Long]("n_c") == 2L && r2.getAs[Long]("n_d") == 0L)
    assert(math.abs(r2.getAs[Double]("tau_b") - 2.0 / math.sqrt(6.0)) < 1e-6)
    val e = intercept[IllegalArgumentException] {
      graft.operators.RankStats.kendallTauB(plain, "x", "y", maxCells = 1)
    }
    assert(e.getMessage.contains("maxCells"))
  }

  test("resizeBilinear: identity resize is exact; 2x2 -> 1x1 averages") {
    import graft.llm.Multimodal
    val plane = Array[Float](
      10, 20, 30, 50, 60, 70, // row 0: two RGB pixels
      90, 100, 110, 130, 140, 150) // row 1
    val same = Multimodal.resizeBilinear(plane, 2, 2, 2, 2)
    assert(same.toSeq == plane.toSeq) // half-pixel centers map exactly
    val one = Multimodal.resizeBilinear(plane, 2, 2, 1, 1)
    assert(one.toSeq == Seq(70.0f, 80.0f, 90.0f)) // per-channel mean
  }

  test("spectralEnergies: DC bin = sample sum; a pure tone concentrates at its bin") {
    import graft.llm.Multimodal
    val const = Array.fill(64)(5.0f)
    val dc = Multimodal.spectralEnergies(
      Seq((1L, const)).toDF("id", "features"), "id", "features", Seq(0, 1))
      .collect().map(r => r.getInt(2) -> r.getAs[Double]("sp_re")).toMap
    assert(dc(0) == 320.0) // 64 * 5: bin 0 is the plain sum
    assert(math.abs(dc(1)) < 1e-3) // constant has no k=1 energy
    val tone = Array.tabulate(64)(t =>
      math.round(1000 * math.cos(2 * math.Pi * 2 * t / 64)).toFloat)
    val pw = Multimodal.spectralEnergies(
      Seq((2L, tone)).toDF("id", "features"), "id", "features",
      Seq(0, 1, 2, 3))
      .collect().map(r => r.getInt(2) -> r.getAs[Double]("power")).toMap
    assert(pw(2) > 100 * math.max(pw(1), math.max(pw(0), pw(3))),
      s"energy must concentrate at k=2: $pw")
  }

  test("perceptualHash64: 64 ordered bits; photometric inversion flips every bit") {
    import graft.llm.Multimodal
    // an 8x8x3 plane with a luma gradient (no cell ties the mean)
    val plane = Array.tabulate(192)(i => ((i / 3) * 2 + i % 3).toFloat)
    val inverted = plane.map(v => 255.0f - v)
    val df = Seq((1L, plane), (2L, inverted)).toDF("id", "features")
    val out = Multimodal.perceptualHash64(df, "id", "features")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L).length == 64 && out(1L).count(_ == '1') > 0)
    // luma weights sum to 1, so inversion maps luma -> 255 - luma and
    // flips every above-mean/below-mean decision
    assert(out(1L).zip(out(2L)).forall { case (a, b) => a != b })
    // hash is deterministic: same plane -> same bits
    val again = Multimodal.perceptualHash64(df, "id", "features")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == out)
  }

  test("exactQuantiles: order statistics with ties and clamping") {
    // values 1..10 each once, plus five extra 5s: n = 15
    val vals = ((1 to 10).map(_.toDouble) ++ Seq.fill(5)(5.0)).map(Tuple1(_))
    val out = graft.operators.OrderedStats.exactQuantiles(
      vals.toDF("v"), "v", Seq(0.5, 1.0, 0.01))
      .collect().map(r => r.getDouble(0) ->
        (r.getLong(1), r.getAs[Double]("value"))).toMap
    assert(out(0.5) == ((8L, 5.0)))  // k=ceil(7.5)=8 lands in the 5-run
    assert(out(1.0) == ((15L, 10.0))) // max
    assert(out(0.01) == ((1L, 1.0)))  // clamped to the minimum rank
  }

  test("mutualInfo: independent columns -> ~0; copied column -> MI = H") {
    val ind = (0 until 400).map(i => (s"a${i % 4}", s"b${i / 4 % 4}"))
    val r1 = TargetEncode.mutualInfo(ind.toDF("a", "b"), "a", "b").head()
    assert(math.abs(r1.getAs[Double]("mi")) < 1e-6)
    val dep = (0 until 400).map(i => (s"a${i % 4}", s"b${i % 4}"))
    val r2 = TargetEncode.mutualInfo(dep.toDF("a", "b"), "a", "b").head()
    assert(math.abs(r2.getAs[Double]("mi") - r2.getAs[Double]("h_a")) < 1e-6)
    assert(math.abs(r2.getAs[Double]("nmi") - 1.0) < 1e-6)
  }

  test("chiSquareIndependence: textbook 2x2 and exact independence") {
    // [[10,20],[20,10]]: e = 15 everywhere, X^2 = 4*(25/15) = 6.666667,
    // V = sqrt(X^2 / (60*1)) = 1/3
    val skewed =
      Seq.fill(10)(("x", "p")) ++ Seq.fill(20)(("x", "q")) ++
      Seq.fill(20)(("y", "p")) ++ Seq.fill(10)(("y", "q"))
    val r = graft.operators.AbTest.chiSquareIndependence(
      skewed.toDF("a", "b"), "a", "b").head()
    assert(r.getAs[Long]("n") == 60L)
    assert(r.getAs[Long]("dof") == 1L)
    assert(math.abs(r.getAs[Double]("chi2") - 6.666667) < 1e-5)
    assert(math.abs(r.getAs[Double]("cramers_v") - 0.333333) < 1e-5)
    // proportional table -> X^2 = 0, V = 0
    val indep =
      Seq.fill(6)(("x", "p")) ++ Seq.fill(12)(("x", "q")) ++
      Seq.fill(3)(("y", "p")) ++ Seq.fill(6)(("y", "q"))
    val r0 = graft.operators.AbTest.chiSquareIndependence(
      indep.toDF("a", "b"), "a", "b").head()
    assert(math.abs(r0.getAs[Double]("chi2")) < 1e-6)
    assert(math.abs(r0.getAs[Double]("cramers_v")) < 1e-6)
    // single-column table: independence vacuous -> NULL chi2/V
    val r1 = graft.operators.AbTest.chiSquareIndependence(
      Seq(("x", "p"), ("x", "q")).toDF("a", "b"), "a", "b").head()
    assert(r1.isNullAt(r1.fieldIndex("chi2")))
    assert(r1.isNullAt(r1.fieldIndex("cramers_v")))
  }

  test("anovaOneWay: textbook three groups -> F = 3") {
    // {1,2,3} {2,3,4} {3,4,5}: SSB = 6, SSW = 6, F = (6/2)/(6/6) = 3
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
                 ("b", 2.0), ("b", 3.0), ("b", 4.0),
                 ("c", 3.0), ("c", 4.0), ("c", 5.0)).toDF("g", "v")
    val r = graft.operators.AbTest.anovaOneWay(df, "v", "g").head()
    assert(r.getAs[Long]("n") == 9L && r.getAs[Long]("k") == 3L)
    assert(math.abs(r.getAs[Double]("ss_between") - 6.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("ss_within") - 6.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("f") - 3.0) < 1e-6)
    // one group -> NULL F (df_between = 0)
    val r1 = graft.operators.AbTest.anovaOneWay(
      Seq(("a", 1.0), ("a", 2.0)).toDF("g", "v"), "v", "g").head()
    assert(r1.isNullAt(r1.fieldIndex("f")))
  }

  test("welchTTest: hand case with unequal variances") {
    // g1 = {1,2,3}: mean 2, var 1; g0 = {2,4,6,8}: mean 5, var 20/3
    // se = 1/3 + 5/3 = 2 -> t = -3/sqrt(2); df = 4/0.981481 = 4.075472
    val df = Seq((1.0, true), (2.0, true), (3.0, true),
                 (2.0, false), (4.0, false), (6.0, false), (8.0, false))
      .toDF("v", "g")
    val r = graft.operators.AbTest.welchTTest(df, "v", col("g")).head()
    assert(r.getAs[Long]("n1") == 3L && r.getAs[Long]("n2") == 4L)
    assert(math.abs(r.getAs[Double]("mean1") - 2.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("var2") - 20.0 / 3.0) < 1e-5)
    assert(math.abs(r.getAs[Double]("t") + 3.0 / math.sqrt(2.0)) < 1e-5)
    assert(math.abs(r.getAs[Double]("df_welch") - 4.075472) < 1e-5)
  }

  test("aucDeLong: perfect separation -> zero variance; hand case") {
    import graft.operators.Eval
    val perfect = Seq((1.0, false), (2.0, false), (3.0, true), (4.0, true))
      .toDF("s", "y")
    val r = Eval.aucDeLong(perfect, "s", col("y")).head()
    assert(r.getAs[Double]("auc") == 1.0)
    assert(r.getAs[Double]("se") == 0.0)
    assert(r.getAs[Double]("ci_lo") == 1.0 && r.getAs[Double]("ci_hi") == 1.0)
    // pos {2,3}, neg {1,2}: AUC 0.875, V10 = {0.75, 1.0}, V01 = {1.0, 0.75}
    // S10 = S01 = 0.03125 -> var = 0.03125, se = 0.176777
    val mixed = Seq((1.0, false), (2.0, false), (2.0, true), (3.0, true))
      .toDF("s", "y")
    val m = Eval.aucDeLong(mixed, "s", col("y")).head()
    assert(math.abs(m.getAs[Double]("auc") - 0.875) < 1e-6)
    assert(math.abs(m.getAs[Double]("se") - 0.176777) < 1e-5)
    assert(math.abs(m.getAs[Double]("ci_lo") - 0.528515) < 1e-4)
    assert(math.abs(m.getAs[Double]("ci_hi") - 1.221485) < 1e-4)
    // agreement with the exact AUC point estimate
    val a = Eval.auc(mixed, "s", col("y")).head()
    assert(math.abs(m.getAs[Double]("auc") - a.getAs[Double]("auc")) < 1e-6)
  }

  test("brierDecomposition: perfect forecaster and uninformative forecaster") {
    import graft.operators.Eval
    // perfect confident: BS = 0 = REL(0) - RES(0.25) + UNC(0.25)
    val perfect = Seq((1.0, true), (1.0, true), (0.0, false), (0.0, false))
      .toDF("p", "y")
    val r = Eval.brierDecomposition(perfect, col("p"), col("y")).head()
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Double]("brier") == 0.0)
    assert(r.getAs[Double]("reliability") == 0.0)
    assert(math.abs(r.getAs[Double]("resolution") - 0.25) < 1e-6)
    assert(math.abs(r.getAs[Double]("uncertainty") - 0.25) < 1e-6)
    // constant 0.5 on a balanced set: calibrated but zero resolution
    val flat = Seq((0.5, true), (0.5, false), (0.5, true), (0.5, false))
      .toDF("p", "y")
    val f = Eval.brierDecomposition(flat, col("p"), col("y")).head()
    assert(math.abs(f.getAs[Double]("brier") - 0.25) < 1e-6)
    assert(f.getAs[Double]("reliability") == 0.0)
    assert(f.getAs[Double]("resolution") == 0.0)
    // BS = REL - RES + UNC holds exactly here (p constant within bins)
    assert(math.abs(f.getAs[Double]("brier") -
      (f.getAs[Double]("reliability") - f.getAs[Double]("resolution") +
       f.getAs[Double]("uncertainty"))) < 1e-6)
  }

  test("seasonalDecompose: planted weekly pattern, NULL-trend edges") {
    import java.sql.Date
    // 21 days from the 1992-01-01 anchor (wd 0): 17 events on wd 0,
    // 10 otherwise -> any centered 7-day window sums to 77, trend 11,
    // seasonal = +6 on wd 0 / -1 elsewhere, residual exactly 0
    val rows = for {
      i <- 0 until 21
      _ <- 0 until (if (i % 7 == 0) 17 else 10)
    } yield Tuple1(new Date(Date.valueOf("1992-01-01").getTime +
      i * 86400000L))
    val out = graft.operators.Forecast
      .seasonalDecompose(rows.toDF("ts"), "ts")
      .collect().map(r => r.getDate(0).toString -> r).toMap
    assert(out.size == 21)
    val mid = out("1992-01-08") // wd 0, interior
    assert(mid.getAs[Long]("cnt") == 17L)
    assert(mid.getAs[Long]("wd") == 0L)
    assert(mid.getAs[Double]("trend") == 11.0)
    assert(mid.getAs[Double]("seasonal") == 6.0)
    assert(mid.getAs[Double]("residual") == 0.0)
    val tue = out("1992-01-09") // wd 1, interior
    assert(tue.getAs[Double]("seasonal") == -1.0)
    assert(tue.getAs[Double]("residual") == 0.0)
    // first/last 3 days: incomplete window -> NULL trend and residual
    val edge = out("1992-01-01")
    assert(edge.isNullAt(edge.fieldIndex("trend")))
    assert(edge.isNullAt(edge.fieldIndex("residual")))
    assert(edge.getAs[Double]("seasonal") == 6.0) // index still defined
  }
}
