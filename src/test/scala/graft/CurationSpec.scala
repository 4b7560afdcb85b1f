package graft

import org.apache.spark.sql.functions._

import graft.llm.{Coreset, Decontaminate, Sampling}
import graft.operators.{Eval, Graph, Preference, TargetEncode}

/** Hand-case semantics for the curation/governance family (q159–q165):
  * the oracle gate proves engine equivalence; these prove the numbers
  * are the intended ones. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("bradleyTerry: two items, 3-1 record -> rating ratio 3, mean 1") {
    val m = Seq((1L, 2L, true), (1L, 2L, true), (1L, 2L, true),
                (1L, 2L, false)).toDF("a", "b", "awin")
    val r = Preference.bradleyTerry(m, "a", "b", "awin", iters = 20)
      .collect().map(x => x.getLong(0) -> x.getDouble(3)).toMap
    // fixed point: r1/r2 = w1/w2 = 3; normalized to sum k=2
    assert(math.abs(r(1L) - 1.5) < 1e-6, s"r1=${r(1L)}")
    assert(math.abs(r(2L) - 0.5) < 1e-6, s"r2=${r(2L)}")
  }

  test("bradleyTerry: symmetric wins -> equal ratings") {
    val m = Seq((1L, 2L, true), (1L, 2L, false),
                (2L, 3L, true), (2L, 3L, false),
                (1L, 3L, true), (1L, 3L, false)).toDF("a", "b", "awin")
    val r = Preference.bradleyTerry(m, "a", "b", "awin", iters = 20)
      .collect()
    r.foreach(x => assert(math.abs(x.getDouble(3) - 1.0) < 1e-6))
    assert(r.map(_.getLong(1)).forall(_ == 4L)) // n_matches
    assert(r.map(_.getLong(2)).forall(_ == 2L)) // wins
  }

  test("kCore: triangle survives k=2, pendant chain peels off") {
    // triangle 1-2-3 plus chain 3-4-5: nodes 4,5 have degree <= 2 but
    // 5 has degree 1 -> peels, then 4 drops to 1 -> peels; triangle
    // keeps degree 2 within itself.
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("u", "v")
    val core = Graph.kCore(e, "u", "v", k = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kCore: k above max degree -> empty core") {
    val e = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    assert(Graph.kCore(e, "u", "v", k = 3).count() == 0L)
  }

  test("kCenterGreedy: farthest-first order and tie-break to smaller id") {
    // seed = min id (0) at 0.0; farthest is 10.0 (id 3); then the two
    // duplicate mid points (ids 1, 2 at 5.0) tie -> smaller id 1 wins.
    val pts = Seq((0L, Array(0.0)), (1L, Array(5.0)), (2L, Array(5.0)),
                  (3L, Array(10.0))).toDF("id", "v")
    val trace = Coreset.kCenterGreedy(pts, "id", "v", k = 3)
      .orderBy("step").collect()
    assert(trace.map(_.getLong(1)).toSeq == Seq(0L, 3L, 1L))
    // r2q of pick 2 = 100 * 1e9; pick 3 = 25 * 1e9
    assert(trace(1).getLong(2) == 100000000000L)
    assert(trace(2).getLong(2) == 25000000000L)
  }

  test("overlapAudit: counts distinct shingle hits, skips clean docs") {
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "z alpha beta gamma delta y"), // shares trigrams ABC + BCD
      (2L, "nothing in common here at all"),
      (3L, "beta gamma delta extended run")) // shares only BCD
      .toDF("doc_id", "text")
    val out = Decontaminate.overlapAudit(corpus, bench, "doc_id", "text",
                                         n = 3, minHits = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(4)))
      .toMap
    assert(out.keySet == Set(1L, 3L)) // doc 2 clean -> absent
    assert(out(1L) == ((2L, true)))
    assert(out(3L) == ((1L, false))) // one hit: reported, below threshold
  }

  test("timeSplitEmbargo: boundary rows land right, purged gap honored") {
    val rows = Seq(
      (1L, "2024-01-10 00:00:00"), // train
      (1L, "2024-01-18 00:00:00"), // purged (inclusive cutoff)
      (2L, "2024-01-19 12:00:00"), // purged
      (1L, "2024-01-21 00:00:00"), // test (embargo end inclusive)
      (3L, "2024-01-25 00:00:00")) // test, unit never in train
      .toDF("user_id", "s")
      .select(col("user_id"), to_timestamp(col("s")).as("ts"))
    val out = Sampling.timeSplitEmbargo(rows, "ts", "user_id",
        "2024-01-18 00:00:00", embargoDays = 3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(5))).toMap
    assert(out("train") == ((1L, 1L, 1L)))
    assert(out("purged") == ((2L, 2L, 1L))) // unit 1 purged row overlaps train
    assert(out("test") == ((2L, 2L, 1L)))   // unit 1 in train too; unit 3 not
  }

  test("woeIv: hand counts reproduce the smoothed formula") {
    // cat A: 3 pos / 1 neg; cat B: 1 pos / 3 neg; totals P=4, N=4
    val df = Seq(("A", 1), ("A", 1), ("A", 1), ("A", 0),
                 ("B", 1), ("B", 0), ("B", 0), ("B", 0)).toDF("cat", "y")
    val out = TargetEncode.woeIv(df, "cat", col("y") === 1)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    val expA = math.log((3.5 / 4.0) / (1.5 / 4.0))
    val expB = math.log((1.5 / 4.0) / (3.5 / 4.0))
    assert(math.abs(out("A") - expA) < 1e-6)
    assert(math.abs(out("B") - expB) < 1e-6)
  }

  test("cohenKappa: textbook 2x2 -> kappa 0.4") {
    // n11=20 n10=5 n01=10 n00=15: po=0.7, pe=0.5, kappa=0.4
    val rows =
      Seq.fill(20)((true, true)) ++ Seq.fill(5)((true, false)) ++
      Seq.fill(10)((false, true)) ++ Seq.fill(15)((false, false))
    val df = rows.toDF("a", "b")
    val r = Eval.cohenKappa(df, col("a"), col("b")).head()
    assert(r.getAs[Long]("n11") == 20L && r.getAs[Long]("n00") == 15L)
    assert(math.abs(r.getAs[Double]("po") - 0.7) < 1e-9)
    assert(math.abs(r.getAs[Double]("pe") - 0.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("kappa") - 0.4) < 1e-9)
  }

  test("equiDepth: uniform 1..100 into 4 buckets of 25 with tight envelopes") {
    val df = (1 to 100).map(i => (i.toDouble, i.toLong)).toDF("x", "id")
    val h = graft.operators.Histogram.equiDepth(df, "x", Seq("id"), 4)
      .orderBy("bucket").collect()
    assert(h.map(_.getLong(1)).toSeq == Seq(25L, 25L, 25L, 25L))
    assert(h(0).getDouble(2) == 1.0 && h(0).getDouble(3) == 25.0)
    assert(h(3).getDouble(2) == 76.0 && h(3).getDouble(3) == 100.0)
    assert(h.map(_.getLong(4)).toSeq == Seq(25L, 25L, 25L, 25L))
  }

  test("equiDepth: heavy skew still balances row counts") {
    // 90 copies of one value + 10 distinct: equi-WIDTH would put 90%
    // in one bucket; equi-depth splits the tie run across buckets.
    val df = (Seq.fill(90)(5.0) ++ (6 to 15).map(_.toDouble))
      .zipWithIndex.map { case (x, i) => (x, i.toLong) }.toDF("x", "id")
    val h = graft.operators.Histogram.equiDepth(df, "x", Seq("id"), 4)
      .orderBy("bucket").collect()
    assert(h.map(_.getLong(1)).toSeq == Seq(25L, 25L, 25L, 25L))
  }

  test("stupidBackoff: seen, unigram-backoff and floor branches") {
    val stats = Seq((0L, "a b c")).toDF("doc_id", "text")
    val cand = Seq((1L, "a b x")).toDF("doc_id", "text")
    val r = graft.llm.TextStats.stupidBackoff(cand, "doc_id", "text",
                                              stats, "text").head()
    assert(r.getLong(1) == 2L)      // bigrams: "a b" (seen), "b x" (floor)
    assert(r.getLong(3) == 1L)      // one backoff
    val exp = (-math.log(1.0) + -math.log(0.4 * 0.5 / 3.0)) / 2.0
    assert(math.abs(r.getDouble(2) - exp) < 1e-3)
  }

  test("kneserNeyNll: discount + continuation interpolation; unseen " +
    "context backs off to P_cont; rows of a context sum to 1") {
    // train "a b a b a c": c2 = {ab:2, ba:2, ac:1}; ctx a: cctx=3
    // fwd=2, b: cctx=2 fwd=1; bwd = {b:1, a:1, c:1}; types=3.
    val stats = Seq((0L, "a b a b a c")).toDF("doc_id", "text")
    // P(b|a) = (max(2-.75,0) + .75*2*(1/3)) / 3 = 1.75/3
    val r1 = graft.llm.TextStats.kneserNeyNll(
      Seq((1L, "a b")).toDF("doc_id", "text"), "doc_id", "text",
      stats, "text").head()
    assert(r1.getLong(1) == 1L && r1.getLong(3) == 0L)
    assert(math.abs(r1.getDouble(2) - (-math.log(1.75 / 3))) < 1e-3)
    // (z,a): unseen context z -> p = P_cont(a) = 1/3. (a,q): seen
    // context a, unseen continuation q -> interpolation with the
    // 0.5/types floor: (0 + .75*2*(0.5/3)) / 3
    val r2 = graft.llm.TextStats.kneserNeyNll(
      Seq((2L, "z a q")).toDF("doc_id", "text"), "doc_id", "text",
      stats, "text").head()
    assert(r2.getLong(3) == 1L)
    val exp2 = (-math.log(1.0 / 3) +
      -math.log((0.75 * 2 * (0.5 / 3)) / 3)) / 2
    assert(math.abs(r2.getDouble(2) - exp2) < 1e-3)
    // P(.|a) sums to 1 over the seen vocabulary continuations:
    // P(b|a)+P(a|a)+P(c|a) where P(a|a) = (0 + .75*2*(1/3))/3
    val pba = (2 - 0.75 + 0.75 * 2 * (1.0 / 3)) / 3
    val paa = (0.75 * 2 * (1.0 / 3)) / 3
    val pca = (1 - 0.75 + 0.75 * 2 * (1.0 / 3)) / 3
    assert(math.abs(pba + paa + pca - 1.0) < 1e-12)
  }

  test("NgramEval.bleu/rougeN: hand-computed clipped precisions, BP, F1") {
    val pairs = Seq(
      (0L, "the cat sat on the mat", "the cat is on the mat"),
      (1L, "the cat", "the cat is on the mat"))
      .toDF("pair_id", "cand", "ref")
    val b = graft.llm.NgramEval.bleu(pairs, "pair_id", "cand", "ref")
      .collect().map(r => r.getLong(0) -> r).toMap
    // pair 0: p1=5/6, p2'=4/6, p3'=2/5, p4'=1/4, bp=1
    // -> bleu = (5/6 * 4/6 * 2/5 * 1/4)^(1/4) = (1/18)^(1/4)
    assert(b(0L).getLong(1) == 6 && b(0L).getLong(2) == 6)
    assert(math.abs(b(0L).getDouble(3) - 5.0 / 6) < 2e-6)
    assert(b(0L).getDouble(4) == 1.0)
    assert(math.abs(b(0L).getDouble(5) -
      math.exp(math.log(1.0 / 18) / 4)) < 2e-6)
    // pair 1 ("the cat"): every clipped precision is 1 (the n>=2
    // zero-gram rows smooth to (0+1)/(0+1)), so bleu IS the brevity
    // penalty exp(1 - 6/2)
    assert(math.abs(b(1L).getDouble(4) - math.exp(-2.0)) < 2e-6)
    assert(math.abs(b(1L).getDouble(5) - math.exp(-2.0)) < 2e-6)
    val r = graft.llm.NgramEval.rougeN(pairs, "pair_id", "cand", "ref")
      .collect().map(x => (x.getLong(0), x.getInt(1)) -> x).toMap
    assert(math.abs(r((0L, 1)).getDouble(2) - 5.0 / 6) < 2e-6)
    assert(math.abs(r((0L, 1)).getDouble(4) - 5.0 / 6) < 2e-6)
    assert(math.abs(r((0L, 2)).getDouble(2) - 0.6) < 2e-6)
    assert(math.abs(r((0L, 2)).getDouble(4) - 0.6) < 2e-6)
    // short candidate: ROUGE-2 recall 1/5, precision 1/1, f1 harmonic
    assert(math.abs(r((1L, 2)).getDouble(2) - 0.2) < 2e-6)
    assert(math.abs(r((1L, 2)).getDouble(3) - 1.0) < 2e-6)
    assert(math.abs(r((1L, 2)).getDouble(4) - 1.0 / 3) < 2e-6)
  }

  test("jsDivergence: hand-computed KLs; identical slices give 0") {
    // A = "a a b": p = {a:2/3, b:1/3}; B = "a c": q = {a:1/2, c:1/2}
    // m = {a:7/12, b:1/6, c:1/4}
    val a = Seq((1L, "a a b")).toDF("id", "text")
    val b = Seq((2L, "a c")).toDF("id", "text")
    val r = graft.llm.TextStats.jsDivergence(a, b, "text").head()
    assert(r.getLong(0) == 3 && r.getLong(1) == 3 && r.getLong(2) == 2)
    val kl1 = (2.0 / 3) * math.log((2.0 / 3) / (7.0 / 12)) +
      (1.0 / 3) * math.log(2)
    val kl2 = 0.5 * math.log(0.5 / (7.0 / 12)) + 0.5 * math.log(2)
    assert(math.abs(r.getDouble(3) - kl1) < 1e-4)
    assert(math.abs(r.getDouble(4) - kl2) < 1e-4)
    assert(math.abs(r.getDouble(5) - (kl1 + kl2) / 2) < 1e-4)
    val same = graft.llm.TextStats.jsDivergence(a, a, "text").head()
    assert(same.getDouble(5) == 0.0)
  }

  test("zipfFit: exact power law recovers slope -1, intercept ln(c), r2 1") {
    // f(a)=6, f(b)=3, f(c)=2 at ranks 1,2,3: ln f = ln 6 - ln rank
    val docs = Seq((1L, "a a a a a a b b b c c")).toDF("doc_id", "text")
    val r = graft.llm.TextStats.zipfFit(docs, "text").head()
    assert(r.getLong(0) == 3)
    assert(math.abs(r.getDouble(1) - (-1.0)) < 1e-4)
    assert(math.abs(r.getDouble(2) - math.log(6.0)) < 1e-4)
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-4)
    // ties rank by token asc: f(a)=f(b)=2, f(c)=1 -> ranks a=1,b=2,c=3
    val t = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val rt = graft.llm.TextStats.zipfFit(t, "text").head()
    val (x, y) = (Seq(0.0, math.log(2), math.log(3)),
                  Seq(math.log(2), math.log(2), 0.0))
    val n = 3.0
    val (sx, sy) = (x.sum, y.sum)
    val sxy = x.zip(y).map { case (a2, b2) => a2 * b2 }.sum
    val sxx = x.map(v => v * v).sum
    val exp = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(rt.getDouble(1) - exp) < 1e-3)
  }

  test("ipwEffect: balanced stratum identifies, degenerate stratum drops") {
    val units = Seq(
      ("A", true, 10.0), ("A", true, 12.0),
      ("A", false, 5.0), ("A", false, 7.0),
      ("B", true, 100.0), ("B", true, 90.0), ("B", true, 80.0))
      .toDF("stratum", "treated", "y")
    val r = graft.operators.AbTest.ipwEffect(units, "treated", "y", "stratum")
      .head()
    assert(r.getAs[Long]("n") == 7L)
    assert(r.getAs[Long]("n_treat") == 2L)   // only stratum A identifies
    assert(r.getAs[Long]("n_dropped") == 3L) // all-treated stratum B
    assert(math.abs(r.getAs[Double]("mu_treated") - 11.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("mu_control") - 6.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("ate") - 5.0) < 1e-6)
  }

  test("transitionMatrix: counts consecutive pairs, rows normalize to 1") {
    val rows = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "b"),
      (2L, 1L, "a"), (2L, 2L, "a"))
      .toDF("user_id", "seq", "state")
    val m = graft.operators.Journey.transitionMatrix(
        rows, "user_id", "state", Seq("seq"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
                          (r.getLong(2), r.getDouble(3))).toMap
    // user 1: a->b, b->a, a->b; user 2: a->a
    assert(m(("a", "b")) == ((2L, 0.666667)))
    assert(m(("a", "a")) == ((1L, 0.333333)))
    assert(m(("b", "a")) == ((1L, 1.0)))
  }

  test("kaplanMeier: product-limit steps and censoring reduce risk set") {
    import java.sql.Timestamp
    def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")
    // lifetimes: u1: 0d death, u2: 2d death, u3: 2d death, u4: 5d
    // censored (last event past the cutoff)
    val rows = Seq(
      (1L, ts(1)), (1L, ts(1)),
      (2L, ts(1)), (2L, ts(3)),
      (3L, ts(2)), (3L, ts(4)),
      (4L, ts(5)), (4L, ts(10))).toDF("user_id", "ts")
    val km = graft.operators.Journey.kaplanMeier(rows, "user_id", "ts",
        censorCutoff = "2024-01-10 00:00:00")
      .orderBy("t").collect()
    // t=0: risk 4, d 1 -> S = 0.75; t=2: risk 3, d 2 -> S = 0.25;
    // t=5: risk 1, censored -> S stays 0.25
    assert(km.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                        r.getLong(3))).toSeq ==
      Seq((0L, 4L, 1L, 0L), (2L, 3L, 2L, 0L), (5L, 1L, 0L, 1L)))
    assert(km.map(_.getDouble(4)).toSeq == Seq(0.75, 0.25, 0.25))
  }

  test("labelPropagation: two cliques bridged stay two communities") {
    // cliques {1,2,3} and {10,11,12} joined by one bridge edge 3-10
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L),
                (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L))
      .toDF("u", "v")
    val out = graft.operators.Graph.labelPropagation(e, "u", "v", rounds = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.values.sum == 6L)       // every node labeled
    assert(out.size >= 2)              // bridge does not merge cliques
  }

  test("theilSen: robust to a single spike, exact median of slopes") {
    // group A: perfect slope 2 line with one wild spike at the end
    val a = Seq(2.0, 4.0, 6.0, 8.0, 1000.0).zipWithIndex
      .map { case (v, i) => ("A", i.toLong, v) }
    val df = a.toDF("g", "o", "v")
    val r = graft.operators.Robust.theilSen(df, Seq("g"), Seq("o"), "v")
      .head()
    assert(r.getLong(1) == 10L)
    // 6 of 10 pairwise slopes equal 2.0 -> median 2.0 despite spike
    assert(math.abs(r.getDouble(2) - 2.0) < 1e-9)
  }

  test("bpe learnMerges: greedy pair selection with count-then-lex ties") {
    val docs = Seq((1L, "aa ab aa")).toDF("doc_id", "text")
    val m = graft.llm.BpeTrain.learnMerges(docs, "text", nMerges = 2)
      .orderBy("round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    // "a a" appears in both aa words (count 2), then "a b" (count 1)
    assert(m == Seq((1L, "a a", 2L), (2L, "a b", 1L)))
  }

  test("bpe merge fuses left-to-right non-overlapping (aaa -> [aa, a])") {
    val docs = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val m = graft.llm.BpeTrain.learnMerges(docs, "text", nMerges = 1)
      .head()
    assert(m.getString(1) == "a a")
    assert(m.getLong(2) == 4L) // 2 adjacent pairs per "a a a" word
    val applied = graft.llm.BpeTrain.applyMerges(
      docs, "doc_id", "text", Seq("a a")).head()
    assert(applied.getLong(1) == 6L) // chars
    assert(applied.getLong(2) == 4L) // per word: [aa, a] -> 2 tokens
  }

  test("bpe applyMerges never crosses word boundaries") {
    // merge "a b" must not fuse the b|a boundary between words
    val docs = Seq((1L, "ab ba")).toDF("doc_id", "text")
    val applied = graft.llm.BpeTrain.applyMerges(
      docs, "doc_id", "text", Seq("a b")).head()
    assert(applied.getLong(2) == 3L) // [ab], [b, a]
  }

  test("bootstrap meanCi: constant data collapses the interval; spread brackets") {
    val const = (1L to 500L).map(i => (i, 42.0)).toDF("rid", "x")
    val r1 = graft.operators.Bootstrap.meanCi(const, "rid", "x").head()
    assert(r1.getAs[Double]("mean") == 42.0)
    assert(r1.getAs[Double]("ci_lo") == 42.0 &&
           r1.getAs[Double]("ci_hi") == 42.0)

    val spread = (1L to 2000L).map(i => (i, (i % 100).toDouble)).toDF("rid", "x")
    val r2 = graft.operators.Bootstrap.meanCi(spread, "rid", "x").head()
    assert(r2.getAs[Double]("ci_lo") < r2.getAs[Double]("mean"))
    assert(r2.getAs[Double]("ci_hi") > r2.getAs[Double]("mean"))
    // CI of a 2000-point mean of U(0,99) should be within ~±2 of 49.5
    assert(math.abs(r2.getAs[Double]("ci_lo") - 49.5) < 5.0)
    assert(math.abs(r2.getAs[Double]("ci_hi") - 49.5) < 5.0)
  }

  test("isotonicCalibration: pools adjacent violators, preserves monotone runs") {
    // 4 bins, 10 rows each, pos counts 1,3,2,4 -> PAV pools bins 1,2
    val rows = for {
      bin <- 0 to 3
      i <- 0 until 10
    } yield (bin + 0.5, i < Seq(1, 3, 2, 4)(bin))
    val df = rows.toDF("score", "label")
    val out = graft.operators.Eval.isotonicCalibration(
        df, "score", col("label"), lo = 0.0, hi = 4.0, nBins = 4)
      .orderBy("bin").collect()
    assert(out.map(_.getDouble(2)).toSeq == Seq(0.1, 0.3, 0.2, 0.4))
    assert(out.map(_.getDouble(3)).toSeq == Seq(0.1, 0.25, 0.25, 0.4))
    // isotonic output is monotone non-decreasing by construction
    val iso = out.map(_.getDouble(3))
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b })
  }

  test("kAnonymity: min cell and min diversity surface") {
    val df = Seq(
      ("DE", "A", 1), ("DE", "A", 2), ("DE", "A", 1), // cell 3, l=2
      ("FR", "B", 1), ("FR", "B", 1),                 // cell 2, l=1
      ("US", "A", 2))                                  // cell 1, l=1
      .toDF("nation", "seg", "sens")
    val r = graft.operators.Privacy.kAnonymity(
      df, Seq("nation", "seg"), "sens").head()
    assert(r.getAs[Long]("n_rows") == 6L)
    assert(r.getAs[Long]("n_cells") == 3L)
    assert(r.getAs[Long]("k_anonymity") == 1L)
    assert(r.getAs[Long]("l_diversity") == 1L)
    assert(r.getAs[Long]("n_cells_k_lt_5") == 3L)
  }

  test("capContributions: keeps the first `cap` rows per unit, idempotent") {
    val df = (1L to 100L).map(i => (i % 3, i, s"e$i")).toDF("u", "o", "p")
    val once = graft.operators.Privacy.capContributions(df, "u", Seq("o"), 10)
    assert(once.count() == 30L)
    val twice = graft.operators.Privacy.capContributions(once, "u", Seq("o"), 10)
    assert(twice.collect().map(_.getLong(1)).sorted.toSeq ==
           once.collect().map(_.getLong(1)).sorted.toSeq)
    // kept rows are exactly the lowest order keys per unit
    val kept = once.filter(col("u") === 0L).collect().map(_.getLong(1)).sorted
    assert(kept.toSeq == (1L to 100L).filter(_ % 3 == 0).take(10))
  }

  test("gridDbscan: two blobs, a border point, and noise") {
    val pts = Seq(
      // blob A: 5 mutually-close points -> all core, cluster = min id 0
      (0L, 0.0, 0.0), (1L, 0.01, 0.0), (2L, 0.0, 0.01),
      (3L, 0.01, 0.01), (4L, 0.005, 0.005),
      // blob B far away -> own cluster, min id 10
      (10L, 1.0, 1.0), (11L, 1.01, 1.0), (12L, 1.0, 1.01),
      (13L, 1.01, 1.01), (14L, 1.005, 1.005),
      // border: within eps of blob A's edge but only 2 neighbors
      (20L, 0.025, 0.0),
      // noise: alone
      (30L, 0.5, 0.5)).toDF("id", "x", "y")
    val out = graft.operators.Dbscan.gridDbscan(pts, "id", "x", "y",
        eps = 0.02, minPts = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getString(2), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    (0L to 4L).foreach(i => assert(out(i) == (("core", 0L)), s"pt $i"))
    (10L to 14L).foreach(i => assert(out(i) == (("core", 10L)), s"pt $i"))
    assert(out(20L) == (("border", 0L)))
    assert(out(30L) == (("noise", -1L)))
  }

  test("bfsLayers: path distances from seed; unreachable absent") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("u", "v")
    val seeds = Seq(1L).toDF("node")
    val out = graft.operators.Graph.bfsLayers(e, "u", "v", seeds, "node")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("pca powerIteration: exact line recovers direction and eigenvalue") {
    // points on y = 2x: cov = [[2,4],[4,8]], eigenvector (1,2),
    // max-abs normalization -> (0.5, 1.0), eigenvalue 10
    val pts = Seq((1.0, 2.0), (2.0, 4.0), (-1.0, -2.0), (-2.0, -4.0),
                  (0.0, 0.0)).toDF("a", "b")
    val out = graft.operators.Pca.powerIteration(pts, Seq("a", "b"), 30)
      .orderBy("dim").collect()
    assert(math.abs(out(0).getDouble(1) - 0.5) < 1e-6)
    assert(math.abs(out(1).getDouble(1) - 1.0) < 1e-6)
    assert(math.abs(out(0).getDouble(2) - 10.0) < 1e-4)
  }

  test("rankingMetrics: mrr/precision/ndcg hand case with a miss") {
    val retrieved = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("qid", "cid", "rank")
    val relevant = Seq((1L, 11L), (1L, 99L)).toDF("q", "c")
    val r = graft.operators.Eval.rankingMetrics(
      retrieved, "qid", "cid", "rank", relevant, "q", "c", k = 3).head()
    assert(r.getAs[Long]("n_rel") == 2L && r.getAs[Long]("n_hits") == 1L)
    assert(math.abs(r.getAs[Double]("mrr") - 0.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("precision_at_3") - 1.0 / 3) < 1e-4)
    val dcg = 1.0 / (math.log(3.0) / math.log(2.0))
    val idcg = 1.0 + 1.0 / (math.log(3.0) / math.log(2.0))
    assert(math.abs(r.getAs[Double]("ndcg_at_3") - dcg / idcg) < 1e-4)
  }

  test("attribution: first/last/linear disagree exactly as designed") {
    import java.sql.Timestamp
    def ts(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    val ev = Seq(
      (1L, 1L, ts(1), "view"), (1L, 2L, ts(2), "click"),
      (1L, 3L, ts(3), "purchase"),
      (2L, 4L, ts(5), "purchase")) // touchless
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = graft.operators.Attribution.credits(ev, "user_id", "ts",
        "event_id", "event_type", "purchase",
        Seq("view", "click", "signup"), lookbackDays = 3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("view") == ((1L, 0L, 0.5)))
    assert(out("click") == ((0L, 1L, 0.5)))
    assert(out("(none)") == ((1L, 1L, 1.0)))
  }

  test("holtSummary: constant series -> level const, trend 0; fold matches") {
    import java.sql.Timestamp
    def ts(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    val const = (1 to 10).map(i => (1L, i.toLong, ts(i), 5.0))
      .toDF("user_id", "event_id", "ts", "value")
    val r1 = graft.operators.Forecast.holtSummary(const, "user_id",
      Seq(col("ts"), col("event_id")), "value", 0.3, 0.1).head()
    assert(r1.getAs[Double]("level") == 5.0 &&
           r1.getAs[Double]("trend") == 0.0 &&
           r1.getAs[Double]("forecast_next") == 5.0)

    val ys = Seq(1.0, 3.0, 2.0, 6.0, 4.0)
    val series = ys.zipWithIndex.map { case (y, i) =>
      (2L, i.toLong, ts(i + 1), y) }
      .toDF("user_id", "event_id", "ts", "value")
    val r2 = graft.operators.Forecast.holtSummary(series, "user_id",
      Seq(col("ts"), col("event_id")), "value", 0.3, 0.1).head()
    // manual fold of the documented recurrence
    var l = ys.head; var b = 0.0
    ys.tail.foreach { y =>
      val lp = l; l = 0.3 * y + 0.7 * (l + b); b = 0.1 * (l - lp) + 0.9 * b
    }
    assert(math.abs(r2.getAs[Double]("level") - l) < 1e-6)
    assert(math.abs(r2.getAs[Double]("trend") - b) < 1e-6)
  }

  test("splitConformal: k-th residual becomes the band, coverage audited") {
    // train: user 1 predicts 0; cal residuals 1..10 -> k=ceil(0.9*11)=10,
    // qhat=10; test residuals 5 (in) and 15 (out) -> coverage 0.5
    val rows =
      (1 to 5).map(i => (1L, i.toLong * 3, 0.0)) ++           // ids ≡ 0 (mod 3)
      (1 to 10).map(i => (1L, 100L + 3 * i, i.toDouble)) ++   // ids ≡ 1 (mod 3)
      Seq((1L, 200L, 5.0), (1L, 203L, 15.0))                  // ids ≡ 2 (mod 3)
    val df = rows.toDF("user_id", "event_id", "value")
      .withColumn("split", col("event_id") % 3)
    val r = graft.operators.Conformal.splitConformal(
      df, "user_id", "event_id", "value", "split", alpha = 0.1).head()
    assert(r.getAs[Long]("n_cal") == 10L)
    assert(r.getAs[Long]("k") == 10L)
    assert(r.getAs[Double]("qhat") == 10.0)
    assert(r.getAs[Double]("coverage") == 0.5)
  }

  test("personalizedPageRank: mass stays near seeds, unreachable nodes get 0") {
    val e = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("u", "v")
    val seeds = Seq(1L).toDF("node")
    val out = graft.operators.Graph.personalizedPageRank(
        e, "u", "v", seeds, "node", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(10L) == 0.0 && out(11L) == 0.0) // unreachable from seed
    assert(out(1L) > out(3L)) // rank decays away from the seed
    assert(out.values.forall(_ >= 0.0))
  }

  test("gmm fit2: recovers two separated blobs") {
    val vals = Seq.fill(50)(8.0) ++ Seq.fill(50)(12.0) ++
               Seq.fill(50)(88.0) ++ Seq.fill(50)(92.0)
    val df = vals.toDF("value")
    val r = graft.operators.Gmm.fit2(df, "value", lo = 0.0, hi = 128.0,
      nBins = 32, mu1_0 = 20.0, sigma1_0 = 20.0, mu2_0 = 80.0,
      sigma2_0 = 20.0, iters = 10).head()
    assert(r.getAs[Long]("n") == 200L)
    assert(math.abs(r.getAs[Double]("pi1") - 0.5) < 0.05)
    assert(math.abs(r.getAs[Double]("mu1") - 12.0) < 3.0)  // bin midpoints 10/14
    assert(math.abs(r.getAs[Double]("mu2") - 92.0) < 3.0)
    assert(r.getAs[Double]("sigma1") < 6.0)
  }

  test("cohenKappa: identical raters -> kappa 1, independent-ish -> ~0") {
    val same = Seq.fill(10)((true, true)) ++ Seq.fill(10)((false, false))
    val r1 = Eval.cohenKappa(same.toDF("a", "b"), col("a"), col("b")).head()
    assert(math.abs(r1.getAs[Double]("kappa") - 1.0) < 1e-9)
    // perfectly balanced independent pattern: po == pe -> kappa 0
    val ind = Seq((true, true), (true, false), (false, true), (false, false))
    val r2 = Eval.cohenKappa(ind.toDF("a", "b"), col("a"), col("b")).head()
    assert(math.abs(r2.getAs[Double]("kappa")) < 1e-9)
  }

  test("bpe fuse reaches the fixpoint on token-disjoint repeats (abab -> [ab, ab])") {
    val docs = Seq((1L, "abab abab")).toDF("doc_id", "text")
    // round 1: "a b" twice per "abab" occurrence (word-type cnt 2) -> 4;
    // round 2 counts pairs of the FUSED vocab " ab ab " -> ("ab ab", 2).
    // The one-pass replace bug left " ab a b " (the match consumed the
    // shared space) and re-selected "a b" in round 2.
    val m = graft.llm.BpeTrain.learnMerges(docs, "text", nMerges = 2)
      .orderBy("round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(m == Seq((1L, "a b", 4L), (2L, "ab ab", 2L)))
    val applied = graft.llm.BpeTrain.applyMerges(
      docs, "doc_id", "text", Seq("a b")).head()
    assert(applied.getLong(2) == 4L) // per word [ab, ab], not [ab, a, b]
  }

  test("bpe fuse is token-level greedy on self-pair runs (Sennrich parity)") {
    // merge (a,a) over a 6-run must give [aa,aa,aa] and a 5-run
    // [aa,aa,a] — the old single-space double-replace re-synced the
    // scan mid-run and produced [aa,a,aa,a] / [aa,a,aa] instead.
    val docs = Seq((1L, "aaaaaa")).toDF("doc_id", "text")
    val applied6 = graft.llm.BpeTrain.applyMerges(
      docs, "doc_id", "text", Seq("a a")).head()
    assert(applied6.getLong(2) == 3L) // [aa, aa, aa]
    val docs5 = Seq((1L, "aaaaa")).toDF("doc_id", "text")
    val applied5 = graft.llm.BpeTrain.applyMerges(
      docs5, "doc_id", "text", Seq("a a")).head()
    assert(applied5.getLong(2) == 3L) // [aa, aa, a]
    // training on the 6-run: round 1 learns (a,a) with 5 adjacent
    // pairs; round 2 sees [aa,aa,aa] and learns (aa,aa) with count 2
    val m = graft.llm.BpeTrain.learnMerges(docs, "text", nMerges = 2)
      .orderBy("round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(m == Seq((1L, "a a", 5L), (2L, "aa aa", 2L)))
  }

  test("trained-tokenizer packing bins respect the budget in MODEL tokens") {
    // "ababab" = 6 chars-as-tokens but 3 model tokens once (a,b)->ab is
    // learned; packing at budget 6 must fit TWO such docs per bin under
    // model-token counts (whitespace/char counts would split them).
    val docs = Seq((1L, "ababab"), (2L, "ababab"), (3L, "ababab"),
                   (4L, "ababab")).toDF("doc_id", "text")
    val merges = graft.llm.BpeTrain.learnMerges(docs, "text", nMerges = 1)
      .orderBy("round").collect().map(_.getString(1)).toSeq
    assert(merges == Seq("a b"))
    val counted = graft.llm.BpeTrain
      .applyMerges(docs, "doc_id", "text", merges)
      .select(col("doc_id"), col("n_bpe_tok"))
    assert(counted.collect().forall(_.getLong(1) == 3L))
    val bins = graft.llm.Packing.packBinsFirstFit(counted, "doc_id",
        "n_bpe_tok", budget = 6, nShards = 1, Seq(col("doc_id").asc))
      .collect()
    assert(bins.length == 2) // 4 docs x 3 model tokens / budget 6
    assert(bins.forall(_.getAs[Long]("sum_tokens") == 6L))
    assert(bins.forall(_.getAs[Long]("n_docs") == 2L))
  }

  test("unigram-LM selection prunes frequent-but-dominated substrings (likelihood vs frequency disagree)") {
    // every word is "abcd": the substring "##bc" is exactly as
    // FREQUENT as every other candidate, but the Viterbi-optimal
    // segmentation is always the single unit "abcd" — so "##bc" has
    // EM usage 0 and the likelihood trainer prunes it, while the
    // frequency stand-in keeps it at the same topK.
    val docs = Seq((1L, "abcd abcd abcd"), (2L, "abcd abcd"))
      .toDF("doc_id", "text")
    val out = graft.llm.UnigramLm.selectVocab(docs, "text", topK = 10)
      .collect()
    val byUnit = out.map(r => r.getString(0) -> r).toMap
    assert(!byUnit.contains("##bc")) // pruned: n_em1 = 0, not single
    assert(byUnit("abcd").getAs[Boolean]("kept"))
    assert(byUnit("abcd").getAs[Long]("n_em1") == 5L)
    assert(byUnit("abcd").getAs[Long]("n_em_final") == 5L)
    // the character alphabet survives with zero usage (smoothing floor)
    for (s <- Seq("a", "##b", "##c", "##d")) {
      assert(byUnit(s).getAs[Boolean]("is_single"))
      assert(byUnit(s).getAs[Boolean]("kept"))
      assert(byUnit(s).getAs[Long]("n_em1") == 0L)
    }
    assert(out.length == 5) // abcd + the 4 single-char units
    // the frequency-based stand-in keeps "##bc" on the SAME corpus
    val freq = graft.llm.WordPiece.trainVocab(
      graft.llm.WordPiece.wordTypes(docs, "text"), topK = 10)
    assert(freq.contains("##bc"))
  }

  test("unigram-LM EM round 3 changes the selection (emRounds is a real knob)") {
    // found by randomized search over the recurrence: round 2's
    // re-segmentation moves usage off "##bbb" (abbbbbbaba's tail
    // re-splits once round-1 costs make other units cheap), so the
    // round-3 counts rank "##aa" above it — the topK=3 cut differs
    // between emRounds = 2 and 3. Word frequencies: abbbbbbaba ×1,
    // baa ×11, aabbb ×16, abbabbbaa ×1.
    val docs = Seq(
      (1L, "abbbbbbaba abbabbbaa"),
      (2L, (1 to 11).map(_ => "baa").mkString(" ")),
      (3L, (1 to 16).map(_ => "aabbb").mkString(" "))).toDF("doc_id", "text")
    def keptMulti(rounds: Int): Set[String] =
      graft.llm.UnigramLm.selectVocab(docs, "text", topK = 3,
          emRounds = rounds)
        .filter(col("kept") && !col("is_single"))
        .select("unit").collect().map(_.getString(0)).toSet
    assert(keptMulti(2) == Set("aabb", "baa", "##bbb"))
    assert(keptMulti(3) == Set("aabb", "baa", "##aa"))
    // emRounds = 1 ranks by the round-1 counts themselves
    val r1 = graft.llm.UnigramLm.selectVocab(docs, "text", topK = 3,
      emRounds = 1).collect()
    assert(r1.forall(r =>
      r.getAs[Long]("n_em1") == r.getAs[Long]("n_em_final")))
  }

  test("unigram-LM Viterbi ties break to the SHORTEST last piece (micro-nat-exact tie)") {
    // cost(ab) = -ln(2/8), cost(a) = cost(##b) = -ln(4/8): the 1-piece
    // and 2-piece paths tie EXACTLY — ln4 = 2·ln2 in reals, and in
    // micro-nats round(ln4·1e6) = 1386294 = 2·round(ln2·1e6) — so the
    // deterministic contract (probe l = 1..4, strict minimum) must
    // pick the SINGLE-char step first: segmentation [a, ##b], not [ab].
    val words = Seq(("ab", 1L)).toDF("w", "f")
    val costs = Seq("ab" -> 2L, "a" -> 4L, "##b" -> 4L)
      .toDF("tok", "__c")
      .select(col("tok"),
        round(-log(col("__c").cast("double") / lit(8.0)) * lit(1e6), 0)
          .cast("long").as("cost"))
    val byTok = costs.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byTok("ab") == byTok("a") + byTok("##b")) // the tie is real
    val n = graft.llm.UnigramLm
      .viterbiCounts(words, graft.llm.UnigramLm.candidates(words), costs)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(n == Map("a" -> 1L, "##b" -> 1L)) // NOT Map("ab" -> 1L)
  }

  test("rankingMetrics truncates retrieved lists deeper than k") {
    val retrieved = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("qid", "doc", "rank")
    val relevant = Seq((1L, 12L)).toDF("qid", "doc")
    // only hit sits at rank 3 > k=2: every @k metric must ignore it
    val r = Eval.rankingMetrics(retrieved, "qid", "doc", "rank",
      relevant, "qid", "doc", k = 2).head()
    assert(r.getAs[Long]("n_hits") == 0L)
    assert(r.isNullAt(r.fieldIndex("mrr")))
    assert(r.getAs[Double]("precision_at_2") == 0.0)
  }

  test("splitConformal clamps k to n_cal instead of emitting 0 rows") {
    // 2 calibration rows, alpha=0.01 -> ceil(0.99*3)=3 > n_cal=2
    val df = Seq(
      (1L, 1L, 10.0, 0), (1L, 2L, 10.0, 0),
      (1L, 3L, 11.0, 1), (1L, 4L, 13.0, 1),
      (1L, 5L, 12.0, 2), (1L, 6L, 20.0, 2))
      .toDF("unit", "id", "value", "split")
    val out = graft.operators.Conformal
      .splitConformal(df, "unit", "id", "value", "split", alpha = 0.01)
      .collect()
    assert(out.length == 1) // the un-clamped rank matched NO row
    assert(out(0).getAs[Long]("k") == 2L) // clamped to n_cal
    assert(out(0).getAs[Double]("qhat") == 3.0) // max |residual|
  }

  test("personalizedPageRank keeps an edgeless seed in the universe") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val seeds = Seq(1L, 99L).toDF("node") // 99 has no edges
    val out = Graph.personalizedPageRank(edges, "src", "dst",
        seeds, "node", iterations = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getAs[Double]("ppr"))).toMap
    // the edgeless seed keeps its 1/|S| teleport share: every round
    // pr(99) = (1-0.85) * 0.5 (it receives no inflow, sends none)
    assert(out.contains(99L), "edgeless seed dropped from the output")
    assert(out(99L)._1 == 0L)
    assert(math.abs(out(99L)._2 - 0.075) < 1e-9)
    // and the connected seed's share is diluted by it (|S|=2, not 1)
    assert(out(1L)._2 < 0.5)
  }

  test("dbscan dense-cell cap bounds candidate pairs, audited by overflowCells") {
    import graft.operators.Dbscan
    // 30 points crowd ONE eps-cell; 3 sit far away in their own cell
    val dense = (0L until 30L).map(i => (i, 0.001 * i, 0.0))
    val far = Seq((100L, 0.50, 0.0), (101L, 0.51, 0.0), (102L, 0.52, 0.0))
    val pts = (dense ++ far).toDF("id", "x", "y")
    val g = Dbscan.gridded(pts, "id", "x", "y", eps = 0.1)
    val uncapped = Dbscan.candidatePairs(g, 0.1, Int.MaxValue).count()
    assert(uncapped == 30L * 29L + 3L * 2L) // quadratic in the dense cell
    // cap at 10: the dense cell leaves the BUILD side; pair count
    // collapses to the far cell's 3*2 (bounded, not quadratic)
    val capped = Dbscan.candidatePairs(g, 0.1, maxCellPoints = 10).count()
    assert(capped == 6L)
    val overflow = Dbscan.overflowCells(pts, "id", "x", "y", 0.1, 10)
      .collect()
    assert(overflow.length == 1 && overflow(0).getAs[Long]("n_points") == 30L)
    // and a cap that never fires leaves the clustering EXACT
    val exact = Dbscan.gridDbscan(pts, "id", "x", "y", 0.1, minPts = 4)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    val roomy = Dbscan.gridDbscan(pts, "id", "x", "y", 0.1, minPts = 4,
        maxCellPoints = 1000)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(exact == roomy)
  }

  test("driver-side sufficient-stat collects fail loudly past their bound") {
    val m = Seq((1L, 2L, true), (2L, 3L, true), (3L, 1L, true))
      .toDF("a", "b", "awin")
    val e1 = intercept[IllegalArgumentException] {
      Preference.bradleyTerry(m, "a", "b", "awin", iters = 1, maxPairs = 2)
    }
    assert(e1.getMessage.contains("bound"))
    val e2 = intercept[IllegalArgumentException] {
      graft.operators.Gmm.fit2(Seq(1.0).toDF("value"), "value",
        lo = 0.0, hi = 1.0, nBins = 200001, mu1_0 = 0.2, sigma1_0 = 0.1,
        mu2_0 = 0.8, sigma2_0 = 0.1, iters = 1)
    }
    assert(e2.getMessage.contains("nBins"))
    val km = Seq((1L, "2024-01-01"), (1L, "2024-01-02"),
                 (2L, "2024-01-01"), (2L, "2024-01-03"),
                 (3L, "2024-01-01"), (3L, "2024-01-05"))
      .toDF("unit", "ts_s")
      .select(col("unit"), to_timestamp(col("ts_s")).as("ts"))
    val e3 = intercept[IllegalArgumentException] {
      graft.operators.Journey.kaplanMeier(km, "unit", "ts",
        censorCutoff = "2024-02-01", maxTimePoints = 2)
    }
    assert(e3.getMessage.contains("bound"))
    val e4 = intercept[IllegalArgumentException] {
      graft.llm.BpeTrain.learnMerges(
        Seq((1L, "ab")).toDF("doc_id", "text"), "text", nMerges = 0)
    }
    assert(e4.getMessage.contains("nMerges"))
    val e5 = intercept[IllegalArgumentException] {
      Coreset.kCenterGreedy(
        Seq((1L, Seq(0.0, 0.0))).toDF("id", "v"), "id", "v", k = 5000)
    }
    assert(e5.getMessage.contains("k must be"))
  }

  test("WordPiece: deterministic vocab cut, longest-match greedy, ## forms, [UNK]") {
    import graft.llm.WordPiece
    val docs = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    // counts: all aaab substrings have weight 2, 'ab' (plain) weight 1;
    // ties cut by token asc, '#' < 'a' -> top2 = {##aa, ##aab}
    val vocab = WordPiece.trainVocab(
      WordPiece.wordTypes(docs, "text"), topK = 2).toSet
    assert(vocab == Set("##aa", "##aab", "a", "##a", "##b"))
    val out = WordPiece.segmentCorpus(docs, "text", topK = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getString(2), r.getLong(3))).toMap
    // greedy prefers the 3-char ##aab over the 2-char ##aa at pos 2
    assert(out("aaab") == ((2L, "a ##aab", 2L)))
    assert(out("ab") == ((1L, "a ##b", 2L)))
    // over-length words collapse to [UNK], never a 20+-step scan
    val long = Seq((1L, ("x" * 25) + " ok")).toDF("doc_id", "text")
    val lo = WordPiece.segmentCorpus(long, "text", topK = 2)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(lo("x" * 25) == "[UNK]")
    assert(lo("ok") == "o ##k")
  }
}
