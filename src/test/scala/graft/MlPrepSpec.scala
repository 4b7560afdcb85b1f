package graft

import org.apache.spark.sql.functions._
import graft.llm.{FeatureHash, Sampling, SpanDedup}
import graft.operators.{Robust, TargetEncode}

/** Specs for the round-5 ML-prep operator batch: chunk-level corpus
  * dedup, LOO target encoding, MAD robust scoring, feature hashing,
  * grouped split audit. */
class MlPrepSpec extends SparkSpec {
  import spark.implicits._

  test("SpanDedup flags cross-doc boilerplate and rebuilds clean text") {
    // docs 1 and 2 share an identical 3-token span; doc 3 is unique;
    // doc 4 is PURE boilerplate (both its chunks recur elsewhere).
    val df = Seq(
      (1L, "shared span one alpha beta gamma"),
      (2L, "shared span one delta epsilon zeta"),
      (3L, "totally unique content here now ok"),
      (4L, "shared span one shared span one")
    ).toDF("doc_id", "text")
    val out = SpanDedup.chunkDupStats(df, "doc_id", "text", size = 3)
      .orderBy("doc_id").collect()
    // chunk size 3, stride 3 → 2 chunks per 6-token doc
    assert(out.map(_.getLong(1)).toSeq == Seq(2L, 2L, 2L, 2L))
    // "shared span one" appears in docs 1, 2, 4 → dup everywhere it occurs
    assert(out(0).getLong(2) == 1L && out(1).getLong(2) == 1L)
    assert(out(2).getLong(2) == 0L)             // unique doc: no dups
    assert(out(3).getLong(2) == 2L)             // all-boilerplate doc
    assert(out(0).getString(4) == "alpha beta gamma")  // clean_text keeps rest
    assert(out(2).getString(4) == "totally unique content here now ok")
    assert(out(3).getString(4) == "")           // everything removed
    assert(out(3).getDouble(3) == 1.0)          // dup_frac
  }

  test("TargetEncode: LOO excludes the row's own target and shrinks to global") {
    val df = Seq(("a", 10.0), ("a", 20.0), ("a", 30.0), ("b", 100.0))
      .toDF("cat", "t")
    val m = 2.0
    val mu = (10.0 + 20.0 + 30.0 + 100.0) / 4.0 // 40
    val out = TargetEncode.looEncode(df, "cat", "t", m)
      .orderBy("cat", "t").select("cat", "t", "target_enc").collect()
    // row (a, 10): (60 - 10 + 2*40) / (3 - 1 + 2) = 130/4 = 32.5
    assert(out(0).getDouble(2) == 32.5)
    // row (a, 20): (60 - 20 + 80) / 4 = 30.0
    assert(out(1).getDouble(2) == 30.0)
    // singleton category b: (100 - 100 + 80) / (1 - 1 + 2) = 40 → pure
    // global mean: a category with no OTHER observations carries no
    // signal of its own.
    assert(out(3).getDouble(2) == 40.0)
  }

  test("Robust.madScore: outlier flagged, constant group scores NULL") {
    val g1 = (1 to 9).map(i => ("g1", i.toLong, i.toDouble)) :+ (("g1", 10L, 1000.0))
    val g2 = (1 to 5).map(i => ("g2", (100 + i).toLong, 7.0))
    val df = (g1 ++ g2).toDF("k", "id", "x")
    val scored = Robust.madScore(df, Seq("k"), "x")
    val out = Robust.madOutliers(df, Seq("k"), "x", zCut = 3.0).collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(10L)) // only the 1000.0 row
    // constant group: mad = 0 → robust_z NULL for every member
    val g2z = scored.filter(col("k") === "g2").select("robust_z").collect()
    assert(g2z.forall(_.isNullAt(0)))
    // mean/stddev z would be dragged by the outlier: assert MAD-z of the
    // inliers stays small (robustness, the operator's reason to exist)
    val inlierZ = scored.filter(col("k") === "g1" && col("id") < 10L)
      .select(abs(col("robust_z"))).collect().map(_.getDouble(0))
    assert(inlierZ.forall(_ < 2.0))
  }

  test("FeatureHash: deterministic buckets in range, counts preserved") {
    val df = Seq((1L, "a b c a"), (2L, "a d")).toDF("doc_id", "text")
    val out = FeatureHash.hashedBow(df, "doc_id", "text", nBuckets = 8)
    val rows = out.collect()
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 8))
    // total counts == total tokens
    assert(rows.map(_.getLong(2)).sum == 6L)
    // same token → same bucket across docs (pure function of text)
    val aBucket1 = out.filter(col("doc_id") === 1L && col("n") === 2L)
      .select("bucket").head().getLong(0)
    val run2 = FeatureHash.hashedBow(df, "doc_id", "text", nBuckets = 8)
      .filter(col("doc_id") === 1L && col("n") === 2L)
      .select("bucket").head().getLong(0)
    assert(aBucket1 == run2)
  }

  test("TextStats.pmiCollocations: collocated pair outranks chance pairs") {
    // "new york" always adjacent and exclusive; every other word
    // appears twice per doc so its pair rates are diluted.
    val docs = (1 to 20).map(i => (i.toLong, "new york a b b a c c d d")) ++
      Seq((21L, "a b new c d york"))
    val out = graft.llm.TextStats.pmiCollocations(
      docs.toDF("doc_id", "text"), "text", minCount = 5L, k = 3).collect()
    assert(out.head.getString(0) == "new" && out.head.getString(1) == "york")
    assert(out.head.getDouble(3) > 0.0)
  }

  test("NearDup.containmentPairs: subset doc scores 1.0 one-way") {
    val df = Seq(
      (1L, "alpha beta gamma", "en"),                       // A ⊂ B
      (2L, "alpha beta gamma delta epsilon zeta", "en"),
      (30L, "unrelated words entirely different here", "en")
    ).toDF("doc_id", "text", "lang")
    val out = graft.llm.NearDup.containmentPairs(df, "doc_id", "text",
      "lang", threshold = 0.9, windowAhead = 25).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 1.0)      // all of A inside B
    assert(r.getDouble(3) == 0.5)      // half of B covered by A
  }

  test("Profiler.corrMatrix: exact ±1 on linear columns, 0-ish on noise") {
    val df = (1 to 100).map { i =>
      (i.toDouble, 2.0 * i + 5.0, -3.0 * i, ((i * 37) % 11).toDouble)
    }.toDF("x", "y", "z", "w")
    val out = graft.operators.Profiler.corrMatrix(df, Seq("x", "y", "z", "w"),
                                                  scale = 2)
    val m = out.collect().map(r =>
      (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(m(("x", "y")) == 1.0)       // exact: integer stats, perfect line
    assert(m(("x", "z")) == -1.0)
    assert(math.abs(m(("x", "w"))) < 0.3)
    assert(out.collect().forall(_.getLong(2) == 100L))
  }

  test("Linkage.fuzzyPairs: near-identical names match only within blocks") {
    val df = Seq(
      (1L, "acme corp", "west"), (2L, "acme c0rp", "west"),  // dist 1, same block
      (3L, "acme corp", "east"),                              // same name, other block
      (4L, "completely different", "west")
    ).toDF("id", "name", "region")
    val out = graft.operators.Linkage.fuzzyPairs(df, "id", "name", "region",
                                                 maxDist = 2).collect()
    assert(out.length == 1)                        // blocking prunes id 3
    assert(out.head.getLong(0) == 1L && out.head.getLong(1) == 2L)
    assert(out.head.getInt(4) == 1)
  }

  test("Linkage.fellegiSunter: histogram u, LLR weights, threshold") {
    val df = Seq(
      (1L, "b", 10L, "x"), (2L, "b", 10L, "x"),
      (3L, "b", 20L, "y"), (4L, "c", 10L, "x"))
      .toDF("id", "blk", "f", "g")
    val out = graft.operators.Linkage.fellegiSunter(df, "id", "blk",
      fields = Seq(("f", col("f"), 0.9), ("g", col("g"), 0.8)),
      threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getBoolean(2), r.getBoolean(3), r.getDouble(4), r.getBoolean(5)))
      .toMap
    // blocking: only the 3 pairs inside block b
    assert(out.size == 3)
    // u_f = u_g = (3^2 + 1^2) / 4^2 = 0.625 over ALL records
    val uAgree = math.log(0.9 / 0.625) + math.log(0.8 / 0.625)
    val uDis = math.log((1.0 - 0.9) / (1.0 - 0.625)) +
      math.log((1.0 - 0.8) / (1.0 - 0.625))
    assert(out((1L, 2L))._1 && out((1L, 2L))._2)
    assert(math.abs(out((1L, 2L))._3 - uAgree) < 1e-5)
    assert(out((1L, 2L))._4)                   // 0.61 >= 0.5
    assert(!out((1L, 3L))._1 && !out((1L, 3L))._2)
    assert(math.abs(out((1L, 3L))._3 - uDis) < 1e-5)
    assert(!out((1L, 3L))._4 && !out((2L, 3L))._4)
  }

  test("Sweep.maxConcurrent: peak and earliest peak instant; [start,end) half-open") {
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val df = Seq(
      // g1: [0,10), [5,15), [10,20) → peak 2 (at min 5); the [10,20)
      // start does NOT overlap the [0,10) end (half-open)
      ("g1", ts(0), ts(10)), ("g1", ts(5), ts(15)), ("g1", ts(10), ts(20)),
      // g2: three fully-overlapping intervals → peak 3 at min 2
      ("g2", ts(0), ts(30)), ("g2", ts(1), ts(30)), ("g2", ts(2), ts(30))
    ).toDF("g", "start", "end")
    val out = graft.operators.Sweep.maxConcurrent(df, Seq("g"),
        col("start"), col("end"))
      .orderBy("g").collect()
    assert(out(0).getLong(1) == 2L)
    assert(out(0).getTimestamp(2) == ts(5))
    assert(out(1).getLong(1) == 3L)
    assert(out(1).getTimestamp(2) == ts(2))
  }

  test("Graph.triangles: each triangle exactly once; open wedges excluded") {
    // K4 on {1,2,3,4} (4 triangles) + open wedge 4-5-6 (no edge 4-6)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
                    (3L, 4L), (4L, 5L), (5L, 6L)).toDF("src", "dst")
    val tri = graft.operators.Graph.triangles(edges, "src", "dst").collect()
    assert(tri.length == 4)                 // C(4,3), wedge closed nowhere
    assert(tri.forall(r => r.getLong(0) < r.getLong(1) &&
                           r.getLong(1) < r.getLong(2)))
    assert(tri.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ==
      Set((1L,2L,3L), (1L,2L,4L), (1L,3L,4L), (2L,3L,4L)))
  }

  test("Profiler.corrStats merge: split halves merge to the whole, exactly") {
    import graft.operators.Profiler
    val df = (1 to 200).map { i =>
      (i.toLong, i.toDouble, (i * i % 97).toDouble, (200 - i).toDouble)
    }.toDF("id", "x", "y", "z")
    val cols = Seq("x", "y", "z")
    val whole = Profiler.corrMatrix(df, cols).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val merged = Profiler.corrFromStats(
        Profiler.corrMergeStats(
          Profiler.corrStats(df.filter(col("id") <= 100L), cols),
          Profiler.corrStats(df.filter(col("id") > 100L), cols)),
        cols).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(merged == whole)   // exact decimal state: bit-identical, not close

    // overflow of the decimal(19,0) quantization raises LOUDLY instead
    // of NULLing-and-dropping the row while __n still counts it
    val huge = Seq((1.0e18, 2.0), (1.0, 3.0)).toDF("x", "y")
    val ex = intercept[Exception] {
      Profiler.corrStats(huge, Seq("x", "y"), scale = 2).collect()
    }
    assert(ex.getMessage.contains("corrStats") ||
           Option(ex.getCause).exists(_.getMessage.contains("corrStats")))
  }

  test("Skew.keyProfile: hot key surfaces, Gini separates skew from uniform") {
    import graft.operators.Skew
    val uniform = (1 to 40).flatMap(k => (1 to 5).map(_ => k.toLong))
      .toDF("k")
    val skewed = ((1 to 39).flatMap(k => (1 to 2).map(_ => k.toLong)) ++
      (1 to 122).map(_ => 40L)).toDF("k")
    val u = Skew.keyProfile(uniform, "k", topK = 3).collect()
    val s = Skew.keyProfile(skewed, "k", topK = 3).collect()
    assert(u.head.getDouble(7) == 0.0)              // perfectly uniform: Gini 0
    assert(s.head.getDouble(7) > 0.5)               // one key owns 61%
    assert(s.head.getInt(0) == 1 && s.head.getLong(1) == 40L)  // hot key ranked 1
    assert(s.head.getLong(2) == 122L)
    assert(s.head.getDouble(6) > 20.0)              // max/mean ratio
  }

  test("Profiler.diff: drift flagged, stable columns quiet, schema change surfaces") {
    import graft.operators.Profiler
    val v1 = Seq((1L, "x", 10.0), (2L, "y", 20.0)).toDF("id", "s", "v")
    val v2 = Seq((1L, "x", 10.0), (2L, "y", 99.0), (3L, "y", 20.0))
      .toDF("id", "s", "v")
    val d = Profiler.diff(v1, v2).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(d("v").getBoolean(7))                 // max moved 20 → 99
    assert(!d("s").getBoolean(7))                // min/max strings unchanged
    assert(d("id").getLong(3) == 1L)             // delta_nonnull
    // dropped column: one-sided row, not a vanished one
    val d2 = Profiler.diff(v1, v2.drop("v")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(d2.contains("v") && d2("v").isNullAt(2))  // n_b null: gone in v2
  }

  test("JaroWinklerSim: textbook values, DuckDB edge semantics, codegen path") {
    import graft.plans.JaroWinklerNative.jaroWinkler
    val df = Seq(
      ("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"), ("DWAYNE", "DUANE"),
      ("abcdef", "abcfde"),   // odd transposition count: integer t/2
      ("", "abc"), ("", ""),  // empty → 0.0 (DuckDB convention)
      ("CRATE", "TRACE"),     // jaro ≤ 0.7+: no prefix anyway
      ("abqqqqqq", "abzzzzzzzzzzzz")  // prefix present, jaro < 0.7: NO boost
    ).toDF("a", "b")
    val jw = df.select(round(jaroWinkler(spark, col("a"), col("b")), 4))
      .collect().map(_.getDouble(0)).toSeq
    assert(jw == Seq(0.9611, 0.8133, 0.84, 0.9611, 0.0, 0.0, 0.7333, 0.4643))
    // the expression runs inside codegen (no CodegenFallback): assert
    // the projection stays whole-stage (a Range source, so the local
    // relation can't constant-fold the projection away)
    val ranged = spark.range(4).select(
      jaroWinkler(spark, concat(lit("MARTH"), col("id").cast("string")),
                  lit("MARTHA")).as("jw"))
    val plan = ranged.queryExecution.executedPlan.toString
    // the "*(n)" prefix is the whole-stage-codegen marker in the
    // simple plan string; a CodegenFallback projection would lack it
    assert(plan.linesIterator.next().trim.startsWith("*("), plan)
    assert(ranged.count() == 4)
    // non-string args are cast at ANALYSIS time (the registration wraps
    // both sides in Cast(_, StringType)) — an int column works cleanly
    // instead of ClassCastException-ing inside generated code
    val casted = Seq((1212, 1221)).toDF("x", "y")
      .select(round(jaroWinkler(spark, col("x"), col("y")), 4))
      .collect().head.getDouble(0)
    assert(casted == 0.9333)  // JW("1212","1221"): transposed middle pair
  }

  test("Eval.auc: separation=1, anti-separation=0, all-ties=0.5, hand case") {
    import graft.operators.Eval
    def aucOf(rows: Seq[(Double, Boolean)]): Double =
      Eval.auc(rows.toDF("s", "y"), "s", col("y")).head().getDouble(2)
    val perfect = Seq((1.0, false), (2.0, false), (3.0, true), (4.0, true))
    assert(aucOf(perfect) == 1.0)
    assert(aucOf(perfect.map { case (s, y) => (s, !y) }) == 0.0)
    assert(aucOf(Seq((5.0, true), (5.0, false), (5.0, true), (5.0, false))) == 0.5)
    // hand-computed with one tie: pos {2, 3}, neg {1, 3}: pairs
    // (2>1)=1, (2<3)=0, (3>1)=1, (3,3) tie=0.5 → 2.5/4
    assert(aucOf(Seq((1.0, false), (2.0, true), (3.0, true), (3.0, false))) == 0.625)
  }

  test("Eval.calibration: rates and bins line up") {
    import graft.operators.Eval
    val rows = (1 to 100).map { i =>
      (i.toDouble, i > 50 + (i % 10) - 5) // rate grows with score
    }
    val out = Eval.calibration(rows.toDF("s", "y"), "s", col("y"),
        lo = 0.0, hi = 100.0, nBins = 4)
      .orderBy("bin").collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3))
    assert(out.map(_.getLong(1)).sum == 100L)
    val rates = out.map(_.getDouble(4))
    assert(rates.head < 0.2 && rates.last > 0.8)  // monotone-ish ramp
  }

  test("Eval.prCurve and groupRates: hand-counted rates, NULL degenerate edges") {
    import graft.operators.Eval
    val df = Seq((10.0, true, "a"), (20.0, true, "a"), (5.0, false, "a"),
                 (30.0, false, "b"), (1.0, false, "b"))
      .toDF("s", "y", "g")
    val pr = Eval.prCurve(df, "s", col("y"), Seq(0.0, 15.0, 100.0))
      .orderBy("threshold").collect()
    // t=0: everything selected → precision = 2/5, recall 1
    assert(pr(0).getDouble(4) == 0.4 && pr(0).getDouble(5) == 1.0)
    // t=15: selected {20, 30} → tp=1, fp=1; recall 1/2
    assert(pr(1).getDouble(4) == 0.5 && pr(1).getDouble(5) == 0.5)
    // t=100: nothing selected → precision NULL, recall 0
    assert(pr(2).isNullAt(4) && pr(2).getDouble(5) == 0.0)
    val gr = Eval.groupRates(df, "g", "s", col("y"), threshold = 15.0)
      .orderBy("grp").collect()
    // group a: 2/3 base rate, selects {20} → tpr 1/2, fpr 0
    assert(gr(0).getDouble(4) == 0.5 && gr(0).getDouble(5) == 0.0)
    // group b: NO positives → tpr NULL (not 0-by-convention); fpr 1/2
    assert(gr(1).isNullAt(4) && gr(1).getDouble(5) == 0.5)
  }

  test("Sampling.splitAudit: fractions near weights, leak_free proven") {
    val df = (1L to 2000L).map(u => (u, s"e$u")).toDF("user_id", "payload")
      .union((1L to 2000L).map(u => (u, s"f$u")).toDF("user_id", "payload"))
    val out = Sampling.splitAudit(df, "user_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).collect()
    assert(out.length == 3)
    assert(out.forall(_.getBoolean(4)), "no user may straddle splits")
    val byName = out.map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(byName("train") > 0.7 && byName("train") < 0.9)
    // every row of a user follows the user: per-split rows are 2× groups
    assert(out.forall(r => r.getLong(2) == 2 * r.getLong(1)))
  }

  test("cdcChunkStats: boundaries re-align after a front insertion (CDC property)") {
    // non-repeating pseudorandom text (seeded java.util.Random is a
    // fixed spec) so within-doc chunks can't self-duplicate
    val rnd = new scala.util.Random(42)
    val base = (0 until 1200).map(_ => ('a' + rnd.nextInt(26)).toChar)
      .mkString
    val df = Seq((1L, base), (2L, "INSERTED-PREFIX " + base))
      .toDF("id", "text")
    val r = SpanDedup.cdcChunkStats(df, "id", "text").head()
    val nChunks = r.getAs[Long]("n_chunks")
    val nDup = r.getAs[Long]("n_dup_chunks")
    // ~1200/64 = 18 expected chunks per doc; after the first shared
    // boundary every later chunk of the twin equals the original's —
    // the CDC claim: most chunks dedup despite the shifted prefix
    assert(nChunks >= 10L)
    assert(r.getAs[Long]("max_dup") == 2L)
    assert(nDup.toDouble >= 0.5 * (nChunks - nDup) / 2.0,
      s"insertion robustness: $nDup dup of $nChunks")
    // chunks tile the text exactly: total length = sum of doc lengths
    val total = math.round(r.getAs[Double]("avg_len") * nChunks)
    assert(total == base.length * 2 + "INSERTED-PREFIX ".length)
    // sub-window doc: single whole-text chunk per doc
    val tiny = SpanDedup.cdcChunkStats(
      Seq((1L, "short"), (2L, "tiny")).toDF("id", "text"), "id", "text")
      .head()
    assert(tiny.getAs[Long]("n_chunks") == 2L)
    assert(tiny.getAs[Long]("n_distinct") == 2L)
  }
}
