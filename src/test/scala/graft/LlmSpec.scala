package graft

import org.apache.spark.sql.functions._

import graft.llm.{Multimodal, NearDup, Packing, Sampling, Similarity, TextStats}

class LlmSpec extends SparkSpec {
  import spark.implicits._

  private val docA = "the quick brown fox jumps over the lazy dog near the river bank today"
  private val docB = "the quick brown fox jumps over the lazy dog near the river bank tonight" // near-dup of A
  private val docC = "completely different words about spark engines and columnar execution plans"

  test("minhash-LSH near-dup pipeline finds the planted pair and only it") {
    val docs = Seq((1L, docA), (2L, docB), (3L, docC)).toDF("doc_id", "text")
    val pairs = NearDup.nearDupPairs(docs, "doc_id", "text",
      shingleSize = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((1L, 2L)))
  }

  test("native minhash signature: fused minima match a direct computation") {
    val hs = Seq((1L, Seq(11L, 22L, 33L, 44L)), (2L, Seq.empty[Long]))
      .toDF("id", "hs")
    val out = hs.select($"id",
        graft.plans.MinHashNative.minhashNative(spark, $"hs", 8).as("sig"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[Long](1))).toMap
    val expected = (0 until 8).map { j =>
      Seq(11L, 22L, 33L, 44L)
        .map(h => org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(h, j.toLong))
        .min
    }
    assert(out(1L).get.toSeq === expected)
    assert(out(2L).isEmpty) // empty shingle set -> null signature
  }

  test("banded Hamming near-dup: pigeonhole recall equals brute force on random 64-bit strings") {
    val rnd = new scala.util.Random(42)
    val r = 3
    def randBits(): Array[Char] =
      Array.fill(64)(if (rnd.nextBoolean()) '1' else '0')
    def flipN(b: Array[Char], n: Int): Array[Char] = {
      val out = b.clone()
      rnd.shuffle((0 until 64).toList).take(n)
        .foreach(i => out(i) = if (out(i) == '1') '0' else '1')
      out
    }
    // 18 random bases x 3 noisy copies at <= r flips (planted
    // positives; random 64-bit pairs are essentially never within 3),
    // plus one pair at EXACTLY r+1 flips — the boundary negative the
    // exact verify must reject even when banding offers it up.
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    var id = 0L
    (0 until 18).foreach { _ =>
      val base = randBits()
      rows += ((id, new String(base))); id += 1
      (0 until 2).foreach { _ =>
        rows += ((id, new String(flipN(base, rnd.nextInt(r + 1))))); id += 1
      }
    }
    val nb = randBits()
    rows += ((id, new String(nb))); val negA = id; id += 1
    rows += ((id, new String(flipN(nb, r + 1)))); val negB = id; id += 1

    val df = rows.toSeq.toDF("doc", "bits")
    def ham(a: String, b: String): Long =
      a.zip(b).count { case (x, y) => x != y }.toLong
    val all = rows.toSeq
    val truth = (for {
      (ia, ba) <- all; (ib, bb) <- all
      if ia < ib; h = ham(ba, bb) if h <= r
    } yield (ia, ib, h)).toSet
    assert(truth.nonEmpty)

    // (a) pigeonhole: banded candidates are a SUPERSET of every true
    // pair at distance <= r (zero false negatives before the verify)
    val cands = NearDup.pairsFromBanded(
        NearDup.hammingBandedBuckets(df, "doc", col("bits"), r),
        Int.MaxValue)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(truth.map(t => (t._1, t._2)).subsetOf(cands))

    // (b) end-to-end: banded + exact verify == brute force, exactly
    val got = NearDup.hammingNearDupPairs(df, "doc", "bits", r)
      .select("id_a", "id_b", "hamming").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(got === truth)

    // (c) the distance-(r+1) boundary pair is rejected
    assert(ham(rows(negA.toInt)._2, rows(negB.toInt)._2) === (r + 1).toLong)
    assert(!got.exists(p => p._1 == negA && p._2 == negB))
  }

  test("simhash: near-identical docs land within small hamming distance") {
    val docs = Seq((1L, docA), (2L, docB), (3L, docC)).toDF("doc_id", "text")
    val sh = NearDup.simhash64(
      docs.select($"doc_id", NearDup.tokenSet($"text").as("t")), "doc_id", $"t")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(2L)) < ham(sh(1L), sh(3L)))
    assert(ham(sh(1L), sh(2L)) <= 12)
  }

  test("affine minhash expression matches the portable modular arithmetic") {
    val P = 2147483647L
    val hs = Seq(5L, 1234567L, P - 1)
    val expected = (0 until 8).map(j => hs.map(h => (h * (2 * j + 1) + j) % P).min)
    val got = Seq(Tuple1(hs.toArray)).toDF("hs")
      .select(graft.plans.AffineMinHashNative
        .affineMinhash(spark, $"hs", 8).as("sig"))
      .collect().head.getSeq[Long](0)
    assert(got === expected)
    // empty -> null (no signature)
    val empty = Seq(Tuple1(Array.empty[Long])).toDF("hs")
      .select(graft.plans.AffineMinHashNative.affineMinhash(spark, $"hs", 8))
      .collect().head
    assert(empty.isNullAt(0))
  }

  test("native simhash expression is bit-identical to the 64-fold HOF form") {
    val docs = Seq((1L, docA), (2L, docB), (3L, docC), (4L, ""), (5L, "one two"))
      .toDF("doc_id", "text")
      .select($"doc_id", NearDup.tokenSet($"text").as("t"))
    val native = NearDup.simhash64(docs, "doc_id", $"t")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hof = NearDup.simhash64Hof(docs, "doc_id", $"t")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native === hof)
    assert(native.nonEmpty)
  }

  test("cosineTopK: exact neighbors on known vectors") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.cosineTopK(vecs, "vec_id", "embedding",
        vecs.filter($"vec_id" === 0), "vec_id", "embedding", 2)
      .orderBy($"cos_sim".desc).collect().map(_.getLong(1))
    assert(out.toSeq === Seq(1L, 2L)) // closest first, anti-parallel excluded
  }

  test("annTopK returns exact-cosine-scored rows from its bucket") {
    val vecs = (0L until 50L).map { i =>
      (i, Array.tabulate(8)(j => math.sin((i * 8 + j).toDouble).toFloat))
    }.toDF("vec_id", "embedding")
    val ann = Similarity.annTopK(vecs, "vec_id", "embedding",
      vecs.filter($"vec_id" < 3), "vec_id", "embedding", k = 5, dim = 8, bits = 2)
    assert(ann.count() > 0)
    assert(ann.columns.toSet === Set("qid", "cid", "cos_sim"))
  }

  test("native codegen cosine agrees with the HOF formulation") {
    val vecs = (0L until 20L).map { i =>
      (i, Array.tabulate(16)(j => math.cos((i * 16 + j).toDouble).toFloat))
    }.toDF("vec_id", "embedding")
    val fold = Similarity.cosineTopK(vecs, "vec_id", "embedding",
      vecs.filter($"vec_id" < 3), "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val native = Similarity.cosineTopKNative(vecs, "vec_id", "embedding",
      vecs.filter($"vec_id" < 3), "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(native.keySet === fold.keySet)
    // bit-identical: same dot/norm accumulation order and same
    // sqrt(nx)*sqrt(ny) formulation as the HOF fold
    native.foreach { case (k, v) => assert(v === fold(k)) }
  }

  test("ivfTopK: high recall on clustered vectors") {
    // 4 well-separated clusters of 25 vectors each
    val vecs = (0L until 100L).map { i =>
      val cluster = (i % 4).toInt
      val base = Array.tabulate(8)(j => if (j == cluster * 2) 10.0f else 0.0f)
      (i, base.zipWithIndex.map { case (v, j) =>
        v + math.sin((i * 8 + j).toDouble).toFloat * 0.1f })
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" < 4)
    val exact = Similarity.cosineTopK(vecs, "vec_id", "embedding",
      queries, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(vecs, "vec_id", "embedding",
      queries, "vec_id", "embedding", 5, nCentroids = 8, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivf & exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF recall $recall too low on clustered data")
  }

  test("langId marker heuristic") {
    val out = Seq(
      "the cat and the hat of a house",
      "der hund und die katze und das haus",
      "le chien et la maison et les chats",
      "xyzzy plugh").toDF("text")
      .select(TextStats.langId($"text")).as[String].collect()
    assert(out.toSeq === Seq("en", "de", "fr", "und"))
  }

  test("text stats: tokens, punct ratio, stopword ratio") {
    val df = Seq("the quick fox!").toDF("text")
    val r = df.select(
      TextStats.tokenCount($"text").as("n"),
      TextStats.punctRatio($"text").as("p"),
      TextStats.stopwordRatio($"text", Seq("the")).as("s")).collect().head
    assert(r.getInt(0) === 3)
    assert(math.abs(r.getDouble(1) - 1.0 / 14) < 1e-12)
    assert(math.abs(r.getDouble(2) - 1.0 / 3) < 1e-12)
  }

  test("fingerprint is whitespace/case-insensitive, rollingHash64 deterministic") {
    val fp = Seq("Hello  World", "hello world").toDF("t")
      .select(TextStats.fingerprint($"t")).as[String].collect()
    assert(fp(0) === fp(1) && fp(0).length === 16)
    val rh = Seq("abc", "abc", "abd").toDF("t")
      .select(TextStats.rollingHash64($"t")).as[Long].collect()
    assert(rh(0) === rh(1) && rh(0) != rh(2))
    // long inputs stay in [0, 2^31) — no ANSI overflow (the classic
    // wrapping h*31+c formulation throws under ANSI mode)
    val big = Seq("x" * 100000).toDF("t")
      .select(TextStats.rollingHash64($"t")).as[Long].collect().head
    assert(big >= 0L && big < 2147483648L)
  }

  test("bpeish token estimate splits words, digits, and punctuation runs") {
    val n = Seq("don't count-me 42x!").toDF("t")
      .select(TextStats.bpeishTokens($"t")).as[Int].collect().head
    // don / ' / t / count / - / me / 42 / x / ! = 9
    assert(n === 9)
  }

  test("deterministic splits: full coverage, ~declared proportions, stable") {
    val ids = (0L until 1000L).toDF("id")
    val split = Sampling.assignSplit($"id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = ids.select(split.as("s")).groupBy("s").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 1000L)
    assert(counts("train") > 700 && counts("train") < 900)
    assert(counts("val") > 50 && counts("test") > 50)
    // pure function of id: same assignment on re-evaluation
    val a = ids.select($"id", split.as("s")).collect().toSeq
    val b = ids.select($"id", split.as("s")).collect().toSeq
    assert(a === b)
  }

  test("packing: contiguous chunking bins by exclusive cumsum (may overflow budget)") {
    val docs = Seq((1L, 4L), (2L, 4L), (3L, 4L), (4L, 4L)).toDF("doc_id", "n_tokens")
    val bins = Packing.packBins(docs, "doc_id", "n_tokens",
        budget = 10, nShards = 1, Seq($"doc_id".asc))
      .orderBy("bin").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // exclusive cumsums 0,4,8,12 -> bins 0,0,0,1: bin 0 holds 12 > 10
    // tokens — the documented straddle, NOT first-fit.
    assert(bins.toSeq === Seq((0L, 3L, 12L), (1L, 1L, 4L)))
  }

  test("packing: strict first-fit closes a bin instead of overflowing it") {
    val docs = Seq((1L, 4L), (2L, 4L), (3L, 4L), (4L, 4L), (5L, 11L), (6L, 2L))
      .toDF("doc_id", "n_tokens")
    val out = Packing.assignBinsFirstFit(docs, "doc_id", "n_tokens",
        budget = 10, nShards = 1, Seq($"doc_id".asc))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    // 4+4=8 fits; +4 would be 12 -> close; 4+? next is 11 > 10 alone ->
    // closes bin 1 after doc 4; doc 5 (11 > budget) gets its own bin;
    // doc 6 starts fresh after the oversized bin.
    assert(out.toSeq === Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L),
                             (5L, 2L), (6L, 3L)))
    // invariant: no bin exceeds budget unless it is a single oversized doc
    val sums = Packing.packBinsFirstFit(docs, "doc_id", "n_tokens",
        budget = 10, nShards = 1, Seq($"doc_id".asc))
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    sums.foreach { case (nDocs, sumTok) =>
      assert(sumTok <= 10 || nDocs === 1L)
    }
  }

  test("packing: first-fit extraKeys pack each key independently") {
    val docs = Seq((1L, 6L, "a"), (2L, 6L, "a"), (3L, 6L, "a"),
                   (4L, 6L, "b"), (5L, 6L, "b"))
      .toDF("doc_id", "n_tokens", "split")
    val out = Packing.assignBinsFirstFit(docs, "doc_id", "n_tokens",
        budget = 10, nShards = 1, Seq($"doc_id".asc),
        extraKeys = Seq($"split"))
    assert(!out.columns.contains("__gkey"))
    val got = out.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(4)))
    // 6+6 > 10, so every doc gets its own bin — and bin numbering
    // restarts at 0 for each split, proving the packing never mixes
    // keys into one sequential fold.
    assert(got.toSeq === Seq((1L, "a", 0L), (2L, "a", 1L), (3L, "a", 2L),
                             (4L, "b", 0L), (5L, "b", 1L)))
  }

  test("byteEntropy: hand-computed, uniform bytes ln k, empty blobs absent") {
    val df = Seq((1L, "aabb".getBytes("UTF-8")),
                 (2L, "zzzz".getBytes("UTF-8")),
                 (3L, Array.emptyByteArray))
      .toDF("id", "blob")
    val got = Multimodal.byteEntropy(df, "id", "blob")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got(1L)._1 === 4L)
    assert(math.abs(got(1L)._2 - math.log(2)) < 1e-4) // two equiprobable bytes
    assert(got(2L)._2 === 0.0)                        // one byte value
    assert(!got.contains(3L))                         // empty blob absent
  }

  test("domainOutliers: planted off-direction vector ranks first, per domain") {
    val rows = Seq(
      (1L, "a", Array(10.0f, 0.0f)), (2L, "a", Array(9.0f, 1.0f)),
      (3L, "a", Array(10.0f, 0.5f)), (4L, "a", Array(0.0f, 10.0f)), // outlier
      (5L, "b", Array(0.0f, 5.0f)), (6L, "b", Array(5.0f, 0.0f)),   // outlier
      (7L, "b", Array(0.1f, 5.0f))).toDF("vec_id", "source", "embedding")
    val got = Similarity.domainOutliers(rows, "vec_id", "embedding",
        "source", k = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 4L, "b" -> 6L))
  }

  test("bigram NLL: hand-computed add-alpha scores, short docs absent") {
    // corpus: c1(a)=4, c1(b)=4, c1(solo)=1, V=3; c2("a b")=3, c2("b a")=2
    // P(a b) = (3+.5)/(4+.5*3) = 3.5/5.5 ; P(b a) = (2+.5)/5.5
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "b a"), (4L, "solo"))
      .toDF("doc_id", "text")
    val got = TextStats.bigramNll(docs, "doc_id", "text", alpha = 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    val lnP_ab = -math.log(3.5 / 5.5); val lnP_ba = -math.log(2.5 / 5.5)
    assert(got(1L)._1 === 3L)
    assert(math.abs(got(1L)._2 - (2 * lnP_ab + lnP_ba) / 3) < 1e-3)
    assert(math.abs(got(2L)._2 - lnP_ab) < 1e-3)
    assert(math.abs(got(3L)._2 - lnP_ba) < 1e-3)
    // "solo" has c1 presence but no transition: absent from output
    assert(!got.contains(4L))
  }

  test("winnowing: shared-run guarantee, density drop, short-doc edges") {
    import graft.llm.TextStats
    val k = 4; val w = 4
    // Two docs sharing a run of w+k-1 = 7 tokens (the guarantee
    // threshold) embedded in different contexts MUST share >= 1
    // fingerprint; a third unrelated doc shares none with either.
    val shared = "alpha beta gamma delta epsilon zeta eta"
    val docs = Seq(
      (1L, s"one two three $shared four five six seven eight"),
      (2L, s"nine ten eleven twelve $shared thirteen fourteen"),
      (3L, "totally unrelated words with no common grams at all here"),
      (4L, "tiny doc"),   // < k tokens -> no grams -> no fingerprints
      (5L, "a b c d e"))  // 2 grams < w -> one window over what exists
      .toDF("doc_id", "text")
    val fp = docs
      .select($"doc_id", TextStats.tokens($"text").as("__toks"))
      .select($"doc_id", TextStats.gramHashes($"__toks", k).as("__hs"))
      .select($"doc_id", size($"__hs").as("n_grams"),
              TextStats.winnowFromHashes($"__hs", w).as("fp"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getSeq[Long](2).toSet))).toMap
    assert((fp(1L)._2 & fp(2L)._2).nonEmpty, "guarantee violated")
    assert((fp(1L)._2 & fp(3L)._2).isEmpty)
    assert(fp(4L) === ((0, Set.empty[Long])))
    assert(fp(5L)._1 === 2 && fp(5L)._2.size === 1) // min of the 2 grams
    // density: fingerprints are a strict subset of gram count
    assert(fp(1L)._2.size < fp(1L)._1)
  }

  test("crossDocGramStats: shared 8-token span flagged, short docs absent") {
    val docs = Seq(
      (1L, "a b c d e f g h x"),        // grams: [a..h], [b..x]
      (2L, "z a b c d e f g h"),        // grams: [z..g], [a..h]  (shares [a..h])
      (3L, "p q r s t u v w y"),        // 2 grams, nothing shared
      (4L, "too short for grams"))      // < 8 tokens -> absent
      .toDF("doc_id", "text")
    val got = NearDup.crossDocGramStats(docs, "doc_id", "text", k = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq((1L, 2L, 1L, 0.5), (2L, 2L, 1L, 0.5),
                             (3L, 2L, 0L, 0.0)))
  }

  test("semanticDedup: parallel in-cluster vectors collapse to the min id") {
    // Three exactly-parallel direction clusters (cluster = id % 3, the
    // kmeansFit layout): within a cluster cosine is exactly 1, across
    // clusters exactly 0, so with tau = 0.9 every cluster keeps only
    // its minimum id. Cells are labeled by their seed centroid's id
    // (0, 2, 4 — spanning the three clusters).
    val base = Seq(
      Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0), Seq(0.0, 0.0, 1.0, 0.0))
    val rows = for {
      (dir, ci) <- base.zipWithIndex
      j <- 0 until 10
    } yield (3L * j + ci,
             dir.zipWithIndex.map { case (x, d) =>
               (x * 10 + (if (d == ci) j * 0.01 else 0.0)).toFloat }.toArray)
    val corpus = rows.toDF("vec_id", "embedding")
    val got = Similarity.semanticDedup(corpus, "vec_id", "embedding",
        nCentroids = 3, maxIter = 3, tau = 0.9)
      .orderBy("cell").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // cell 0 holds ids ≡ 0 (mod 3) → min 0; cell 2 holds ids ≡ 2 → min
    // 2; cell 4 (seed id 4, cluster 1) holds ids ≡ 1 → min 1.
    assert(got.toSeq === Seq((0L, 10L, 9L, 0L), (2L, 10L, 9L, 2L),
                             (4L, 10L, 9L, 1L)))
  }

  test("lcg: ANSI-safe for snowflake-scale and negative ids, stays in [0, 2^31)") {
    val ids = Seq(0L, 1L, Long.MaxValue, Long.MinValue, -1L, 1234567890123456789L)
      .toDF("id")
    val out = ids.select(Similarity.lcg($"id").as("h")).as[Long].collect()
    assert(out.forall(h => h >= 0L && h < 2147483648L))
    // negative ids must not all collapse into the first split
    val splits = Seq(-1L, -999999999999L, -5L, -12345678901L).toDF("id")
      .select(Sampling.assignSplit($"id",
        Seq("train" -> 0.5, "val" -> 0.5)).as("s"))
      .as[String].collect().toSet
    assert(splits.size > 1, s"negative ids all routed to $splits")
  }

  test("embedding near-dup: identical vectors pair at cos 1, orthogonal don't") {
    val rows = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f, 0.0f)),  // dup of 1
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)))  // orthogonal
    val df = rows.toDF("vec_id", "embedding")
    val pairs = NearDup.embedNearDupPairs(df, "vec_id", "embedding",
        dim = 4, bits = 1, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((1L, 2L)))
  }

  test("multimodal: batched feature extraction over binary media (stubbed decode)") {
    val rows = Seq(
      Multimodal.MediaRow(1L, Array[Byte](1, 2, 3, 4), "image"),
      Multimodal.MediaRow(2L, Array[Byte](9, 9, 9), "audio")).toDS()
    val feats = Multimodal.extractFeatures(rows, Multimodal.FakeDecoder, batchSize = 2)
      .collect().sortBy(_.id)
    assert(feats.map(_.nBytes).toSeq === Seq(4, 3))
    assert(feats.forall(_.features.length === 8))
    // determinism: same bytes → same features
    val again = Multimodal.extractFeatures(rows, Multimodal.FakeDecoder)
      .collect().sortBy(_.id)
    assert(feats.head.features.toSeq === again.head.features.toSeq)
  }

  test("resize stub: nearest-neighbor to exact target length, batched pipeline") {
    val px = Array(0f, 1f, 2f, 3f, 4f, 5f, 6f, 7f)
    // downsample 8 -> 4: picks 0,2,4,6
    assert(Multimodal.resizeNearest(px, 4).toSeq === Seq(0f, 2f, 4f, 6f))
    // upsample 8 -> 16: each source pixel exactly twice, order kept
    val up = Multimodal.resizeNearest(px, 16)
    assert(up.length === 16 && up.toSeq === px.toSeq.flatMap(p => Seq(p, p)))
    // same-size resize is identity
    assert(Multimodal.resizeNearest(px, 8).toSeq === px.toSeq)
    // full decode -> resize -> features plumbing at a fixed width
    val rows = Seq(Multimodal.MediaRow(1L, Array[Byte](1, 2, 3, 4), "image")).toDS()
    val out = Multimodal.extractResized(rows, Multimodal.FakeDecoder,
      targetLen = 4, batchSize = 2).collect().head
    assert(out.features.length === 4)
  }

  test("frame sampling stub strides the byte stream") {
    val frames = Multimodal.sampleFrames(Array.tabulate[Byte](100)(_.toByte), 10, 2)
    assert(frames.length === 5)
    assert(frames.head.toSeq === (0 until 10).map(_.toByte))
  }

  test("PQ-ADC: a duplicated vector attains the minimum ADC distance") {
    val rnd = new scala.util.Random(7)
    val base = (0 until 20).map(i =>
      (i.toLong, Seq.fill(16)(rnd.nextFloat() * 2f - 1f)))
    // vec 17 is an exact copy of vec 5 → identical codes, so its ADC
    // distance to query 5 is the smallest any candidate can score.
    val corpus = base.map { case (id, v) =>
      if (id == 17L) (id, base(5)._2) else (id, v)
    }.toDF("vec_id", "embedding")
    val out = Similarity.pqTopK(corpus, "vec_id", "embedding",
        corpus.filter($"vec_id" === 5), "vec_id", "embedding",
        k = 20, nSub = 4, nCodes = 8)
      .orderBy($"adc_dist".asc, $"cid".asc)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(out.length === 19) // all candidates except the query itself
    val minDist = out.map(_._2).min
    assert(out.find(_._1 == 17L).get._2 === minDist)
    // distances are non-negative and the result is sorted
    assert(out.forall(_._2 >= 0.0))
    assert(out.map(_._2).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
  }

  test("shuffleOrder: contiguous per-shard positions, stable under repartition") {
    val docs = (0L until 200L).toDF("doc_id")
    val a = Sampling.shuffleOrder(docs, "doc_id", nShards = 4)
      .select("shard", "pos", "doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(x => (x._1, x._2))
    // positions are 1..n contiguous within each shard, rows cover all ids
    a.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).toSeq === (1 to rows.length))
    }
    assert(a.map(_._3).sorted.toSeq === (0L until 200L))
    // pure function of ids: identical under a different partitioning
    val b = Sampling.shuffleOrder(docs.repartition(7), "doc_id", nShards = 4)
      .select("shard", "pos", "doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(x => (x._1, x._2))
    assert(a.toSeq === b.toSeq)
  }

  test("lloydStep matches an independent driver-side reimplementation") {
    val rnd = new scala.util.Random(11)
    val corpus = (0 until 30).map(i =>
      (i.toLong, Seq.fill(8)(rnd.nextFloat() * 2f - 1f)))
    val df = corpus.toDF("vec_id", "embedding")

    val k = 3
    val got = Similarity.lloydStep(df, "vec_id", "embedding", nCentroids = k)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getDouble(2), r.getLong(3)))
      .toMap

    // Independent reimplementation: same LCG seed selection, spherical
    // assignment (sequential index-order double dot), exact 1e-6
    // quantized means.
    def lcg(id: Long): Long = (1103515245L * (id % 2147483648L) + 12345L) % 2147483648L
    def dot(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
    def cos(a: Seq[Float], b: Seq[Float]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val cents = corpus.sortBy { case (id, _) => (lcg(id), id) }.take(k)
    val assigned = corpus.map { case (id, v) =>
      val cell = cents.map { case (cid, cv) => (cos(v, cv), cid) }
        .maxBy { case (c, cid) => (c, -cid) }._2
      (cell, v)
    }
    val expected = assigned.groupBy(_._1).flatMap { case (cell, members) =>
      (0 until 8).map { dim =>
        val quanta = members.map { case (_, v) =>
          BigDecimal(v(dim).toDouble * 1e6)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        }
        val mean = quanta.sum.toDouble / (1e6 * members.length)
        (cell, dim) -> (BigDecimal(mean).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          .toDouble, members.length.toLong)
      }
    }
    assert(got.size === expected.size)
    expected.foreach { case (key, (mean, n)) =>
      val (gm, gn) = got(key)
      assert(gn === n, s"n_members mismatch at $key")
      assert(gm === mean, s"centroid_val mismatch at $key")
    }
    // every corpus row lands in exactly one cell
    assert(got.values.collect { case (_, n) => n }.sum === 30L * 8)
  }

  test("repetition metrics: duplicate n-gram fractions and top-token share") {
    val docs = Seq(
      (1L, "a b a b c"),  // bigrams ab,ba,ab,bc -> 1 dup of 4
      (2L, "x y z"),      // all distinct
      (3L, "w"),          // below n=2: no grams, whole doc is one token
      (4L, "r r r r")     // degenerate: one repeated token
    ).toDF("doc_id", "text")
    val out = docs.select($"doc_id",
        TextStats.duplicateNgramFraction($"text", 2).as("d2"),
        TextStats.duplicateNgramFraction($"text", 3).as("d3"),
        TextStats.topTokenFraction($"text").as("top"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(out(1L) === ((0.25, 0.0, 0.4)))
    assert(out(2L) === ((0.0, 0.0, 1.0 / 3)))
    assert(out(3L) === ((0.0, 0.0, 1.0)))
    assert(out(4L) === ((2.0 / 3, 0.5, 1.0)))
  }

  test("tf-idf top terms: hand-computed scores, deterministic tie-break") {
    val docs = Seq((1L, "a a b"), (2L, "a c"), (3L, "c c c")).toDF("doc_id", "text")
    val out = TextStats.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
                 r.getDouble(4), r.getInt(5)))
      .sortBy(t => (t._1, t._6))
      .toSeq
    // N=3; df: a=2, b=1, c=2. Scores: ln3=1.098612, ln1.5=0.405465.
    assert(out === Seq(
      (1L, "b", 1L, 1L, 1.098612, 1), (1L, "a", 2L, 2L, 0.81093, 2),
      (2L, "a", 1L, 2L, 0.405465, 1), (2L, "c", 1L, 2L, 0.405465, 2), // exact tie -> token asc
      (3L, "c", 3L, 2L, 1.216395, 1)))
  }

  test("kmeansFit: planted direction clusters converge to their means") {
    // three well-separated direction clusters in 4-d. Lloyd is
    // seed-dependent (two seeds in one cluster can never split a
    // missed cluster), so ids are laid out as cluster = id % 3: the
    // three smallest (lcg(id), id) among 0..29 are 0, 2, 4, which
    // span all three clusters.
    val base = Seq(
      Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0), Seq(0.0, 0.0, 1.0, 0.0))
    val rows = for {
      (dir, ci) <- base.zipWithIndex
      j <- 0 until 10
    } yield (3L * j + ci,
             dir.zipWithIndex.map { case (x, d) =>
               (x * 10 + (if (d == ci) j * 0.01 else 0.0)).toFloat }.toArray)
    val corpus = rows.toDF("vec_id", "embedding")
    val (fit, iters) = Similarity.kmeansFit(corpus, "vec_id", "embedding",
      nCentroids = 3, maxIter = 10, tol = 1e-10)
    val got = fit.collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getDouble(2), r.getLong(3))))
      .toMap
    assert(iters <= 10)
    // every cell converged with 10 members; its dominant dimension's
    // centroid is the cluster mean 10 + mean(j*0.01) = 10.045
    val cells = got.keys.map(_._1).toSet
    assert(cells.size === 3)
    cells.foreach { c =>
      val dims = (0 until 4).map(d => got((c, d)))
      dims.foreach { case (_, n) => assert(n === 10L) }
      val dominant = dims.map(_._1).max
      assert(math.abs(dominant - 10.045) < 1e-9)
    }
  }

  test("char entropy: hand-computed, uniform text scores zero") {
    val docs = Seq((1L, "aab"), (2L, "zzzz")).toDF("doc_id", "text")
    val out = TextStats.charEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // doc1: ln3 - (2 ln2)/3 = 0.636514; doc2: single symbol -> 0
    assert(out(1L) === ((3L, 0.6365)))
    assert(out(2L) === ((4L, 0.0)))
  }

  test("unigram NLL: hand-computed scores under the corpus distribution") {
    // corpus tokens a,a,b,c -> N=4, c(a)=2, c(b)=c(c)=1
    val docs = Seq((1L, "a a b"), (2L, "c")).toDF("doc_id", "text")
    val out = TextStats.unigramNll(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // doc1: (2*(-ln .5) + -ln .25)/3 = 0.924196 -> 0.9242; doc2: -ln .25 -> 1.3863
    assert(out(1L) === ((3L, 0.9242)))
    assert(out(2L) === ((1L, 1.3863)))
  }

  test("tf-idf plan: tf aggregation and top-k window share one corpus exchange") {
    val docs = Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text")
    val plan = TextStats.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .queryExecution.executedPlan.toString
    // exactly 2 shuffles: the corpus repartition by doc_id (which the
    // (doc_id, token) aggregation AND the per-doc window both satisfy
    // via subset clustering) + the vocabulary-sized doc-freq aggregate.
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles === 2, s"expected 2 shuffle exchanges, plan:\n$plan")
  }

  test("mixedLanguage: a doc that flips language mid-stream is flagged") {
    val en = Seq.fill(5)("the cat and a dog of it").mkString(" ")   // 35 tok
    val de = Seq.fill(5)("der hund und die katze das war").mkString(" ")
    val docs = Seq(
      (1L, en),                // monolingual
      (2L, en + " " + de),     // flips en -> de across chunks
      (3L, "x1 x2 x3"))        // no markers at all
      .toDF("doc_id", "text")
    val out = TextStats.mixedLanguage(docs, "doc_id", "text", chunkSize = 20)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(2), r.getBoolean(4)))).toMap
    assert(out(1L) === (("en", false)))
    assert(out(2L)._2 === true)
    assert(out(3L) === (("und", false))) // und never counts as mixed
  }

  test("prefix-filter join: lossless vs brute force; threshold boundary exact") {
    // docs 1/2: jaccard = 4/6 = 0.667 (>= 0.6 keeps); docs 1/3:
    // 2/8 = 0.25 (drops); doc 4 disjoint
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d x"),
      (3L, "a b p q r s"),
      (4L, "z1 z2 z3")).toDF("doc_id", "text")
    val out = NearDup.prefixFilterJaccardPairs(docs, "doc_id", "text", 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1),
                           math.rint(r.getDouble(2) * 1e4) / 1e4))
    assert(out.toSeq === Seq((1L, 2L, 0.6667)))
    // brute force over the same fixture agrees (losslessness)
    val toks = docs.select($"doc_id", NearDup.tokenSet($"text").as("t"))
    val brute = toks.as("a").join(toks.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(NearDup.jaccard(col("a.t"), col("b.t")).as("j"))
      .filter($"j" >= 0.6).count()
    assert(brute === 1L)
  }

  test("dimStats: hand-computed per-dimension moments") {
    val vecs = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(3.0f, 0.0f)))
      .toDF("id", "v")
    val out = Similarity.dimStats(vecs, "v")
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5)))).toMap
    // dim0: mean 2, var ((1+9)/2 - 4) = 1; dim1: all zero
    assert(out(0) === ((2L, 2.0, 1.0, 1.0, 3.0)))
    assert(out(1) === ((2L, 0.0, 0.0, 0.0, 0.0)))
  }

  test("temperatureMix: alpha<1 boosts the small domain; caps at domain size") {
    // 90 docs in big, 10 in small. alpha=0.5: w_big = sqrt(90)/Z ≈ .75,
    // w_small = sqrt(10)/Z ≈ .25; budget 40 -> big floor(29.9999992)=29
    // (floor allocation may under-fill by a row — standard), small
    // floor(10.0000007)=10, exactly its size.
    val docs = ((1L to 90L).map(i => (i, "big")) ++
                (101L to 110L).map(i => (i, "small"))).toDF("id", "dom")
    val out = Sampling.temperatureMix(docs, "id", "dom",
                                      alpha = 0.5, budget = 40L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3),
                                              r.getLong(4)))).toMap
    val (nBig, tBig, kBig) = out("big")
    val (nSmall, tSmall, kSmall) = out("small")
    assert(nBig === 90L && nSmall === 10L)
    assert(tBig === 29L && kBig === 29L)
    assert(tSmall === 10L && kSmall === 10L)
    // proportional share of 40 would give small only 4 — the
    // temperature up-weighted it to its full 10.
  }

  test("temperatureMix: a budget beyond the corpus caps keeps at domain size") {
    val docs = (1L to 5L).map(i => (i, "only")).toDF("id", "dom")
    val row = Sampling.temperatureMix(docs, "id", "dom",
                                      alpha = 0.3, budget = 100L)
      .collect().head
    assert(row.getLong(3) === 100L) // target = all of the budget
    assert(row.getLong(4) === 5L)   // kept capped at corpus
    assert(row.getLong(5) === 15L)  // 1+2+3+4+5
  }

  test("tripletMine: planted geometry picks the right positive and negative") {
    // anchor (1,0); near-dup (0.9,0.1); mild match (0.5,0.5);
    // opposite (-1,0.1). Ceiling 0.3: positive = near-dup, negative
    // = the opposite vector (the only one under the ceiling).
    val rows = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0.5f, 0.5f)),
      (4L, Seq(-1.0f, 0.1f))).toDF("id", "v")
    val t = Similarity.tripletMine(rows, "id", "v",
        rows.filter($"id" === 1L), "id", "v", negCeiling = 0.3)
      .collect().head
    assert(t.getLong(0) === 1L)
    assert(t.getLong(1) === 2L)            // pos = near-dup
    assert(t.getLong(3) === 4L)            // neg = opposite
    assert(t.getDouble(2) > 0.99)
    assert(t.getDouble(4) < 0.0)
  }

  test("tripletMine: anchors with no row under the ceiling surface nulls") {
    val rows = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)))
      .toDF("id", "v")
    val t = Similarity.tripletMine(rows, "id", "v",
        rows.filter($"id" === 1L), "id", "v", negCeiling = 0.3)
      .collect().head
    assert(!t.isNullAt(1) && t.isNullAt(3) && t.isNullAt(4) && t.isNullAt(5))
  }
}
