package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting and shard assignment for training
  * pipelines. Every assignment is a pure function of the row's id —
  * reproducible across runs, engines, and repartitionings (no
  * rand()), and a narrow projection with zero shuffle.
  */
object Sampling {

  /** Uniform-ish fraction in [0, 1) from a numeric id via the shared
    * plain-arithmetic LCG (see Similarity.lcg — recomputable by any
    * SQL engine). The glibc LCG's low bits have short periods, so the
    * fraction keeps only bits 16..30 — the well-mixed high half of the
    * 31-bit state. Consequence: 15-bit resolution — fractions (and so
    * mixtureKeep / importanceKeep rates) quantize to multiples of
    * 2^-15 ≈ 3.05e-5; rates below that floor round to keeping the
    * fraction==0 ids only. For rarer sampling, compose two draws
    * (e.g. mixtureKeep at 1e-3 then prioritySample a fixed count). */
  def idFraction(id: Column): Column =
    shiftright(Similarity.lcg(id), 16).cast("double") / lit(32768.0) // 2^15

  /** Assign each row to a named split by cumulative weight over
    * [[idFraction]]. `splits` e.g. Seq("train" -> 0.8, "val" -> 0.1,
    * "test" -> 0.1); weights must sum to 1. */
  def assignSplit(id: Column, splits: Seq[(String, Double)]): Column = {
    val frac = idFraction(id)
    val cuts = splits.scanLeft(0.0)(_ + _._2).tail
    splits.init.zip(cuts.init).foldRight(lit(splits.last._1): Column) {
      case (((name, _), cut), rest) => when(frac < cut, lit(name)).otherwise(rest)
    }
  }

  /** Deterministic shard id in [0, nShards). */
  def shardOf(id: Column, nShards: Int): Column =
    pmod(Similarity.lcg(id), lit(nShards.toLong))

  /** Weighted sampling WITHOUT replacement, exact size k (Efraimidis &
    * Spirakis 2006): each row draws u = [[idFraction]](id) and ranks
    * by u^(1/w) — the top k are a weight-proportional sample. Ranking
    * uses the monotone-equivalent ln(u)/w (exp is monotone), because
    * ln's cross-engine determinism is proven (the q83 contract) while
    * pow's is not. Deterministic: the sample is a pure function of
    * ids and weights. Rows with u = 0 (the 15-bit [[idFraction]]
    * floor) are filtered explicitly — u^(1/w) = 0 can never win, and
    * engines disagree on ln(0) (null vs error). TakeOrdered top-k —
    * no global sort. Requires weights > 0. */
  def weightedSampleES(df: DataFrame, idCol: String, weightCol: String,
                       k: Int): DataFrame = {
    val esKey = log(idFraction(col(idCol))) / col(weightCol).cast("double")
    df.filter(idFraction(col(idCol)) > 0.0)
      .select(col(idCol), col(weightCol), esKey.as("__es"))
      .orderBy(col("__es").desc, col(idCol))
      .limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("__es").desc, col(idCol))))
      .select(col("rank").cast("long").as("rank"), col(idCol),
              col(weightCol), round(col("__es"), 9).as("es_key"))
  }

  /** Mixture (per-domain) sampling: keep a row iff [[idFraction]] of
    * its id falls below its domain's rate — how a training corpus is
    * re-weighted across sources (up/down-sample web vs books vs code)
    * without a shuffle or an rng. Domains absent from `rates` fall
    * back to `defaultRate`; rates are deterministic per row, so the
    * sample is stable under re-runs and re-partitionings and two
    * pipelines sampling at nested rates produce nested subsets
    * (idFraction < 0.1 implies idFraction < 0.5). */
  def mixtureKeep(id: Column, domain: Column, rates: Seq[(String, Double)],
                  defaultRate: Double): Column = {
    val rate = rates.foldLeft(lit(defaultRate): Column) {
      case (acc, (dom, r)) => when(domain === lit(dom), lit(r)).otherwise(acc)
    }
    idFraction(id) < rate
  }

  /** Quality-weighted (importance) sampling: keep a row iff
    * [[idFraction]] of its id falls below its own per-row `score` in
    * [0, 1] — keep probability proportional to quality, the
    * curriculum-style generalization of [[mixtureKeep]]'s per-domain
    * constant rate. Same properties: pure function of (id, score),
    * zero shuffle, stable under re-runs/re-partitionings, and nested
    * across monotone score transforms (raising every score only adds
    * rows). The score expression must be engine-portable arithmetic if
    * an external oracle recomputes the sample. */
  def importanceKeep(id: Column, score: Column): Column =
    idFraction(id) < score

  /** Fixed-COUNT deterministic per-group sample: the `n` rows with the
    * smallest (lcg(id), id) rank in each group — "exactly 25 eval docs
    * per language" where [[mixtureKeep]] gives a RATE. One exchange on
    * the group keys with map-side WindowGroupLimit (only candidate
    * winners cross the shuffle); no rand(), so the sample is stable
    * across runs, engines and partitionings, and growing `n` only adds
    * rows (prefixes of a fixed priority order are nested). */
  def prioritySample(df: DataFrame, groups: Seq[String], id: Column,
                     n: Int): DataFrame = {
    val w = Window.partitionBy(groups.map(col): _*)
      .orderBy(Similarity.lcg(id), id)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Temperature-scaled domain mixture (the multinomial-sampling
    * scheme of XLM-R / GPT-3 data curation): domain d's sampling
    * weight is n_d^alpha / Σ_e n_e^alpha, so alpha < 1 UP-weights
    * low-resource domains relative to proportional sampling (alpha=1
    * is proportional, alpha=0 uniform across domains). Each domain's
    * integer allocation is floor(budget · w_d), filled by the
    * deterministic (lcg(id), id) priority order of [[prioritySample]]
    * — so the selected set is a pure function of ids, nested in the
    * budget, and exactly reproducible by an external engine. Returns
    * the per-domain audit table: corpus count, weight, target,
    * kept count (= target unless the domain is smaller), checksum.
    *
    * Determinism of the weight arithmetic: n^alpha quantizes to 1e-6
    * and Z accumulates in DECIMAL(38,0); the allocation is INTEGER
    * division (budget·wq) div Z — no float threshold can straddle an
    * integer boundary differently across engines.
    *
    * Scale shape: the count agg map-side combines to #domains rows;
    * weights/targets live on that tiny frame and broadcast back; the
    * only corpus exchange is the one domain-keyed rank window (the
    * alternative — threshold on idFraction at rate t_d/n_d — is
    * exchange-free but binomial, not exact-allocation). */
  /** Exact stratified sampling with LARGEST-REMAINDER (Hamilton)
    * apportionment: the sample hits `total` EXACTLY (temperatureMix's
    * floor allocation leaves the remainder unfilled) while preserving
    * stratum proportions to within one row. Integer-only arithmetic:
    * base quota = (total·n_s) div N; the R = total − Σ base leftover
    * rows go to the strata with the largest division remainders
    * (ties → stratum key asc). Rows inside a stratum are picked in
    * (lcg(id), id) priority order — the [[prioritySample]] contract:
    * the kept set is a pure function of ids.
    *
    * Scale shape: stratum counts map-side combine to #strata rows; the
    * remainder-rank window runs on that BOUNDED frame (|strata| rows —
    * not corpus-scale, the q101/q135 class); quotas broadcast back and
    * the only corpus exchange is the per-stratum rank window.
    * Precondition: total <= N (can't sample more than exists).
    * Returns the audit: (strata*, n_docs, quota, n_kept, checksum). */
  def stratifiedExact(df: DataFrame, idCol: String, strataCols: Seq[String],
                      total: Long): DataFrame = {
    val sc = strataCols.map(col)
    val counts = df.groupBy(sc: _*).agg(count(lit(1)).as("n_docs"))
      .withColumn("__N", sum(col("n_docs")).over(Window.partitionBy()))
    val quotas = counts
      .withColumn("__base", expr(s"($total * n_docs) DIV __N"))
      .withColumn("__rem", lit(total) * col("n_docs") - col("__base") * col("__N"))
      .withColumn("__left",
        lit(total) - sum(col("__base")).over(Window.partitionBy()))
      .withColumn("__rk", row_number().over(
        Window.orderBy(col("__rem").desc +: sc.map(_.asc): _*)))
      .withColumn("quota",
        col("__base") + when(col("__rk") <= col("__left"), 1L).otherwise(0L))
      .select(sc :+ col("n_docs") :+ col("quota"): _*)
    val ranked = df
      .withColumn("__rn", row_number().over(
        Window.partitionBy(sc: _*)
          .orderBy(Similarity.lcg(col(idCol)), col(idCol))))
      .join(broadcast(quotas.select(sc :+ col("quota"): _*)), strataCols)
      .filter(col("__rn") <= col("quota"))
    val kept = ranked.groupBy(sc: _*)
      .agg(count(lit(1)).as("n_kept"),
           sum(col(idCol).cast("decimal(38,0)")).cast("long")
             .as("kept_id_checksum"))
    quotas.join(kept, strataCols, "left")
      .select(sc ++ Seq(col("n_docs"), col("quota"),
              coalesce(col("n_kept"), lit(0L)).as("n_kept"),
              col("kept_id_checksum")): _*)
  }

  def temperatureMix(df: DataFrame, idCol: String, domainCol: String,
                     alpha: Double, budget: Long): DataFrame = {
    val wq = round(pow(col("n_docs").cast("double"), lit(alpha)) * lit(1e6), 0)
      .cast("decimal(38,0)")
    val weights = df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("wq", wq)
      .withColumn("z", sum(col("wq")).over(Window.partitionBy()))
      .withColumn("n_target",
        expr(s"CAST(($budget * wq) DIV z AS BIGINT)"))
    val ranked = df
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(domainCol))
          .orderBy(Similarity.lcg(col(idCol)), col(idCol))))
      .join(broadcast(weights.select(col(domainCol), col("n_target"))),
            Seq(domainCol))
      .filter(col("__rn") <= col("n_target"))
    val kept = ranked.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_kept"),
           sum(col(idCol).cast("decimal(38,0)")).cast("long")
             .as("kept_id_checksum"))
    weights
      .select(col(domainCol), col("n_docs"),
              round(col("wq").cast("double") / col("z").cast("double"), 6)
                .as("weight"),
              col("n_target"))
      .join(kept, Seq(domainCol), "left")
      .select(col(domainCol), col("n_docs"), col("weight"), col("n_target"),
              coalesce(col("n_kept"), lit(0L)).as("n_kept"),
              col("kept_id_checksum"))
  }

  /** Curriculum training order: easy-first schedule over a per-row
    * difficulty score (e.g. the unigram-LM NLL of TextStats) —
    * documents bucket into `nBuckets` difficulty bands by EXACT
    * percentile cutpoints, then each shard orders its rows
    * (band asc, lcg(id), id): the curriculum ramps difficulty while
    * the LCG decorrelates order inside a band. Returns
    * (shard, pos, id, bucket, difficulty).
    *
    * The banding deliberately uses broadcast CUTPOINTS, not a global
    * ntile: ntile needs a single totally-ordered partition (the whole
    * corpus through one task), while nBuckets−1 percentile values are
    * a 1-row aggregate broadcast back into a scan-local comparison —
    * the same reason q71's centroids are plan literals. Cutpoints
    * round to 4 decimals before any comparison (the Winsorize
    * portability contract). One shard-keyed window orders the output;
    * shards sort independently (the shuffleOrder scale story). */
  def curriculumOrder(df: DataFrame, idCol: String, difficultyCol: String,
                      nBuckets: Int, nShards: Int): DataFrame = {
    require(nBuckets >= 2, "need at least 2 difficulty bands")
    val diff = round(col(difficultyCol).cast("double"), 4)
    val scored = df.select(col(idCol).as("id"), diff.as("difficulty"))
    val ps = (1 until nBuckets).map(_.toDouble / nBuckets)
    val cuts = scored.agg(
      round(expr(s"percentile(difficulty, ${ps.head})"), 4).as("c0"),
      ps.tail.zipWithIndex.map { case (p, i) =>
        round(expr(s"percentile(difficulty, $p)"), 4).as(s"c${i + 1}")
      }: _*)
    val bucket = ps.indices
      .map(i => when(col("difficulty") > col(s"c$i"), 1).otherwise(0))
      .reduce(_ + _)
    scored.crossJoin(broadcast(cuts))
      .withColumn("bucket", bucket)
      .withColumn("shard", shardOf(col("id"), nShards))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard"))
          .orderBy(col("bucket").asc, Similarity.lcg(col("id")), col("id"))))
      .select(col("shard"), col("pos"), col("id"), col("bucket"),
              col("difficulty"))
  }

  /** Reproducible corpus shuffle for training order: every row gets a
    * (shard, pos) coordinate where shard is [[shardOf]] and pos
    * numbers the shard's rows in (lcg(id), id) order. The LCG
    * decorrelates position from id order (documents ingested together
    * land apart), yet the permutation is a pure function of ids —
    * identical across runs, engines, and repartitionings, which is
    * what makes training order auditable and resumable. Sharding
    * bounds the sort: each shard sorts independently (the training
    * loader reads shards round-robin), so nothing serializes globally
    * — the same scale story as Packing. */
  def shuffleOrder(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    val w = Window.partitionBy(col("shard"))
      .orderBy(Similarity.lcg(col(idCol)), col(idCol))
    df.withColumn("shard", shardOf(col(idCol), nShards))
      .withColumn("pos", row_number().over(w))
  }

  /** GROUP-level split audit — the leakage check for entity-grouped
    * data. Splitting event/interaction rows row-wise puts the same
    * user in train AND test, and the model "generalizes" to users it
    * memorized; the safe split assigns the GROUP (user, session,
    * patient) via [[assignSplit]] of the group id, and every row
    * inherits it. This operator emits the audit a pipeline gates on:
    * one row per split with group/row counts and fractions, plus
    * `leak_free` — TRUE iff no group landed in two splits, proven by
    * comparing distinct (group, split) pairs against distinct groups
    * rather than trusted by construction.
    *
    * Scale shape: split assignment is a narrow pure-LCG projection
    * (zero shuffle); the audit aggregations exchange only group-
    * cardinality rows after a map-side distinct; the leak check is a
    * 1-row broadcast crossJoin. */
  def splitAudit(df: DataFrame, groupCol: String,
                 splits: Seq[(String, Double)]): DataFrame = {
    val tagged = df.withColumn("split", assignSplit(col(groupCol), splits))
    val perSplit = tagged.groupBy(col("split"))
      .agg(countDistinct(col(groupCol)).as("n_groups"),
           count(lit(1)).as("n_rows"))
    val totals = tagged.agg(
        countDistinct(col(groupCol)).as("__g_total"),
        countDistinct(col(groupCol), col("split")).as("__gs_total"),
        count(lit(1)).as("__r_total"))
    perSplit.crossJoin(broadcast(totals))
      .select(col("split"), col("n_groups"), col("n_rows"),
              round(col("n_rows").cast("double") /
                    col("__r_total").cast("double"), 4).as("row_frac"),
              (col("__gs_total") === col("__g_total")).as("leak_free"))
  }

  /** Purged time-series split with an embargo gap — the leakage-safe
    * temporal split (de Prado's purged CV, simplified to one fold):
    * rows strictly before `cutoff` train; rows inside
    * [cutoff, cutoff + embargo) are PURGED (a model whose features
    * look back `embargo` long would otherwise see test-adjacent
    * state); rows at or after cutoff + embargo test. [[splitAudit]]
    * guards ENTITY leakage; this guards TEMPORAL leakage — and since
    * a user may legitimately appear on both sides of a time split,
    * the audit column here is the per-split count of units shared
    * with train (informative, not an error bit), plus each split's
    * time envelope proving train maxes out before test begins.
    *
    * Scale shape: the split tag is a narrow timestamp comparison
    * (zero shuffle, pushable to partition pruning when the table is
    * date-partitioned); the audit aggregates once per split
    * (map-side combined) and the shared-units check exchanges only
    * distinct (unit, split) pairs. Returns ≤ 3 rows. */
  def timeSplitEmbargo(df: DataFrame, tsCol: String, unitCol: String,
                       cutoff: String, embargoDays: Int): DataFrame = {
    val cut = to_timestamp(lit(cutoff))
    val cutEmb = cut + expr(s"INTERVAL $embargoDays DAYS")
    val tagged = df.withColumn("split",
      when(col(tsCol) < cut, "train")
        .when(col(tsCol) < cutEmb, "purged")
        .otherwise("test"))
    val perSplit = tagged.groupBy(col("split"))
      .agg(count(lit(1)).as("n_rows"),
           countDistinct(col(unitCol)).as("n_units"),
           unix_micros(min(col(tsCol))).as("min_ts_us"),
           unix_micros(max(col(tsCol))).as("max_ts_us"))
    val pairs = tagged.select(col("split"), col(unitCol)).distinct()
    val trainUnits = pairs.filter(col("split") === "train").select(col(unitCol))
    // unit-keyed shuffle join (NOT broadcast: train's unit set grows
    // with the data); both sides arrive pre-distinct'd map-side.
    val shared = pairs.join(trainUnits, Seq(unitCol))
      .groupBy(col("split")).agg(count(lit(1)).as("n_units_in_train"))
    perSplit.join(shared, Seq("split"), "left")
      .select(col("split"), col("n_rows"), col("n_units"),
              col("min_ts_us"), col("max_ts_us"),
              coalesce(col("n_units_in_train"), lit(0L))
                .as("n_units_in_train"))
  }
}
