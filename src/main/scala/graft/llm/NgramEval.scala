package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-scale n-gram overlap metrics between a candidate and a
  * reference text column — BLEU (Papineni et al. 2002) and ROUGE-N
  * (Lin 2004), the canonical machine-generated-text eval pair a
  * training pipeline runs over model outputs at every checkpoint.
  * No counterpart in the reference repo (its eval surface stops at
  * win/loss accuracy); this is the driver's LLM-pipeline mandate.
  *
  * Both metrics share one clipped-count kernel: for each (pair, n),
  * match_n = Σ_g min(count_cand(g), count_ref(g)) over the grams g of
  * the candidate — computed by exploding each side's n-grams to
  * (id, n, gram, count) aggregates and joining, NEVER by a per-row
  * nested scan (a per-row `filter`-count over the gram array is
  * quadratic in document length and dies on long documents; the
  * explode form is linear and shuffles once on (id, gram)).
  *
  * Determinism: every precision/recall is an exact integer ratio;
  * BLEU's geometric mean sums the four ln terms left-to-right in n
  * order before one exp, and every emitted double rounds to 6 — the
  * same fixed-order contract the q234 log-likelihood scores use, so
  * DuckDB reproduces the hash.
  */
object NgramEval {

  /** (id, n, gram, cnt) counts for n = 1..maxN over a text column —
    * the shared explode kernel. One projection stages the token split
    * so the regex runs once per row (the q74 CollapseProject lesson,
    * TextStats.ngramsOfTokens doc), and all maxN gram orders ride ONE
    * flattened (n, gram) struct array through ONE explode — a per-n
    * union would scan the corpus maxN times, which at 100 TB is maxN
    * full passes for one metric. */
  private def gramCounts(df: DataFrame, idCol: String, textCol: String,
                         maxN: Int): DataFrame = {
    // Empty-token guard: TextStats.tokens returns [""] for
    // empty/whitespace text, which would give an empty candidate
    // cand_len = 1 and two empty texts BLEU 1.0 — the same
    // `length > 0` filter negativeTable/naiveBayesModel/wordTypes use.
    val toks = df.select(col(idCol).as("__id"),
                         filter(TextStats.tokens(col(textCol)),
                                t => length(t) > 0).as("__toks"))
    toks.select(col("__id"),
        explode(flatten(array((1 to maxN).map(n =>
          transform(TextStats.ngramsOfTokens(col("__toks"), n),
                    g => struct(lit(n).as("__n"), g.as("__gram")))): _*)))
          .as("__s"))
      .select(col("__id"), col("__s.__n").as("__n"),
              col("__s.__gram").as("__gram"))
      .groupBy(col("__id"), col("__n"), col("__gram"))
      .agg(count(lit(1)).as("__cnt"))
  }

  /** match_n / cand-total_n / ref-total_n per (id, n), n = 1..maxN —
    * rows with zero totals for some n are PRESENT with zeros (grams
    * below n tokens yield no rows, so a conditional-agg consumer sees
    * explicit 0s, not absent keys). */
  private def clippedStats(pairs: DataFrame, idCol: String,
                           candCol: String, refCol: String,
                           maxN: Int): DataFrame = {
    val c = gramCounts(pairs, idCol, candCol, maxN)
      .withColumnRenamed("__cnt", "__c")
    val r = gramCounts(pairs, idCol, refCol, maxN)
      .withColumnRenamed("__cnt", "__r")
    c.join(r, Seq("__id", "__n", "__gram"), "full_outer")
      .groupBy(col("__id"), col("__n"))
      .agg(sum(least(coalesce(col("__c"), lit(0L)),
                     coalesce(col("__r"), lit(0L)))).as("__m"),
           sum(coalesce(col("__c"), lit(0L))).as("__t"),
           sum(coalesce(col("__r"), lit(0L))).as("__tr"))
  }

  /** Sentence-level BLEU-maxN with the Lin–Och +1 smoothing on the
    * higher orders: p_1 = m_1/t_1 unsmoothed (zero unigram overlap IS
    * bleu 0), p_n = (m_n+1)/(t_n+1) for n ≥ 2, brevity penalty
    * exp(1 − r/c) when the candidate is shorter than the reference.
    * Output: (id, cand_len, ref_len, p1, bp, bleu); empty candidate →
    * NULL bleu. One (id,gram) exchange + one (id) exchange; the pairs
    * frame itself is never shuffled wider than its id. */
  def bleu(pairs: DataFrame, idCol: String, candCol: String,
           refCol: String, maxN: Int = 4): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"bleu: need 1 <= maxN <= 8, got $maxN")
    val st = clippedStats(pairs, idCol, candCol, refCol, maxN)
    val mN = (n: Int) => sum(when(col("__n") === n, col("__m"))
      .otherwise(lit(0L)))
    val tN = (n: Int) => sum(when(col("__n") === n, col("__t"))
      .otherwise(lit(0L)))
    // ref_len (the reference side's t_1) rides the SAME per-id fold as
    // the moment columns — a separate aggregate would re-evaluate the
    // whole clipped-count subtree (8 scans instead of 4 in the dumped
    // plan) and add a join.
    val aggCols = (1 to maxN).flatMap(n =>
      Seq(mN(n).as(s"m$n"), tN(n).as(s"t$n"))) :+
      sum(when(col("__n") === 1, col("__tr")).otherwise(lit(0L)))
        .as("ref_len")
    val agg = st.groupBy(col("__id")).agg(aggCols.head, aggCols.tail: _*)
    // ln p1 + Σ ln pn' in ascending-n order, one exp, bp multiplied
    // last — the fixed factor order the oracle mirrors.
    val lnSum = (2 to maxN).foldLeft(
      log(col("m1").cast("double") / col("t1").cast("double"))) {
      case (acc, n) =>
        acc + log((col(s"m$n") + lit(1L)).cast("double") /
                  (col(s"t$n") + lit(1L)).cast("double"))
    }
    val bp = when(col("t1") >= col("ref_len"), lit(1.0))
      .otherwise(exp(lit(1.0) - col("ref_len").cast("double") /
                     col("t1").cast("double")))
    agg
      .select(col("__id").as(idCol),
              col("t1").as("cand_len"), col("ref_len"),
              round(col("m1").cast("double") / col("t1").cast("double"), 6)
                .as("p1"),
              round(bp, 6).as("bp"),
              when(col("t1") === 0, lit(null).cast("double"))
                .when(col("m1") === 0, lit(0.0))
                .otherwise(round(bp * exp(lnSum / lit(maxN.toDouble)), 6))
                .as("bleu"))
  }

  /** ROUGE-N recall / precision / F1 per pair for each n = 1..maxN:
    * recall = m_n / ref-grams, precision = m_n / cand-grams, F1 their
    * harmonic mean — NULL on an empty denominator, 0 F1 when both
    * overlap terms are 0. Output long form (id, n, recall, precision,
    * f1): eval dashboards select the n they want without a schema
    * change per n. Same two-exchange kernel as [[bleu]]. */
  def rougeN(pairs: DataFrame, idCol: String, candCol: String,
             refCol: String, maxN: Int = 2): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"rougeN: need 1 <= maxN <= 8, got $maxN")
    val st = clippedStats(pairs, idCol, candCol, refCol, maxN)
    val rec = when(col("__tr") > 0,
      col("__m").cast("double") / col("__tr").cast("double"))
    val prec = when(col("__t") > 0,
      col("__m").cast("double") / col("__t").cast("double"))
    st.select(col("__id").as(idCol), col("__n").as("n"),
              round(rec, 6).as("recall"),
              round(prec, 6).as("prec"),
              when(rec.isNull || prec.isNull, lit(null).cast("double"))
                .when(rec + prec === 0.0, lit(0.0))
                .otherwise(round(lit(2.0) * rec * prec / (rec + prec), 6))
                .as("f1"))
  }
}
