package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.util.Exact

/** Supervised text classification for corpus curation — the
  * fastText-shaped quality/language filter of the big pretraining
  * pipelines (CCNet, GPT-3's WebText classifier) re-expressed as two
  * vocabulary-bounded aggregations: multinomial Naive Bayes with
  * Laplace smoothing, and chi-square per-token feature selection.
  *
  * Both are pure frequency algebra: the "model" is a (class × vocab)
  * count frame small enough to broadcast, so training is ONE corpus
  * pass and scoring is a broadcast-join per token — no gradient loop,
  * no driver-side state, and the whole thing replays in ANSI SQL for
  * the oracle gate.
  *
  * Reference scope: dan8239/nfl-data-engineering has no text
  * classifier; this is the driver's LLM-pipeline mandate (quality
  * scoring / curation layer).
  */
object TextClassify {

  /** Multinomial Naive Bayes model, Laplace-smoothed — the training
    * pass. One row per (class, token) in the class×vocab GRID (zero
    * counts materialized so the unseen-token penalty is first-class,
    * not an apply-time special case):
    *
    *   loglik  = ln((c + α) / (tc + α·V))   (token | class)
    *   logprior = ln(n_class / n_docs)
    *
    * Scale shape: the corpus folds ONCE to (class, token) counts — a
    * vocabulary-bounded frame; class totals, doc priors, and V are
    * aggregates OF that frame (plus a doc-count pass), all broadcast.
    * The α-smoothed grid is vocab × classes — bounded by model size,
    * never by corpus size. Output columns:
    * (lang, token, cnt, loglik, logprior), log terms rounded 9. */
  def naiveBayesModel(docs: DataFrame, textCol: String, labelCol: String,
                      alpha: Double = 1.0): DataFrame = {
    require(alpha > 0, s"TextClassify.naiveBayesModel: alpha > 0, got $alpha")
    val toks = graft.Tables.spreadSmall(
        docs.select(col(labelCol).as("lang"), col(textCol).as("__t")))
      .select(col("lang"), explode(TextStats.tokens(col("__t"))).as("token"))
      .filter(length(col("token")) > 0)
    val counts = toks.groupBy(col("lang"), col("token"))
      .agg(count(lit(1)).as("c"))
    val classes = counts.groupBy(col("lang"))
      .agg(sum(col("c")).as("tc"))
    val priors = docs.groupBy(col(labelCol).as("lang"))
      .agg(count(lit(1)).as("nd"))
    val nDocs = docs.agg(count(lit(1)).as("n")).select(col("n"))
    val vocab = counts.select(col("token")).distinct()
    val v = vocab.agg(count(lit(1)).as("v"))
    vocab.crossJoin(broadcast(classes))
      .join(counts, Seq("lang", "token"), "left")
      .join(broadcast(priors), Seq("lang"))
      .crossJoin(broadcast(nDocs))
      .crossJoin(broadcast(v))
      .select(col("lang"), col("token"),
        coalesce(col("c"), lit(0L)).as("cnt"),
        round(log((coalesce(col("c"), lit(0L)).cast("double") + alpha) /
          (col("tc").cast("double") + lit(alpha) * col("v").cast("double"))), 9)
          .as("loglik"),
        round(log(col("nd").cast("double") / col("n").cast("double")), 9)
          .as("logprior"))
  }

  /** Naive Bayes scoring — argmax over classes of
    * logprior + Σ_tokens loglik, against a [[naiveBayesModel]] fit on
    * the same corpus (self-classification: the standard trained-filter
    * readout plus an in-sample accuracy audit against the true label).
    *
    * Determinism: per-token log terms are 9-dp quantized in the model
    * and sum through DECIMAL(30,6) (order-independent); the per-class
    * score is rounded to 6 BEFORE the argmax, and ties break to the
    * lexicographically smallest class — both engines pick the same
    * winner by construction, never by float luck.
    *
    * Scale shape: the model grid broadcasts; each document token joins
    * it once per class (docs × tokens × |classes| rows, narrow), folds
    * map-side to (doc, class) partials, and the argmax is a 2-pass
    * max-then-filter on the (doc × class) frame — no window, no sort.
    * Output: (doc_id, lang, predicted, score, correct). */
  def naiveBayesClassify(docs: DataFrame, idCol: String, textCol: String,
                         labelCol: String, alpha: Double = 1.0): DataFrame = {
    val model = naiveBayesModel(docs, textCol, labelCol, alpha)
      .withColumnRenamed("lang", "__cls")
    val toks = graft.Tables.spreadSmall(
        docs.select(col(idCol), col(labelCol).as("__true"),
                    col(textCol).as("__t")))
      .select(col(idCol), col("__true"),
        explode(TextStats.tokens(col("__t"))).as("token"))
      .filter(length(col("token")) > 0)
    val scored = toks
      .join(broadcast(model), Seq("token"))
      .groupBy(col(idCol), col("__true"), col("__cls"))
      .agg(round(
        sum(col("loglik").cast(org.apache.spark.sql.types.DecimalType(38, 9)))
          .cast("double") + first(col("logprior")), 6).as("__score"))
    // Argmax in ONE pass over the (doc × class) frame: min over
    // struct(−score, class, score) picks the max score with ties to
    // the lexicographically smallest class — the identical winner the
    // previous max-then-filter two-pass selected, without evaluating
    // the corpus-wide scoring subtree twice (the join-back's probe
    // side replayed tokenize+join+agg in full). `+ 0.0` canonicalizes
    // a −0.0 score before negation so signed-zero ordering matches the
    // old `===`-tie semantics; the winner's own score rides the struct
    // so the reported value is bit-identical, not re-derived.
    val key = struct(negate(col("__score") + lit(0.0)).as("k"),
                     col("__cls").as("c"), col("__score").as("s"))
    scored.groupBy(col(idCol))
      .agg(first(col("__true")).as("lang"), min(key).as("__b"))
      .select(col(idCol), col("lang"),
        col("__b.c").as("predicted"), col("__b.s").as("score"),
        (col("__b.c") === col("lang")).as("correct"))
  }

  /** Chi-square token feature selection — for every vocabulary token,
    * the 2×2 document-presence test against a binary label:
    *
    *   χ² = N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d))
    *
    * with a = docs(token, label), b = docs(token, ¬label), c/d the
    * complements. The classic filter-method ranking for "which tokens
    * actually carry the label" (Yang & Pedersen 1997) — presence is
    * per-document (array_distinct), so a token repeated 50× in one doc
    * counts once, the robustness choice every IR text uses.
    *
    * Numeric contract: all contingency algebra stays in 64-bit
    * integers (each pairwise product ≤ N² — safe to ~3e9 docs); only
    * the final ratio is computed in double, in a fixed factor order
    * mirrored by the oracle, so the 6-dp rounding is engine-portable.
    * Degenerate margins (token in every doc / label constant) yield
    * NULL, not a division blow-up.
    *
    * Scale shape: one corpus pass explodes DISTINCT tokens per doc and
    * folds to the vocabulary-bounded (token, a, b) frame; label totals
    * are a broadcast 1-row frame. Output:
    * (token, n_pos, n_neg, chi2), χ² rounded 6. */
  def chi2Tokens(docs: DataFrame, idCol: String, textCol: String,
                 labelCol: Column): DataFrame = {
    val y = when(labelCol, 1L).otherwise(0L)
    val pres = docs.select(col(idCol), y.as("__y"),
      explode(array_distinct(TextStats.tokens(col(textCol)))).as("token"))
      .filter(length(col("token")) > 0)
    val perTok = pres.groupBy(col("token"))
      .agg(sum(col("__y")).as("a"),
        (count(lit(1)) - sum(col("__y"))).as("b"))
    val tot = docs.select(y.as("__y"))
      .agg(sum(col("__y")).as("ny"),
        (count(lit(1)) - sum(col("__y"))).as("nn"))
    val cc = col("ny") - col("a")
    val dd = col("nn") - col("b")
    val diff = (col("a") * dd - col("b") * cc).cast("double")
    val den = ((col("a") + col("b")) * (cc + dd)).cast("double") *
      ((col("a") + cc) * (col("b") + dd)).cast("double")
    perTok.crossJoin(broadcast(tot))
      .select(col("token"), col("a").as("n_pos"), col("b").as("n_neg"),
        when(den > 0,
          round((col("ny") + col("nn")).cast("double") * diff * diff / den,
            6)).as("chi2"))
  }
}
