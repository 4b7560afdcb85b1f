package graft.llm

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** BPE tokenizer TRAINING (Sennrich et al. 2016) — the iterative
  * merge-learning loop, not just one pair-count pass (q82): each
  * round finds the most frequent adjacent token pair across the
  * corpus and fuses it everywhere, and the learned merge list IS the
  * tokenizer.
  *
  * The classic trick makes this tractable at any corpus size:
  * training runs on the WORD-TYPE vocabulary (distinct words with
  * counts), never the corpus — the corpus folds once into a
  * vocabulary-bounded frame, and all `nMerges` rounds iterate on
  * that. Words are held as space-delimited token strings
  * (" h e l l o ") so applying a merge is the literal
  * `replace(" a b " → " ab ")`, applied TWICE ([[fuse]]): ONE
  * replace pass is not a fixpoint, because a match consumes the
  * shared delimiter space — in " a b a b " the first match eats the
  * space before the second occurrence, so token-disjoint repeats
  * ("abab" → should be [ab, ab]) survive one pass un-fused. Two
  * passes ARE the fixpoint: after pass 1 every surviving occurrence
  * is flanked by replacement output (" ab ", which restores the
  * delimiter) or non-matching text, so no two survivors share a
  * delimiter (for two adjacent occurrences to BOTH be skipped the
  * left one must overlap a real match that ends at its leading
  * space, which leaves the right one free — so it matched), and
  * fusing "a b"→"ab" can never create a NEW "a b" adjacency (the
  * fused token is strictly longer than either side). The
  * double-replace is byte-identical across engines (Java, Spark and
  * DuckDB replace() all scan left-to-right from after the matched
  * segment); genuinely overlapping repeats still fuse greedily
  * left-to-right: " l l l " → " ll l " after pass 1 and stays.
  *
  * Determinism: the winning pair each round maximizes (count, then
  * lexicographically smallest pair) via TakeOrdered(1) — no full
  * sort; the q174 oracle replays the identical selection and replace
  * in a recursive CTE and the merge lists hash-match.
  *
  * Scale shape: ONE corpus exchange (the word count); each round is
  * an explode→count over the vocabulary frame (map-side combined,
  * pair-vocabulary-sized partials), a 1-row TakeOrdered collect
  * (bounded driver state — the centroid precedent), and a narrow
  * replace projection, localCheckpoint'ed so lineage stays flat. */
object BpeTrain {

  /** Non-overlapping greedy fuse of pair (a, b) in a space-delimited
    * token string: double replace — two passes reach the fixpoint
    * (see the object doc for why exactly two suffice). Mirrored
    * verbatim by the q174/q175 oracle CTEs as a nested replace. */
  private[graft] def fuse(sp: Column, a: String, b: String): Column = {
    val one = call_function("replace", sp, lit(s" $a $b "), lit(s" $a$b "))
    call_function("replace", one, lit(s" $a $b "), lit(s" $a$b "))
  }

  /** Returns the learned merge table: (round 1..nMerges, merged_pair
    * "a b", pair_count at selection). */
  def learnMerges(df: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    // each merge round is a driver-looped job and one learned-merge
    // row of driver state — bound the round count loudly (real BPE
    // vocabularies are 10³–10⁵ merges; the cap guards the loop, not
    // the corpus, which never leaves the cluster)
    require(nMerges >= 1 && nMerges <= 65536,
      s"BpeTrain.learnMerges: nMerges must be in [1, 65536], got $nMerges")
    val spark = df.sparkSession
    var vocab = df
      .select(explode(TextStats.tokens(col(textCol))).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("cnt"))
      .select(concat(lit(" "),
                     concat_ws(" ", TextStats.chars(col("__w"))),
                     lit(" ")).as("sp"),
              col("cnt"))
      .localCheckpoint()

    val merges = ArrayBuffer.empty[(Long, String, Long)]
    for (r <- 1 to nMerges) {
      val top = vocab
        .select(explode(TextStats.ngramsOfTokens(
          split(trim(col("sp")), " "), 2)).as("pair"), col("cnt"))
        .groupBy(col("pair")).agg(sum(col("cnt")).as("pc"))
        .orderBy(col("pc").desc, col("pair").asc)
        .limit(1)
        .collect()(0)
      val pair = top.getString(0)
      val Array(a, b) = pair.split(" ", 2)
      merges += ((r.toLong, pair, top.getLong(1)))
      vocab = vocab
        .withColumn("sp", fuse(col("sp"), a, b))
        .localCheckpoint()
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        merges.toSeq.map { case (r, p, c) => Row(r, p, c) }, 1),
      StructType(Seq(
        StructField("round", LongType, nullable = false),
        StructField("merged_pair", StringType, nullable = false),
        StructField("pair_count", LongType, nullable = false))))
  }

  /** Tokenize text with a learned merge list: the inference side of
    * [[learnMerges]] — per WORD (merges never cross word boundaries,
    * matching training), apply every merge in order to the
    * space-delimited character form and count resulting tokens. A
    * narrow per-row projection (the merge list is a plan-literal
    * replace chain inside one transform(), zero shuffle); per
    * document returns the token count before and after merging. */
  def applyMerges(df: DataFrame, idCol: String, textCol: String,
                  merges: Seq[String]): DataFrame = {
    val toks = TextStats.tokens(col(textCol))
    val perWord = transform(toks, w => {
      val sp = concat(lit(" "), concat_ws(" ", TextStats.chars(w)), lit(" "))
      val merged = merges.foldLeft(sp) { (acc, pair) =>
        val Array(a, b) = pair.split(" ", 2)
        fuse(acc, a, b)
      }
      size(split(trim(merged), " ")).cast("long")
    })
    df.select(col(idCol),
              aggregate(transform(toks, w => length(w).cast("long")),
                        lit(0L), (acc, x) => acc + x).as("n_chars_tok"),
              aggregate(perWord, lit(0L), (acc, x) => acc + x)
                .as("n_bpe_tok"))
  }
}
