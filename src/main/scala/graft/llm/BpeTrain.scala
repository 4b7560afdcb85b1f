package graft.llm

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row}
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
  * (" h e l l o ") so applying a merge is one literal
  * `replace(" a b " → " ab ")` — left-to-right, non-overlapping,
  * exactly BPE's greedy fuse rule, and byte-identical across engines
  * (Java, Spark and DuckDB replace() all scan from after the matched
  * segment, so " l l l " fuses to " ll l ").
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

  /** Returns the learned merge table: (round 1..nMerges, merged_pair
    * "a b", pair_count at selection). */
  def learnMerges(df: DataFrame, textCol: String, nMerges: Int): DataFrame = {
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
        .withColumn("sp", call_function("replace", col("sp"),
          lit(s" $a $b "), lit(s" $a$b ")))
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
        call_function("replace", acc, lit(s" $a $b "), lit(s" $a$b "))
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
