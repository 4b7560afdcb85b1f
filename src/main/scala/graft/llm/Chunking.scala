package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking for training pipelines: split each document into
  * overlapping token windows of `size` tokens every `stride` tokens —
  * pure narrow array expressions (sequence + explode + slice), no
  * shuffle, scales linearly with the corpus. */
object Chunking {

  /** One row per (doc, window): chunk_start (token offset), chunk_text,
    * n_tokens. */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
                  size: Int, stride: Int): DataFrame = {
    val toks = TextStats.tokens(col(textCol))
    df.select(col(idCol), toks.as("__toks"))
      .select(col(idCol), col("__toks"),
              explode(sequence(lit(0), org.apache.spark.sql.functions.size(col("__toks")) - 1,
                               lit(stride))).as("chunk_start"))
      .select(col(idCol), col("chunk_start"),
              concat_ws(" ", slice(col("__toks"), col("chunk_start") + 1, lit(size)))
                .as("chunk_text"),
              org.apache.spark.sql.functions.size(
                slice(col("__toks"), col("chunk_start") + 1, lit(size))).as("n_tokens"))
  }
}
