package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Chunk-level (paragraph/span) corpus deduplication — the CCNet-style
  * cleaning pass LLM pipelines run between exact-dedup and near-dedup:
  * a chunk of tokens that recurs across MANY documents is boilerplate
  * (headers, navigation, license blurbs) even when the documents as a
  * whole are unique. Each document is split into non-overlapping token
  * windows (the verified [[Chunking]] kernel with stride == size), a
  * chunk is "duplicated" when its normalized text occurs in ≥
  * `minDocs` distinct documents, and the operator emits a per-document
  * audit (chunk counts, duplicated fraction) plus the cleaned text
  * rebuilt from the surviving chunks in offset order.
  *
  * Scale shape: the chunk explode is narrow; chunks reduce to 32-char
  * md5 digests immediately, so no exchange ever carries chunk TEXT.
  * The distinct-doc count rides a WINDOW over the digest partition
  * (one exchange on the digest serves both counting and marking — no
  * counts-side join, which at corpus scale would be a second
  * chunk-cardinality shuffle), and the per-document rebuild is one
  * exchange on the document id. Total: two exchanges, both carrying
  * (digest, offset) pairs, never full documents.
  */
object SpanDedup {

  /** Per-document audit + cleaned text. Output columns: idCol,
    * n_chunks, n_dup_chunks, dup_frac (4 decimals), clean_text (the
    * non-duplicated chunks joined in offset order; "" when everything
    * was boilerplate). */
  def chunkDupStats(df: DataFrame, idCol: String, textCol: String,
                    size: Int, minDocs: Int = 2): DataFrame = {
    val chunks = Chunking.chunkTokens(df, idCol, textCol, size, stride = size)
      .select(col(idCol), col("chunk_start"), col("chunk_text"),
              md5(col("chunk_text")).as("__ch"))
    // collect_set over the digest partition: distinct docs per chunk
    // without a second shuffle or a join back.
    val marked = chunks.withColumn("__n_docs",
        size2(collect_set(col(idCol)).over(Window.partitionBy(col("__ch")))))
      .withColumn("__dup", col("__n_docs") >= minDocs)
    marked.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"),
           sum(when(col("__dup"), 1L).otherwise(0L)).as("n_dup_chunks"),
           round(sum(when(col("__dup"), 1.0).otherwise(0.0)) /
                 count(lit(1)).cast("double"), 4).as("dup_frac"),
           concat_ws(" ",
             transform(
               array_sort(collect_list(when(!col("__dup"),
                 struct(col("chunk_start"), col("chunk_text"))))),
               s => s.getField("chunk_text"))).as("clean_text"))
  }

  // size() shadowed by the window-size import pattern elsewhere; alias
  // keeps the call unambiguous inside this file.
  private def size2(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.size(c)
}
