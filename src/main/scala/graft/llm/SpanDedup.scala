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

  /** Content-defined chunking (CDC) dedup audit — the
    * rolling-hash-boundary chunker (Rabin/gear CDC, the rsync/LBFS
    * family) that [[chunkDupStats]]' fixed windows cannot replace:
    * because a chunk boundary is a function of the CONTENT under an
    * 8-char window (cut where a weighted char-code hash lands in a
    * 1-in-64 bucket), inserting or deleting bytes near the front of a
    * document shifts only the chunks up to the next boundary — the
    * rest re-align and dedup against the unedited twin, where
    * fixed-size chunking would shift every window and match nothing.
    *
    * Determinism contract: char codes via `ascii` (corpus is ASCII;
    * non-ASCII would just fold to the same code both engines compute),
    * the weighted window sum feeds the shared portable
    * [[Similarity.lcg]], and the cut test is bits 5..10 == 0 — every
    * step replayable in DuckDB integer arithmetic.
    *
    * Scale shape: boundary detection and chunk slicing are pure
    * per-row array expressions (no UDF, no shuffle); chunks explode
    * narrowly and reduce immediately to the per-chunk count frame
    * (ONE map-side-combined exchange on the chunk text — at corpus
    * scale swap the raw chunk for its hash, the q117 digest
    * economics). Returns 1 row:
    * (n_chunks, n_distinct, n_dup_chunks, max_dup, avg_len). */
  def cdcChunkStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val k = 8
    val pows = Array.iterate(1L, k)(_ * 33L)
    val text = col(textCol)
    // One-pass char-code array: `split` materializes the char array
    // ONCE as the transform's input (never inside a lambda), then the
    // window sums index it with O(1) element_at — boundary detection
    // is O(n·k) per document. The per-position
    // `ascii(text.substr(i, 1))` form this replaces re-scanned the
    // UTF8String from byte 0 on every call (substr is O(pos)), i.e.
    // O(n²·k) per document — measured 13.4 s for q224 at sf0.1 vs
    // ~1 s in this form. Values are identical (ascii of the i-th
    // char), so the DuckDB oracle contract is unchanged. __codes is
    // referenced k times in wsum, which also keeps CollapseProject
    // from inlining the split into the filter lambda.
    val staged0 = df.select(col(idCol).as("__id"), text.as("__t"),
      transform(split(text, ""), c => ascii(c).cast("long")).as("__codes"))
    val n = length(col("__t"))
    def wsum(i: org.apache.spark.sql.Column) = (0 until k).map(j =>
      element_at(col("__codes"), i + lit(j)) * lit(pows(j)))
      .reduce(_ + _)
    // candidate cut positions 2..n-k+1 (a cut at 1 is a no-op); the
    // cut fires where the lcg'd window hash lands in bucket 0 of 64.
    val cand = when(n >= k + 1, sequence(lit(2), n - (k - 1)))
      .otherwise(array().cast("array<int>"))
    val bpos = filter(cand, i =>
      pmod(shiftright(Similarity.lcg(wsum(i)), 5), lit(64)) === 0)
    val staged = staged0.select(col("__id"), col("__t"),
      concat(array(lit(1)), bpos).as("__starts"))
    val chunks = staged.select(col("__id"),
      explode(transform(col("__starts"), (st, j) =>
        col("__t").substr(st,
          when(j < size2(col("__starts")) - 1,
            element_at(col("__starts"), j + lit(2)) - 1)
          .otherwise(length(col("__t"))) - st + 1))).as("chunk"))
    val perChunk = chunks.groupBy(col("chunk")).agg(count(lit(1)).as("cnt"))
    perChunk.agg(
      sum(col("cnt")).cast("long").as("n_chunks"),
      count(lit(1)).as("n_distinct"),
      sum(when(col("cnt") > 1, 1L).otherwise(0L)).as("n_dup_chunks"),
      max(col("cnt")).as("max_dup"),
      round(sum(length(col("chunk")).cast("long") * col("cnt"))
              .cast("double") /
            sum(col("cnt")).cast("double"), 6).as("avg_len"))
  }

  // size() shadowed by the window-size import pattern elsewhere; alias
  // keeps the call unambiguous inside this file.
  private def size2(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.size(c)
}
