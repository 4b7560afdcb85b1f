package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning — the shuffle-reduction play for a
  * selective join whose build side is too big to broadcast AS ROWS but
  * whose key membership fits a few KB of bits.
  *
  * At 100 TB the dominant cost of `fact JOIN dim_subset` is shuffling
  * fact rows that will never match. Spark's own runtime bloom filter
  * (spark.sql.optimizer.runtime.bloomFilter.*) covers simple cases;
  * this operator makes the technique explicit, PORTABLE (xxhash64 +
  * pmod arithmetic an oracle can replay) and composable: build a bit
  * array from the dim keys, prune the fact scan with a pure-codegen
  * bit test (no shuffle, no UDF), then run the exact join on survivors.
  * False positives only pass extra rows to the exact join, so the
  * result is BIT-IDENTICAL to the unpruned join — the oracle is the
  * plain join, which is exactly the point.
  *
  * The bit-position collect is bounded by mBits (65,536 default →
  * ≤8 KB of longs), independent of dim cardinality — the same
  * config-bounded plan-literal economics as the IVF centroids
  * (Similarity.scala). k hash probes per fact row, each one xxhash64 +
  * shift — whole-stage codegen keeps it in the scan.
  */
object BloomJoin {

  /** h_i(x) = pmod(xxhash64(i, x), mBits) — seed folded in as a leading
    * literal column (Spark's xxhash64 has a fixed seed but hashes the
    * argument tuple, so a distinct leading constant derives a distinct
    * hash family member). */
  private def probe(key: Column, i: Int, mBits: Int): Column =
    pmod(xxhash64(lit(i), key), lit(mBits.toLong)).cast("int")

  /** Build the packed bit array from the build side's keys. The
    * distinct-bit frame is <= mBits rows regardless of dim size; the
    * collect is config-bounded, not data-bounded. */
  def buildBits(dim: DataFrame, key: Column, mBits: Int = 1 << 16,
                kHashes: Int = 4): Array[Long] = {
    require(mBits % 64 == 0, "mBits must pack into longs")
    val bits = dim
      .select(explode(array((0 until kHashes).map(i => probe(key, i, mBits)): _*))
                .as("p"))
      .distinct()
      .collect().map(_.getInt(0))
    val words = new Array[Long](mBits / 64)
    bits.foreach(p => words(p >>> 6) |= 1L << (p & 63))
    words
  }

  /** Keep only fact rows whose key MIGHT be in the bloom — a narrow
    * codegen filter (array literal + shifts), no join, no shuffle. */
  def mightContain(words: Array[Long], key: Column, mBits: Int = 1 << 16,
                   kHashes: Int = 4): Column = {
    val bitsLit = lit(words)
    (0 until kHashes).map { i =>
      val h = probe(key, i, mBits)
      // the Column-API shiftleft takes only a literal Int shift; the SQL
      // function accepts a column — reach it via call_function
      val mask = call_function("shiftleft", lit(1L), (h % 64).cast("int"))
      (element_at(bitsLit, (h.cast("long") / 64L).cast("int") + 1)
         .bitwiseAND(mask)) =!= 0L
    }.reduce(_ && _)
  }

  /** The full pattern: prune `fact` by the bloom of `dim`'s keys, then
    * exact inner join — result identical to the unpruned join. */
  def prunedJoin(fact: DataFrame, factKey: String, dim: DataFrame,
                 dimKey: String, mBits: Int = 1 << 16,
                 kHashes: Int = 4): DataFrame = {
    val words = buildBits(dim, col(dimKey), mBits, kHashes)
    fact.filter(mightContain(words, col(factKey), mBits, kHashes))
      .join(dim, col(factKey) === col(dimKey))
  }
}
