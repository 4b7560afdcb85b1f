package graft.streaming

import org.apache.spark.sql.{AnalysisException, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental exact-dedup of a document stream against the WHOLE
  * corpus seen so far — the crawl-ingest shape of an LLM training-data
  * pipeline: a new batch of documents is kept only where its content
  * hash is (a) unique within the batch and (b) absent from the
  * persisted hash store of everything previously accepted; accepted
  * hashes are appended to the store so the next batch (or the next
  * scheduled run — the checkpoint skips committed batches) dedups
  * against them.
  *
  * Delivery contract: foreachBatch is AT-LEAST-ONCE. A batch replayed
  * after a crash between `accept` and the store append re-forwards
  * the same fresh set, so `accept` must be idempotent (a keyed upsert
  * like [[graft.sources.PartitionedParquetStore]], not a blind
  * append); a replay after the store append forwards an empty set
  * (the batch's own hashes now hit the store). Doc ids must be
  * integral (they are cast to long for component labels — string ids
  * need a stable id-assignment step upstream).
  *
  * This complements the in-stream variants in [[MicroBatchUpsert]]:
  * `dedupedWithinWatermark` bounds its state by the watermark, so it
  * can only dedup documents that arrive close together; a training
  * corpus needs dedup against ALL history, which no streaming state
  * store should hold — so history lives as a parquet hash table
  * (16 bytes + id per accepted doc, ~1000× smaller than the text) and
  * each micro-batch does one anti-join against it.
  *
  * Scale notes (100 TB corpus ≈ 10^10 hashes ≈ 300 GB store): the
  * per-batch anti-join shuffles the store on content_hash unless the
  * store is laid out for it — [[runBucketed]] keeps the store as a
  * table BUCKETED by content_hash (the BucketedJoinSpec pattern: the
  * store reads pre-clustered, only the small batch shuffles into the
  * store's bucketing — the spec asserts the single-Exchange plan).
  * [[run]] stays layout-agnostic (plain parquet directory) for
  * deployments where the store is small enough to shuffle.
  */
object StreamingCorpusDedup {

  /** Accepted-hash store reader: empty frame when absent. */
  private def storedHashes(spark: SparkSession, storeDir: String): DataFrame =
    try spark.read.parquet(storeDir).select(col("content_hash"))
    catch {
      case e: AnalysisException
          if e.getMessage.contains("PATH_NOT_FOUND") ||
             e.getMessage.contains("UNABLE_TO_INFER_SCHEMA") ||
             e.getMessage.contains("Path does not exist") =>
        spark.emptyDataFrame.select(lit("").as("content_hash")).limit(0)
    }

  /** NEAR-dup variant: incremental MinHash-LSH dedup of a document
    * stream against all accepted history. Each micro-batch:
    *  1. bands every doc (NearDup.bandedBuckets — the XXH64 scale
    *     path);
    *  2. dedups WITHIN the batch: bucket-collision pairs → connected
    *     components → only each component's minimum-id representative
    *     survives (same survivor contract as q60);
    *  3. drops survivors whose ANY band bucket collides with the
    *     persisted store of accepted docs' buckets;
    *  4. hands the fresh docs to `accept`, then appends their bucket
    *     rows to the store.
    *
    * Bucket collision is the LSH candidate test, used here as the
    * drop decision directly — recall-oriented (dropping a
    * false-positive candidate loses a doc; letting one through is
    * what batch near-dup sweeps (q57/q60) exist for). Store size is
    * numBands rows × 20 bytes per accepted doc — still ~100× smaller
    * than text. Scale layout: bucket the store table by
    * (band, band_hash) so the per-batch semi-join co-locates (see
    * class scaladoc).
    */
  def runNearDup(docs: DataFrame, idCol: String, textCol: String,
                 storeDir: String, checkpoint: String,
                 shingleSize: Int = 3, numBands: Int = 16,
                 rowsPerBand: Int = 4, maxBucket: Int = 1000)
                (accept: DataFrame => Unit): StreamingQuery =
    docs.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        import graft.llm.{Components, NearDup}
        val hashed = batch.withColumn("__hs",
          NearDup.hashedShingles(NearDup.shingles(col(textCol), shingleSize)))
        val banded = NearDup
          .bandedBuckets(hashed, idCol, col("__hs"), numBands, rowsPerBand)
          .persist()
        try {
          // (2) history hits for EVERY batch doc (not just survivors):
          // any shared (band, band_hash) bucket is a hit, and a hit on
          // a non-representative member must still poison its whole
          // component below.
          val hitIds = banded
            .join(storedBuckets(spark, storeDir), Seq("band", "band_hash"),
                  "left_semi")
            .select(col("doc")).distinct().persist()
          // (3) in-batch components. A doc is dropped when it is a
          // non-representative member (component rep = min id, the
          // q60 contract) OR its component touches history ANYWHERE —
          // the accepted historical doc is the component's true
          // canonical representative, so even members that don't
          // collide with the store directly (9~X, 5~9, 5!~X) must not
          // be re-accepted. Plus direct hits (singleton components
          // never enter the pair graph).
          val comps = Components.connectedComponents(
            NearDup.pairsFromBanded(banded, maxBucket), "id_a", "id_b")
          val poisonedLabels = comps
            .join(hitIds, comps("node") === hitIds("doc"), "left_semi")
            .select(col("label")).distinct()
          val dropped = comps
            .join(poisonedLabels.withColumnRenamed("label", "__pl"),
                  col("label") === col("__pl"), "left_semi")
            .select(col("node"))
            .union(comps.filter(col("node") =!= col("label"))
              .select(col("node")))
            .union(hitIds.select(col("doc").as("node")))
            .distinct()
            .withColumnRenamed("node", idCol)
          val fresh = batch.join(dropped, Seq(idCol), "left_anti")
          fresh.persist()
          try {
            accept(fresh)
            banded.join(fresh.select(col(idCol).as("__fid")),
                        col("doc") === col("__fid"), "left_semi")
              .select(col("doc"), col("band"), col("band_hash"))
              .write.mode("append").parquet(storeDir)
          } finally {
            fresh.unpersist(); hitIds.unpersist()
          }
        } finally banded.unpersist()
      }
      .start()

  /** EMBEDDING near-dup variant: incremental SEMANTIC dedup of an
    * embedding stream against all accepted history via SRP signature
    * buckets (the q51 bucketing). Per micro-batch:
    *  1. SRP-sign every vector (a per-row plan-literal projection, no
    *     shuffle), persisted once for all three consumers;
    *  2. in-batch: exact-cosine pairs within buckets, keep-lowest-id
    *     per pair (the [[graft.llm.Similarity.semanticDedup]] survivor
    *     contract);
    *  3. drop docs whose bucket already exists in the accepted-bucket
    *     store — the LSH candidate test as the drop decision, the
    *     same recall-oriented contract as [[runNearDup]] (the store
    *     holds NO vectors — bits/doc, not KB/doc — so there is no
    *     cosine re-verification against history; the batch sweeps
    *     q51/q90 are the precision pass);
    *  4. hand fresh rows to `accept`, append their (doc, bucket) rows.
    * `bits` is the recall/precision knob: each extra signature bit
    * halves bucket size (fewer false drops) and weakens cross-bucket
    * recall — the q51 trade, persisted. */
  def runEmbeddingNearDup(docs: DataFrame, idCol: String, vecCol: String,
                          storeDir: String, checkpoint: String, dim: Int,
                          bits: Int = 8, threshold: Double = 0.9)
                         (accept: DataFrame => Unit): StreamingQuery =
    docs.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        import graft.llm.Similarity
        val sig = batch.withColumn("__bucket",
          concat_ws("", Similarity.srpSignature(col(vecCol), dim, bits)))
          .persist()
        try {
          val inBatchDrop = sig.as("x").join(sig.as("y"),
              col("x.__bucket") === col("y.__bucket") &&
              col(s"x.$idCol") < col(s"y.$idCol"))
            .filter(graft.plans.NativeFunctions
              .cosineNative(spark, col(s"x.$vecCol"), col(s"y.$vecCol"))
              >= lit(threshold))
            .select(col(s"y.$idCol").as(idCol))
          val histDrop = sig
            .join(storedEmbedBuckets(spark, storeDir), Seq("__bucket"),
                  "left_semi")
            .select(col(idCol))
          val fresh = sig.join(inBatchDrop.union(histDrop).distinct(),
                               Seq(idCol), "left_anti")
          fresh.persist()
          try {
            accept(fresh.drop("__bucket"))
            fresh.select(col(idCol).as("doc"),
                         col("__bucket").as("bucket"))
              .write.mode("append").parquet(storeDir)
          } finally fresh.unpersist()
        } finally sig.unpersist()
      }
      .start()

  /** Accepted-embedding-bucket store reader: empty frame when absent. */
  private def storedEmbedBuckets(spark: SparkSession,
                                 storeDir: String): DataFrame =
    try spark.read.parquet(storeDir).select(col("bucket").as("__bucket"))
    catch {
      case e: AnalysisException
          if e.getMessage.contains("PATH_NOT_FOUND") ||
             e.getMessage.contains("UNABLE_TO_INFER_SCHEMA") ||
             e.getMessage.contains("Path does not exist") =>
        spark.emptyDataFrame.select(lit("").as("__bucket")).limit(0)
    }

  /** Accepted-bucket store reader: empty frame when absent. */
  private def storedBuckets(spark: SparkSession, storeDir: String): DataFrame =
    try spark.read.parquet(storeDir).select(col("band"), col("band_hash"))
    catch {
      case e: AnalysisException
          if e.getMessage.contains("PATH_NOT_FOUND") ||
             e.getMessage.contains("UNABLE_TO_INFER_SCHEMA") ||
             e.getMessage.contains("Path does not exist") =>
        spark.emptyDataFrame
          .select(lit(0).as("band"), lit(0L).as("band_hash")).limit(0)
    }

  /** The per-batch history anti-join against the BUCKETED store —
    * exposed (not private) so the plan contract can be asserted: with
    * the store bucketed by content_hash, the sort-merge anti-join
    * needs exactly ONE Exchange (the small batch shuffling into the
    * store's buckets); the history side — the 300 GB at scale — reads
    * its buckets in place. An empty/absent store passes the batch
    * through untouched. */
  def freshVsBucketedStore(inBatch: DataFrame, storeTable: String): DataFrame = {
    val spark = inBatch.sparkSession
    if (!spark.catalog.tableExists(storeTable)) inBatch
    else inBatch.join(spark.table(storeTable).select(col("content_hash")),
                      Seq("content_hash"), "left_anti")
  }

  /** Bucketed-store variant of [[run]]: history lives as a managed
    * table bucketed+sorted by content_hash (`nBuckets` fixed for the
    * store's lifetime — Spark appends into the same bucket spec), so
    * the per-batch anti-join co-locates on the store side. At 10^10
    * accepted hashes this is the difference between re-shuffling
    * 300 GB per micro-batch and shuffling only the batch. */
  def runBucketed(docs: DataFrame, textCol: String, storeTable: String,
                  nBuckets: Int, checkpoint: String)
                 (accept: DataFrame => Unit): StreamingQuery =
    docs.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val hashed = batch.withColumn("content_hash", md5(col(textCol)))
        val inBatch = hashed.dropDuplicates("content_hash")
        val fresh = freshVsBucketedStore(inBatch, storeTable)
        fresh.persist()
        try {
          accept(fresh)
          fresh.select(col("content_hash"))
            .write.mode("append").format("parquet")
            .bucketBy(nBuckets, "content_hash").sortBy("content_hash")
            .saveAsTable(storeTable)
        } finally fresh.unpersist()
      }
      .start()

  /** One available-now pass: dedup each micro-batch against the store,
    * hand the survivors to `accept` (write to the corpus, forward
    * downstream, ...), then append their hashes to the store. */
  def run(docs: DataFrame, textCol: String, storeDir: String,
          checkpoint: String)(accept: DataFrame => Unit): StreamingQuery =
    docs.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val hashed = batch.withColumn("content_hash", md5(col(textCol)))
        // (a) unique within the batch: first arrival wins — an
        // arbitrary-but-deterministic pick via min over the batch's
        // own hash group would need an ordering column; batches are
        // unordered sets here, so full-row distinct then one-per-hash.
        val inBatch = hashed.dropDuplicates("content_hash")
        // (b) absent from the persisted corpus
        val fresh = inBatch.join(storedHashes(spark, storeDir),
                                 Seq("content_hash"), "left_anti")
        // materialize ONCE: accept() and the store append must see the
        // same row set even though `fresh` is lazily planned twice
        fresh.persist()
        try {
          accept(fresh)
          fresh.select(col("content_hash"))
            .write.mode("append").parquet(storeDir)
        } finally fresh.unpersist()
      }
      .start()
}
