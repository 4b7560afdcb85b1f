package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.{ImageFixtures, JpegCodec}

/** Streaming perceptual dedup: history drops re-encodes, in-batch
  * components keep one representative, and at-least-once replay
  * converges — fixtures are REAL codec streams (PNG originals, JPEG
  * re-encodes), so the pipeline under test is decode → resize →
  * aHash → band → verify end to end. */
class StreamingImageDedupSpec extends SparkSpec {
  import spark.implicits._

  // structurally distinct textures (the q255 family — cross hashes
  // measured ~28-49 bits apart; re-encodes within a few bits)
  private def pat(seed: Int) = (x: Int, y: Int) => (
    (x * 31 + y * 47 + seed * 101) % 256,
    (x * 13 + y * 7 + seed * 59 + 31) % 256,
    (x * 5 + y * 29 + seed * 151 + 7) % 256)

  private def png(seed: Int) = ImageFixtures.pngFull(24, 18, pat(seed))
  private def jpg(seed: Int, q: Int) = JpegCodec.encode(24, 18, pat(seed), q)

  test("history drops re-encodes, in-batch components keep min-id, replay converges") {
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val store = tmpDir("img-dedup-store")
    val accepted = collection.mutable.ArrayBuffer[Long]()
    def accept(df: DataFrame): Unit =
      accepted ++= df.select(col("image_id").cast("long"))
        .collect().map(_.getLong(0))

    val mem = MemoryStream[(Long, Array[Byte])]
    def runOnce(ckpt: String): Unit = {
      graft.streaming.StreamingImageDedup.run(
        mem.toDF().toDF("image_id", "media"), "image_id", "media",
        store, ckpt)(accept).awaitTermination(120000)
    }

    // batch 1: two novel images
    mem.addData((1L, png(1)), (2L, png(2)))
    runOnce(tmpDir("img-dedup-ckpt1"))
    assert(accepted.sorted == Seq(1L, 2L))

    // batch 2: 10 = JPEG re-encode of image 1 (history near-dup,
    // dropped); 11 = novel; 12/13 = two re-encodes of the SAME new
    // pattern (in-batch component -> min id 12 survives)
    accepted.clear()
    mem.addData((10L, jpg(1, 80)), (11L, png(3)),
                (12L, jpg(4, 95)), (13L, jpg(4, 70)))
    runOnce(tmpDir("img-dedup-ckpt2"))
    assert(accepted.sorted == Seq(11L, 12L))

    // the store now holds 8 band rows per accepted image
    val st = spark.read.parquet(store)
    assert(st.count() == 4 * 8)
    assert(st.select("image_id").distinct().collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 11L, 12L))

    // at-least-once replay with a FRESH checkpoint: everything now
    // verifies against the store -> accept receives nothing new
    accepted.clear()
    val mem2 = MemoryStream[(Long, Array[Byte])]
    mem2.addData((1L, png(1)), (2L, png(2)), (10L, jpg(1, 80)),
                 (11L, png(3)), (12L, jpg(4, 95)), (13L, jpg(4, 70)))
    graft.streaming.StreamingImageDedup.run(
      mem2.toDF().toDF("image_id", "media"), "image_id", "media",
      store, tmpDir("img-dedup-ckpt3"))(accept).awaitTermination(120000)
    assert(accepted.isEmpty, s"replay re-accepted $accepted")
    assert(spark.read.parquet(store).count() == 4 * 8) // store unchanged
  }

  test("a corrupt history store fails LOUDLY instead of silently disabling dedup") {
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // a store directory with real files but the WRONG schema (no
    // band/band_key/bits) — reading it must rethrow, never read as
    // "no history" (which would let every duplicate into accept)
    val store = tmpDir("img-dedup-corrupt-store")
    Seq((1L, "not-a-band-row")).toDF("some_id", "junk")
      .write.mode("overwrite").parquet(store)
    val accepted = collection.mutable.ArrayBuffer[Long]()
    val mem = MemoryStream[(Long, Array[Byte])]
    mem.addData((1L, png(1)))
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      graft.streaming.StreamingImageDedup.run(
        mem.toDF().toDF("image_id", "media"), "image_id", "media",
        store, tmpDir("img-dedup-corrupt-ckpt")) { df =>
        accepted ++= df.select(col("image_id").cast("long"))
          .collect().map(_.getLong(0))
      }.awaitTermination(120000)
    }
    assert(accepted.isEmpty,
      s"corrupt store silently accepted $accepted")
    // the failure names the missing column, not a generic stream error
    assert(ex.getMessage.contains("band") || ex.getMessage.contains("bits"),
      s"unexpected failure: ${ex.getMessage.take(300)}")
  }

  test("streaming result equals the batch recompute (parity)") {
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val all = Seq((1L, png(1)), (2L, jpg(1, 85)), (3L, png(2)),
                  (4L, jpg(2, 60)), (5L, png(5)))
    // batch recompute: hash everything, greedy min-id survivors at
    // Hamming <= 6 (transitive via components)
    val rows = all.map { case (id, b) =>
      graft.llm.Multimodal.MediaRow(id, b, "image") }.toDS()
    val hashed = graft.llm.Multimodal.perceptualHash64(
      graft.llm.Multimodal.extractResizedBmp(rows, 8, 8).toDF(),
      "id", "features")
    val pairs = hashed.as("a").join(hashed.as("b"),
        col("a.image_id") < col("b.image_id"))
      .filter(graft.llm.NearDup.hammingBits(col("a.bits"), col("b.bits"))
        <= 6)
      .select(col("a.image_id").as("id_a"), col("b.image_id").as("id_b"))
    val comps = graft.llm.Components
      .connectedComponents(pairs, "id_a", "id_b")
    val nonRep = comps.filter(col("node") =!= col("label"))
      .select("node").collect().map(_.getLong(0)).toSet
    val expected = all.map(_._1).filterNot(nonRep).sorted

    val accepted = collection.mutable.ArrayBuffer[Long]()
    val mem = MemoryStream[(Long, Array[Byte])]
    mem.addData(all: _*)
    graft.streaming.StreamingImageDedup.run(
      mem.toDF().toDF("image_id", "media"), "image_id", "media",
      tmpDir("img-parity-store"), tmpDir("img-parity-ckpt")) { df =>
      accepted ++= df.select(col("image_id").cast("long"))
        .collect().map(_.getLong(0))
    }.awaitTermination(120000)
    assert(accepted.sorted.toSeq == expected,
      s"streaming ${accepted.sorted} vs batch $expected")
  }
}
