package graft.llm

import org.apache.spark.sql.{Dataset, SparkSession}

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-local batches.
  *
  * Image and audio METADATA are real: [[graft.plans.ImageMeta]]
  * parses container format and pixel dimensions straight from
  * PNG/JPEG/GIF headers, and [[graft.plans.AudioMeta]] parses sample
  * rate / channels / bit depth / frame count from WAV (RIFF chunk
  * walk) and FLAC (STREAMINFO bit fields) — pure byte inspection, no
  * codec library, whole-stage codegen (oracle-checked by q88/q92 over
  * known-parameter fixture bytes). Only
  * the sample-DECODE step is stubbed behind `MediaDecoder`, because
  * this container has no image/audio libraries — production would
  * drop in a JNI/FFM-backed decoder with the same interface.
  * `mapPartitions` + `grouped(batchSize)` is the Scala analogue of a
  * vectorized (pandas-UDF-style) batch boundary: a real decoder
  * amortizes model/codec init once per batch.
  */
object Multimodal {

  /** One media object: opaque bytes + kind ("image"|"audio"|"video"). */
  case class MediaRow(id: Long, media: Array[Byte], kind: String)

  case class MediaFeatures(id: Long, kind: String, nBytes: Int,
                           features: Array[Float])

  trait MediaDecoder extends Serializable {
    /** bytes → fixed-width feature vector (e.g. decoded+pooled pixels). */
    def decode(bytes: Array[Byte], kind: String): Array[Float]
  }

  /** Deterministic fake decoder: 8 features from a rolling hash of the
    * bytes — stands in for the real codec so the pipeline is testable. */
  object FakeDecoder extends MediaDecoder {
    override def decode(bytes: Array[Byte], kind: String): Array[Float] = {
      var h = 1125899906842597L
      val out = new Array[Float](8)
      var i = 0
      while (i < bytes.length) {
        h = h * 31 + bytes(i)
        out(i % 8) += (h % 1000) / 1000.0f
        i += 1
      }
      out
    }
  }

  /** Decode/feature-extract in partition-local batches. Narrow (no
    * shuffle); batch size bounds decoder memory. */
  def extractFeatures(ds: Dataset[MediaRow], decoder: MediaDecoder,
                      batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // real impl: one vectorized decode call per batch
        batch.map(r => MediaFeatures(r.id, r.kind, r.media.length,
                                     decoder.decode(r.media, r.kind)))
      }
    }
  }

  /** Frame sampling stub for video kinds: every `stride`-th fixed-size
    * chunk of the byte stream stands in for a decoded frame. */
  def sampleFrames(bytes: Array[Byte], frameSize: Int, stride: Int): Seq[Array[Byte]] =
    bytes.grouped(frameSize).zipWithIndex
      .collect { case (frame, i) if i % stride == 0 => frame }
      .toSeq

  /** Resize stub: nearest-neighbor resample of a decoded 1-D pixel /
    * feature array to `targetLen` — stands in for the image-resize
    * step (a real impl swaps in bilinear over the decoded plane with
    * the same signature). Deterministic and length-exact, so the
    * downstream fixed-width feature contract is testable. */
  def resizeNearest(pixels: Array[Float], targetLen: Int): Array[Float] = {
    require(targetLen > 0, s"targetLen must be positive, got $targetLen")
    require(pixels.nonEmpty, "cannot resize an empty pixel array")
    Array.tabulate(targetLen)(i =>
      pixels((i.toLong * pixels.length / targetLen).toInt))
  }

  /** Decode + resize to a fixed feature width, batched like
    * [[extractFeatures]] — the full image-pipeline plumbing shape
    * (decode → resize → features) in one narrow pass. */
  def extractResized(ds: Dataset[MediaRow], decoder: MediaDecoder,
                     targetLen: Int, batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          MediaFeatures(r.id, r.kind, r.media.length,
            resizeNearest(decoder.decode(r.media, r.kind), targetLen))
        }
      }
    }
  }

  /** Shannon entropy (nats) of each blob's BYTE distribution — the
    * corruption/noise signal for opaque media columns: well-formed
    * containers sit in a mid band, encrypted/random bytes near ln 256
    * ≈ 5.545, zero-padded or truncated blobs far below. No decoder
    * needed (pairs with [[graft.plans.ImageMeta]]/AudioMeta: all
    * three read bytes, none decode samples).
    *
    * Byte tokens come from the hex encoding (2 chars = 1 byte) so the
    * whole pipeline stays in portable string expressions — same
    * count-based formulation, DECIMAL(30,6) exact-sum arithmetic, and
    * one-doc-id-exchange shape as
    * [[graft.llm.TextStats.charEntropy]]. Empty blobs are absent. */
  def byteEntropy(df: org.apache.spark.sql.DataFrame, idCol: String,
                  binCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val counts = df.repartition(col(idCol))
      // empty blobs out FIRST: sequence(1, 0) would descend and
      // fabricate tokens (the ngramsOfTokens lesson)
      .where(length(col(binCol)) > 0)
      .select(col(idCol), hex(col(binCol)).as("__hx"))
      .select(col(idCol), explode(
        transform(sequence(lit(1), (length(col("__hx")) / lit(2)).cast("int")),
                  i => col("__hx").substr(i * lit(2) - lit(1), lit(2)))).as("b"))
      .groupBy(col(idCol), col("b")).agg(count(lit(1)).as("c"))
    val n = sum(col("c")).cast("double")
    val cLnC = graft.util.Exact.exactSum(
      col("c").cast("double") * log(col("c").cast("double")))
    counts.groupBy(col(idCol))
      .agg(sum(col("c")).as("n_bytes"),
           round(log(n) - cLnC / n, 4).as("byte_entropy"))
  }
}
