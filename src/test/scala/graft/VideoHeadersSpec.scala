package graft

import org.apache.spark.sql.functions._

import graft.llm.VideoFixtures
import graft.plans.VideoMetaNative

/** VideoMeta expression against staged ISO BMFF / EBML / RIFF bytes —
  * every parser branch, including largesize boxes, v1 (64-bit) movie
  * and track headers, truncation, and non-video bytes. */
class VideoHeadersSpec extends SparkSpec {
  import spark.implicits._

  private def parsed = {
    val df = VideoFixtures.all.toDF("video_id", "bytes")
    df.select(col("video_id"),
        VideoMetaNative.videoMeta(spark, col("bytes")).as("m"))
      .select(col("video_id"), col("m.format"), col("m.brand"),
              col("m.timescale"), col("m.duration"),
              col("m.width"), col("m.height"))
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  test("mp4 v0 headers: brand, timescale, duration, dimensions") {
    val r = parsed(1L)
    assert(r.getString(1) == "mp4" && r.getString(2) == "isom")
    assert(r.getLong(3) == 600L && r.getLong(4) == 1200L)
    assert(r.getInt(5) == 640 && r.getInt(6) == 360)
  }

  test("mp4 v1 (64-bit) movie and track headers parse") {
    val r = parsed(2L)
    assert(r.getString(2) == "mp42")
    assert(r.getLong(3) == 90000L && r.getLong(4) == 630000L)
    assert(r.getInt(5) == 1920 && r.getInt(6) == 1080)
  }

  test("largesize (size==1) moov box walks correctly") {
    val r = parsed(3L)
    assert(r.getString(2) == "avc1")
    assert(r.getLong(3) == 1000L && r.getLong(4) == 2500L)
    assert(r.getInt(5) == 320 && r.getInt(6) == 240)
  }

  test("moov-less file keeps the brand, nulls the movie fields") {
    val r = parsed(4L)
    assert(r.getString(1) == "mp4" && r.getString(2) == "isom")
    assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5))
  }

  test("webm and avi detected by magic; garbage is unknown") {
    assert(parsed(5L).getString(1) == "webm")
    assert(parsed(6L).getString(1) == "avi")
    assert(parsed(7L).getString(1) == "unknown")
    assert(parsed(7L).isNullAt(2))
  }

  test("null bytes yield a null struct, and codegen path agrees with eval") {
    val df = Seq((1L, VideoFixtures.mp4V0("isom", 600, 1200, 640, 360)),
                 (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "bytes")
    val out = df.select(col("id"),
        VideoMetaNative.videoMeta(spark, col("bytes")).as("m")).collect()
    assert(out.find(_.getLong(0) == 2L).get.isNullAt(1))
    val direct = graft.plans.VideoMeta(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        VideoFixtures.mp4V0("isom", 600, 1200, 640, 360),
        org.apache.spark.sql.types.BinaryType))
    val evaluated = direct.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    assert(evaluated.getString(0) == "mp4" && evaluated.getInt(4) == 640)
  }
}
