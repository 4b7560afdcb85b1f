package graft

import org.apache.spark.sql.functions._
import graft.sources.Mp4Index
import graft.llm.VideoFixtures

/** MP4 sample-table indexing: stts/stsz/stsc/stco expansion to
  * per-sample (dts, duration, size, offset, keyframe), uniform-stsz
  * and co64 variants, stss semantics, refusals. */
class Mp4IndexSpec extends SparkSpec {
  import spark.implicits._

  // 7 samples: durations 3x100, 2x150, 2x120; sizes 10..16;
  // chunks: run (1st chunk, 2/chunk) then (3rd chunk, 3/chunk)
  // -> chunks carry 2, 2, 3 samples at offsets 1000, 2000, 3000
  private def fixture(sync: Option[Seq[Int]] = Some(Seq(1, 4, 6))) =
    VideoFixtures.mp4Stbl("isom", 600, "avc1", 320, 180,
      sttsRuns = Seq((3, 100L), (2, 150L), (2, 120L)),
      sizes = (10L to 16L).toSeq,
      stscRuns = Seq((1, 2), (3, 3)),
      chunkOffsets = Seq(1000L, 2000L, 3000L),
      sync = sync)

  test("per-sample dts/duration/size/offset/keyframe expansion") {
    val got = Mp4Index.parse(fixture())
    assert(got.size == 7)
    assert(got.forall(s => s.codec == "avc1" && s.width == 320 &&
      s.height == 180 && s.timescale == 600))
    assert(got.map(_.duration) == Seq(100L, 100, 100, 150, 150, 120, 120))
    assert(got.map(_.dts) == Seq(0L, 100, 200, 300, 450, 600, 720))
    assert(got.map(_.size) == (10L to 16L).toSeq)
    // chunk 1: samples 0,1 at 1000, 1010; chunk 2: 2,3 at 2000, 2012;
    // chunk 3: 4,5,6 at 3000, 3014, 3029
    assert(got.map(_.offset) ==
      Seq(1000L, 1010, 2000, 2012, 3000, 3014, 3029))
    assert(got.map(_.keyframe) ==
      Seq(true, false, false, true, false, true, false))
  }

  test("stss absent means every sample is sync; uniform stsz; co64") {
    val all = Mp4Index.parse(fixture(sync = None))
    assert(all.forall(_.keyframe))
    val uni = VideoFixtures.mp4Stbl("isom", 90000, "hvc1", 64, 64,
      sttsRuns = Seq((4, 3000L)), sizes = Seq.fill(4)(500L),
      stscRuns = Seq((1, 4)), chunkOffsets = Seq(5000000000L),
      forceUniform = true, useCo64 = true)
    val got = Mp4Index.parse(uni)
    assert(got.map(_.offset) ==
      Seq(5000000000L, 5000000500L, 5000001000L, 5000001500L))
    assert(got.forall(_.size == 500L) && got.head.codec == "hvc1")
  }

  test("index(): narrow per-file rows; refusals") {
    val df = Seq((1L, fixture()), (2L, fixture(sync = None)))
      .toDF("video_id", "bytes")
    val got = Mp4Index.index(df, "video_id", "bytes")
    assert(got.count() == 14)
    assert(got.filter(col("keyframe")).count() == 3 + 7)
    intercept[IllegalArgumentException] {
      Mp4Index.parse(VideoFixtures.mp4FtypOnly("isom"))
    }
    // a plain header-only mp4 (no stbl) indexes to zero rows, loudly
    // NOT an error (tracks without sample tables are skipped)
    assert(Mp4Index.parse(
      VideoFixtures.mp4V0("isom", 600, 1200, 64, 64)).isEmpty)
    // a tiny hostile stts declaring 2^31-ish samples refuses BEFORE
    // any allocation (the cap checks the run-count sum first)
    val bomb = VideoFixtures.mp4Stbl("isom", 600, "avc1", 8, 8,
      sttsRuns = Seq((1000000000, 1L), (1000000000, 1L)),
      sizes = Seq(1L), stscRuns = Seq((1, 1)), chunkOffsets = Seq(0L))
    val ex = intercept[IllegalArgumentException] { Mp4Index.parse(bomb) }
    assert(ex.getMessage.contains("cap 8M"))
  }
}
