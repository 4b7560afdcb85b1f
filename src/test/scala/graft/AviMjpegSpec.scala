package graft

import graft.llm.{AviMjpeg, JpegCodec, Multimodal, VideoFixtures}

/** MJPEG-in-AVI: the RIFF container walk composed with the JPEG
  * codec. Frame payloads are the encoder's own streams, so container
  * extraction is asserted EXACTLY (byte-equal payloads, bit-equal
  * decodes) — the lossy-codec tolerance games stay in JpegCodecSpec. */
class AviMjpegSpec extends SparkSpec {

  private def mk(f: Int) = (x: Int, y: Int) =>
    (96 + x * 2 + y + 5 * f, 80 + x + y * 2 + 3 * f, 120 + x - y / 2 + 7 * f)

  test("frameBytes extracts each 00dc payload byte-equal to the encoded frame, in order") {
    val avi = VideoFixtures.aviMjpeg(16, 12, 3, mk, quality = 95)
    val frames = AviMjpeg.frameBytes(avi)
    assert(frames.length == 3)
    for (f <- 0 until 3)
      assert(frames(f).toSeq ==
        JpegCodec.encode(16, 12, mk(f), quality = 95).toSeq, s"frame $f")
  }

  test("decodeFrames: planes bit-equal to standalone JPEG decode; rec-grouped progressive AVI too") {
    val flat = VideoFixtures.aviMjpeg(16, 12, 3, mk)
    for ((d, f) <- AviMjpeg.decodeFrames(flat).zipWithIndex) {
      val std = JpegCodec.decode(JpegCodec.encode(16, 12, mk(f)))
      assert((d._1, d._2) == ((16, 12)))
      assert(d._3.toSeq == std._3.toSeq, s"flat frame $f")
    }
    val rec = VideoFixtures.aviMjpeg(13, 9, 2, mk, recGroups = true,
      progressiveFrames = true)
    for ((d, f) <- AviMjpeg.decodeFrames(rec).zipWithIndex) {
      val std = JpegCodec.decode(
        JpegCodec.encode(13, 9, mk(f), progressive = true))
      assert(d._3.toSeq == std._3.toSeq, s"rec frame $f")
    }
  }

  test("isMjpegAvi: true for real fixtures, false for magic-only AVI / non-AVI bytes") {
    assert(AviMjpeg.isMjpegAvi(VideoFixtures.aviMjpeg(8, 8, 1, mk)))
    assert(AviMjpeg.isMjpegAvi(
      VideoFixtures.aviMjpeg(8, 8, 1, mk, recGroups = true)))
    assert(!AviMjpeg.isMjpegAvi(VideoFixtures.avi)) // header-less magic
    assert(!AviMjpeg.isMjpegAvi(VideoFixtures.garbage))
    assert(!AviMjpeg.isMjpegAvi(VideoFixtures.webm))
    assert(!AviMjpeg.isMjpegAvi(
      VideoFixtures.mp4V0("isom", 600, 1200, 64, 36)))
  }

  test("truncated AVI never throws from the walk: fewer or zero frames") {
    val avi = VideoFixtures.aviMjpeg(10, 10, 2, mk)
    for (cut <- Seq(13, 40, avi.length / 2, avi.length - 3)) {
      val t = avi.take(cut)
      if (AviMjpeg.isAvi(t)) {
        val n = AviMjpeg.frameBytes(t).length // must not throw
        assert(n <= 2)
      }
    }
  }

  test("video dispatch: MJPEG AVI decodes the first frame; other video bytes keep FakeDecoder") {
    val avi = VideoFixtures.aviMjpeg(11, 7, 2, mk)
    val got = Multimodal.BmpWavDecoder.decode(avi, "video")
    val first = JpegCodec.decode(JpegCodec.encode(11, 7, mk(0)))._3
    assert(got.toSeq == first.toSeq)
    val mp4 = VideoFixtures.mp4V0("isom", 600, 1200, 64, 36)
    assert(Multimodal.BmpWavDecoder.decode(mp4, "video").toSeq ==
      Multimodal.FakeDecoder.decode(mp4, "video").toSeq)
  }

  test("extractVideoFrames: one row per frame, stride sampling re-indexes") {
    import spark.implicits._
    val ds = Seq(
      Multimodal.MediaRow(1L, VideoFixtures.aviMjpeg(9, 6, 5, mk), "video"),
      Multimodal.MediaRow(2L, VideoFixtures.aviMjpeg(8, 8, 2, mk,
        recGroups = true), "video")).toDS()
    val all = Multimodal.extractVideoFrames(ds).collect()
    assert(all.map(r => (r.id, r.frame)).sorted.toSeq ==
      Seq((1L, 0), (1L, 1), (1L, 2), (1L, 3), (1L, 4), (2L, 0), (2L, 1)))
    assert(all.forall(r => r.features.length == r.w * r.h * 3))
    val strided = Multimodal.extractVideoFrames(ds, stride = 2).collect()
    assert(strided.map(r => (r.id, r.frame)).sorted.toSeq ==
      Seq((1L, 0), (1L, 1), (1L, 2), (2L, 0)))
    // strided frame 1 of video 1 is the ORIGINAL frame 2
    val f1 = strided.find(r => r.id == 1L && r.frame == 1).get
    val orig2 = JpegCodec.decode(JpegCodec.encode(9, 6, mk(2)))._3
    assert(f1.features.toSeq == orig2.toSeq)
  }

  test("VideoMeta parses the avih main header: dims and µs duration") {
    val r = graft.plans.VideoMeta.parse(
      VideoFixtures.aviMjpeg(12, 8, 2, mk, fps = 10))
    assert(r.getString(0) == "avi")
    assert(r.getLong(2) == 1000000L && r.getLong(3) == 200000L)
    assert(r.getInt(4) == 12 && r.getInt(5) == 8)
    // header-less AVI magic stays the null-field row
    val m = graft.plans.VideoMeta.parse(VideoFixtures.avi)
    assert(m.getString(0) == "avi" && m.isNullAt(2) && m.isNullAt(4))
  }
}
