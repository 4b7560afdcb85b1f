package graft.llm

import java.io.ByteArrayOutputStream

/** Deterministic minimal-but-valid video byte fixtures for the
  * multimodal metadata path (q173 / VideoHeadersSpec) — the video
  * sibling of [[ImageFixtures]]/[[AudioFixtures]]. Each builder emits
  * exactly the ISO 14496-12 box structure [[graft.plans.VideoMeta]]
  * parses (ftyp brand, moov → mvhd v0/v1, trak → tkhd 16.16
  * dimensions, largesize boxes); sample data is absent — headers
  * only, no codec library.
  */
object VideoFixtures {

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
          ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  private def be64(v: Long): Array[Byte] = be32(v >> 32) ++ be32(v & 0xFFFFFFFFL)

  private def boxOf(tpe: String, payload: Array[Byte]): Array[Byte] =
    be32(8L + payload.length) ++ tpe.getBytes("US-ASCII") ++ payload

  private def ftyp(brand: String): Array[Byte] =
    boxOf("ftyp", brand.getBytes("US-ASCII") ++ be32(0))

  private def mvhdV0(timescale: Long, duration: Long): Array[Byte] =
    boxOf("mvhd",
      Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++ // v/flags, ctime, mtime
        be32(timescale) ++ be32(duration) ++
        Array.fill[Byte](100 - 20)(0)) // rate..next_track_id

  private def mvhdV1(timescale: Long, duration: Long): Array[Byte] =
    boxOf("mvhd",
      Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
        be32(timescale) ++ be64(duration) ++
        Array.fill[Byte](80)(0))

  private def tkhdV0(w: Int, h: Int): Array[Byte] =
    boxOf("tkhd",
      Array[Byte](0, 0, 0, 0) ++ Array.fill[Byte](72)(0) ++
        be32((w.toLong << 16)) ++ be32((h.toLong << 16)))

  private def tkhdV1(w: Int, h: Int): Array[Byte] =
    boxOf("tkhd",
      Array[Byte](1, 0, 0, 0) ++ Array.fill[Byte](84)(0) ++
        be32((w.toLong << 16)) ++ be32((h.toLong << 16)))

  private def trak(tkhd: Array[Byte]): Array[Byte] = boxOf("trak", tkhd)

  private def moov(children: Array[Byte]*): Array[Byte] =
    boxOf("moov", children.flatten.toArray)

  /** v0 headers: the common fast-start layout. */
  def mp4V0(brand: String, timescale: Long, duration: Long,
            w: Int, h: Int): Array[Byte] =
    ftyp(brand) ++ moov(mvhdV0(timescale, duration), trak(tkhdV0(w, h)))

  /** v1 (64-bit time) headers. */
  def mp4V1(brand: String, timescale: Long, duration: Long,
            w: Int, h: Int): Array[Byte] =
    ftyp(brand) ++ moov(mvhdV1(timescale, duration), trak(tkhdV1(w, h)))

  /** moov carried in a largesize (size == 1, 64-bit length) box. */
  def mp4LargeSize(brand: String, timescale: Long, duration: Long,
                   w: Int, h: Int): Array[Byte] = {
    val payload = mvhdV0(timescale, duration) ++ trak(tkhdV0(w, h))
    ftyp(brand) ++ be32(1) ++ "moov".getBytes("US-ASCII") ++
      be64(16L + payload.length) ++ payload
  }

  /** ftyp only — a moov-less (truncated upload) file. */
  def mp4FtypOnly(brand: String): Array[Byte] = ftyp(brand)

  /** MP4 with a COMPLETE sample table — the [[graft.sources.Mp4Index]]
    * unit. One video track: mdhd timescale, stsd with a minimal
    * 36-byte visual sample entry (codec fourcc + dims at the spec
    * offsets 32/34), stts delta runs, stsz (uniform when `sizes` has
    * one distinct value and `forceUniform`), stsc chunk-run map,
    * stco (or co64 when `useCo64`) chunk offsets, and an optional
    * stss sync set (1-based sample numbers). */
  def mp4Stbl(brand: String, timescale: Long, codec: String,
              w: Int, h: Int, sttsRuns: Seq[(Int, Long)],
              sizes: Seq[Long], stscRuns: Seq[(Int, Int)],
              chunkOffsets: Seq[Long], sync: Option[Seq[Int]] = None,
              forceUniform: Boolean = false,
              useCo64: Boolean = false): Array[Byte] = {
    def full(tpe: String, body: Array[Byte]): Array[Byte] =
      boxOf(tpe, be32(0) ++ body) // version 0, flags 0
    val mdhd = full("mdhd",
      be32(0) ++ be32(0) ++ be32(timescale) ++
        be32(sttsRuns.map { case (c, d) => c * d }.sum))
    val entry = be32(36) ++ codec.getBytes("US-ASCII") ++
      Array.fill[Byte](6)(0) ++ Array[Byte](0, 1) ++ // data_reference_index
      Array.fill[Byte](16)(0) ++
      Array(((w >> 8) & 0xFF).toByte, (w & 0xFF).toByte,
            ((h >> 8) & 0xFF).toByte, (h & 0xFF).toByte)
    val stsd = full("stsd", be32(1) ++ entry)
    val stts = full("stts", be32(sttsRuns.size) ++
      sttsRuns.flatMap { case (c, d) => be32(c) ++ be32(d) }.toArray)
    val stsz =
      if (forceUniform && sizes.distinct.size == 1)
        full("stsz", be32(sizes.head) ++ be32(sizes.size))
      else full("stsz", be32(0) ++ be32(sizes.size) ++
        sizes.flatMap(be32).toArray)
    val stsc = full("stsc", be32(stscRuns.size) ++
      stscRuns.flatMap { case (first, per) =>
        be32(first) ++ be32(per) ++ be32(1)
      }.toArray)
    val offsets =
      if (useCo64) full("co64", be32(chunkOffsets.size) ++
        chunkOffsets.flatMap(be64).toArray)
      else full("stco", be32(chunkOffsets.size) ++
        chunkOffsets.flatMap(be32).toArray)
    val stss = sync.map(ss => full("stss", be32(ss.size) ++
      ss.flatMap(s => be32(s.toLong)).toArray)).getOrElse(Array.empty[Byte])
    val stbl = boxOf("stbl",
      stsd ++ stts ++ stsz ++ stsc ++ offsets ++ stss)
    val minf = boxOf("minf", stbl)
    val mdia = boxOf("mdia", mdhd ++ minf)
    val trakBox = boxOf("trak", tkhdV0(w, h) ++ mdia)
    ftyp(brand) ++ moov(mvhdV0(timescale,
      sttsRuns.map { case (c, d) => c * d }.sum), trakBox)
  }

  /** EBML magic (WebM/Matroska) — detected, not parsed. */
  def webm: Array[Byte] =
    Array(0x1A, 0x45, 0xDF, 0xA3, 0x01, 0x00, 0x00, 0x00).map(_.toByte)

  /** RIFF AVI magic only — header-less (the detect-by-magic branch). */
  def avi: Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(Array[Byte](0, 1, 0, 0))
    out.write("AVI ".getBytes("US-ASCII"))
    out.toByteArray
  }

  // ---- RIFF little-endian building blocks (AVI MJPEG writer) ----
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
          ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
  private def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
    val pad = if (payload.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
    fourcc(id) ++ le32(payload.length.toLong) ++ payload ++ pad
  }
  private def list(listType: String, children: Array[Byte]*): Array[Byte] =
    chunk("LIST", fourcc(listType) ++ children.flatten.toArray)

  /** A complete playable MJPEG AVI: `LIST hdrl` (avih main header +
    * `strl` with a 'vids'/'MJPG' stream header and BITMAPINFOHEADER),
    * `LIST movi` with one baseline-JPEG `00dc` chunk per frame (frame
    * f rendered from `pix(f)`), and an idx1 keyframe index — exactly
    * the structure [[AviMjpeg]] walks and [[graft.plans.VideoMeta]]
    * reads dimensions/duration from. `recGroups` wraps each frame in
    * a `LIST rec ` group (the interleaved-stream layout some muxers
    * emit). */
  def aviMjpeg(w: Int, h: Int, nFrames: Int,
               pix: Int => (Int, Int) => (Int, Int, Int),
               quality: Int = 95, fps: Int = 10,
               recGroups: Boolean = false,
               progressiveFrames: Boolean = false): Array[Byte] = {
    require(nFrames >= 1 && fps >= 1, "need frames and a rate")
    val usPerFrame = 1000000L / fps
    val frames = (0 until nFrames).map(f =>
      graft.llm.JpegCodec.encode(w, h, pix(f), quality,
        progressive = progressiveFrames))
    val avih = chunk("avih",
      le32(usPerFrame) ++ le32(0) ++ le32(0) ++ le32(0x10) ++ // HASINDEX
        le32(nFrames.toLong) ++ le32(0) ++ le32(1) ++ le32(0) ++
        le32(w.toLong) ++ le32(h.toLong) ++ Array.fill[Byte](16)(0))
    val strh = chunk("strh",
      fourcc("vids") ++ fourcc("MJPG") ++ le32(0) ++ le16(0) ++ le16(0) ++
        le32(0) ++ le32(1) ++ le32(fps.toLong) ++ le32(0) ++
        le32(nFrames.toLong) ++ le32(0) ++ le32(0xFFFFFFFFL) ++ le32(0) ++
        le16(0) ++ le16(0) ++ le16(w) ++ le16(h))
    val strf = chunk("strf",
      le32(40) ++ le32(w.toLong) ++ le32(h.toLong) ++ le16(1) ++ le16(24) ++
        fourcc("MJPG") ++ le32(w.toLong * h * 3) ++ le32(0) ++ le32(0) ++
        le32(0) ++ le32(0))
    val hdrl = list("hdrl", avih, list("strl", strh, strf))
    val frameChunks = frames.map(f => chunk("00dc", f))
    val moviChildren =
      if (recGroups) frameChunks.map(fc => list("rec ", fc))
      else frameChunks
    val movi = list("movi", moviChildren: _*)
    // idx1 offsets are relative to the 'movi' fourcc (first chunk at 4)
    val offsets = moviChildren.scanLeft(4L)((o, c) => o + c.length)
    val idx1 = chunk("idx1",
      frames.indices.flatMap { i =>
        fourcc("00dc") ++ le32(0x10) ++
          le32(offsets(i) + (if (recGroups) 12 else 0)) ++
          le32(frames(i).length.toLong)
      }.toArray)
    val body = fourcc("AVI ") ++ hdrl ++ movi ++ idx1
    fourcc("RIFF") ++ le32(body.length.toLong) ++ body
  }

  def garbage: Array[Byte] = Array.tabulate[Byte](32)(i => (i * 7 + 3).toByte)

  /** (video_id, bytes) staging rows — every parser branch covered. */
  def all: Seq[(Long, Array[Byte])] = Seq(
    1L -> mp4V0("isom", 600L, 1200L, 640, 360),
    2L -> mp4V1("mp42", 90000L, 630000L, 1920, 1080),
    3L -> mp4LargeSize("avc1", 1000L, 2500L, 320, 240),
    4L -> mp4FtypOnly("isom"),
    5L -> webm,
    6L -> avi,
    7L -> garbage,
    8L -> aviMjpeg(12, 8, 2,
      f => (x, y) => (30 + x * 3 + f * 5, 40 + y * 4 + f * 3, 50 + x + y + f)))
}
