package graft.llm

import java.io.ByteArrayOutputStream

/** Deterministic minimal-but-valid audio byte fixtures for the
  * multimodal metadata path (q92 / AudioHeadersSpec) — the audio
  * sibling of [[ImageFixtures]], built from the public WAVE and FLAC
  * format specs so the container needs no audio library to stage
  * known-parameter bytes. Sample data is fake (zeros): the fixtures
  * exercise header parsing, not decoding.
  */
object AudioFixtures {

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)

  private def le32(v: Long): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
          ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  /** RIFF/WAVE with a canonical fmt chunk, an extra LIST chunk the
    * walk must skip (odd-sized, so the pad-byte rule is exercised),
    * and a data chunk of `frames` zeroed PCM frames. */
  def wav(sampleRate: Int, channels: Int, bitsPerSample: Int,
          frames: Long, withListChunk: Boolean = false): Array[Byte] = {
    val align = channels * bitsPerSample / 8
    val dataSize = frames * align
    val out = new ByteArrayOutputStream()
    def chunk(id: String, body: Array[Byte]): Unit = {
      out.write(id.getBytes("US-ASCII"))
      out.write(le32(body.length))
      out.write(body)
      if (body.length % 2 == 1) out.write(0) // word-align pad
    }
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(le32(0)) // container size — unread by the parser
    out.write("WAVE".getBytes("US-ASCII"))
    if (withListChunk)
      chunk("LIST", "INFOISFTgraft".getBytes("US-ASCII")) // odd length 13
    val fmt = new ByteArrayOutputStream()
    fmt.write(le16(1)) // PCM
    fmt.write(le16(channels))
    fmt.write(le32(sampleRate))
    fmt.write(le32(sampleRate.toLong * align)) // byte rate
    fmt.write(le16(align))
    fmt.write(le16(bitsPerSample))
    chunk("fmt ", fmt.toByteArray)
    chunk("data", new Array[Byte](dataSize.toInt))
    out.toByteArray
  }

  /** RIFF/WAVE carrying REAL 16-bit PCM sample data (interleaved LE
    * frames) — the audio sibling of [[ImageFixtures.bmp]]: unlike the
    * zero-payload [[wav]] header fixture, this one feeds
    * [[Multimodal.BmpWavDecoder]] actual samples to decode
    * (q190 / MultimodalDecodeSpec). `samples` is the flat interleaved
    * stream (length = frames × channels); the optional odd-length
    * LIST chunk exercises the walker's pad-byte skip on the decode
    * path too. */
  def wavPcm16(sampleRate: Int, channels: Int, samples: Array[Short],
               withListChunk: Boolean = false): Array[Byte] = {
    require(samples.length % channels == 0,
      "interleaved sample count must be a multiple of channels")
    val align = channels * 2
    val out = new ByteArrayOutputStream()
    def chunk(id: String, body: Array[Byte]): Unit = {
      out.write(id.getBytes("US-ASCII"))
      out.write(le32(body.length))
      out.write(body)
      if (body.length % 2 == 1) out.write(0) // word-align pad
    }
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(le32(0)) // container size — unread by the parser
    out.write("WAVE".getBytes("US-ASCII"))
    if (withListChunk)
      chunk("LIST", "INFOISFTgraft".getBytes("US-ASCII")) // odd length 13
    val fmt = new ByteArrayOutputStream()
    fmt.write(le16(1)) // PCM
    fmt.write(le16(channels))
    fmt.write(le32(sampleRate))
    fmt.write(le32(sampleRate.toLong * align)) // byte rate
    fmt.write(le16(align))
    fmt.write(le16(16)) // bits per sample
    chunk("fmt ", fmt.toByteArray)
    val data = new ByteArrayOutputStream()
    samples.foreach(s => data.write(le16(s & 0xFFFF)))
    chunk("data", data.toByteArray)
    out.toByteArray
  }

  /** RIFF/WAVE at an arbitrary encoding: `fmtCode` 1 (int PCM), 3
    * (IEEE float), 6 (A-law), 7 (µ-law), or the raw code placed in a
    * WAVE_FORMAT_EXTENSIBLE wrapper when `extensible` — `dataBytes`
    * is the already-encoded sample payload, so every branch of
    * [[Multimodal.BmpWavDecoder.decodeWav]] can be staged with
    * byte-exact-known input (q250 / MultimodalDecodeSpec). */
  def wavRaw(sampleRate: Int, channels: Int, fmtCode: Int,
             bitsPerSample: Int, dataBytes: Array[Byte],
             extensible: Boolean = false,
             withListChunk: Boolean = false,
             alignOverride: Int = -1): Array[Byte] = {
    // block-based codecs (ADPCM) carry a BLOCK size in nBlockAlign,
    // not channels·bits/8 — callers override it there
    val align =
      if (alignOverride > 0) alignOverride
      else math.max(1, channels * bitsPerSample / 8)
    val out = new ByteArrayOutputStream()
    def chunk(id: String, body: Array[Byte]): Unit = {
      out.write(id.getBytes("US-ASCII"))
      out.write(le32(body.length))
      out.write(body)
      if (body.length % 2 == 1) out.write(0) // word-align pad
    }
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(le32(0)) // container size — unread by the parser
    out.write("WAVE".getBytes("US-ASCII"))
    if (withListChunk)
      chunk("LIST", "INFOISFTgraft".getBytes("US-ASCII")) // odd length 13
    val fmt = new ByteArrayOutputStream()
    fmt.write(le16(if (extensible) 0xFFFE else fmtCode))
    fmt.write(le16(channels))
    fmt.write(le32(sampleRate))
    fmt.write(le32(sampleRate.toLong * align)) // byte rate
    fmt.write(le16(align))
    fmt.write(le16(bitsPerSample))
    if (extensible) {
      fmt.write(le16(22)) // cbSize
      fmt.write(le16(bitsPerSample)) // valid bits
      fmt.write(le32(0)) // channel mask
      fmt.write(le16(fmtCode)) // SubFormat GUID data1 low word
      fmt.write(le16(0))
      // the KSDATAFORMAT_SUBTYPE tail (fixed in the public spec)
      fmt.write(Array(0x00, 0x00, 0x10, 0x00, 0x80, 0x00, 0x00, 0xAA,
        0x00, 0x38, 0x9B, 0x71).map(_.toByte))
    }
    chunk("fmt ", fmt.toByteArray)
    chunk("data", dataBytes)
    out.toByteArray
  }

  /** RIFF/WAVE magic only — a truncated file with no chunks. */
  def wavTruncated: Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(le32(4))
    out.write("WAVE".getBytes("US-ASCII"))
    out.toByteArray
  }

  /** "fLaC" + a STREAMINFO block with the given packed fields
    * (min/max block/frame sizes and MD5 zeroed — unread). */
  def flac(sampleRate: Int, channels: Int, bitsPerSample: Int,
           totalSamples: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    out.write(Array[Byte](0x00.toByte, 0, 0, 34)) // STREAMINFO, 34 bytes
    out.write(new Array[Byte](10)) // min/max blocksize + framesize
    // 20-bit rate | 3-bit channels-1 | 5-bit bits-1 | 36-bit samples
    val packed = (sampleRate.toLong << 44) |
      ((channels - 1).toLong << 41) | ((bitsPerSample - 1).toLong << 36) |
      (totalSamples & 0xFFFFFFFFFL)
    (7 to 0 by -1).foreach(i => out.write(((packed >>> (8 * i)) & 0xFF).toInt))
    out.write(new Array[Byte](16)) // MD5
    out.toByteArray
  }

  /** MP3 header bytes: an optional ID3v2.3 tag (28-bit syncsafe size
    * over `id3Pad` payload bytes) followed by one MPEG audio frame
    * header. `version` is the header field value (3 = MPEG-1,
    * 2 = MPEG-2, 0 = MPEG-2.5); `srIdx` indexes that version's
    * sample-rate table; layer III, bitrate index 9, no CRC. */
  def mp3(version: Int, srIdx: Int, mono: Boolean,
          withId3: Boolean = false, id3Pad: Int = 17): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    if (withId3) {
      out.write("ID3".getBytes("US-ASCII"))
      out.write(3); out.write(0); out.write(0) // v2.3, flags
      out.write((id3Pad >> 21) & 0x7F); out.write((id3Pad >> 14) & 0x7F)
      out.write((id3Pad >> 7) & 0x7F); out.write(id3Pad & 0x7F)
      out.write(new Array[Byte](id3Pad))
    }
    out.write(0xFF)
    out.write(0xE0 | ((version & 3) << 3) | (1 << 1) | 1) // layer III, no CRC
    out.write((9 << 4) | ((srIdx & 3) << 2))
    out.write((if (mono) 3 else 0) << 6)
    out.toByteArray
  }

  /** An ID3v2 tag followed by garbage (no MPEG frame): the format is
    * identifiable, the fields are not. */
  def mp3Id3Only: Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write("ID3".getBytes("US-ASCII"))
    out.write(3); out.write(0); out.write(0)
    out.write(0); out.write(0); out.write(0); out.write(4)
    out.write(new Array[Byte](4))
    out.write("junk".getBytes("US-ASCII"))
    out.toByteArray
  }

  /** The q92 staging set: (audio_id, bytes) covering the WAV chunk
    * walk (canonical + skipped odd LIST chunk), a truncated WAV, both
    * FLAC reads (CD-quality and a 96 kHz/24-bit studio shape), MP3
    * frame headers (bare V1 stereo, ID3-prefixed V2 mono, and an ID3
    * tag with no frame), and non-audio bytes. */
  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
          ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  /** The 80-bit extended float AIFF sample rates live in: explicit
    * integer bit, so mantissa = rate normalized to the top bit,
    * exponent = 16383 + (63 − leading zeros). */
  private[graft] def extended80(rate: Int): Array[Byte] = {
    require(rate > 0, s"rate $rate")
    val lz = java.lang.Long.numberOfLeadingZeros(rate.toLong)
    val mant = rate.toLong << lz
    val exp = 16383 + (63 - lz)
    be16(exp) ++ (0 until 8).map(i =>
      ((mant >>> (56 - 8 * i)) & 0xFF).toByte)
  }

  /** AIFF (comp = "NONE" → plain AIFF) or AIFF-C (any other 4CC:
    * sowt/fl32/fl64/ulaw/alaw) with real sample bytes. `ssndOffset`
    * > 0 inserts pad bytes the SSND offset field declares — OUR
    * decoder honors it; the JDK reader ignores the field, so the
    * JDK cross-check fixtures keep it 0. */
  def aiff(sampleRate: Int, channels: Int, bits: Int,
           dataBytes: Array[Byte], comp: String = "NONE",
           frames: Long = -1, ssndOffset: Int = 0): Array[Byte] = {
    require(comp.length == 4, s"compression 4CC: '$comp'")
    val aifc = comp != "NONE"
    val out = new ByteArrayOutputStream()
    def chunk(id: String, body: Array[Byte]): Unit = {
      out.write(id.getBytes("US-ASCII"))
      out.write(be32(body.length))
      out.write(body)
      if (body.length % 2 == 1) out.write(0) // word-align pad
    }
    out.write("FORM".getBytes("US-ASCII"))
    out.write(be32(0)) // container size — unread by the parser
    out.write((if (aifc) "AIFC" else "AIFF").getBytes("US-ASCII"))
    if (aifc) chunk("FVER", be32(0xA2805140L)) // AIFC version 1
    val nFrames =
      if (frames >= 0) frames
      else dataBytes.length.toLong / math.max(1, channels * bits / 8)
    val comm = new ByteArrayOutputStream()
    comm.write(be16(channels))
    comm.write(be32(nFrames))
    comm.write(be16(bits))
    comm.write(extended80(sampleRate))
    if (aifc) {
      comm.write(comp.getBytes("US-ASCII"))
      comm.write(Array[Byte](0, 0)) // empty pascal-string name (padded)
    }
    chunk("COMM", comm.toByteArray)
    val ssnd = new ByteArrayOutputStream()
    ssnd.write(be32(ssndOffset))
    ssnd.write(be32(0)) // block size
    (0 until ssndOffset).foreach(_ => ssnd.write(9)) // offset padding
    ssnd.write(dataBytes)
    chunk("SSND", ssnd.toByteArray)
    out.toByteArray
  }

  /** Sun/NeXT .au: ".snd" magic + 24-byte header + data; `offset`
    * beyond 24 inserts annotation bytes the decoder must skip. */
  def au(sampleRate: Int, channels: Int, encoding: Int,
         dataBytes: Array[Byte], offset: Int = 28): Array[Byte] = {
    require(offset >= 24, s"offset $offset")
    val out = new ByteArrayOutputStream()
    out.write(".snd".getBytes("US-ASCII"))
    out.write(be32(offset))
    out.write(be32(dataBytes.length))
    out.write(be32(encoding))
    out.write(be32(sampleRate))
    out.write(be32(channels))
    (24 until offset).foreach(_ => out.write(7)) // annotation filler
    out.write(dataBytes)
    out.toByteArray
  }

  // ---------------------------------------------------------------- ogg

  /** OGG page CRC: CRC-32 poly 0x04C11DB7, init 0, no reflection, no
    * final xor (the Xiph variant — NOT zlib's CRC32), computed over
    * the whole page with the checksum field zeroed. */
  private def oggCrc(page: Array[Byte]): Long = {
    var crc = 0L
    page.foreach { byte =>
      crc ^= (byte & 0xFFL) << 24
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80000000L) != 0) ((crc << 1) ^ 0x04C11DB7L)
              else crc << 1
        crc &= 0xFFFFFFFFL
        k += 1
      }
    }
    crc
  }

  /** One OGG page wrapping `packet` (≤ 255*255 bytes, laced 255-ful
    * segments + remainder per the spec), real checksum. */
  private def oggPage(packet: Array[Byte], granule: Long, serial: Int,
                      seq: Int, headerType: Int): Array[Byte] = {
    val full = packet.length / 255
    val rem = packet.length % 255
    val lacing = Array.fill[Byte](full)(255.toByte) :+ rem.toByte
    val out = new ByteArrayOutputStream()
    out.write("OggS".getBytes("US-ASCII"))
    out.write(0) // version
    out.write(headerType) // 2 = BOS, 4 = EOS
    (0 until 8).foreach(k => out.write(((granule >>> (8 * k)) & 0xFF).toInt))
    out.write(le32(serial))
    out.write(le32(seq))
    out.write(le32(0)) // CRC placeholder
    out.write(lacing.length)
    out.write(lacing)
    out.write(packet)
    val page = out.toByteArray
    val crc = oggCrc(page)
    (0 until 4).foreach(k => page(22 + k) = ((crc >>> (8 * k)) & 0xFF).toByte)
    page
  }

  /** Ogg Vorbis shell: the `\x01vorbis` identification header on a
    * BOS page, a dummy audio page, and an EOS page carrying the
    * total-PCM-samples granule — header-honest (no packet decode). */
  def oggVorbis(sampleRate: Int, channels: Int,
                totalSamples: Long): Array[Byte] = {
    val id = new ByteArrayOutputStream()
    id.write(1); id.write("vorbis".getBytes("US-ASCII"))
    id.write(le32(0)) // vorbis version
    id.write(channels)
    id.write(le32(sampleRate))
    id.write(le32(-1)); id.write(le32(128000)); id.write(le32(-1))
    id.write(0xB8); id.write(1) // blocksizes + framing bit
    oggPage(id.toByteArray, 0, 0x6772, 0, 2) ++
      oggPage(Array.fill[Byte](64)(0x5A), totalSamples / 2, 0x6772, 1, 0) ++
      oggPage(Array.fill[Byte](48)(0x5A), totalSamples, 0x6772, 2, 4)
  }

  /** Ogg Opus shell: `OpusHead` on a BOS page plus an EOS page whose
    * granule (48 kHz domain) INCLUDES the pre-skip the reader must
    * subtract. */
  def oggOpus(channels: Int, preSkip: Int,
              samples48k: Long): Array[Byte] = {
    val id = new ByteArrayOutputStream()
    id.write("OpusHead".getBytes("US-ASCII"))
    id.write(1) // version
    id.write(channels)
    id.write(preSkip & 0xFF); id.write((preSkip >> 8) & 0xFF)
    id.write(le32(48000)) // informational input rate
    id.write(0); id.write(0) // output gain
    id.write(0) // channel mapping family 0
    oggPage(id.toByteArray, 0, 0x6F70, 0, 2) ++
      oggPage(Array.fill[Byte](32)(0x3C), samples48k + preSkip,
        0x6F70, 1, 4)
  }

  /** Multiplexed shape: the Vorbis stream's pages followed by a
    * SECOND logical stream (different serial) whose final page
    * carries a huge foreign granule — duration must come from the
    * FIRST stream's own last granule, not the physically-last
    * page. */
  def oggMultiplexed(sampleRate: Int, channels: Int,
                     totalSamples: Long): Array[Byte] =
    oggVorbis(sampleRate, channels, totalSamples) ++
      oggPage(Array.fill[Byte](16)(0x11), 999999999L, 0x7EAD, 0, 2) ++
      oggPage(Array.fill[Byte](16)(0x11), 1999999999L, 0x7EAD, 1, 4)

  /** BOS page truncated mid-body: rate/channels survive, duration
    * nulls (the broken-chain convention). */
  def oggTruncated: Array[Byte] = {
    val whole = oggVorbis(32000, 2, 99999L)
    whole.take(whole.length - 20)
  }

  def all: Seq[(Long, Array[Byte])] = Seq(
    1L -> wav(44100, 2, 16, 1000),
    2L -> wav(16000, 1, 8, 12345, withListChunk = true),
    3L -> wav(8000, 1, 16, 0),
    4L -> wavTruncated,
    5L -> flac(44100, 2, 16, 88200L),
    6L -> flac(96000, 8, 24, 123456789L),
    7L -> "not audio in any way".getBytes("UTF-8"),
    8L -> mp3(version = 3, srIdx = 0, mono = false),
    9L -> mp3(version = 2, srIdx = 2, mono = true, withId3 = true),
    10L -> mp3Id3Only,
    // 25 stereo 16-bit frames = 100 data bytes; frames read from COMM
    11L -> aiff(22050, 2, 16, new Array[Byte](100)),
    // AIFC marker with a sowt body (metadata reads the same COMM)
    12L -> aiff(48000, 1, 16, new Array[Byte](24), comp = "sowt"),
    // .au: 16-bit BE mono, 30 frames = 60 data bytes
    13L -> au(8000, 1, 3, new Array[Byte](60)),
    // .au mu-law stereo with an annotation region to skip
    14L -> au(44100, 2, 1, new Array[Byte](50), offset = 40),
    // OGG: Vorbis id header + EOS granule = total PCM samples
    15L -> oggVorbis(44100, 2, 88200L),
    16L -> oggVorbis(8000, 1, 4000L),
    // Opus: fixed 48 kHz output; EOS granule minus pre-skip
    17L -> oggOpus(2, 312, 96000L),
    // truncated page chain: id header reads, duration nulls
    18L -> oggTruncated)
}
