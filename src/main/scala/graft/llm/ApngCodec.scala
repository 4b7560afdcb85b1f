package graft.llm

import scala.collection.mutable.ArrayBuffer

/** APNG (Animated PNG, PNG 3rd-edition chunks acTL/fcTL/fdAT) — the
  * second animation container web crawls carry next to GIF.
  *
  * `decodeFrames` returns per-frame RGBA canvases composited per the
  * spec: frame regions render at (x, y) offsets with blend op 0
  * (SOURCE, replace) or 1 (OVER, Porter-Duff on non-premultiplied
  * alpha), then dispose op 0 (none), 1 (background: clear the region
  * to transparent black) or 2 (previous: revert to the pre-render
  * canvas; on the first frame it degrades to background, per spec).
  * The default image (IDAT) is frame 0 when an fcTL precedes IDAT,
  * otherwise it is NOT part of the animation and only fdAT frames
  * render.
  *
  * Frame rasters are decoded by a self-contained Inflater + filter
  * undo at 8-bit depth, color types 0/2/4/6, non-interlaced — the
  * shapes APNG encoders actually emit; anything else refuses loudly.
  * (The still-image PNG path in Multimodal keeps its own wider depth
  * matrix; this decoder exists because compositing needs the alpha
  * plane that path deliberately drops.)
  */
object ApngCodec {

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) |
      ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && (b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G'

  /** PNG signature + an acTL chunk before IDAT. */
  def isApng(b: Array[Byte]): Boolean = {
    if (!isPng(b)) return false
    var pos = 8
    while (pos + 8 <= b.length) {
      val len = be32(b, pos)
      val typ = new String(b, pos + 4, 4, "US-ASCII")
      if (typ == "acTL") return true
      if (typ == "IDAT" || typ == "IEND") return false
      if (len < 0 || pos + 12L + len > b.length) return false
      pos += 12 + len
    }
    false
  }

  private case class Fctl(seq: Int, w: Int, h: Int, x: Int, y: Int,
                          dispose: Int, blend: Int,
                          data: ArrayBuffer[Byte])

  /** (canvasW, canvasH, RGBA canvas per animation frame). */
  def decodeFrames(b: Array[Byte]): (Int, Int, Seq[Array[Float]]) = {
    require(isApng(b), "not an APNG")
    var pos = 8
    var w = 0; var h = 0; var depth = 0; var color = -1
    var palette: Array[Int] = null
    var numFrames = -1
    val frames = ArrayBuffer[Fctl]()
    var pendingFctl: Fctl = null // fcTL seen, awaiting IDAT/fdAT data
    var idatIsFrame = false
    val idat = ArrayBuffer[Byte]()
    var done = false
    while (!done && pos + 8 <= b.length) {
      val len = be32(b, pos)
      val typ = new String(b, pos + 4, 4, "US-ASCII")
      require(len >= 0 && pos + 12L + len <= b.length,
        s"truncated APNG chunk $typ")
      val p = pos + 8
      typ match {
        case "IHDR" =>
          w = be32(b, p); h = be32(b, p + 4)
          depth = b(p + 8) & 0xFF; color = b(p + 9) & 0xFF
          require(depth == 8 && Set(0, 2, 3, 4, 6)(color),
            s"APNG frames decode at 8-bit depth (got depth=$depth color=$color)")
          require((b(p + 12) & 0xFF) == 0, "interlaced APNG unsupported")
          require(w > 0 && h > 0 && w.toLong * h <= 16000000L,
            s"APNG $w x $h out of range")
        case "PLTE" =>
          palette = Array.tabulate(len)(i => b(p + i) & 0xFF)
        case "acTL" =>
          numFrames = be32(b, p)
          require(numFrames > 0 && numFrames <= 4096,
            s"APNG frame count $numFrames out of range")
        case "fcTL" =>
          val f = Fctl(be32(b, p), be32(b, p + 4), be32(b, p + 8),
            be32(b, p + 12), be32(b, p + 16),
            b(p + 24) & 0xFF, b(p + 25) & 0xFF, ArrayBuffer[Byte]())
          require(f.w > 0 && f.h > 0 && f.x >= 0 && f.y >= 0 &&
            f.x + f.w <= w && f.y + f.h <= h,
            s"APNG frame rect ${f.w}x${f.h}+${f.x}+${f.y} outside canvas")
          require(f.dispose <= 2 && f.blend <= 1,
            s"APNG dispose=${f.dispose} blend=${f.blend} unknown")
          frames += f
          pendingFctl = f
        case "IDAT" =>
          if (pendingFctl != null && frames.size == 1) {
            idatIsFrame = true
            pendingFctl.data ++= b.slice(p, p + len)
          } else idat ++= b.slice(p, p + len)
        case "fdAT" =>
          require(pendingFctl != null, "APNG fdAT before any fcTL")
          pendingFctl.data ++= b.slice(p + 4, p + len) // skip sequence no.
        case "IEND" => done = true
        case _ => // ancillary
      }
      pos += 12 + len
    }
    require(numFrames == frames.size,
      s"acTL declares $numFrames frames, found ${frames.size}")
    require(color != 3 || palette != null, "palette APNG missing PLTE")
    // each output frame is a full canvas clone — cap the TOTAL
    // pixel-frame volume, not just per-frame dims, or a hostile
    // 4096-frame animation over a large canvas OOMs the task
    require(frames.size.toLong * w * h <= 64000000L,
      s"APNG ${frames.size} frames x $w x $h exceeds the composite cap")
    // IDAT-as-frame-0 requires its fcTL to cover the full canvas
    if (idatIsFrame) {
      val f = frames.head
      require(f.w == w && f.h == h && f.x == 0 && f.y == 0,
        "APNG default-image frame must cover the canvas")
    }

    val canvas = new Array[Float](w * h * 4)
    val out = ArrayBuffer[Array[Float]]()
    var first = true
    frames.foreach { f =>
      require(f.data.nonEmpty, s"APNG frame ${f.seq} carries no data")
      val px = decodeRaster(f.data.toArray, f.w, f.h, color, palette)
      val snapshot =
        if (f.dispose == 2 && !first) canvas.clone() else null
      // render
      var fy = 0
      while (fy < f.h) {
        var fx = 0
        while (fx < f.w) {
          val d = ((f.y + fy) * w + (f.x + fx)) * 4
          val s = (fy * f.w + fx) * 4
          if (f.blend == 0 || px(s + 3) == 255f) {
            canvas(d) = px(s); canvas(d + 1) = px(s + 1)
            canvas(d + 2) = px(s + 2); canvas(d + 3) = px(s + 3)
          } else if (px(s + 3) > 0f) {
            // OVER on non-premultiplied alpha (double arithmetic)
            val fa = px(s + 3) / 255.0
            val ba = canvas(d + 3) / 255.0
            val oa = fa + ba * (1 - fa)
            var c = 0
            while (c < 3) {
              canvas(d + c) =
                ((px(s + c) * fa + canvas(d + c) * ba * (1 - fa)) / oa).toFloat
              c += 1
            }
            canvas(d + 3) = (oa * 255.0).toFloat
          } // fa == 0: fully transparent fg leaves the canvas pixel
          fx += 1
        }
        fy += 1
      }
      out += canvas.clone()
      // dispose for the NEXT frame
      val dispose = if (first && f.dispose == 2) 1 else f.dispose
      if (dispose == 1) {
        var fy = 0
        while (fy < f.h) {
          var fx = 0
          while (fx < f.w) {
            val d = ((f.y + fy) * w + (f.x + fx)) * 4
            canvas(d) = 0; canvas(d + 1) = 0; canvas(d + 2) = 0
            canvas(d + 3) = 0
            fx += 1
          }
          fy += 1
        }
      } else if (dispose == 2 && snapshot != null)
        System.arraycopy(snapshot, 0, canvas, 0, canvas.length)
      first = false
    }
    (w, h, out.toSeq)
  }

  /** Inflate + per-row filter undo + RGBA lift for one frame raster
    * (8-bit, non-interlaced; color types 0/2/3/4/6). */
  private def decodeRaster(z: Array[Byte], w: Int, h: Int, color: Int,
                           palette: Array[Int]): Array[Float] = {
    val chans = color match {
      case 0 | 3 => 1; case 4 => 2; case 2 => 3; case _ => 4
    }
    val stride = w * chans
    val raw = new Array[Byte]((1 + stride) * h)
    val inf = new java.util.zip.Inflater()
    inf.setInput(z)
    var got = 0
    while (got < raw.length && !inf.finished()) {
      val n = inf.inflate(raw, got, raw.length - got)
      require(n > 0 || !inf.needsInput(), "truncated APNG frame raster")
      got += n
    }
    inf.end()
    require(got == raw.length, s"APNG frame raster short ($got)")
    def paeth(a: Int, bb: Int, c: Int): Int = {
      val pa = math.abs(bb - c); val pb = math.abs(a - c)
      val pc = math.abs(a + bb - 2 * c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) bb else c
    }
    val prev = new Array[Int](stride)
    val cur = new Array[Int](stride)
    val out = new Array[Float](w * h * 4)
    var y = 0
    while (y < h) {
      val base = y * (1 + stride)
      val filter = raw(base) & 0xFF
      require(filter <= 4, s"APNG filter $filter")
      var i = 0
      while (i < stride) {
        val x = raw(base + 1 + i) & 0xFF
        val a = if (i >= chans) cur(i - chans) else 0
        val bb = prev(i)
        val c = if (i >= chans) prev(i - chans) else 0
        cur(i) = (filter match {
          case 0 => x
          case 1 => x + a
          case 2 => x + bb
          case 3 => x + (a + bb) / 2
          case _ => x + paeth(a, bb, c)
        }) & 0xFF
        i += 1
      }
      var x = 0
      while (x < w) {
        val d = (y * w + x) * 4
        color match {
          case 0 =>
            val g = cur(x)
            out(d) = g; out(d + 1) = g; out(d + 2) = g; out(d + 3) = 255
          case 4 =>
            val g = cur(x * 2)
            out(d) = g; out(d + 1) = g; out(d + 2) = g
            out(d + 3) = cur(x * 2 + 1)
          case 2 =>
            out(d) = cur(x * 3); out(d + 1) = cur(x * 3 + 1)
            out(d + 2) = cur(x * 3 + 2); out(d + 3) = 255
          case 3 =>
            val idx = cur(x)
            require(idx * 3 + 2 < palette.length, s"APNG palette index $idx")
            out(d) = palette(idx * 3); out(d + 1) = palette(idx * 3 + 1)
            out(d + 2) = palette(idx * 3 + 2); out(d + 3) = 255
          case _ =>
            out(d) = cur(x * 4); out(d + 1) = cur(x * 4 + 1)
            out(d + 2) = cur(x * 4 + 2); out(d + 3) = cur(x * 4 + 3)
        }
        x += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    out
  }

  // ---------------------------------------------------------------- fixture

  /** One animation frame for the fixture builder. */
  case class FrameSpec(w: Int, h: Int, x: Int, y: Int,
                       pix: (Int, Int) => (Int, Int, Int),
                       alpha: (Int, Int) => Int = (_, _) => 255,
                       dispose: Int = 0, blend: Int = 0)

  /** Assemble an APNG: canvas IHDR from frame 0 (which must cover
    * the canvas), acTL, then per frame fcTL + IDAT (frame 0) / fdAT.
    * Frames are 8-bit RGBA, filter 0, zlib-deflated. */
  def encode(frames: Seq[FrameSpec]): Array[Byte] = {
    require(frames.nonEmpty)
    val f0 = frames.head
    require(f0.x == 0 && f0.y == 0, "frame 0 must cover the canvas")
    val out = new ArrayBuffer[Byte]()
    out ++= Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
    def be32(v: Int): Array[Byte] = Array(
      ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out ++= be32(data.length)
      out ++= typ.getBytes("US-ASCII")
      out ++= data
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      out ++= be32(crc.getValue.toInt)
    }
    chunk("IHDR", be32(f0.w) ++ be32(f0.h) ++
      Array[Byte](8, 6, 0, 0, 0)) // 8-bit RGBA, non-interlaced
    chunk("acTL", be32(frames.size) ++ be32(0))
    var seq = 0
    frames.zipWithIndex.foreach { case (f, i) =>
      chunk("fcTL", be32(seq) ++ be32(f.w) ++ be32(f.h) ++ be32(f.x) ++
        be32(f.y) ++ Array[Byte](0, 1, 0, 100) ++ // delay 1/100 s
        Array[Byte](f.dispose.toByte, f.blend.toByte))
      seq += 1
      val stride = f.w * 4
      val raster = new Array[Byte]((1 + stride) * f.h)
      for (y <- 0 until f.h; x <- 0 until f.w) {
        val (r, g, b) = f.pix(x, y)
        val o = y * (1 + stride) + 1 + x * 4
        raster(o) = r.toByte; raster(o + 1) = g.toByte
        raster(o + 2) = b.toByte; raster(o + 3) = f.alpha(x, y).toByte
      }
      val z = {
        val d = new java.util.zip.Deflater()
        d.setInput(raster); d.finish()
        val bos = new ArrayBuffer[Byte]()
        val buf = new Array[Byte](8192)
        while (!d.finished()) { val n = d.deflate(buf); bos ++= buf.take(n) }
        d.end(); bos.toArray
      }
      if (i == 0) chunk("IDAT", z)
      else { chunk("fdAT", be32(seq) ++ z); seq += 1 }
    }
    chunk("IEND", Array.empty)
    out.toArray
  }
}
