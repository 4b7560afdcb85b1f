package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PDF text extraction — after HTML, the largest text source in real
  * crawl-derived training pipelines ([[HtmlText]]'s sibling for
  * `application/pdf` responses).
  *
  * Honest dependency-free subset (PDF 32000-1):
  *   - classic `xref` tables with `/Prev` chains (§7.5.4), PDF 1.5+
  *     cross-reference STREAMS (/W widths, /Index ranges, type-2
  *     entries) and /Type/ObjStm object streams — what modern
  *     writers actually emit — plus hybrid /XRefStm files; trailer
  *     `/Root` → page-tree walk with inherited `/Resources`
  *   - streams raw or `/FlateDecode` via the JDK Inflater (the same
  *     path the PNG/TIFF codecs use), expansion-capped, with the
  *     PNG row predictors (/DecodeParms Predictor 10-15) xref
  *     streams routinely carry
  *   - content-stream text operators: `BT/ET`, `Tf`, `Td`, `TD`,
  *     `T-star`, `Tm` (line moves), `Tj/'/"/TJ` (shows; TJ kern
  *     adjustments ≤ -100 units surface as a word space)
  *   - literal strings with all escapes (octal, line continuation)
  *     and hex strings; bytes decode through the font's encoding:
  *     WinAnsiEncoding, StandardEncoding (Appendix D tables) and
  *     `/Differences` over a glyph-name map — unknown glyph names
  *     decode as U+FFFD (extraction is loss-tolerant at glyph
  *     granularity)
  *   - REFUSES loudly (the VP8 pattern — never silently wrong):
  *     encryption (`/Encrypt`), non-Flate filters, the TIFF
  *     predictor, composite `/Type0` (CID) fonts, and
  *     `/MacRomanEncoding`
  *
  * Deterministic line contract (so SQL oracles can replay the
  * extraction symbolically): every line-move operator appends one
  * `\n` iff the page buffer is non-empty and does not already end
  * with `\n`; pages join with `\n\n`.
  *
  * Scale shape: [[extract]] is a narrow per-row map (bytes in, text
  * out) — at crawl scale it runs inside the same task as the WARC
  * record walk, exactly like the image codecs.
  */
object PdfText {

  private val MaxInflate = 256L << 20 // per-stream decode cap
  private val MaxObjects = 10000000 // xref entry cap
  private val MaxPages = 100000
  private val MaxDepth = 64 // value-nesting / page-tree recursion cap

  // ------------------------------------------------------------- model

  private case class PName(s: String)
  private case class PRef(num: Int, gen: Int)
  private case object PNull
  private case class PStream(dict: Map[String, Any], raw: Array[Byte])

  def isPdf(b: Array[Byte]): Boolean =
    b.length >= 8 && b(0) == '%' && b(1) == 'P' && b(2) == 'D' &&
      b(3) == 'F' && b(4) == '-'

  /** All pages' text, joined with a blank line. */
  def extractText(pdf: Array[Byte]): String = pages(pdf).mkString("\n\n")

  /** Per-page extracted text. */
  def pages(pdf: Array[Byte]): Seq[String] = {
    require(isPdf(pdf), "not a PDF (missing %PDF- header)")
    val doc = new Doc(pdf)
    doc.pageObjects().map(p => doc.pageText(p))
  }

  /** (id, n_pages, text) — narrow per-row extraction. */
  def extract(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val ps = pages(bytes)
        (id, ps.length, ps.mkString("\n\n"))
      })
      .toDF("id", "n_pages", "text")
  }

  // ------------------------------------------------------------ document

  private final class Doc(b: Array[Byte]) {
    private val cache = scala.collection.mutable.Map[Int, Any]()
    private val (offsets, trailer) = readXrefChain()

    require(!trailer.contains("Encrypt"),
      "encrypted PDF unsupported (refusing, not mis-decoding)")

    /** Resolve indirect references (possibly chained) to a value. */
    def resolve(v: Any, depth: Int = 0): Any = {
      require(depth < MaxDepth, "PDF reference chain too deep")
      v match {
        case PRef(num, _) => resolve(obj(num), depth + 1)
        case other => other
      }
    }

    private val inProgress = scala.collection.mutable.Set[Int]()

    // explicit two-step (not getOrElseUpdate): parsing may recurse
    // into OTHER objects (indirect /Length), and reentrant updates
    // inside getOrElseUpdate's default are not safe on a HashMap.
    // The inProgress set turns a reference CYCLE reached during that
    // recursion (object A's /Length pointing back at A) into a loud
    // IllegalArgumentException instead of a StackOverflowError — SOE
    // is fatal and would escape the per-document Try in streaming
    // callers, killing the whole query on one crafted PDF.
    private def obj(num: Int): Any = cache.get(num) match {
      case Some(v) => v
      case None =>
        require(inProgress.add(num),
          s"PDF object $num participates in a reference cycle")
        try {
          val v = parseObjAt(num)
          cache(num) = v
          v
        } finally inProgress.remove(num)
    }

    private def parseObjAt(num: Int): Any =
      offsets.getOrElse(num,
        throw new IllegalArgumentException(s"PDF object $num not in xref")
      ) match {
        case Left(-1L) => PNull // freed (type-0/'f') object: null per spec
        case Left(off) => parseObjAtOffset(num, off)
        case Right((stmNum, _)) => objFromStream(num, stmNum)
      }

    private def parseObjAtOffset(num: Int, off: Long): Any = {
      val lx = new Lexer(b, off.toInt)
      val n1 = lx.token()
      val n2 = lx.token()
      val kw = lx.token()
      require(n1 == java.lang.Long.valueOf(num.toLong) && kw == "obj" &&
        n2.isInstanceOf[java.lang.Long],
        s"PDF object $num: malformed header at $off")
      val value = lx.value(0)
      lx.skipWs()
      if (lx.peekKeyword("stream")) {
        val dict = value.asInstanceOf[Map[String, Any]]
        val len = resolve(dict.getOrElse("Length",
          throw new IllegalArgumentException(
            s"PDF object $num stream lacks /Length")))
          .asInstanceOf[java.lang.Long].toInt
        val raw = lx.streamBytes(len)
        PStream(dict, raw)
      } else value
    }

    /** Decoded stream payload — raw or FlateDecode, with the PNG
      * row predictors xref streams routinely carry in /DecodeParms
      * (Predictor ≥ 10; the TIFF predictor 2 refuses). */
    def decodedStream(s: PStream): Array[Byte] = {
      val inflated = resolve(s.dict.getOrElse("Filter", PNull)) match {
        case PNull => s.raw
        case PName("FlateDecode") => inflate(s.raw)
        case v: Vector[Any] @unchecked if v.isEmpty => s.raw
        case v: Vector[Any] @unchecked
            if v.map(resolve(_)) == Vector(PName("FlateDecode")) =>
          inflate(s.raw)
        case other =>
          throw new IllegalArgumentException(
            s"PDF stream filter $other unsupported (FlateDecode only)")
      }
      val parms = resolve(s.dict.getOrElse("DecodeParms",
        s.dict.getOrElse("DP", PNull))) match {
        case m: Map[String, Any] @unchecked => m
        case v: Vector[Any] @unchecked if v.length == 1 =>
          resolve(v.head) match {
            case m: Map[String, Any] @unchecked => m
            case _ => Map.empty[String, Any]
          }
        case _ => Map.empty[String, Any]
      }
      val predictor = resolve(parms.getOrElse("Predictor",
        java.lang.Long.valueOf(1L))).asInstanceOf[java.lang.Long].toInt
      if (predictor <= 1) inflated
      else if (predictor >= 10) {
        val columns = resolve(parms.getOrElse("Columns",
          java.lang.Long.valueOf(1L))).asInstanceOf[java.lang.Long].toInt
        val colors = resolve(parms.getOrElse("Colors",
          java.lang.Long.valueOf(1L))).asInstanceOf[java.lang.Long].toInt
        val bpc = resolve(parms.getOrElse("BitsPerComponent",
          java.lang.Long.valueOf(8L))).asInstanceOf[java.lang.Long].toInt
        pngPredictorUndo(inflated, columns, colors, bpc)
      } else throw new IllegalArgumentException(
        s"PDF /Predictor $predictor unsupported (none or PNG)")
    }

    /** PNG row filters (each row: filter byte + data) — the same
      * None/Sub/Up/Average/Paeth math the PNG codec undoes. */
    private def pngPredictorUndo(data: Array[Byte], columns: Int,
                                 colors: Int, bpc: Int): Array[Byte] = {
      require(columns > 0 && colors > 0 && bpc > 0 &&
        columns.toLong * colors * bpc <= (1L << 30), "predictor geometry")
      val rowBytes = (columns.toLong * colors * bpc + 7).toInt / 8
      val bpp = math.max(1, colors * bpc / 8)
      val rows = data.length / (rowBytes + 1)
      require(rows.toLong * (rowBytes + 1) == data.length,
        s"PNG-predicted stream length ${data.length} not a multiple of " +
          s"row ${rowBytes + 1}")
      val out = new Array[Byte](rows * rowBytes)
      var r = 0
      while (r < rows) {
        val ft = data(r * (rowBytes + 1)) & 0xFF
        val src = r * (rowBytes + 1) + 1
        val dst = r * rowBytes
        var i = 0
        while (i < rowBytes) {
          val raw = data(src + i) & 0xFF
          val left = if (i >= bpp) out(dst + i - bpp) & 0xFF else 0
          val up = if (r > 0) out(dst - rowBytes + i) & 0xFF else 0
          val ul = if (r > 0 && i >= bpp) out(dst - rowBytes + i - bpp) & 0xFF
                   else 0
          val v = ft match {
            case 0 => raw
            case 1 => raw + left
            case 2 => raw + up
            case 3 => raw + ((left + up) >> 1)
            case 4 =>
              val p = left + up - ul
              val pa = math.abs(p - left)
              val pb = math.abs(p - up)
              val pc = math.abs(p - ul)
              raw + (if (pa <= pb && pa <= pc) left
                     else if (pb <= pc) up else ul)
            case other => throw new IllegalArgumentException(
              s"PNG predictor filter $other")
          }
          out(dst + i) = (v & 0xFF).toByte
          i += 1
        }
        r += 1
      }
      out
    }

    /** Leaf /Page objects in document order, resources inherited. */
    def pageObjects(): Seq[Map[String, Any]] = {
      val root = resolve(trailer.getOrElse("Root",
        throw new IllegalArgumentException("PDF trailer lacks /Root")))
        .asInstanceOf[Map[String, Any]]
      val top = resolve(root.getOrElse("Pages",
        throw new IllegalArgumentException("PDF catalog lacks /Pages")))
        .asInstanceOf[Map[String, Any]]
      val out = scala.collection.mutable.ArrayBuffer[Map[String, Any]]()
      def walk(node: Map[String, Any], inherited: Map[String, Any],
               depth: Int): Unit = {
        require(depth < MaxDepth, "PDF page tree too deep")
        require(out.size <= MaxPages, s"PDF page count exceeds $MaxPages")
        val res = node.get("Resources").map(resolve(_)).orElse(
          inherited.get("Resources")) match {
          case Some(r) => Map[String, Any]("Resources" -> r)
          case None => Map.empty[String, Any]
        }
        resolve(node.getOrElse("Type", PNull)) match {
          case PName("Pages") =>
            val kids = resolve(node.getOrElse("Kids", Vector.empty))
              .asInstanceOf[Vector[Any]]
            kids.foreach { k =>
              walk(resolve(k).asInstanceOf[Map[String, Any]], res, depth + 1)
            }
          case PName("Page") => out += (node ++ res)
          case other =>
            throw new IllegalArgumentException(
              s"PDF page tree node of type $other")
        }
      }
      walk(top, Map.empty, 0)
      out.toSeq
    }

    /** Text of one page: fonts from /Resources, content streams
      * concatenated, interpreted. */
    def pageText(page: Map[String, Any]): String = {
      val fonts: Map[String, Array[Char]] =
        resolve(page.getOrElse("Resources", PNull)) match {
          case m: Map[String, Any] @unchecked =>
            resolve(m.getOrElse("Font", PNull)) match {
              case fm: Map[String, Any] @unchecked =>
                fm.map { case (name, fref) =>
                  name -> encodingOf(resolve(fref).asInstanceOf[Map[String, Any]])
                }
              case _ => Map.empty
            }
          case _ => Map.empty
        }
      val content = resolve(page.getOrElse("Contents", PNull)) match {
        case PNull => Array.emptyByteArray
        case s: PStream => decodedStream(s)
        case v: Vector[Any] @unchecked =>
          v.flatMap(c => resolve(c) match {
            case s: PStream => decodedStream(s) :+ '\n'.toByte
            case other => throw new IllegalArgumentException(
              s"PDF /Contents element $other")
          }).toArray
        case other =>
          throw new IllegalArgumentException(s"PDF /Contents $other")
      }
      interpret(content, fonts)
    }

    /** code→char table for one font object. */
    private def encodingOf(font: Map[String, Any]): Array[Char] = {
      resolve(font.getOrElse("Subtype", PNull)) match {
        case PName("Type0") =>
          throw new IllegalArgumentException(
            "composite (Type0/CID) PDF fonts unsupported")
        case _ =>
      }
      resolve(font.getOrElse("Encoding", PNull)) match {
        case PNull => Encodings.standard
        case PName("WinAnsiEncoding") => Encodings.winAnsi
        case PName("StandardEncoding") => Encodings.standard
        case PName("MacRomanEncoding") =>
          throw new IllegalArgumentException(
            "MacRomanEncoding unsupported (WinAnsi/Standard only)")
        case m: Map[String, Any] @unchecked =>
          val base = resolve(m.getOrElse("BaseEncoding", PNull)) match {
            case PName("WinAnsiEncoding") => Encodings.winAnsi
            case PName("StandardEncoding") | PNull => Encodings.standard
            case other => throw new IllegalArgumentException(
              s"PDF /BaseEncoding $other unsupported")
          }
          val table = base.clone()
          resolve(m.getOrElse("Differences", Vector.empty)) match {
            case diffs: Vector[Any] @unchecked =>
              var code = 0
              diffs.foreach {
                case n: java.lang.Long => code = n.toInt
                case PName(glyph) =>
                  if (code >= 0 && code < 256) {
                    table(code) =
                      Encodings.glyphs.getOrElse(glyph, '�')
                    code += 1
                  }
                case other => throw new IllegalArgumentException(
                  s"PDF /Differences element $other")
              }
            case other => throw new IllegalArgumentException(
              s"PDF /Differences $other")
          }
          table
        case other =>
          throw new IllegalArgumentException(s"PDF /Encoding $other")
      }
    }

    /** The content-stream text machine. */
    private def interpret(content: Array[Byte],
                          fonts: Map[String, Array[Char]]): String = {
      val sb = new java.lang.StringBuilder()
      var enc: Array[Char] = Encodings.standard
      val stack = scala.collection.mutable.ArrayBuffer[Any]()
      def newline(): Unit =
        if (sb.length > 0 && sb.charAt(sb.length - 1) != '\n')
          sb.append('\n')
      def show(bytes: Array[Byte]): Unit =
        bytes.foreach(x => sb.append(enc(x & 0xFF)))
      val lx = new Lexer(content, 0)
      var tok = lx.tokenOrNull()
      while (tok != null) {
        tok match {
          case "[" => // array operand (TJ): collect until the ]
            val arr = Vector.newBuilder[Any]
            var t = lx.token()
            while (t != "]") { arr += t; t = lx.token() }
            stack += arr.result()
          case "<<" => // dict operand (BDC/DP properties): skip it
            var d = 1
            while (d > 0) {
              val t = lx.token()
              if (t == "<<") d += 1
              if (t == ">>") d -= 1
            }
            stack += PNull
          case "BI" => // inline image: binary data — skip to EI
            lx.skipInlineImage()
            stack.clear()
          case op: String => // operator
            op match {
              case "Tf" =>
                if (stack.size >= 2) stack(stack.size - 2) match {
                  case PName(f) => fonts.get(f).foreach(t => enc = t)
                  case _ =>
                }
              case "Td" | "TD" =>
                if (stack.size >= 2) stack.last match {
                  case ty: java.lang.Long if ty.longValue != 0L => newline()
                  case ty: java.lang.Double if ty.doubleValue != 0.0 =>
                    newline()
                  case _ =>
                }
              case "T*" | "Tm" => newline()
              case "Tj" => stack.lastOption.collect {
                  case s: Array[Byte] => show(s)
                }
              case "'" =>
                newline()
                stack.lastOption.collect { case s: Array[Byte] => show(s) }
              case "\"" =>
                newline()
                stack.lastOption.collect { case s: Array[Byte] => show(s) }
              case "TJ" => stack.lastOption.collect {
                  case arr: Vector[Any] @unchecked => arr.foreach {
                    case s: Array[Byte] => show(s)
                    case n: java.lang.Long if n.longValue <= -100 =>
                      if (sb.length > 0 && sb.charAt(sb.length - 1) != ' ' &&
                          sb.charAt(sb.length - 1) != '\n') sb.append(' ')
                    case n: java.lang.Double if n.doubleValue <= -100.0 =>
                      if (sb.length > 0 && sb.charAt(sb.length - 1) != ' ' &&
                          sb.charAt(sb.length - 1) != '\n') sb.append(' ')
                    case _ =>
                  }
                }
              case _ => // graphics/state operator: ignore
            }
            stack.clear()
          case v => stack += v
        }
        tok = lx.tokenOrNull()
      }
      // drop the trailing line-move newline, if any
      while (sb.length > 0 && sb.charAt(sb.length - 1) == '\n')
        sb.setLength(sb.length - 1)
      sb.toString
    }

    // ------------------------------------------------------------- xref

    /** Where an object lives: a byte offset, or (object stream
      * number, index within it) — xref type-2 entries. */
    private def readXrefChain(): (Map[Int, Either[Long, (Int, Int)]],
                                  Map[String, Any]) = {
      val tail = new String(b, math.max(0, b.length - 2048),
        math.min(2048, b.length), "ISO-8859-1")
      val sx = tail.lastIndexOf("startxref")
      require(sx >= 0, "PDF lacks startxref")
      val numStr = tail.substring(sx + 9).trim.takeWhile(_.isDigit)
      require(numStr.nonEmpty, "PDF startxref offset unreadable")
      var off = numStr.toLong
      val offsets =
        scala.collection.mutable.Map[Int, Either[Long, (Int, Int)]]()
      var trailer: Map[String, Any] = null
      val seen = scala.collection.mutable.Set[Long]()
      while (off >= 0) {
        require(off < b.length && seen.add(off), s"PDF xref offset $off invalid")
        val lx = new Lexer(b, off.toInt)
        lx.skipWs()
        val tdict =
          if (lx.peekKeyword("xref")) readClassicXref(lx, offsets)
          else readXrefStream(lx, offsets)
        if (trailer == null) trailer = tdict
        // hybrid-reference files: the classic trailer may point at a
        // companion xref STREAM carrying the object-stream entries
        tdict.get("XRefStm") match {
          case Some(p: java.lang.Long)
              if p.longValue >= 0 && p.longValue < b.length &&
                seen.add(p.longValue) =>
            readXrefStream(new Lexer(b, p.intValue), offsets)
          case _ =>
        }
        off = tdict.get("Prev") match {
          case Some(p: java.lang.Long) => p.longValue
          case _ => -1L
        }
      }
      (offsets.toMap, trailer)
    }

    private def readClassicXref(
        lx: Lexer,
        offsets: scala.collection.mutable.Map[Int, Either[Long, (Int, Int)]])
        : Map[String, Any] = {
      lx.expectKeyword("xref")
      var tok = lx.token()
      var total = 0L
      while (tok != "trailer") {
        val start = tok.asInstanceOf[java.lang.Long].toInt
        val count = lx.token().asInstanceOf[java.lang.Long].toInt
        total += count
        require(count >= 0 && total <= MaxObjects,
          s"PDF xref entry count exceeds $MaxObjects")
        var i = 0
        while (i < count) {
          val o = lx.token().asInstanceOf[java.lang.Long]
          lx.token() // generation
          val kind = lx.token().asInstanceOf[String]
          // newest-first chain: existing entries win over /Prev —
          // INCLUDING free ('f') tombstones, else a deleted object
          // resurrects from a stale offset in an older section
          if (!offsets.contains(start + i))
            offsets(start + i) =
              Left(if (kind == "n") o.longValue else -1L)
          i += 1
        }
        tok = lx.token()
      }
      lx.value(0).asInstanceOf[Map[String, Any]]
    }

    /** PDF 1.5 cross-reference STREAM: a stream object whose decoded
      * payload is fixed-width binary entry rows (/W field widths,
      * /Index subsection ranges); type-2 entries point into object
      * streams. All dict values must be direct per spec, so this
      * parses without the offsets map (no chicken-and-egg). */
    private def readXrefStream(
        lx: Lexer,
        offsets: scala.collection.mutable.Map[Int, Either[Long, (Int, Int)]])
        : Map[String, Any] = {
      lx.token() // object number
      lx.token() // generation
      val kw = lx.token()
      require(kw == "obj",
        "PDF startxref points at neither an xref table nor an xref stream")
      val dict = lx.value(0) match {
        case m: Map[String, Any] @unchecked => m
        case other => throw new IllegalArgumentException(
          s"PDF xref stream object is $other, not a dict")
      }
      require(dict.get("Type") == Some(PName("XRef")),
        "PDF startxref object lacks /Type /XRef")
      lx.skipWs()
      require(lx.peekKeyword("stream"), "PDF xref stream has no stream")
      val len = dict.getOrElse("Length",
        throw new IllegalArgumentException("xref stream lacks direct /Length"))
        .asInstanceOf[java.lang.Long].toInt
      val data = decodedStream(PStream(dict, lx.streamBytes(len)))
      val w = dict.getOrElse("W", Vector.empty).asInstanceOf[Vector[Any]]
        .map(_.asInstanceOf[java.lang.Long].toInt)
      require(w.length == 3 && w.forall(x => x >= 0 && x <= 8),
        s"PDF xref stream /W $w")
      val size = dict.getOrElse("Size",
        throw new IllegalArgumentException("xref stream lacks /Size"))
        .asInstanceOf[java.lang.Long].toInt
      val index: Seq[(Int, Int)] = dict.get("Index") match {
        case Some(v: Vector[Any] @unchecked) =>
          require(v.length % 2 == 0, "odd /Index")
          v.map(_.asInstanceOf[java.lang.Long].toInt).grouped(2)
            .map(p => (p(0), p(1))).toSeq
        case _ => Seq((0, size))
      }
      val rowLen = w.sum
      var pos = 0
      var totalRows = 0L
      def field(width: Int, default: Long): Long = {
        if (width == 0) return default
        var v = 0L
        var i = 0
        while (i < width) { v = (v << 8) | (data(pos + i) & 0xFFL); i += 1 }
        pos += width
        v
      }
      index.foreach { case (start, count) =>
        totalRows += count
        require(count >= 0 && totalRows <= MaxObjects,
          s"PDF xref stream entry count exceeds $MaxObjects")
        require(pos + count.toLong * rowLen <= data.length,
          "PDF xref stream data short for /Index")
        var i = 0
        while (i < count) {
          val typ = field(w(0), 1L)
          val f2 = field(w(1), 0L)
          val f3 = field(w(2), 0L)
          val num = start + i
          if (!offsets.contains(num)) typ match {
            case 1L => offsets(num) = Left(f2)
            case 2L => offsets(num) = Right((f2.toInt, f3.toInt))
            case 0L => offsets(num) = Left(-1L) // free: tombstone
            case _ => // unknown types: skip per spec
          }
          i += 1
        }
      }
      dict
    }

    /** An object living inside a /Type /ObjStm container: the stream
      * payload starts with N (num, offset) integer pairs; object i's
      * body begins at /First + offset_i. */
    private def objFromStream(num: Int, stmNum: Int): Any = {
      // a container must itself be a direct (type-1) object — an
      // ObjStm inside an ObjStm is illegal and, unchecked, a hostile
      // cycle (A in B, B in A) would recurse unboundedly
      require(offsets.get(stmNum).exists(_.isLeft),
        s"PDF object stream $stmNum is not a direct object")
      val container = resolve(PRef(stmNum, 0)) match {
        case s: PStream => s
        case other => throw new IllegalArgumentException(
          s"PDF object stream $stmNum is $other")
      }
      require(container.dict.get("Type") == Some(PName("ObjStm")),
        s"PDF object $num points into non-ObjStm $stmNum")
      val data = decodedStream(container)
      val n = resolve(container.dict.getOrElse("N",
        throw new IllegalArgumentException("ObjStm lacks /N")))
        .asInstanceOf[java.lang.Long].toInt
      val first = resolve(container.dict.getOrElse("First",
        throw new IllegalArgumentException("ObjStm lacks /First")))
        .asInstanceOf[java.lang.Long].toInt
      require(n >= 0 && n <= 100000 && first >= 0 && first <= data.length,
        s"ObjStm header out of range (N=$n First=$first)")
      val hdr = new Lexer(data, 0)
      var found = -1L
      var i = 0
      while (i < n && found < 0) {
        val objNum = hdr.token().asInstanceOf[java.lang.Long].toInt
        val off = hdr.token().asInstanceOf[java.lang.Long]
        if (objNum == num) found = off.longValue
        i += 1
      }
      require(found >= 0, s"PDF object $num not in object stream $stmNum")
      require(first + found < data.length, "ObjStm offset out of range")
      new Lexer(data, (first + found).toInt).value(0)
    }

    private def inflate(data: Array[Byte]): Array[Byte] = {
      val inf = new java.util.zip.Inflater()
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 3))
      val buf = new Array[Byte](65536)
      var total = 0L
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        require(n > 0 || !inf.needsInput(), "truncated PDF Flate stream")
        if (n == 0 && inf.needsDictionary())
          throw new IllegalArgumentException("PDF Flate preset dictionary")
        total += n
        require(total <= MaxInflate,
          s"PDF Flate expansion exceeds $MaxInflate bytes")
        out.write(buf, 0, n)
      }
      inf.end()
      out.toByteArray
    }
  }

  // -------------------------------------------------------------- lexer

  /** PDF object lexer/parser over a byte range. `token()` returns
    * java.lang.Long | java.lang.Double | String (keyword/operator) |
    * PName | Array[Byte] (string) | "[[" structural markers are
    * handled internally by `value`. */
  private final class Lexer(b: Array[Byte], var pos: Int) {

    def skipWs(): Unit = {
      var go = true
      while (go && pos < b.length) {
        val c = b(pos)
        if (c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == 0 ||
            c == 12) pos += 1
        else if (c == '%') { // comment to EOL
          while (pos < b.length && b(pos) != '\r' && b(pos) != '\n') pos += 1
        } else go = false
      }
    }

    def peekKeyword(kw: String): Boolean = {
      skipWs()
      if (pos + kw.length > b.length) return false
      var i = 0
      while (i < kw.length) {
        if (b(pos + i) != kw.charAt(i)) return false
        i += 1
      }
      true
    }

    def expectKeyword(kw: String): Unit = {
      require(peekKeyword(kw), s"PDF: expected '$kw' at $pos")
      pos += kw.length
    }

    /** Raw stream payload: positioned after the stream dict, consumes
      * `stream` EOL + len bytes + `endstream`. */
    def streamBytes(len: Int): Array[Byte] = {
      expectKeyword("stream")
      if (pos < b.length && b(pos) == '\r') pos += 1
      if (pos < b.length && b(pos) == '\n') pos += 1
      require(len >= 0 && pos + len <= b.length,
        s"PDF stream of $len bytes overruns the file")
      val out = java.util.Arrays.copyOfRange(b, pos, pos + len)
      pos += len
      skipWs()
      expectKeyword("endstream")
      out
    }

    def tokenOrNull(): Any = {
      skipWs()
      if (pos >= b.length) null else token()
    }

    /** Skip an inline image (`BI … ID <binary> EI`): binary data is
      * unlexable, so scan for a whitespace-delimited `EI`. */
    def skipInlineImage(): Unit = {
      var i = pos
      while (i + 2 < b.length &&
             !(isDelim(b(i)) && b(i + 1) == 'E' && b(i + 2) == 'I' &&
               (i + 3 >= b.length || isDelim(b(i + 3))))) i += 1
      pos = math.min(b.length, i + 3)
    }

    /** One lexical token (no ref-folding; `value` does that). */
    def token(): Any = {
      skipWs()
      require(pos < b.length, "PDF: unexpected end of input")
      val c = b(pos).toChar
      c match {
        case '/' => name()
        case '(' => literalString()
        case '<' =>
          if (pos + 1 < b.length && b(pos + 1) == '<') { pos += 2; "<<" }
          else hexString()
        case '>' =>
          require(pos + 1 < b.length && b(pos + 1) == '>',
            s"PDF: stray '>' at $pos")
          pos += 2; ">>"
        case '[' => pos += 1; "["
        case ']' => pos += 1; "]"
        case d if d.isDigit || d == '+' || d == '-' || d == '.' => number()
        case _ => keyword()
      }
    }

    /** One VALUE with structure folding: dicts, arrays, refs. */
    def value(depth: Int): Any = {
      require(depth < MaxDepth, "PDF value nesting too deep")
      token() match {
        case "<<" =>
          val m = Map.newBuilder[String, Any]
          var t = token()
          while (t != ">>") {
            val key = t match {
              case PName(k) => k
              case other => throw new IllegalArgumentException(
                s"PDF dict key $other")
            }
            m += key -> valueFrom(token(), depth + 1)
            t = token()
          }
          m.result()
        case "[" =>
          val out = Vector.newBuilder[Any]
          var t = token()
          while (t != "]") {
            out += valueFrom(t, depth + 1)
            t = token()
          }
          out.result()
        case t => valueFrom(t, depth)
      }
    }

    /** Fold a lexed token into a value; an integer may open an
      * `n g R` indirect reference. */
    private def valueFrom(t: Any, depth: Int): Any = t match {
      case "<<" | "[" => rewindAnd(t, depth)
      case n: java.lang.Long => tryRef(n)
      case "true" => java.lang.Boolean.TRUE
      case "false" => java.lang.Boolean.FALSE
      case "null" => PNull
      case other => other
    }

    private def rewindAnd(t: Any, depth: Int): Any = {
      // re-enter structured parse for a token already consumed
      t match {
        case "<<" =>
          val m = Map.newBuilder[String, Any]
          var tk = token()
          while (tk != ">>") {
            val key = tk match {
              case PName(k) => k
              case other => throw new IllegalArgumentException(
                s"PDF dict key $other")
            }
            m += key -> valueFrom(token(), depth + 1)
            tk = token()
          }
          m.result()
        case "[" =>
          val out = Vector.newBuilder[Any]
          var tk = token()
          while (tk != "]") {
            out += valueFrom(tk, depth + 1)
            tk = token()
          }
          out.result()
        case _ => throw new IllegalStateException("unreachable")
      }
    }

    private def tryRef(n: java.lang.Long): Any = {
      val save = pos
      skipWs()
      if (pos < b.length && (b(pos).toChar.isDigit)) {
        val start = pos
        while (pos < b.length && b(pos).toChar.isDigit) pos += 1
        val gen = new String(b, start, pos - start, "US-ASCII")
        skipWs()
        if (pos < b.length && b(pos) == 'R' &&
            (pos + 1 >= b.length || isDelim(b(pos + 1)))) {
          pos += 1
          return PRef(n.toInt, gen.toInt)
        }
      }
      pos = save
      n
    }

    private def isDelim(c: Byte): Boolean =
      c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == 0 ||
        c == 12 || c == '/' || c == '(' || c == ')' || c == '<' ||
        c == '>' || c == '[' || c == ']' || c == '%'

    private def name(): PName = {
      pos += 1 // '/'
      val sb = new java.lang.StringBuilder(16)
      while (pos < b.length && !isDelim(b(pos))) {
        val c = b(pos).toChar
        if (c == '#' && pos + 2 < b.length) {
          sb.append(Integer.parseInt(
            new String(b, pos + 1, 2, "US-ASCII"), 16).toChar)
          pos += 3
        } else { sb.append(c); pos += 1 }
      }
      PName(sb.toString)
    }

    private def number(): Any = {
      val start = pos
      if (b(pos) == '+' || b(pos) == '-') pos += 1
      var dot = false
      while (pos < b.length &&
             (b(pos).toChar.isDigit || (b(pos) == '.' && !dot))) {
        if (b(pos) == '.') dot = true
        pos += 1
      }
      val s = new String(b, start, pos - start, "US-ASCII")
      if (dot) java.lang.Double.valueOf(s.toDouble)
      else java.lang.Long.valueOf(s.toLong)
    }

    private def keyword(): String = {
      val start = pos
      while (pos < b.length && !isDelim(b(pos))) pos += 1
      require(pos > start, s"PDF: unlexable byte ${b(start)} at $start")
      new String(b, start, pos - start, "US-ASCII")
    }

    /** Literal string: balanced parens, all escapes, raw bytes out. */
    private def literalString(): Array[Byte] = {
      pos += 1 // '('
      val out = new java.io.ByteArrayOutputStream(32)
      var depth = 1
      while (depth > 0) {
        require(pos < b.length, "PDF: unterminated literal string")
        val c = b(pos)
        c match {
          case '(' => depth += 1; out.write(c); pos += 1
          case ')' =>
            depth -= 1
            if (depth > 0) out.write(c)
            pos += 1
          case '\\' =>
            require(pos + 1 < b.length, "PDF: dangling string escape")
            val e = b(pos + 1).toChar
            pos += 2
            e match {
              case 'n' => out.write('\n')
              case 'r' => out.write('\r')
              case 't' => out.write('\t')
              case 'b' => out.write('\b')
              case 'f' => out.write(12)
              case '(' => out.write('(')
              case ')' => out.write(')')
              case '\\' => out.write('\\')
              case '\r' => // line continuation
                if (pos < b.length && b(pos) == '\n') pos += 1
              case '\n' => // line continuation
              case d if d >= '0' && d <= '7' =>
                var v = d - '0'
                var k = 0
                while (k < 2 && pos < b.length &&
                       b(pos) >= '0' && b(pos) <= '7') {
                  v = v * 8 + (b(pos) - '0'); pos += 1; k += 1
                }
                out.write(v & 0xFF)
              case other => out.write(other) // spec: ignore the backslash
            }
          case _ => out.write(c); pos += 1
        }
      }
      out.toByteArray
    }

    private def hexString(): Array[Byte] = {
      pos += 1 // '<'
      val out = new java.io.ByteArrayOutputStream(16)
      var hi = -1
      while (pos < b.length && b(pos) != '>') {
        val c = b(pos).toChar
        val d = Character.digit(c, 16)
        if (d >= 0) {
          if (hi < 0) hi = d
          else { out.write(hi * 16 + d); hi = -1 }
        } else require(c == ' ' || c == '\t' || c == '\r' || c == '\n',
          s"PDF: bad hex-string byte '$c'")
        pos += 1
      }
      require(pos < b.length, "PDF: unterminated hex string")
      pos += 1
      if (hi >= 0) out.write(hi * 16) // odd count: final 0 nibble
      out.toByteArray
    }
  }

  // ---------------------------------------------------------- encodings

  private[graft] object Encodings {

    /** WinAnsiEncoding ≈ windows-1252: C1 range gets the cp1252
      * specials (5 undefined slots → U+FFFD), the rest is latin-1. */
    val winAnsi: Array[Char] = {
      val t = Array.tabulate[Char](256)(_.toChar)
      val c1 = Map(
        0x80 -> 0x20AC, 0x82 -> 0x201A, 0x83 -> 0x0192, 0x84 -> 0x201E,
        0x85 -> 0x2026, 0x86 -> 0x2020, 0x87 -> 0x2021, 0x88 -> 0x02C6,
        0x89 -> 0x2030, 0x8A -> 0x0160, 0x8B -> 0x2039, 0x8C -> 0x0152,
        0x8E -> 0x017D, 0x91 -> 0x2018, 0x92 -> 0x2019, 0x93 -> 0x201C,
        0x94 -> 0x201D, 0x95 -> 0x2022, 0x96 -> 0x2013, 0x97 -> 0x2014,
        0x98 -> 0x02DC, 0x99 -> 0x2122, 0x9A -> 0x0161, 0x9B -> 0x203A,
        0x9C -> 0x0153, 0x9E -> 0x017E, 0x9F -> 0x0178)
      (0x80 to 0x9F).foreach(i => t(i) = c1.getOrElse(i, 0xFFFD).toChar)
      t
    }

    /** StandardEncoding per PDF 32000 Appendix D: ASCII with the two
      * quote exceptions, the Adobe high-half set, unmapped → U+FFFD. */
    val standard: Array[Char] = {
      val t = Array.fill[Char](256)('�')
      (0x20 to 0x7E).foreach(i => t(i) = i.toChar)
      t(0x27) = '’' // quoteright
      t(0x60) = '‘' // quoteleft
      val hi = Map(
        0xA1 -> 0x00A1, 0xA2 -> 0x00A2, 0xA3 -> 0x00A3, 0xA4 -> 0x2044,
        0xA5 -> 0x00A5, 0xA6 -> 0x0192, 0xA7 -> 0x00A7, 0xA8 -> 0x00A4,
        0xA9 -> 0x0027, 0xAA -> 0x201C, 0xAB -> 0x00AB, 0xAC -> 0x2039,
        0xAD -> 0x203A, 0xAE -> 0xFB01, 0xAF -> 0xFB02, 0xB1 -> 0x2013,
        0xB2 -> 0x2020, 0xB3 -> 0x2021, 0xB4 -> 0x00B7, 0xB6 -> 0x00B6,
        0xB7 -> 0x2022, 0xB8 -> 0x201A, 0xB9 -> 0x201E, 0xBA -> 0x201D,
        0xBB -> 0x00BB, 0xBC -> 0x2026, 0xBD -> 0x2030, 0xBF -> 0x00BF,
        0xC1 -> 0x0060, 0xC2 -> 0x00B4, 0xC3 -> 0x02C6, 0xC4 -> 0x02DC,
        0xC5 -> 0x00AF, 0xC6 -> 0x02D8, 0xC7 -> 0x02D9, 0xC8 -> 0x00A8,
        0xCA -> 0x02DA, 0xCB -> 0x00B8, 0xCD -> 0x02DD, 0xCE -> 0x02DB,
        0xCF -> 0x02C7, 0xD0 -> 0x2014, 0xE1 -> 0x00C6, 0xE3 -> 0x00AA,
        0xE8 -> 0x0141, 0xE9 -> 0x00D8, 0xEA -> 0x0152, 0xEB -> 0x00BA,
        0xF1 -> 0x00E6, 0xF5 -> 0x0131, 0xF8 -> 0x0142, 0xF9 -> 0x00F8,
        0xFA -> 0x0153, 0xFB -> 0x00DF)
      hi.foreach { case (k, v) => t(k) = v.toChar }
      t
    }

    /** Glyph-name → char map for /Differences: basic latin names,
      * the Latin-1 accented set (Adobe names), common punctuation. */
    val glyphs: Map[String, Char] = {
      val basicLetters =
        (('a' to 'z') ++ ('A' to 'Z')).map(c => c.toString -> c)
      val digits = Seq("zero", "one", "two", "three", "four", "five",
        "six", "seven", "eight", "nine").zipWithIndex
        .map { case (n, i) => n -> ('0' + i).toChar }
      val punct = Map(
        "space" -> ' ', "exclam" -> '!', "quotedbl" -> '"',
        "numbersign" -> '#', "dollar" -> '$', "percent" -> '%',
        "ampersand" -> '&', "quotesingle" -> '\'', "parenleft" -> '(',
        "parenright" -> ')', "asterisk" -> '*', "plus" -> '+',
        "comma" -> ',', "hyphen" -> '-', "period" -> '.', "slash" -> '/',
        "colon" -> ':', "semicolon" -> ';', "less" -> '<', "equal" -> '=',
        "greater" -> '>', "question" -> '?', "at" -> '@',
        "bracketleft" -> '[', "backslash" -> '\\', "bracketright" -> ']',
        "asciicircum" -> '^', "underscore" -> '_', "grave" -> '`',
        "braceleft" -> '{', "bar" -> '|', "braceright" -> '}',
        "asciitilde" -> '~',
        "quoteleft" -> '‘', "quoteright" -> '’',
        "quotedblleft" -> '“', "quotedblright" -> '”',
        "endash" -> '–', "emdash" -> '—',
        "ellipsis" -> '…', "bullet" -> '•',
        "dagger" -> '†', "daggerdbl" -> '‡',
        "Euro" -> '€', "trademark" -> '™',
        "copyright" -> '©', "registered" -> '®',
        "degree" -> '°', "plusminus" -> '±')
      val latin1 = Map(
        "exclamdown" -> 0xA1, "cent" -> 0xA2, "sterling" -> 0xA3,
        "currency" -> 0xA4, "yen" -> 0xA5, "brokenbar" -> 0xA6,
        "section" -> 0xA7, "dieresis" -> 0xA8, "ordfeminine" -> 0xAA,
        "guillemotleft" -> 0xAB, "logicalnot" -> 0xAC, "macron" -> 0xAF,
        "acute" -> 0xB4, "mu" -> 0xB5, "paragraph" -> 0xB6,
        "periodcentered" -> 0xB7, "cedilla" -> 0xB8,
        "ordmasculine" -> 0xBA, "guillemotright" -> 0xBB,
        "onequarter" -> 0xBC, "onehalf" -> 0xBD,
        "threequarters" -> 0xBE, "questiondown" -> 0xBF,
        "Agrave" -> 0xC0, "Aacute" -> 0xC1, "Acircumflex" -> 0xC2,
        "Atilde" -> 0xC3, "Adieresis" -> 0xC4, "Aring" -> 0xC5,
        "AE" -> 0xC6, "Ccedilla" -> 0xC7, "Egrave" -> 0xC8,
        "Eacute" -> 0xC9, "Ecircumflex" -> 0xCA, "Edieresis" -> 0xCB,
        "Igrave" -> 0xCC, "Iacute" -> 0xCD, "Icircumflex" -> 0xCE,
        "Idieresis" -> 0xCF, "Eth" -> 0xD0, "Ntilde" -> 0xD1,
        "Ograve" -> 0xD2, "Oacute" -> 0xD3, "Ocircumflex" -> 0xD4,
        "Otilde" -> 0xD5, "Odieresis" -> 0xD6, "multiply" -> 0xD7,
        "Oslash" -> 0xD8, "Ugrave" -> 0xD9, "Uacute" -> 0xDA,
        "Ucircumflex" -> 0xDB, "Udieresis" -> 0xDC, "Yacute" -> 0xDD,
        "Thorn" -> 0xDE, "germandbls" -> 0xDF,
        "agrave" -> 0xE0, "aacute" -> 0xE1, "acircumflex" -> 0xE2,
        "atilde" -> 0xE3, "adieresis" -> 0xE4, "aring" -> 0xE5,
        "ae" -> 0xE6, "ccedilla" -> 0xE7, "egrave" -> 0xE8,
        "eacute" -> 0xE9, "ecircumflex" -> 0xEA, "edieresis" -> 0xEB,
        "igrave" -> 0xEC, "iacute" -> 0xED, "icircumflex" -> 0xEE,
        "idieresis" -> 0xEF, "eth" -> 0xF0, "ntilde" -> 0xF1,
        "ograve" -> 0xF2, "oacute" -> 0xF3, "ocircumflex" -> 0xF4,
        "otilde" -> 0xF5, "odieresis" -> 0xF6, "divide" -> 0xF7,
        "oslash" -> 0xF8, "ugrave" -> 0xF9, "uacute" -> 0xFA,
        "ucircumflex" -> 0xFB, "udieresis" -> 0xFC, "yacute" -> 0xFD,
        "thorn" -> 0xFE, "ydieresis" -> 0xFF).map {
        case (k, v) => k -> v.toChar
      }
      (basicLetters ++ digits).toMap ++ punct ++ latin1
    }

    /** char → WinAnsi byte, for the fixture writer. */
    val winAnsiInverse: Map[Char, Int] =
      winAnsi.zipWithIndex.filter(_._1 != '�')
        .map { case (c, i) => c -> i }.toMap
  }

  // ------------------------------------------------------------ fixture

  private def escape(line: String): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream(line.length + 8)
    line.foreach { c =>
      val code = Encodings.winAnsiInverse.getOrElse(c,
        throw new IllegalArgumentException(
          s"fixture text char U+${c.toInt.toHexString} not WinAnsi-encodable"))
      if (c == '(' || c == ')' || c == '\\') { bo.write('\\'); bo.write(code) }
      else if (code < 0x20 || code > 0x7E) // 3-digit octal: a digit
        bo.write(("\\" + f"$code%03o").getBytes("US-ASCII")) // may follow
      else bo.write(code)
    }
    bo.toByteArray
  }

  private def content(lines: Seq[String]): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    bo.write("BT\n/F1 12 Tf\n72 720 Td\n".getBytes("US-ASCII"))
    lines.zipWithIndex.foreach { case (line, i) =>
      bo.write('(')
      bo.write(escape(line))
      bo.write(')')
      bo.write((if (i == 0) " Tj\n" else " '\n").getBytes("US-ASCII"))
    }
    // the first line used Tj; later shows move to new lines with '
    bo.write("ET\n".getBytes("US-ASCII"))
    bo.toByteArray
  }

  private def deflateBytes(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val bo = new java.io.ByteArrayOutputStream(raw.length)
    val buf = new Array[Byte](8192)
    while (!d.finished()) bo.write(buf, 0, d.deflate(buf))
    d.end()
    bo.toByteArray
  }

  /** Minimal-but-real PDF writer for specs/oracle fixtures: one
    * content stream per page (`Tf`/`Td`/`Tj` + `'` line shows),
    * WinAnsiEncoding Helvetica, classic xref with exact offsets,
    * `/Length` written as an INDIRECT ref on the first page (the
    * parser must resolve it), optional FlateDecode. */
  def fixture(pageLines: Seq[Seq[String]], flate: Boolean = true): Array[Byte] = {
    require(pageLines.nonEmpty, "fixture needs at least one page")
    val out = new java.io.ByteArrayOutputStream()
    val offsets = scala.collection.mutable.ArrayBuffer[Long]()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    def wb(x: Array[Byte]): Unit = out.write(x, 0, x.length)

    val n = pageLines.size
    // object numbering: 1 catalog, 2 pages, 3 font, then per page i:
    // (4+3i) page, (5+3i) content, (6+3i) content-length
    val total = 3 + 3 * n

    w("%PDF-1.4\n%\u00E2\u00E3\u00CF\u00D3\n") // binary-sniff comment
    def obj(num: Int)(body: => Unit): Unit = {
      offsets += out.size().toLong
      w(s"$num 0 obj\n"); body; w("endobj\n")
    }
    obj(1) { w("<< /Type /Catalog /Pages 2 0 R >>\n") }
    obj(2) {
      val kids = (0 until n).map(i => s"${4 + 3 * i} 0 R").mkString(" ")
      w(s"<< /Type /Pages /Kids [ $kids ] /Count $n >>\n")
    }
    obj(3) {
      w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
        "/Encoding /WinAnsiEncoding >>\n")
    }
    pageLines.zipWithIndex.foreach { case (lines, i) =>
      val pageNum = 4 + 3 * i
      val contNum = pageNum + 1
      val lenNum = pageNum + 2
      obj(pageNum) {
        w(s"<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] " +
          s"/Resources << /Font << /F1 3 0 R >> >> " +
          s"/Contents $contNum 0 R >>\n")
      }
      val raw = content(lines)
      val payload = if (!flate) raw else deflateBytes(raw)
      obj(contNum) {
        val filter = if (flate) " /Filter /FlateDecode" else ""
        w(s"<< /Length $lenNum 0 R$filter >>\nstream\n")
        wb(payload)
        w("\nendstream\n")
      }
      obj(lenNum) { w(s"${payload.length}\n") }
    }
    val xrefOff = out.size()
    w(s"xref\n0 ${total + 1}\n")
    w("0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${total + 1} /Root 1 0 R >>\n")
    w(s"startxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }

  /** PDF 1.5-layout fixture: the catalog / pages / font / page dicts
    * live inside a `/Type/ObjStm` object stream, the cross-reference
    * is a `/Type/XRef` STREAM whose binary rows are PNG-Up-predicted
    * (`/DecodeParms << /Predictor 12 /Columns 6 >>`) — the layout
    * modern PDF writers actually emit, exercising the type-2 entry,
    * object-stream and predictor paths end to end. */
  def fixture15(pageLines: Seq[Seq[String]]): Array[Byte] = {
    require(pageLines.nonEmpty, "fixture needs at least one page")
    val n = pageLines.size
    // numbering: 1 catalog, 2 pages, 3 font, 4..3+n page dicts (all
    // packed, type-2), S = 4+n the ObjStm, S+1..S+n content streams,
    // X = S+n+1 the xref stream
    val s0 = 4 + n
    val xn = s0 + n + 1

    // ---- the object stream payload
    val packed: Seq[(Int, String)] =
      Seq(1 -> "<< /Type /Catalog /Pages 2 0 R >>",
          2 -> (s"<< /Type /Pages /Kids [ " +
            (0 until n).map(i => s"${4 + i} 0 R").mkString(" ") +
            s" ] /Count $n >>"),
          3 -> ("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
            "/Encoding /WinAnsiEncoding >>")) ++
        (0 until n).map { i =>
          (4 + i) -> (s"<< /Type /Page /Parent 2 0 R " +
            s"/MediaBox [ 0 0 612 792 ] " +
            s"/Resources << /Font << /F1 3 0 R >> >> " +
            s"/Contents ${s0 + 1 + i} 0 R >>")
        }
    val bodies = packed.map(_._2 + "\n")
    val objOffsets = bodies.scanLeft(0)(_ + _.length).init
    val header = packed.zip(objOffsets)
      .map { case ((num, _), off) => s"$num $off" }.mkString(" ") + "\n"
    val stmRaw = (header + bodies.mkString).getBytes("ISO-8859-1")
    val stmPayload = deflateBytes(stmRaw)

    // ---- assemble the file
    val out = new java.io.ByteArrayOutputStream()
    def w(str: String): Unit = out.write(str.getBytes("ISO-8859-1"))
    val offsets = scala.collection.mutable.Map[Int, Long]()
    w("%PDF-1.5\n%\u00E2\u00E3\u00CF\u00D3\n")
    offsets(s0) = out.size().toLong
    w(s"$s0 0 obj\n<< /Type /ObjStm /N ${packed.size} " +
      s"/First ${header.length} /Length ${stmPayload.length} " +
      s"/Filter /FlateDecode >>\nstream\n")
    out.write(stmPayload, 0, stmPayload.length)
    w("\nendstream\nendobj\n")
    pageLines.zipWithIndex.foreach { case (lines, i) =>
      val num = s0 + 1 + i
      val payload = deflateBytes(content(lines))
      offsets(num) = out.size().toLong
      w(s"$num 0 obj\n<< /Length ${payload.length} " +
        s"/Filter /FlateDecode >>\nstream\n")
      out.write(payload, 0, payload.length)
      w("\nendstream\nendobj\n")
    }

    // ---- xref stream rows (W = [1 2 2]), PNG-Up predicted
    val xrefOff = out.size().toLong
    offsets(xn) = xrefOff
    def row(t: Int, f2: Long, f3: Int): Array[Byte] = Array(
      t.toByte, ((f2 >> 16) & 0xFF).toByte, ((f2 >> 8) & 0xFF).toByte,
      (f2 & 0xFF).toByte, ((f3 >> 8) & 0xFF).toByte, (f3 & 0xFF).toByte)
    val rows: Seq[Array[Byte]] =
      Seq(row(0, 0, 65535)) ++
        packed.zipWithIndex.map { case ((num, _), idx) =>
          require(num == idx + 1); row(2, s0, idx) } ++
        Seq(row(1, offsets(s0), 0)) ++
        (0 until n).map(i => row(1, offsets(s0 + 1 + i), 0)) ++
        Seq(row(1, xrefOff, 0))
    require(rows.size == xn + 1)
    // PNG Up filter (type 2): each row stores raw - rowAbove
    val predicted = new java.io.ByteArrayOutputStream()
    var prev = new Array[Byte](6)
    rows.foreach { r =>
      predicted.write(2)
      var i = 0
      while (i < 6) {
        predicted.write((r(i) - prev(i)) & 0xFF)
        i += 1
      }
      prev = r
    }
    val xrefPayload = deflateBytes(predicted.toByteArray)
    w(s"$xn 0 obj\n<< /Type /XRef /Size ${xn + 1} /W [ 1 3 2 ] " +
      s"/Root 1 0 R /Length ${xrefPayload.length} /Filter /FlateDecode " +
      s"/DecodeParms << /Predictor 12 /Columns 6 >> >>\nstream\n")
    out.write(xrefPayload, 0, xrefPayload.length)
    w("\nendstream\nendobj\n")
    w(s"startxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }
}
