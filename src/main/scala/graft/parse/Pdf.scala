package graft.parse

import scala.collection.mutable

/** Minimal pure-JVM PDF text+layout extraction — the engine-side
  * replacement for the reference's PyMuPDF `page.get_text("dict")`
  * step in its SwissInfo PDF preprocessing
  * (importer_scripts/preprocessing/swissinfo_extract_ocr_from_pdfs.py:300-312):
  * pages of blocks of lines of text spans, each with a bounding box,
  * in TOP-DOWN page coordinates.
  *
  * Deliberately bounded scope (this is an OCR-layer reader, not a PDF
  * renderer):
  *  - object streams are located by scanning `N G obj … endobj`
  *    markers (no xref table needed — works on appended/linearized
  *    files too);
  *  - `FlateDecode` (the overwhelmingly dominant filter — plain
  *    `java.util.zip`) and uncompressed content streams; other
  *    filters yield no text rather than an error;
  *  - text operators: BT/ET blocks, Tf, Td, TD, T-star, TL, Tm, and
  *    the Tj / quote / TJ show family, literal strings with escapes
  *    and hex strings — the positional-text subset an OCR layer uses;
  *  - glyph widths: spans advance by a fixed 0.5 × fontsize per char
  *    (real advance needs embedded font metrics — out of scope; the
  *    reference's own OCR boxes are scanner estimates too). Span
  *    boxes are therefore APPROXIMATE in width, exact in position
  *    and height.
  *
  * Page order follows the catalog's /Pages → /Kids walk when present,
  * else object appearance order. Page size from /MediaBox (inherited
  * from the parent /Pages node when absent; LETTER default).
  */
object Pdf {

  case class Span(text: String, bbox: Seq[Double])
  case class Line(spans: Seq[Span]) {
    def bbox: Seq[Double] = agg(spans.map(_.bbox))
  }
  case class Block(lines: Seq[Line]) {
    def bbox: Seq[Double] = agg(lines.map(_.bbox))
  }
  case class Page(width: Double, height: Double, blocks: Seq[Block])

  private[parse] def agg(boxes: Seq[Seq[Double]]): Seq[Double] =
    Seq(boxes.map(_(0)).min, boxes.map(_(1)).min,
      boxes.map(_(2)).max, boxes.map(_(3)).max)

  private case class Obj(num: Int, dict: String, stream: Option[Array[Byte]])

  /** Latin-1 view: byte-faithful char indexing into the raw PDF. */
  private def s8(bytes: Array[Byte], from: Int, until: Int): String =
    new String(bytes, from, until - from, java.nio.charset.StandardCharsets.ISO_8859_1)

  private val ObjRe = """(?s)(\d+)\s+\d+\s+obj\b""".r
  private val RefRe = """(\d+)\s+0\s+R""".r

  // (?!\d) forbids a partial-number match: for an indirect length like
  // `/Length 100 0 R` the old lookahead rejected '100' but then matched
  // the prefix '10', silently mis-slicing the stream. A full-number
  // match that is followed by `0 R` is still rejected, so indirect
  // lengths fall through to the endstream-marker scan.
  private val LenRe = """/Length\s+(\d+)(?!\d)(?!\s*0\s+R)""".r

  private def parseObjects(bytes: Array[Byte]): Map[Int, Obj] = {
    val text = s8(bytes, 0, bytes.length)
    val out = mutable.Map.empty[Int, Obj]
    for (m <- ObjRe.findAllMatchIn(text);
         num <- m.group(1).toIntOption) {
      val bodyStart = m.end
      val end = text.indexOf("endobj", bodyStart)
      if (end >= 0) {
        val body = text.substring(bodyStart, end)
        // the stream KEYWORD, not the word inside a dict string: it
        // sits after the closing >> of the dict
        val dictEnd = body.indexOf(">>")
        val sIdx =
          if (dictEnd < 0) -1
          else body.indexOf("stream", dictEnd)
        if (sIdx >= 0) {
          val dict = body.substring(0, sIdx)
          // stream data starts after "stream" + EOL
          var ds = bodyStart + sIdx + "stream".length
          if (ds < bytes.length && bytes(ds) == '\r') ds += 1
          if (ds < bytes.length && bytes(ds) == '\n') ds += 1
          // slice by the dict's direct /Length when present (exact
          // even when the stream DATA contains "endstream"/"endobj");
          // fall back to the endstream marker for indirect lengths
          val de = LenRe.findFirstMatchIn(dict)
            .flatMap(_.group(1).toIntOption)
            .map(len => math.min(ds.toLong + len, bytes.length.toLong).toInt)
            .getOrElse(text.indexOf("endstream", ds) match {
              case -1 => end
              case i => i
            })
          out(num) = Obj(num, dict, Some(bytes.slice(ds, de)))
        } else out(num) = Obj(num, body, None)
      }
    }
    out.toMap
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(data.length * 4)
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) return out.toByteArray
        out.write(buf, 0, n)
      }
      out.toByteArray
    } catch {
      case _: java.util.zip.DataFormatException => Array.emptyByteArray
    } finally inf.end()
  }

  private def contentOf(o: Obj): Array[Byte] = o.stream match {
    case None => Array.emptyByteArray
    case Some(raw) =>
      if (o.dict.contains("/FlateDecode")) inflate(raw)
      else if (o.dict.contains("/Filter")) Array.emptyByteArray
      else raw
  }

  private def ref(objs: Map[Int, Obj], num: String): Option[Obj] =
    num.toIntOption.flatMap(objs.get)

  private def mediaBox(dict: String, objs: Map[Int, Obj],
      depth: Int = 0): Seq[Double] = {
    val MbRe = """/MediaBox\s*\[([^\]]*)\]""".r
    MbRe.findFirstMatchIn(dict).map(_.group(1).trim.split("\\s+").toSeq
      .flatMap(_.toDoubleOption)) match {
      case Some(b) if b.length == 4 => b
      case _ if depth < 16 => // bounded: a /Parent cycle must not recurse
        val ParentRe = """/Parent\s+(\d+)\s+0\s+R""".r
        ParentRe.findFirstMatchIn(dict)
          .flatMap(p => ref(objs, p.group(1)))
          .map(p => mediaBox(p.dict, objs, depth + 1))
          .getOrElse(Seq(0.0, 0.0, 612.0, 792.0))
      case _ => Seq(0.0, 0.0, 612.0, 792.0)
    }
  }

  /** Objects packed inside `/Type /ObjStm` object streams (the
    * modern-PDF layout for catalogs/page dicts; content streams are
    * forbidden inside one by the spec, so they stay regular objects):
    * the stream is `/N` pairs of `objNum offset` followed at `/First`
    * by the concatenated object bodies. Expanded objects never
    * override a regular object of the same number (regular wins —
    * incremental updates append regular objects). */
  private def expandObjStm(objs: Map[Int, Obj]): Map[Int, Obj] = {
    val packed = objs.values.filter(o =>
      o.dict.contains("/ObjStm") && o.stream.isDefined)
    if (packed.isEmpty) return objs
    val NRe = """/N\s+(\d+)""".r
    val FirstRe = """/First\s+(\d+)""".r
    val extra = mutable.Map.empty[Int, Obj]
    for (os <- packed) {
      val data = contentOf(os)
      val text = s8(data, 0, data.length)
      for (n <- NRe.findFirstMatchIn(os.dict).flatMap(_.group(1).toIntOption);
           first <- FirstRe.findFirstMatchIn(os.dict)
             .flatMap(_.group(1).toIntOption)
           if first <= text.length) {
        val header = text.substring(0, first).trim
          .split("\\s+").flatMap(_.toIntOption)
        val pairs = header.grouped(2).collect {
          case Array(num, off) => (num, off)
        }.toSeq.take(n)
        for (((num, off), idx) <- pairs.zipWithIndex) {
          val start = first + off
          val end =
            if (idx + 1 < pairs.length) first + pairs(idx + 1)._2
            else text.length
          if (start >= 0 && start <= end && end <= text.length)
            extra(num) = Obj(num, text.substring(start, end), None)
        }
      }
    }
    extra.toMap ++ objs // regular objects win on collision
  }

  /** All pages of the PDF, in document page order. */
  def extract(bytes: Array[Byte]): Seq[Page] = {
    val objs = expandObjStm(parseObjects(bytes))
    val pageObjs: Seq[Obj] = {
      // catalog → /Pages → recursive /Kids order when resolvable
      def kidsWalk(o: Obj, seen: Set[Int]): Seq[Obj] =
        if (seen.contains(o.num)) Nil // a /Kids cycle must not recurse
        else if (o.dict.contains("/Type") && o.dict.contains("/Page") &&
            !o.dict.contains("/Pages")) Seq(o)
        else {
          val KidsRe = """(?s)/Kids\s*\[([^\]]*)\]""".r
          KidsRe.findFirstMatchIn(o.dict).toSeq.flatMap(k =>
            RefRe.findAllMatchIn(k.group(1)).toSeq
              .flatMap(r => ref(objs, r.group(1)))
              .flatMap(kidsWalk(_, seen + o.num)))
        }
      val viaCatalog = objs.values.find(_.dict.contains("/Catalog")).toSeq
        .flatMap { cat =>
          val PagesRe = """/Pages\s+(\d+)\s+0\s+R""".r
          PagesRe.findFirstMatchIn(cat.dict).toSeq
            .flatMap(p => ref(objs, p.group(1)))
            .flatMap(kidsWalk(_, Set.empty))
        }
      if (viaCatalog.nonEmpty) viaCatalog
      else objs.values.toSeq.sortBy(_.num).filter(o =>
        o.dict.contains("/Type") && o.dict.contains("/Page") &&
          !o.dict.contains("/Pages"))
    }
    pageObjs.map { p =>
      val mb = mediaBox(p.dict, objs)
      val (w, h) = (mb(2) - mb(0), mb(3) - mb(1))
      val ContRe = """(?s)/Contents\s+(\d+)\s+0\s+R""".r
      val ContArrRe = """(?s)/Contents\s*\[([^\]]*)\]""".r
      val contents: Array[Byte] =
        ContArrRe.findFirstMatchIn(p.dict).map(a =>
          RefRe.findAllMatchIn(a.group(1)).toSeq
            .flatMap(r => ref(objs, r.group(1)))
            .map(contentOf).foldLeft(Array.emptyByteArray)(_ ++ _))
        .orElse(ContRe.findFirstMatchIn(p.dict)
          .flatMap(r => ref(objs, r.group(1))).map(contentOf))
        .getOrElse(Array.emptyByteArray)
      Page(w, h, runContent(contents, h))
    }
  }

  // ---- content-stream interpreter ----

  private sealed trait Tok
  private case class TNum(v: Double) extends Tok
  private case class TStr(v: String) extends Tok
  private case class TName(v: String) extends Tok
  private case class TOp(v: String) extends Tok
  private case object TArrOpen extends Tok
  private case object TArrClose extends Tok

  private def tokenize(data: Array[Byte]): Seq[Tok] = {
    val s = s8(data, 0, data.length)
    val out = mutable.ArrayBuffer.empty[Tok]
    var i = 0
    def isWs(c: Char) = c == ' ' || c == '\n' || c == '\r' || c == '\t' ||
      c == '\u0000' || c == '\f'
    while (i < s.length) {
      val c = s(i)
      if (isWs(c)) i += 1
      else if (c == '(') {
        val sb = new StringBuilder
        var depth = 1
        i += 1
        while (i < s.length && depth > 0) {
          s(i) match {
            case '\\' if i + 1 < s.length =>
              s(i + 1) match {
                case 'n' => sb += '\n'; i += 2
                case 'r' => sb += '\r'; i += 2
                case 't' => sb += '\t'; i += 2
                case 'b' => sb += '\b'; i += 2
                case 'f' => sb += '\f'; i += 2
                case '(' => sb += '('; i += 2
                case ')' => sb += ')'; i += 2
                case '\\' => sb += '\\'; i += 2
                case d if d >= '0' && d <= '7' =>
                  var j = i + 1
                  var v = 0
                  while (j < s.length && j < i + 4 && s(j) >= '0' && s(j) <= '7') {
                    v = v * 8 + (s(j) - '0'); j += 1
                  }
                  sb += v.toChar; i = j
                case '\n' => i += 2 // line continuation
                case o => sb += o; i += 2
              }
            case '(' => depth += 1; sb += '('; i += 1
            case ')' =>
              depth -= 1
              if (depth > 0) sb += ')'
              i += 1
            case o => sb += o; i += 1
          }
        }
        out += TStr(sb.toString)
      } else if (c == '<' && i + 1 < s.length && s(i + 1) != '<') {
        val end = s.indexOf('>', i)
        val hex = s.substring(i + 1, if (end < 0) s.length else end)
          .filterNot(isWs)
        val sb = new StringBuilder
        var j = 0
        while (j + 1 < hex.length + 1) {
          val pair = if (j + 1 < hex.length) hex.substring(j, j + 2)
            else hex.substring(j, j + 1) + "0"
          if (pair.forall(ch => Character.digit(ch, 16) >= 0))
            sb += Integer.parseInt(pair, 16).toChar
          j += 2
        }
        out += TStr(sb.toString)
        i = (if (end < 0) s.length else end) + 1
      } else if (c == '<' || c == '>') {
        i += 2 // dict delimiters << >> — not needed inside content
      } else if (c == '[') { out += TArrOpen; i += 1 }
      else if (c == ']') { out += TArrClose; i += 1 }
      else if (c == '/') {
        val j = math.max(i + 1, takeWhile(s, i + 1,
          ch => !isWs(ch) && !"()<>[]/".contains(ch)))
        out += TName(s.substring(i + 1, j)); i = j
      } else if (c == '-' || c == '+' || c == '.' || (c >= '0' && c <= '9')) {
        val j = takeWhile(s, i + 1,
          ch => ch == '.' || ch == '-' || (ch >= '0' && ch <= '9'))
        s.substring(i, j).toDoubleOption.foreach(v => out += TNum(v))
        i = j
      } else {
        val j = takeWhile(s, i + 1,
          ch => !isWs(ch) && !"()<>[]/".contains(ch) &&
            !(ch == '-' || ch == '+' || ch == '.'))
        out += TOp(s.substring(i, math.max(j, i + 1))); i = math.max(j, i + 1)
      }
    }
    out.toSeq
  }

  private def takeWhile(s: String, from: Int, p: Char => Boolean): Int = {
    var i = from
    while (i < s.length && p(s(i))) i += 1
    i
  }

  /** Approximate advance width of a shown string. */
  private def widthOf(text: String, fs: Double): Double =
    0.5 * fs * text.length

  private def runContent(data: Array[Byte], pageH: Double): Seq[Block] = {
    val toks = tokenize(data)
    val blocks = mutable.ArrayBuffer.empty[Block]
    var lines = mutable.ArrayBuffer.empty[Line]
    var spans = mutable.ArrayBuffer.empty[Span]
    var tfSize = 12.0
    var tmScale = 1.0
    def fs = tfSize * tmScale
    var tl = 0.0 // leading
    var x = 0.0; var y = 0.0 // text position (PDF bottom-up)
    var lx = 0.0; var ly = 0.0 // line start
    def flushLine(): Unit = {
      if (spans.nonEmpty) { lines += Line(spans.toSeq); spans = mutable.ArrayBuffer.empty }
    }
    def flushBlock(): Unit = {
      flushLine()
      if (lines.nonEmpty) { blocks += Block(lines.toSeq); lines = mutable.ArrayBuffer.empty }
    }
    def show(t: String): Unit = {
      if (t.nonEmpty) {
        val w = widthOf(t, fs)
        // bottom-up (x, y, x+w, y+fs) → top-down (x, H-y-fs, x+w, H-y)
        spans += Span(t, Seq(x, pageH - y - fs, x + w, pageH - y))
        x += w
      }
    }
    def newline(dx: Double, dy: Double): Unit = {
      flushLine()
      lx += dx; ly += dy; x = lx; y = ly
    }
    var i = 0
    while (i < toks.length) {
      toks(i) match {
        case TOp("BT") =>
          flushBlock(); x = 0; y = 0; lx = 0; ly = 0
        case TOp("ET") => flushBlock()
        case TOp("Tf") => // pattern: /Name size Tf — size is the prior num
          prevNums(toks, i, 1).foreach(ns => tfSize = ns(0))
        case TOp("TL") => prevNums(toks, i, 1).foreach(ns => tl = ns(0))
        case TOp("Td") => prevNums(toks, i, 2).foreach(ns => newline(ns(0), ns(1)))
        case TOp("TD") => prevNums(toks, i, 2).foreach { ns =>
          tl = -ns(1); newline(ns(0), ns(1))
        }
        case TOp("T*") => newline(0, -tl)
        case TOp("Tm") => prevNums(toks, i, 6).foreach { ns =>
          flushLine(); lx = ns(4); ly = ns(5); x = lx; y = ly
          // the effective size rides the matrix's vertical scale
          if (ns(3) != 0) tmScale = math.abs(ns(3))
        }
        case TOp("Tj") => prevStr(toks, i).foreach(show)
        case TOp("'") => newline(0, -tl); prevStr(toks, i).foreach(show)
        case TOp("\"") => newline(0, -tl); prevStr(toks, i).foreach(show)
        case TOp("TJ") =>
          // the preceding [ ... ] array: strings shown, numbers = kerning
          var j = i - 1
          while (j >= 0 && toks(j) != TArrOpen) j -= 1
          if (j >= 0) (j + 1 until i).foreach {
            case k => toks(k) match {
              case TStr(t) => show(t)
              case _ => ()
            }
          }
        case _ => ()
      }
      i += 1
    }
    flushBlock()
    blocks.toSeq
  }

  private def prevNums(toks: Seq[Tok], at: Int, n: Int): Option[Seq[Double]] = {
    val ns = toks.slice(math.max(0, at - n - 1), at).collect {
      case TNum(v) => v
    }
    if (ns.length >= n) Some(ns.takeRight(n)) else None
  }

  private def prevStr(toks: Seq[Tok], at: Int): Option[String] =
    toks.slice(math.max(0, at - 3), at).reverse.collectFirst {
      case TStr(v) => v
    }
}
