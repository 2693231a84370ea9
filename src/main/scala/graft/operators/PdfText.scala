package graft.operators

import scala.collection.mutable.ArrayBuffer

/** Minimal real PDF text-layer extractor (S2,
  * `handlers/pdf_handler.py:25-73` — the reference loops
  * `pdfplumber.extract_text()` per page). JDK-only: object parsing by
  * scanning `N 0 obj … endobj`, FlateDecode via `java.util.zip`,
  * content-stream tokenization of BT…ET text blocks with Tj / TJ /
  * ' / " show operators and Td/TD/T* line moves.
  *
  * Scope: the text layer of standard simple-font PDFs (the kind
  * generators like reportlab/LaTeX emit). Composite-font CID hex
  * strings decode bytewise (documented limitation — the reference
  * routes glyph-soup output to OCR via the quality gate anyway, and
  * [[Extract.FormFeedExtractor]] remains the hermetic test stub). */
object PdfTextExtractor extends Extract.PageExtractor {

  private val ObjRe =
    """(?s)(\d+)\s+\d+\s+obj(.*?)endobj""".r
  private val StreamRe =
    """(?s)<<(.*?)>>\s*stream\r?\n(.*?)\r?\nendstream""".r
  private val PageTypeRe = """/Type\s*/Page(?![a-zA-Z])""".r
  private val ContentsRefRe = """/Contents\s+(\d+)\s+\d+\s+R""".r
  private val ContentsArrRe = """(?s)/Contents\s*\[(.*?)\]""".r
  private val RefRe = """(\d+)\s+\d+\s+R""".r
  private val RootRe = """/Root\s+(\d+)\s+\d+\s+R""".r
  private val CatalogRe = """/Type\s*/Catalog""".r

  /** F11 page-open probe (`text_utils.py:227-249`): the reference
    * validates a PDF by checking the 4-byte `%PDF` magic, OPENING the
    * document with pdfplumber, requiring a nonempty page list, and
    * touching page 1 — so a magic-valid but truncated/corrupt body is
    * invalid. Structural mirror over the same object parse the
    * extractor uses: the trailer's `/Root` must resolve to a
    * `/Catalog` object (pdfminer raises "No /Root object!" without
    * one — this is what end-truncation cuts), at least one complete
    * `/Type /Page` object must exist, and the first page's declared
    * `/Contents` refs must resolve to complete stream objects
    * (mid-file truncation leaves them dangling, the analog of the
    * first-page access raising). */
  def isStructurallyValid(bytes: Array[Byte]): Boolean = {
    if (bytes == null || bytes.length < 4) return false
    val doc = new String(bytes, "ISO-8859-1")
    if (!doc.startsWith("%PDF")) return false
    val objects = ObjRe.findAllMatchIn(doc)
      .map(m => m.group(1).toInt -> m.group(2)).toMap
    val rootOk = RootRe.findFirstMatchIn(doc).exists(m =>
      objects.get(m.group(1).toInt)
        .exists(b => CatalogRe.findFirstIn(b).isDefined))
    if (!rootOk) return false
    val pageBodies = ObjRe.findAllMatchIn(doc).map(_.group(2))
      .filter(b => PageTypeRe.findFirstIn(b).isDefined).toSeq
    if (pageBodies.isEmpty) return false
    val first = pageBodies.head
    val refs: Seq[Int] = ContentsArrRe.findFirstMatchIn(first) match {
      case Some(a) =>
        RefRe.findAllMatchIn(a.group(1)).map(_.group(1).toInt).toSeq
      case None =>
        ContentsRefRe.findFirstMatchIn(first)
          .map(_.group(1).toInt).toSeq
    }
    refs.forall(r => objects.get(r)
      .exists(b => StreamRe.findFirstMatchIn(b).isDefined))
  }

  def pages(bytes: Array[Byte]): Seq[String] = {
    if (bytes == null || bytes.length < 5) return Seq.empty
    // latin-1 preserves bytes 1:1, so regex over the string is safe
    val doc = new String(bytes, "ISO-8859-1")
    if (!doc.startsWith("%PDF")) return Seq.empty
    val objects = ObjRe.findAllMatchIn(doc)
      .map(m => m.group(1).toInt -> m.group(2)).toMap
    val streams: Map[Int, String] = objects.flatMap { case (n, body) =>
      StreamRe.findFirstMatchIn(body).map { sm =>
        val dict = sm.group(1)
        val raw = sm.group(2)
        n -> (if (dict.contains("/FlateDecode")) inflate(raw) else raw)
      }
    }
    // page objects in document order; their /Contents refs in order
    val pageBodies = ObjRe.findAllMatchIn(doc)
      .map(m => m.group(2))
      .filter(b => PageTypeRe.findFirstIn(b).isDefined)
      .toSeq
    pageBodies.map { body =>
      val refs: Seq[Int] =
        ContentsArrRe.findFirstMatchIn(body) match {
          case Some(a) =>
            RefRe.findAllMatchIn(a.group(1)).map(_.group(1).toInt).toSeq
          case None =>
            ContentsRefRe.findFirstMatchIn(body)
              .map(_.group(1).toInt).toSeq
        }
      refs.flatMap(streams.get).map(extractText).mkString("\n").trim
    }
  }

  private def inflate(raw: String): String = {
    try {
      val in = raw.getBytes("ISO-8859-1")
      val inf = new java.util.zip.Inflater()
      inf.setInput(in)
      val out = new java.io.ByteArrayOutputStream(in.length * 4)
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
      }
      inf.end()
      new String(out.toByteArray, "ISO-8859-1")
    } catch { case _: Exception => "" }
  }

  /** Walk a content stream: inside BT…ET, the Tj / quote operators
    * show the preceding string, TJ shows every string in the
    * preceding array, and Td, TD, T-star, and the quote operators
    * start a new output line. */
  private[operators] def extractText(content: String): String = {
    val out = new StringBuilder
    var i = 0
    var inText = false
    var lastString: String = null
    val arrayStrings = ArrayBuffer.empty[String]
    var inArray = false
    def newline(): Unit =
      if (out.nonEmpty && !out.endsWith("\n")) out.append('\n')
    def emit(s: String): Unit = out.append(s)
    while (i < content.length) {
      val c = content.charAt(i)
      c match {
        case '(' =>
          val (s, ni) = parseLiteral(content, i)
          lastString = s
          if (inArray) arrayStrings += s
          i = ni
        case '<' if i + 1 < content.length &&
            content.charAt(i + 1) != '<' =>
          val (s, ni) = parseHex(content, i)
          lastString = s
          if (inArray) arrayStrings += s
          i = ni
        case '<' => i += 2 // dict open <<
        case '[' => inArray = true; arrayStrings.clear(); i += 1
        case ']' => inArray = false; i += 1
        case '/' => // name token: skip (irrelevant to text extraction)
          i += 1
          while (i < content.length && !content.charAt(i).isWhitespace &&
            !"()<>[]/".contains(content.charAt(i))) i += 1
        case _ if c.isWhitespace => i += 1
        case _ =>
          // read an operator / number token
          val start = i
          while (i < content.length && !content.charAt(i).isWhitespace &&
            !"()<>[]/".contains(content.charAt(i))) i += 1
          if (i == start) i += 1
          val tok = content.substring(start, i)
          tok match {
            case "BT" => inText = true
            case "ET" => inText = false; newline()
            case "Tj" if inText && lastString != null => emit(lastString)
            case "TJ" if inText =>
              arrayStrings.foreach(emit)
              arrayStrings.clear()
            case "'" if inText && lastString != null =>
              newline(); emit(lastString)
            case "\"" if inText && lastString != null =>
              newline(); emit(lastString)
            case "Td" | "TD" | "T*" if inText => newline()
            case _ => ()
          }
      }
    }
    out.toString.trim
  }

  /** PDF literal string: balanced parens, backslash escapes
    * (\n \r \t \b \f \( \) \\ \ooo, line continuations). Returns
    * (decoded, indexAfterClosingParen). */
  private[operators] def parseLiteral(s: String, open: Int): (String, Int) = {
    val sb = new StringBuilder
    var depth = 1
    var i = open + 1
    while (i < s.length && depth > 0) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        val e = s.charAt(i + 1)
        e match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case '(' => sb.append('('); i += 2
          case ')' => sb.append(')'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case '\n' => i += 2 // line continuation
          case '\r' =>
            i += 2; if (i < s.length && s.charAt(i) == '\n') i += 1
          case d if d >= '0' && d <= '7' =>
            var j = i + 1
            var v = 0
            while (j < s.length && j < i + 4 &&
              s.charAt(j) >= '0' && s.charAt(j) <= '7') {
              v = v * 8 + (s.charAt(j) - '0'); j += 1
            }
            sb.append(v.toChar); i = j
          case other => sb.append(other); i += 2
        }
      } else {
        if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        if (depth > 0) sb.append(c)
        i += 1
      }
    }
    (sb.toString, i)
  }

  /** PDF hex string `<48656C6C6F>` → bytewise chars (simple fonts). */
  private[operators] def parseHex(s: String, open: Int): (String, Int) = {
    val end = s.indexOf('>', open + 1)
    if (end < 0) return ("", s.length)
    val hex = s.substring(open + 1, end).filterNot(_.isWhitespace)
    val padded = if (hex.length % 2 == 1) hex + "0" else hex
    val sb = new StringBuilder
    var i = 0
    while (i + 2 <= padded.length) {
      sb.append(Integer.parseInt(padded.substring(i, i + 2), 16).toChar)
      i += 2
    }
    (sb.toString, end + 1)
  }
}
