package graft.io

/** Block-style YAML parsing — the reader half of the reference's
  * yaml/yamll formats (reference: src/linkml_store/utils/format_utils
  * .py:170-176: `yaml.safe_load` / `safe_load_all`). Hand-rolled
  * because the zero-egress container carries no YAML library; covers
  * the subset PyYAML safe_dump (and [[YamlRender]]) emit, which is
  * what round-trips through the reference:
  *
  *   - `---`-separated documents, full-line and trailing comments
  *   - block mappings and block lists at 2+-space indentation,
  *     including the inline `- key: value` list-of-maps shape and
  *     PyYAML's default indentless sequences
  *   - flow collections `[a, b]` / `{k: v}` (nested, one line)
  *   - single-quoted (doubled-quote escape) and double-quoted
  *     (JSON-style escapes) strings; plain scalars typed as
  *     null/bool/long/double/string exactly like PyYAML's resolver
  *   - scalar FOLDING: width-wrapped plain/quoted scalars continue
  *     across lines (n+1 breaks → n newlines; double-quoted `\`
  *     break join) — safe_dump wraps at width=80, so any dump with
  *     long text fields needs this
  *
  *   - block scalars: `|` literal and `>` folded with `-`/`+`
  *     chomping (hand-written configs use these constantly)
  *
  * NOT covered (documented divergence, none emitted by safe_dump for
  * tabular data): anchors/aliases/tags, multi-line flow collections,
  * explicit block-scalar indentation digits.
  *
  * Documents convert to compact JSON strings so ingestion rides
  * Spark's distributed JSON schema inference (`spark.read.json` over a
  * Dataset[String]) — the parser itself is a pure serializable
  * function, safe to call inside executors.
  */
object YamlParse extends Serializable {

  /** Every document in `text` (multi-doc: `---` separators) as compact
    * JSON. Empty documents are skipped.
    */
  def docsToJson(text: String): Seq[String] = {
    val docs = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    def flush(): Unit = {
      docToJson(cur.toString).foreach(docs += _)
      cur.clear()
    }
    text.split("\n", -1).foreach { line =>
      // document markers are only recognized at COLUMN 0 (YAML spec) —
      // an indented '---' is scalar content (block/multi-line scalars
      // legitimately contain marker-looking lines)
      val t = line.stripTrailing()
      if (t == "---" || t.startsWith("--- ")) {
        flush()
        if (t.length > 3) cur.append(t.substring(4)).append('\n')
      } else if (t == "...") flush()
      else cur.append(line).append('\n')
    }
    flush()
    docs.toSeq
  }

  /** One document body as parsed values (Map/List/String/Long/Double/
    * Boolean/null); None when the document holds no content. The
    * driver-side entry for config files — [[docToJson]] is this plus
    * JSON rendering.
    */
  def docToValue(text: String): Option[Any] = {
    val lines: Array[Line] = text.split("\n", -1).iterator
      .map { raw =>
        val indent = raw.takeWhile(_ == ' ').length
        Line(indent, raw.trim)
      }
      .toArray
    if (lines.forall(l => l.text.isEmpty || l.text.startsWith("#"))) None
    else {
      val p = new P(lines)
      val v = p.parseBlock(0)
      require(p.done, s"yaml: unparsed trailing content at '${p.peek}'")
      Some(v)
    }
  }

  /** One document body as compact JSON; None when the document holds
    * no content (blank / comments only).
    */
  def docToJson(text: String): Option[String] =
    // blank lines and comment lines are KEPT through tokenization —
    // blanks carry folding information inside multi-line scalars and
    // both can be CONTENT inside a block scalar; the structural loops
    // skip them instead
    docToValue(text).map { v =>
      val sb = new StringBuilder
      jsonify(v, sb)
      sb.toString
    }

  private final case class Line(indent: Int, text: String)

  /** Block-scalar headers: `|` / `>` with optional chomping. Explicit
    * indentation digits (rare, unemitted by PyYAML) are not accepted.
    */
  private val BlockHeader = "^[|>][+-]?$".r

  /** Recursive-descent over the indentation tree with a cursor. */
  private final class P(lines: Array[Line]) {
    private var i = 0

    /** Advance past blank and full-line-comment lines (ignorable in
      * structural positions; meaningful inside scalars, which consume
      * lines directly).
      */
    private def skipBlanks(): Unit =
      while (i < lines.length &&
             (lines(i).text.isEmpty || lines(i).text.startsWith("#"))) i += 1

    def done: Boolean = { skipBlanks(); i >= lines.length }
    def peek: String = if (done) "<eof>" else lines(i).text

    /** The block node whose lines sit at indent >= `min`. */
    def parseBlock(min: Int): Any = {
      skipBlanks()
      if (i >= lines.length || lines(i).indent < min) return null
      val l = lines(i)
      if (l.text == "-" || l.text.startsWith("- ")) parseList(l.indent)
      // a flow document ("{k: v}" / "[{k: v}]") must not key-split on a
      // ':' inside the braces — same guard as parseItem
      else if (l.text.startsWith("{") || l.text.startsWith("["))
        { i += 1; scalar(stripComment(l.text)) }
      else if (splitKey(l.text).isDefined) parseMap(l.indent, None)
      else { i += 1; scalar(stripComment(l.text)) } // top-level scalar document
    }

    private def parseList(indent: Int): Any = {
      val out = scala.collection.mutable.ArrayBuffer[Any]()
      skipBlanks()
      while (i < lines.length && lines(i).indent == indent &&
             (lines(i).text == "-" || lines(i).text.startsWith("- "))) {
        val l = lines(i)
        i += 1
        if (l.text == "-") out += parseBlock(indent + 1)
        else {
          val rest = l.text.substring(2).trim
          // column where the item's content begins — nested map keys
          // (`- k: v` continuation) align here; plain-scalar folding
          // only needs to clear the DASH column
          val col = l.indent + (l.text.length - rest.length)
          out += parseItem(rest, col, l.indent)
        }
        skipBlanks()
      }
      out.toSeq
    }

    /** An inline list-item body: scalar, flow, nested list, or the
      * first entry of a map whose siblings sit at column `col`.
      */
    private def parseItem(s: String, col: Int, foldCol: Int): Any = {
      if (s == "-" || s.startsWith("- ")) {
        // nested list written inline ("- - a") — re-parse as a list
        // whose items continue at this column
        val rest = if (s == "-") "" else s.substring(2).trim
        val out = scala.collection.mutable.ArrayBuffer[Any](
          if (rest.isEmpty) null else parseItem(rest, col + 2, col))
        skipBlanks()
        while (i < lines.length && lines(i).indent == col &&
               (lines(i).text == "-" || lines(i).text.startsWith("- "))) {
          val l = lines(i); i += 1
          if (l.text == "-") out += parseBlock(col + 1)
          else out += parseItem(l.text.substring(2).trim, l.indent + 2, l.indent)
          skipBlanks()
        }
        return out.toSeq
      }
      // a flow collection item ("- {k: v}" / "- [a, b]") must not be
      // key-split on a ':' INSIDE the braces — route to scalar/flow
      // first, exactly like parseMap does for flow values
      if (s.startsWith("{") || s.startsWith("["))
        return scalar(folded(stripComment(s), foldCol))
      splitKey(s) match {
        case Some((k, rest)) => parseMap(col, Some((k, rest)))
        case None =>
          val v = stripComment(s)
          if (BlockHeader.matches(v)) blockScalar(v, foldCol)
          else scalar(folded(v, foldCol))
      }
    }

    /** Block scalar (`|` literal / `>` folded, `-` strip / `+` keep
      * chomping): all following lines blank or deeper than `col`.
      * Leading spaces beyond the block's indentation are preserved
      * (reconstructed from each line's measured indent).
      */
    private def blockScalar(header: String, col: Int): String = {
      val literal = header.startsWith("|")
      val chomp = header.drop(1)
      val buf = scala.collection.mutable.ArrayBuffer[(Int, String)]()
      while (i < lines.length && (lines(i).text.isEmpty || lines(i).indent > col)) {
        buf += ((lines(i).indent, lines(i).text))
        i += 1
      }
      var end = buf.length
      while (end > 0 && buf(end - 1)._2.isEmpty) end -= 1
      val trailingBlanks = buf.length - end
      val content = buf.take(end)
      if (content.isEmpty) return if (chomp == "+") "\n" * trailingBlanks else ""
      val blockIndent = content.iterator.filter(_._2.nonEmpty).map(_._1).min
      val raws = content.map { case (ind, t) =>
        if (t.isEmpty) "" else " " * (ind - blockIndent) + t
      }
      val body =
        if (literal) raws.mkString("\n")
        else {
          // folded: adjacent lines -> space, blank runs -> newlines,
          // more-indented lines stay literal with hard breaks
          val sb = new StringBuilder
          var prev: Option[String] = None
          raws.foreach { ln =>
            prev match {
              case None => sb.append(ln)
              case Some(p) =>
                if (ln.isEmpty) sb.append('\n')
                else if (ln.startsWith(" ") || p.startsWith(" ")) sb.append('\n').append(ln)
                else if (p.isEmpty) sb.append(ln)
                else sb.append(' ').append(ln)
            }
            prev = Some(ln)
          }
          sb.toString
        }
      chomp match {
        case "-" => body
        case "+" => body + "\n" * (1 + trailingBlanks)
        case _ => body + "\n"
      }
    }

    /** PyYAML wraps scalars at width=80: a quoted scalar whose quote
      * does not close on its line, or a plain scalar followed by
      * deeper non-key/non-dash lines, continues across physical lines.
      * YAML folding joins the segments: n+1 line breaks → n newlines
      * (so adjacent lines fold to one space, one blank line to \n).
      * Returns the single logical scalar string; [[scalar]] then
      * handles quotes/escapes as usual.
      */
    private def folded(first: String, col: Int): String = {
      val isQuoted = first.startsWith("'") || first.startsWith("\"")
      if (isQuoted && !quoteClosed(first)) {
        val sb = new StringBuilder(first)
        var closed = false
        while (!closed) {
          require(i < lines.length, s"yaml: unterminated quoted scalar '$first'")
          var blanks = 0
          while (i < lines.length && lines(i).text.isEmpty) { blanks += 1; i += 1 }
          require(i < lines.length, s"yaml: unterminated quoted scalar '$first'")
          // double-quoted explicit join: an ODD run of trailing
          // backslashes escapes the break — no folded space
          val oddBackslash = first.startsWith("\"") && blanks == 0 && {
            var b = 0
            while (b < sb.length && sb.charAt(sb.length - 1 - b) == '\\') b += 1
            b % 2 == 1
          }
          if (oddBackslash) sb.deleteCharAt(sb.length - 1)
          else if (blanks == 0) sb.append(' ')
          else sb.append("\n" * blanks)
          sb.append(lines(i).text)
          i += 1
          closed = quoteClosed(sb.toString)
        }
        sb.toString
      } else if (!isQuoted) {
        // plain folding: deeper lines that are not themselves
        // structure; blank runs fold to newlines (n+1 breaks → n
        // newlines) exactly like the quoted branch
        val sb = new StringBuilder(first)
        var go = true
        while (go) {
          val mark = i
          var blanks = 0
          while (i < lines.length && lines(i).text.isEmpty) { blanks += 1; i += 1 }
          if (i < lines.length && lines(i).indent > col) {
            // trailing comments fold away per continuation line too
            val t = stripComment(lines(i).text)
            if (t.isEmpty || t == "-" || t.startsWith("- ") ||
                splitKey(lines(i).text).isDefined) { i = mark; go = false }
            else {
              if (blanks == 0) sb.append(' ') else sb.append("\n" * blanks)
              sb.append(t)
              i += 1
            }
          } else { i = mark; go = false }
        }
        sb.toString
      } else first
    }

    /** A block map at column `col`; `first` injects an entry parsed
      * from an inline `- key: value` head.
      */
    private def parseMap(col: Int, first: Option[(String, String)]): Any = {
      val out = scala.collection.mutable.LinkedHashMap[String, Any]()
      def entry(k: String, rest: String): Unit = out(k) = {
        val v = stripComment(rest)
        if (v.isEmpty) {
          skipBlanks()
          // PyYAML's DEFAULT block style is the indentless sequence —
          // dashes at the KEY's column still belong to this key (a
          // sibling key can never start with "- "), so a list value is
          // accepted at indent >= col while a map value needs > col
          if (i < lines.length && lines(i).indent >= col &&
              (lines(i).text == "-" || lines(i).text.startsWith("- ")))
            parseList(lines(i).indent)
          else parseBlock(col + 1)
        }
        else if (BlockHeader.matches(v)) blockScalar(v, col)
        else scalar(folded(v, col))
      }
      first.foreach { case (k, rest) => entry(k, rest) }
      skipBlanks()
      while (i < lines.length && lines(i).indent == col &&
             !(lines(i).text == "-" || lines(i).text.startsWith("- "))) {
        val l = lines(i)
        splitKey(l.text) match {
          case Some((k, rest)) => i += 1; entry(k, rest)
          case None =>
            throw new IllegalArgumentException(s"yaml: expected 'key: value', got '${l.text}'")
        }
        skipBlanks()
      }
      out
    }
  }

  /** "key: value" → (key, value-text); None when the line is not a map
    * entry. Quoted keys are unquoted; plain keys end at the first
    * ": " (or a trailing ":"), so colons inside the VALUE are safe.
    */
  private def splitKey(s: String): Option[(String, String)] = {
    if (s.startsWith("'") || s.startsWith("\"")) {
      val (k, after) = quoted(s)
      val t = s.substring(after).trim
      if (t.startsWith(":")) Some((k, t.substring(1).trim)) else None
    } else {
      val sep = s.indexOf(": ")
      if (sep >= 0) Some((s.substring(0, sep).trim, s.substring(sep + 2).trim))
      else if (s.endsWith(":")) Some((s.dropRight(1).trim, ""))
      else None
    }
  }

  /** Trailing ` #comment` on a plain scalar (quote-aware: called only
    * on text that is either fully quoted or fully plain).
    */
  private def stripComment(s: String): String =
    if (s.startsWith("'") || s.startsWith("\"")) s
    else {
      val h = s.indexOf(" #")
      (if (h >= 0) s.substring(0, h) else s).trim
    }

  /** Whether the leading quoted scalar in `s` terminates within `s`. */
  private def quoteClosed(s: String): Boolean =
    try { quoted(s); true } catch { case _: IllegalArgumentException => false }

  /** Leading quoted string in `s` → (value, chars consumed). */
  private def quoted(s: String): (String, Int) =
    if (s.startsWith("'")) {
      val sb = new StringBuilder
      var j = 1
      var done = false
      while (!done) {
        if (j >= s.length) throw new IllegalArgumentException(s"yaml: unterminated ' in '$s'")
        val c = s.charAt(j)
        if (c == '\'') {
          if (j + 1 < s.length && s.charAt(j + 1) == '\'') { sb.append('\''); j += 2 }
          else { done = true; j += 1 }
        } else { sb.append(c); j += 1 }
      }
      (sb.toString, j)
    } else {
      val sb = new StringBuilder
      var j = 1
      var done = false
      while (!done) {
        if (j >= s.length) throw new IllegalArgumentException(s"yaml: unterminated \" in '$s'")
        val c = s.charAt(j)
        if (c == '"') { done = true; j += 1 }
        else if (c == '\\') {
          if (j + 1 >= s.length) throw new IllegalArgumentException(s"yaml: dangling \\ in '$s'")
          s.charAt(j + 1) match {
            case 'n' => sb.append('\n'); j += 2
            case 't' => sb.append('\t'); j += 2
            case 'r' => sb.append('\r'); j += 2
            case '"' => sb.append('"'); j += 2
            case '\\' => sb.append('\\'); j += 2
            case '0' => sb.append('\u0000'); j += 2
            case 'u' =>
              require(j + 6 <= s.length, s"yaml: truncated \\u escape in '$s'")
              sb.append(Integer.parseInt(s.substring(j + 2, j + 6), 16).toChar); j += 6
            case other =>
              throw new IllegalArgumentException(s"yaml: unsupported escape \\$other")
          }
        } else { sb.append(c); j += 1 }
      }
      (sb.toString, j)
    }

  private val IntRe = "^[+-]?\\d+$".r
  private val FloatRe = "^[+-]?(\\d+\\.\\d*|\\.\\d+|\\d+)([eE][+-]?\\d+)?$".r

  /** One scalar token (or one-line flow collection) → typed value,
    * following PyYAML's core-schema resolver.
    */
  private[io] def scalar(s: String): Any = {
    if (s.isEmpty) return null
    if (s.startsWith("'") || s.startsWith("\"")) {
      val (v, used) = quoted(s)
      val rest = s.substring(used).trim
      if (rest.nonEmpty && !rest.startsWith("#"))
        throw new IllegalArgumentException(s"yaml: trailing content after quoted scalar: '$s'")
      return v
    }
    if (s.startsWith("[") || s.startsWith("{")) return flow(s)
    s match {
      case "null" | "Null" | "NULL" | "~" => null
      case "true" | "True" | "TRUE" => true
      case "false" | "False" | "FALSE" => false
      case IntRe() =>
        // PyYAML yields an arbitrary-precision int past Long range —
        // keep it numeric (jsonify emits BigInt digits unquoted, Spark
        // JSON inference picks decimal/double), never a string
        try s.toLong catch { case _: NumberFormatException => BigInt(s) }
      case FloatRe(_, _) => s.toDouble
      case ".inf" | ".Inf" => Double.PositiveInfinity
      case "-.inf" | "-.Inf" => Double.NegativeInfinity
      case ".nan" | ".NaN" => Double.NaN
      case _ => s
    }
  }

  /** One-line flow collection: `[a, {k: v}, [b]]`. */
  private def flow(s: String): Any = {
    val (v, used) = flowValue(s, 0)
    if (s.substring(used).trim.nonEmpty)
      throw new IllegalArgumentException(s"yaml: trailing content after flow: '$s'")
    v
  }

  private def flowValue(s: String, from: Int): (Any, Int) = {
    var j = from
    while (j < s.length && s.charAt(j) == ' ') j += 1
    s.charAt(j) match {
      case '[' =>
        j += 1
        val out = scala.collection.mutable.ArrayBuffer[Any]()
        var closed = false
        while (!closed) {
          while (j < s.length && (s.charAt(j) == ' ' || s.charAt(j) == ',')) j += 1
          if (j >= s.length) throw new IllegalArgumentException(s"yaml: unterminated [ in '$s'")
          if (s.charAt(j) == ']') { closed = true; j += 1 }
          else { val (v, n) = flowValue(s, j); out += v; j = n }
        }
        (out.toSeq, j)
      case '{' =>
        j += 1
        val out = scala.collection.mutable.LinkedHashMap[String, Any]()
        var closed = false
        while (!closed) {
          while (j < s.length && (s.charAt(j) == ' ' || s.charAt(j) == ',')) j += 1
          if (j >= s.length) throw new IllegalArgumentException(s"yaml: unterminated { in '$s'")
          if (s.charAt(j) == '}') { closed = true; j += 1 }
          else {
            val (k, n) = flowScalarOrQuoted(s, j)
            j = n
            while (j < s.length && s.charAt(j) == ' ') j += 1
            require(j < s.length && s.charAt(j) == ':', s"yaml: expected ':' in flow map '$s'")
            j += 1
            val (v, n2) = flowValue(s, j)
            out(String.valueOf(k)) = v
            j = n2
          }
        }
        (out, j)
      case _ => flowScalarOrQuoted(s, j)
    }
  }

  private def flowScalarOrQuoted(s: String, from: Int): (Any, Int) = {
    var j = from
    while (j < s.length && s.charAt(j) == ' ') j += 1
    if (j < s.length && (s.charAt(j) == '\'' || s.charAt(j) == '"')) {
      val (v, used) = quoted(s.substring(j))
      (v, j + used)
    } else {
      var k = j
      while (k < s.length && !",]}:".contains(s.charAt(k))) k += 1
      (scalar(s.substring(j, k).trim), k)
    }
  }

  /** Parsed value → compact JSON (shared with [[TomlParse]]). */
  private[io] def jsonify(v: Any, sb: StringBuilder): Unit = v match {
    case null => sb.append("null")
    case b: Boolean => sb.append(b)
    case n: Long => sb.append(n)
    case n: BigInt => sb.append(n) // >Long digits stay a JSON number
    case d: Double =>
      // bare NaN/Infinity literals: Spark's JSON reader accepts them
      // (allowNonNumericNumbers is on by default) and keeps the
      // column DOUBLE — quoting them would string-poison the column
      if (d.isNaN) sb.append("NaN")
      else if (d.isInfinite) sb.append(if (d > 0) "Infinity" else "-Infinity")
      else sb.append(d)
    case s: String => jsonString(s, sb)
    case m: scala.collection.Map[_, _] =>
      sb.append('{')
      var first = true
      m.foreach { case (k, mv) =>
        if (!first) sb.append(',')
        first = false
        jsonString(String.valueOf(k), sb)
        sb.append(':')
        jsonify(mv, sb)
      }
      sb.append('}')
    case xs: scala.collection.Seq[_] =>
      sb.append('[')
      var first = true
      xs.foreach { e =>
        if (!first) sb.append(',')
        first = false
        jsonify(e, sb)
      }
      sb.append(']')
    case other => jsonString(other.toString, sb)
  }

  private[io] def jsonString(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }
}
