package graft.io

/** TOML parsing — the reference loads `.toml` files through
  * `tomllib.load` into one dict per file (reference: src/linkml_store/
  * utils/format_utils.py Format.TOML). Hand-rolled for the zero-egress
  * container; covers TOML 1.0's data surface:
  *
  *   - bare/quoted/dotted keys, `[table]`, `[[array-of-tables]]`
  *   - basic and literal strings, their multiline forms
  *   - integers (underscores, 0x/0o/0b), floats (inf/nan), booleans
  *   - arrays (multiline), inline tables
  *   - dates/datetimes kept as strings (Spark's JSON inference treats
  *     them as strings, same as the reference's dict-of-str path)
  *
  * The parse result converts to JSON and rides `spark.read.json`
  * schema inference, identical to the YAML read path.
  */
object TomlParse extends Serializable {

  /** Whole TOML document → compact JSON object. */
  def tomlToJson(text: String): String = {
    val root = parse(text)
    val sb = new StringBuilder
    YamlParse.jsonify(root, sb)
    sb.toString
  }

  private type Tbl = scala.collection.mutable.LinkedHashMap[String, Any]
  private def newTbl: Tbl = scala.collection.mutable.LinkedHashMap[String, Any]()

  def parse(text: String): scala.collection.Map[String, Any] = {
    val root = newTbl
    var current: Tbl = root
    // TOML 1.0 definition tracking (by object identity — paths repeat
    // legally across [[array-of-tables]] elements): a [t] header may
    // not target a table already defined by a header, created via
    // dotted keys, or standing in for an array of tables.
    val headerDefined = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[Tbl, java.lang.Boolean]())
    val dottedDefined = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[Tbl, java.lang.Boolean]())
    val arrayElem = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[Tbl, java.lang.Boolean]())
    val it = new Lines(text.split("\n", -1))
    while (it.hasNext) {
      val line = it.next().trim
      if (line.isEmpty || line.startsWith("#")) ()
      else if (line.startsWith("[[")) {
        val h = line.stripPrefix("[[")
        val end = h.indexOf("]]")
        require(end >= 0, s"toml: malformed table array header '$line'")
        current = appendTableArray(root, keyPath(h.substring(0, end)))
        arrayElem.add(current)
      } else if (line.startsWith("[")) {
        val h = line.stripPrefix("[")
        val end = h.indexOf("]")
        require(end >= 0, s"toml: malformed table header '$line'")
        val path = keyPath(h.substring(0, end))
        val tbl = descend(root, path, create = true)
        require(!headerDefined.contains(tbl),
          s"toml: duplicate table [${path.mkString(".")}]")
        require(!dottedDefined.contains(tbl),
          s"toml: table [${path.mkString(".")}] already defined via dotted keys")
        require(!arrayElem.contains(tbl),
          s"toml: [${path.mkString(".")}] conflicts with array of tables")
        headerDefined.add(tbl)
        current = tbl
      } else {
        val (path, rest) = splitKeyValue(line)
        val s = new Scanner(rest, it)
        val v = s.value()
        s.expectEnd()
        val owner = if (path.length == 1) current
                    else descend(current, path.dropRight(1), create = true,
                                 created = dottedDefined)
        require(!owner.contains(path.last), s"toml: duplicate key '${path.mkString(".")}'")
        owner(path.last) = v
      }
    }
    root
  }

  /** Line cursor that value parsing can pull continuations from
    * (multiline arrays/strings span physical lines).
    */
  private final class Lines(lines: Array[String]) {
    private var i = 0
    def hasNext: Boolean = i < lines.length
    def next(): String = { val l = lines(i); i += 1; l }
  }

  /** `a.b."c d"` → Seq(a, b, "c d"). */
  private def keyPath(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var j = 0
    val t = s.trim
    while (j < t.length) {
      while (j < t.length && (t.charAt(j) == ' ' || t.charAt(j) == '.')) j += 1
      if (j < t.length) {
        if (t.charAt(j) == '"' || t.charAt(j) == '\'') {
          val q = t.charAt(j)
          val end = t.indexOf(q, j + 1)
          require(end >= 0, s"toml: unterminated quoted key in '$s'")
          out += t.substring(j + 1, end)
          j = end + 1
        } else {
          var k = j
          while (k < t.length && t.charAt(k) != '.' && t.charAt(k) != ' ') k += 1
          out += t.substring(j, k)
          j = k
        }
      }
    }
    require(out.nonEmpty, s"toml: empty key in '$s'")
    out.toSeq
  }

  /** Split `key = value` at the first `=` outside quotes. */
  private def splitKeyValue(line: String): (Seq[String], String) = {
    var j = 0
    var inQ: Char = 0
    while (j < line.length && (inQ != 0 || line.charAt(j) != '=')) {
      val c = line.charAt(j)
      if (inQ == 0 && (c == '"' || c == '\'')) inQ = c
      else if (inQ != 0 && c == inQ) inQ = 0
      j += 1
    }
    require(j < line.length, s"toml: expected 'key = value', got '$line'")
    (keyPath(line.substring(0, j)), line.substring(j + 1).trim)
  }

  /** Walk (and optionally create) the table chain for `path`. Every
    * table stepped through is added to `created` when supplied — the
    * dotted-key branch uses it to mark tables as dotted-defined so a
    * later [t] header over them raises (TOML 1.0).
    */
  private def descend(from: Tbl, path: Seq[String], create: Boolean,
                      created: java.util.Set[Tbl] = null): Tbl =
    path.foldLeft(from) { (t, k) =>
      val next = t.get(k) match {
        case Some(child: Tbl @unchecked) if child.isInstanceOf[Tbl] => child
        case Some(arr: scala.collection.mutable.ArrayBuffer[_]) =>
          // [a.b] after [[a]]: descend into the LAST table of the array
          arr.last match {
            case t2: Tbl @unchecked => t2
            case _ => throw new IllegalArgumentException(s"toml: '$k' is not a table")
          }
        case Some(_) => throw new IllegalArgumentException(s"toml: '$k' is not a table")
        case None =>
          require(create, s"toml: missing table '$k'")
          val child = newTbl
          t(k) = child
          child
      }
      if (created ne null) created.add(next)
      next
    }

  private def appendTableArray(root: Tbl, path: Seq[String]): Tbl = {
    val parent = if (path.length == 1) root else descend(root, path.dropRight(1), create = true)
    val arr = parent.get(path.last) match {
      case Some(a: scala.collection.mutable.ArrayBuffer[Any] @unchecked) => a
      case Some(_) => throw new IllegalArgumentException(
        s"toml: '${path.last}' is not an array of tables")
      case None =>
        val a = scala.collection.mutable.ArrayBuffer[Any]()
        parent(path.last) = a
        a
    }
    val t = newTbl
    arr += t
    t
  }

  /** Value scanner over one logical line, pulling continuation lines
    * for multiline arrays and strings.
    */
  private final class Scanner(first: String, lines: Lines) {
    private val buf = new StringBuilder(first)
    private var p = 0

    private def more(): Boolean =
      if (lines.hasNext) { buf.append('\n').append(lines.next()); true } else false

    private def skipWs(pullLines: Boolean): Unit = {
      var go = true
      while (go) {
        while (p < buf.length && (buf.charAt(p) == ' ' || buf.charAt(p) == '\t' ||
               buf.charAt(p) == '\n')) p += 1
        if (p < buf.length && buf.charAt(p) == '#') {
          // comment: skip to end of physical line
          while (p < buf.length && buf.charAt(p) != '\n') p += 1
        } else if (p >= buf.length && pullLines) { if (!more()) go = false }
        else go = false
      }
    }

    def expectEnd(): Unit = {
      skipWs(pullLines = false)
      require(p >= buf.length, s"toml: trailing content '${buf.substring(p)}'")
    }

    def value(): Any = {
      skipWs(pullLines = true)
      require(p < buf.length, "toml: missing value")
      buf.charAt(p) match {
        case '[' => array()
        case '{' => inlineTable()
        case '"' => if (peek("\"\"\"")) multiline(basic = true) else basicString()
        case '\'' => if (peek("'''")) multiline(basic = false) else literalString()
        case _ => bare()
      }
    }

    private def peek(s: String): Boolean =
      p + s.length <= buf.length && buf.substring(p, p + s.length) == s

    private def array(): Any = {
      p += 1
      val out = scala.collection.mutable.ArrayBuffer[Any]()
      var closed = false
      while (!closed) {
        skipWs(pullLines = true)
        require(p < buf.length, "toml: unterminated array")
        buf.charAt(p) match {
          case ']' => closed = true; p += 1
          case ',' => p += 1
          case _ => out += value()
        }
      }
      out.toSeq
    }

    private def inlineTable(): Any = {
      p += 1
      val out = newTbl
      var closed = false
      while (!closed) {
        skipWs(pullLines = false)
        require(p < buf.length, "toml: unterminated inline table")
        buf.charAt(p) match {
          case '}' => closed = true; p += 1
          case ',' => p += 1
          case _ =>
            // key (bare or quoted) = value
            val start = p
            while (p < buf.length && buf.charAt(p) != '=') p += 1
            require(p < buf.length, "toml: inline table missing '='")
            val path = keyPath(buf.substring(start, p))
            p += 1
            val v = value()
            val owner = if (path.length == 1) out else descend(out, path.dropRight(1), create = true)
            owner(path.last) = v
        }
      }
      out
    }

    private def basicString(): String = {
      p += 1
      val sb = new StringBuilder
      var done = false
      while (!done) {
        require(p < buf.length, "toml: unterminated string")
        buf.charAt(p) match {
          case '"' => done = true; p += 1
          case '\\' => p = decodeEscape(buf, p, sb)
          case c => sb.append(c); p += 1
        }
      }
      sb.toString
    }

    private def literalString(): String = {
      p += 1
      val end = buf.indexOf("'", p)
      require(end >= 0, "toml: unterminated literal string")
      val s = buf.substring(p, end)
      p = end + 1
      s
    }

    private def multiline(basic: Boolean): String = {
      val delim = if (basic) "\"\"\"" else "'''"
      p += 3
      // find the closing delimiter, pulling lines as needed
      var end = buf.indexOf(delim, p)
      while (end < 0) {
        require(more(), "toml: unterminated multiline string")
        end = buf.indexOf(delim, p)
      }
      var s = buf.substring(p, end)
      p = end + 3
      if (s.startsWith("\n")) s = s.substring(1) // leading newline trimmed per spec
      if (basic) {
        // line-ending backslash joins; then the SAME escape set as
        // single-line basic strings (one shared decoder — the two
        // string forms must not parse escapes differently)
        s = s.replaceAll("\\\\\n\\s*", "")
        val sb = new StringBuilder
        var j = 0
        while (j < s.length) {
          if (s.charAt(j) == '\\') j = decodeEscape(s, j, sb)
          else { sb.append(s.charAt(j)); j += 1 }
        }
        sb.toString
      } else s
    }

    /** Decode one escape sequence at `s.charAt(j) == '\\'`, appending
      * the decoded char(s) to `sb`; returns the index just past the
      * escape. Shared by basicString() and multiline(basic = true) so
      * both forms accept exactly the TOML 1.0 escape set and raise on
      * anything else.
      */
    private def decodeEscape(s: CharSequence, j: Int, sb: StringBuilder): Int = {
      require(j + 1 < s.length, "toml: dangling escape")
      s.charAt(j + 1) match {
        case 'n' => sb.append('\n'); j + 2
        case 't' => sb.append('\t'); j + 2
        case 'r' => sb.append('\r'); j + 2
        case '"' => sb.append('"'); j + 2
        case '\\' => sb.append('\\'); j + 2
        case 'f' => sb.append('\f'); j + 2
        case 'b' => sb.append('\b'); j + 2
        case 'u' =>
          require(j + 6 <= s.length, "toml: truncated \\u escape")
          sb.append(Integer.parseInt(s.subSequence(j + 2, j + 6).toString, 16).toChar); j + 6
        case 'U' =>
          require(j + 10 <= s.length, "toml: truncated \\U escape")
          sb.appendAll(Character.toChars(Integer.parseInt(s.subSequence(j + 2, j + 10).toString, 16)))
          j + 10
        case other => throw new IllegalArgumentException(s"toml: bad escape \\$other")
      }
    }

    private val DateLike =
      "^\\d{4}-\\d{2}-\\d{2}([Tt ].*)?$|^\\d{2}:\\d{2}:\\d{2}.*$".r

    private def bare(): Any = {
      val start = p
      while (p < buf.length && !",]}#\n".contains(buf.charAt(p))) p += 1
      val raw = buf.substring(start, p).trim
      require(raw.nonEmpty, "toml: empty value")
      raw match {
        case "true" => true
        case "false" => false
        case "inf" | "+inf" => Double.PositiveInfinity
        case "-inf" => Double.NegativeInfinity
        case "nan" | "+nan" | "-nan" => Double.NaN
        case DateLike(_) => raw // dates/datetimes stay strings
        case _ =>
          val n = raw.replace("_", "")
          if (n.matches("^[+-]?\\d+$")) n.toLong
          else if (n.matches("^0x[0-9a-fA-F]+$")) java.lang.Long.parseLong(n.substring(2), 16)
          else if (n.matches("^0o[0-7]+$")) java.lang.Long.parseLong(n.substring(2), 8)
          else if (n.matches("^0b[01]+$")) java.lang.Long.parseLong(n.substring(2), 2)
          else if (n.matches("^[+-]?(\\d+\\.\\d*|\\.\\d+|\\d+)([eE][+-]?\\d+)?$")) n.toDouble
          else throw new IllegalArgumentException(s"toml: unparseable value '$raw'")
      }
    }
  }
}
