package graft.io

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Block-style YAML rendering of rows — the writer half of the
  * reference's yaml/yamll formats (reference:
  * src/linkml_store/utils/format_utils.py:485-491: safe_dump with
  * insertion-order keys; yamll = one document per object with `---`
  * separators). Hand-rolled because the zero-egress container carries
  * no YAML library; the READ side stays out of scope (documented in
  * [[Formats]]).
  *
  * Conventions match PyYAML safe_dump closely enough for any YAML
  * parser: block maps/lists indented by 2, `null` for missing values,
  * plain scalars where unambiguous, single quotes (doubled-quote
  * escaping) for strings that could misparse, double-quoted
  * JSON-style escaping for strings with control characters, base64
  * for binary.
  */
object YamlRender {

  /** One row as a YAML mapping document (no leading `---`). */
  def renderRow(row: Row): String = {
    val sb = new StringBuilder
    renderMap(fieldsOf(row), 0, sb)
    sb.toString
  }

  /** A bounded collection of rows as ONE document: a block list of
    * mappings (reference yaml export shape).
    */
  def renderDoc(rows: Seq[Row]): String = {
    if (rows.isEmpty) return "[]\n"
    val sb = new StringBuilder
    rows.foreach { r =>
      sb.append("- ")
      renderInline(fieldsOf(r), 1, sb)
    }
    sb.toString
  }

  private def fieldsOf(row: Row): Seq[(String, Any)] = {
    val schema = row.schema
    schema.fields.toSeq.zipWithIndex.map { case (f, i) =>
      f.name -> (if (row.isNullAt(i)) null else row.get(i))
    }
  }

  private def pad(n: Int) = "  " * n

  // a key/value sequence at `indent`, each entry on its own line
  private def renderMap(entries: Seq[(String, Any)], indent: Int, sb: StringBuilder): Unit =
    entries.foreach { case (k, v) =>
      sb.append(pad(indent)).append(scalar(k)).append(":")
      renderValue(v, indent, sb)
    }

  // like renderMap but the FIRST entry continues the current line
  // (after "- "), the classic block-list-of-maps shape
  private def renderInline(entries: Seq[(String, Any)], indent: Int, sb: StringBuilder): Unit =
    entries.zipWithIndex.foreach { case ((k, v), i) =>
      if (i > 0) sb.append(pad(indent))
      sb.append(scalar(k)).append(":")
      renderValue(v, indent, sb)
    }

  private def renderValue(v: Any, indent: Int, sb: StringBuilder): Unit = v match {
    case null => sb.append(" null\n")
    case r: Row =>
      if (r.schema == null || r.schema.isEmpty) sb.append(" {}\n")
      else { sb.append("\n"); renderMap(fieldsOf(r), indent + 1, sb) }
    case m: scala.collection.Map[_, _] =>
      if (m.isEmpty) sb.append(" {}\n")
      else {
        sb.append("\n")
        m.toSeq.foreach { case (k, mv) =>
          sb.append(pad(indent + 1)).append(scalar(k)).append(":")
          renderValue(mv, indent + 1, sb)
        }
      }
    case s: scala.collection.Seq[_] =>
      if (s.isEmpty) sb.append(" []\n")
      else {
        sb.append("\n")
        s.foreach {
          case r: Row =>
            sb.append(pad(indent + 1)).append("- ")
            renderInline(fieldsOf(r), indent + 2, sb)
          case e =>
            sb.append(pad(indent + 1)).append("- ")
            renderValue2(e, indent + 1, sb)
        }
      }
    case other => sb.append(" ").append(scalar(other)).append("\n")
  }

  // list-element rendering: scalar continues the "- " line; nested
  // rows/maps/lists continue it in block form (every value kind a Spark
  // array element can hold renders structurally, never via toString)
  private def renderValue2(v: Any, indent: Int, sb: StringBuilder): Unit = v match {
    case null => sb.append("null\n")
    case r: Row =>
      if (r.schema == null || r.schema.isEmpty) sb.append("{}\n")
      else renderInline(fieldsOf(r), indent + 1, sb)
    case m: scala.collection.Map[_, _] =>
      if (m.isEmpty) sb.append("{}\n")
      else m.toSeq.zipWithIndex.foreach { case ((k, mv), i) =>
        if (i > 0) sb.append(pad(indent + 1))
        sb.append(scalar(k)).append(":")
        renderValue(mv, indent + 1, sb)
      }
    case s: scala.collection.Seq[_] =>
      if (s.isEmpty) sb.append("[]\n")
      else { // nested list: render each element on the next level
        sb.append("\n")
        s.foreach { e => sb.append(pad(indent + 1)).append("- "); renderValue2(e, indent + 1, sb) }
      }
    case other => sb.append(scalar(other)).append("\n")
  }

  private val Plain = "^[A-Za-z_][A-Za-z0-9_ .\\-]*$".r
  private val Ambiguous = Set("true", "false", "null", "yes", "no", "on", "off", "~")

  private[io] def scalar(v: Any): String = v match {
    case null => "null"
    case b: Boolean => b.toString
    case n @ (_: Byte | _: Short | _: Int | _: Long) => n.toString
    // YAML core-schema float specials (.nan/.inf) — a bare NaN would
    // read back as the STRING "NaN" and poison the column type
    case f: Float =>
      if (f.isNaN) ".nan"
      else if (f.isPosInfinity) ".inf"
      else if (f.isNegInfinity) "-.inf"
      else f.toString
    case d: Double =>
      if (d.isNaN) ".nan"
      else if (d.isPosInfinity) ".inf"
      else if (d.isNegInfinity) "-.inf"
      else d.toString
    case d: java.math.BigDecimal => d.toPlainString
    case d: BigDecimal => d.bigDecimal.toPlainString
    case b: Array[Byte] => quote(java.util.Base64.getEncoder.encodeToString(b))
    case t: java.sql.Timestamp => quote(t.toString)
    case t: java.time.Instant => quote(t.toString)
    case d: java.sql.Date => quote(d.toString)
    case d: java.time.LocalDate => quote(d.toString)
    case s: String =>
      if (s.exists(c => c < ' ')) jsonQuote(s) // control chars: double-quoted escapes
      else if (Plain.matches(s) && !Ambiguous(s.toLowerCase) && !s.endsWith(" ")) s
      else quote(s)
    case other => quote(other.toString)
  }

  private def quote(s: String): String = "'" + s.replace("'", "''") + "'"

  private def jsonQuote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
