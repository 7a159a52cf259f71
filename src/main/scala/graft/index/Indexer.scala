package graft.index

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Object→text conversion for indexing — the engine analog of the
  * reference Indexer's `object_to_text` (reference:
  * src/linkml_store/index/indexer.py:81-156: index_attributes select
  * which slots are indexed; exactly one attribute and no template →
  * the raw value; several attributes → a joined rendering with nulls
  * filtered; an optional text template renders the object instead).
  *
  * Spark adaptation: the conversion is a pure Column expression over
  * the collection's rows — one projection fused into the trigram
  * index scan, no per-object driver loop.
  *
  *  - single attribute, no template → `CAST(attr AS STRING)` (the
  *    reference's `str(obj[attr])`).
  *  - several attributes, no template → `"a: va; b: vb"` with
  *    null-valued attributes dropped (the reference's filter_nulls
  *    over the selected slots; the rendering is deterministic and
  *    engine-portable rather than Python's dict repr).
  *  - template → f-string-style `{attr}` substitution (the reference's
  *    TemplateSyntaxEnum.fstring; Jinja2 control flow is out of scope).
  *    Null attributes render as "None", as Python's format would.
  */
object Indexer {

  private val Placeholder = "\\{([A-Za-z_][A-Za-z0-9_]*)\\}".r

  /** The text rendered for each row; see object semantics above. */
  def objectText(attrs: Seq[String], template: Option[String] = None): Column =
    template match {
      case Some(t) => templateText(t)
      case None =>
        require(attrs.nonEmpty, "index_attributes must be non-empty")
        if (attrs.size == 1) col(attrs.head).cast("string")
        else concat_ws("; ",
          // concat null-propagates, concat_ws skips nulls → a null
          // attribute drops its whole "name: value" segment
          attrs.map(a => concat(lit(s"$a: "), col(a).cast("string"))): _*)
    }

  /** Duck SQL twin of [[objectText]] (no-template forms). */
  def objectTextDuckSql(attrs: Seq[String]): String =
    if (attrs.size == 1) s"CAST(${attrs.head} AS VARCHAR)"
    else attrs.map(a => s"'$a: ' || CAST($a AS VARCHAR)")
      .mkString("concat_ws('; ', ", ", ", ")")

  private def templateText(t: String): Column = {
    val parts = scala.collection.mutable.ArrayBuffer[Column]()
    var last = 0
    Placeholder.findAllMatchIn(t).foreach { m =>
      if (m.start > last) parts += lit(t.substring(last, m.start))
      parts += coalesce(col(m.group(1)).cast("string"), lit("None"))
      last = m.end
    }
    if (last < t.length) parts += lit(t.substring(last))
    if (parts.isEmpty) lit(t) else concat(parts.toSeq: _*)
  }
}
