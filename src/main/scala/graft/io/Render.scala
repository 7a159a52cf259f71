package graft.io

import org.apache.spark.sql.{DataFrame, Row}

/** Stdout renderings of a bounded result — the analog of the
  * reference's `render_output` (reference: src/linkml_store/utils/
  * format_utils.py:424-505: JSON / JSONL / YAML / MARKDOWN / TABLE /
  * CSV / TSV) backing the CLI's `--output-type`. Always row-capped by
  * the caller: rendering is a driver-side display concern, never a
  * data path (file exports go through [[Formats]]).
  */
object Render {

  val types: Seq[String] = Seq("tsv", "csv", "json", "jsonl", "yaml", "markdown", "table")

  /** Render up to `limit` rows of `df` as display lines. */
  def render(df: DataFrame, outputType: String, limit: Int): Seq[String] = {
    outputType match {
      case "json" =>
        val rows = df.limit(limit).toJSON.collect()
        if (rows.isEmpty) Seq("[]")
        else Seq("[") ++ rows.zipWithIndex.map { case (r, i) =>
          "  " + r + (if (i < rows.length - 1) "," else "")
        } ++ Seq("]")
      case "jsonl" => df.limit(limit).toJSON.collect().toSeq
      case "yaml" =>
        // list → safe_dump_all shape: one document per object
        df.limit(limit).collect().toSeq.flatMap(r =>
          ("---" +: YamlRender.renderRow(r).split("\n").toSeq).filter(_.nonEmpty))
      case "markdown" =>
        val rows = df.limit(limit).collect()
        rows.zipWithIndex.flatMap { case (r, i) =>
          val body = "## Object" +: "" +: df.columns.indices.map(j =>
            s" * ${df.columns(j)}: ${cell(r, j)}").toSeq
          if (i < rows.length - 1) body :+ "" else body
        }.toSeq
      case "table" => psqlTable(df, limit)
      case "tsv" => delimited(df, limit, "\t")
      case "csv" => delimited(df, limit, ",")
      case other =>
        throw new IllegalArgumentException(
          s"unknown output type '$other' (supported: ${types.mkString(", ")})")
    }
  }

  private def cell(r: Row, j: Int): String =
    if (r.isNullAt(j)) "null" else r.get(j).toString

  private def delimited(df: DataFrame, limit: Int, sep: String): Seq[String] = {
    // minimal quoting for BOTH csv and tsv (csv.DictWriter with
    // delimiter='\t' quote-wraps values containing the separator too —
    // an unquoted embedded tab would shift every later column)
    def esc(s: String): String =
      if (s.contains(sep) || s.contains("\"") || s.contains("\n"))
        "\"" + s.replace("\"", "\"\"") + "\""
      else s
    df.columns.mkString(sep) +:
      df.limit(limit).collect().toSeq.map(r =>
        df.columns.indices.map(j => esc(cell(r, j))).mkString(sep))
  }

  /** The reference TABLE type: tabulate's psql grid. */
  private def psqlTable(df: DataFrame, limit: Int): Seq[String] = {
    val header = df.columns.toSeq
    val rows = df.limit(limit).collect().toSeq.map(r =>
      header.indices.map(j => cell(r, j)))
    val widths = header.indices.map(j =>
      (header(j).length +: rows.map(_(j).length)).max)
    val rule = widths.map("-" * (_: Int)).mkString("+-", "-+-", "-+")
    // tabulate's psql header separator keeps the outer pipes
    val mid = "|" + rule.substring(1, rule.length - 1) + "|"
    def line(cells: Seq[String]) =
      cells.zip(widths).map { case (c, w) => c.padTo(w, ' ') }.mkString("| ", " | ", " |")
    rule +: line(header) +: mid +: rows.map(line) :+ rule
  }
}
