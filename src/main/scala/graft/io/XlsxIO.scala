package graft.io

import java.io.{BufferedInputStream, BufferedOutputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** XLSX import/export on the pure JDK — an .xlsx file is a zip of
  * OOXML parts, so `java.util.zip` + StAX cover the whole format
  * without any library (reference: src/linkml_store/utils/format_utils
  * .py loads xlsx via pandas.read_excel and writes via to_excel).
  *
  * Scope mirrors the reference's tabular use: one sheet, first row =
  * header. WRITE is driver-side and row-capped (like the json-array
  * and yaml single-document exports — a workbook is one sequential
  * file; Excel itself caps sheets at 1,048,576 rows). READ parses the
  * sheet + sharedStrings with a streaming XML cursor, emits one JSON
  * object per row, and hands schema/type inference to
  * `spark.read.json` — numbers and booleans come back typed because
  * xlsx cells carry types (`t="s"` shared string, `t="b"` boolean,
  * numeric default).
  */
object XlsxIO {

  /** Excel's hard sheet limit minus the header row. */
  val MaxRows: Int = 1048575

  // ---------------------------------------------------------- write

  def write(df: DataFrame, path: String): Unit = write(df, path, MaxRows)

  def write(df: DataFrame, path: String, maxRows: Int): Unit = {
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"xlsx export exceeds $maxRows rows; use parquet/jsonl for large exports")
    val cols = df.columns
    val zos = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(localPath(path))))
    try {
      def part(name: String, body: String): Unit = {
        zos.putNextEntry(new ZipEntry(name))
        zos.write(body.getBytes("UTF-8"))
        zos.closeEntry()
      }
      part("[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
          |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
          |<Default Extension="xml" ContentType="application/xml"/>
          |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
          |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
          |</Types>""".stripMargin)
      part("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin)
      part("xl/workbook.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
          |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
          |</workbook>""".stripMargin)
      part("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
          |</Relationships>""".stripMargin)

      zos.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
      val w = new java.io.OutputStreamWriter(zos, "UTF-8")
      w.write("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      w.write("\n<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\"><sheetData>")
      w.write("<row r=\"1\">")
      cols.zipWithIndex.foreach { case (c, j) => w.write(strCell(ref(j, 1), c)) }
      w.write("</row>")
      rows.zipWithIndex.foreach { case (row, ri) =>
        val r = ri + 2
        w.write(s"""<row r="$r">""")
        cols.indices.foreach { j =>
          if (!row.isNullAt(j)) w.write(cell(ref(j, r), row.get(j)))
        }
        w.write("</row>")
      }
      w.write("</sheetData></worksheet>")
      w.flush()
      zos.closeEntry()
    } finally zos.close()
  }

  private def cell(ref: String, v: Any): String = v match {
    case b: Boolean => s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
    case n @ (_: Byte | _: Short | _: Int | _: Long | _: Float | _: Double) =>
      s"""<c r="$ref"><v>$n</v></c>"""
    case d: java.math.BigDecimal => s"""<c r="$ref"><v>${d.toPlainString}</v></c>"""
    case d: BigDecimal => s"""<c r="$ref"><v>${d.bigDecimal.toPlainString}</v></c>"""
    case b: Array[Byte] => strCell(ref, java.util.Base64.getEncoder.encodeToString(b))
    case r: Row => strCell(ref, YamlRender.renderRow(r)) // nested: render structurally
    case other => strCell(ref, other.toString)
  }

  private def strCell(ref: String, s: String): String =
    s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${xmlEscape(s)}</t></is></c>"""

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '&' => "&amp;"
      case '"' => "&quot;"
      case c if c == '\n' || c == '\t' => c.toString
      case '\r' => "&#13;" // char-ref survives the parser's line-end normalization
      case c if c < ' ' => "" // remaining control chars are not representable in XML 1.0
      case c => c.toString
    }

  /** 0-based column + 1-based row → "A1"-style ref. */
  private[io] def ref(col: Int, row: Int): String = {
    var c = col
    val sb = new StringBuilder
    while (c >= 0) {
      sb.insert(0, ('A' + c % 26).toChar)
      c = c / 26 - 1
    }
    sb.append(row).toString
  }

  /** "BC12" → 0-based column index 54. */
  private[io] def colOf(ref: String): Int = {
    var c = 0
    var j = 0
    while (j < ref.length && ref.charAt(j).isLetter) {
      c = c * 26 + (ref.charAt(j).toUpper - 'A' + 1)
      j += 1
    }
    c - 1
  }

  // ----------------------------------------------------------- read

  /** Driver-side parse (a workbook is one sequential zip — same
    * contract as the reference's pandas.read_excel), distributed
    * schema inference via spark.read.json.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val lines = readJsonLines(localPath(path))
    import spark.implicits._
    spark.read.json(spark.createDataset(lines))
  }

  /** Each data row as a JSON object keyed by the header row. */
  private[io] def readJsonLines(path: String): Seq[String] = {
    val zf = new ZipFile(path)
    try {
      val shared = Option(zf.getEntry("xl/sharedStrings.xml"))
        .map(e => parseSharedStrings(zf, e)).getOrElse(Array.empty[String])
      val sheetEntry = firstSheetEntry(zf, path)
      val rows = parseSheet(zf, sheetEntry, shared)
      if (rows.isEmpty) return Nil
      val header = rows.head.map { case (c, v) => c -> String.valueOf(v) }.toMap
      rows.tail.map { cells =>
        val sb = new StringBuilder("{")
        var first = true
        cells.foreach { case (c, v) =>
          header.get(c).foreach { name =>
            if (!first) sb.append(',')
            first = false
            jsonKV(name, v, sb)
          }
        }
        sb.append('}').toString
      }
    } finally zf.close()
  }

  private def jsonKV(k: String, v: Any, sb: StringBuilder): Unit = {
    jsonStr(k, sb)
    sb.append(':')
    v match {
      case b: Boolean => sb.append(b)
      case d: Double =>
        // integral doubles emit as JSON integers so integer columns
        // keep their type through inference — but NOT negative zero,
        // whose sign "0" would silently drop (-0.0 == 0L is true).
        // NaN/Infinity emit as the bare tokens Spark's JSON reader
        // accepts (allowNonNumericNumbers) — same contract as
        // YamlParse.jsonify.
        val negZero = d == 0.0 && java.lang.Double.doubleToRawLongBits(d) != 0L
        if (d.isNaN) sb.append("NaN")
        else if (d.isInfinite) sb.append(if (d > 0) "Infinity" else "-Infinity")
        else if (d == d.toLong && !negZero && math.abs(d) < 1e15) sb.append(d.toLong)
        else sb.append(d)
      case s => jsonStr(String.valueOf(s), sb)
    }
  }

  // JSON string escaping shared with the YAML/TOML read paths
  private def jsonStr(s: String, sb: StringBuilder): Unit =
    YamlParse.jsonString(s, sb)

  /** The FIRST sheet in workbook order: workbook.xml's first `<sheet>`
    * resolved through its r:id relationship — tab order and >9 sheets
    * both break a lexicographic part-name sort. Falls back to the
    * name-sorted part only when the workbook/rels parts are absent.
    */
  private def firstSheetEntry(zf: ZipFile, path: String): ZipEntry = {
    import scala.jdk.CollectionConverters._
    val viaWorkbook = for {
      wb <- Option(zf.getEntry("xl/workbook.xml"))
      relsEntry <- Option(zf.getEntry("xl/_rels/workbook.xml.rels"))
      firstRid <- {
        val r = xmlReader(zf, wb)
        try {
          var rid: Option[String] = None
          while (rid.isEmpty && r.hasNext) {
            if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet")
              rid = Option(r.getAttributeValue(
                "http://schemas.openxmlformats.org/officeDocument/2006/relationships", "id"))
                .orElse(Option(r.getAttributeValue(null, "id")))
          }
          rid
        } finally r.close()
      }
      target <- {
        val r = xmlReader(zf, relsEntry)
        try {
          var t: Option[String] = None
          while (t.isEmpty && r.hasNext) {
            if (r.next() == XMLStreamConstants.START_ELEMENT &&
                r.getLocalName == "Relationship" &&
                r.getAttributeValue(null, "Id") == firstRid)
              t = Option(r.getAttributeValue(null, "Target"))
          }
          t
        } finally r.close()
      }
      entry <- {
        val name =
          if (target.startsWith("/")) target.stripPrefix("/")
          else "xl/" + target
        Option(zf.getEntry(name))
      }
    } yield entry
    viaWorkbook.getOrElse {
      val sheets = zf.entries().asScala
        .filter(e => e.getName.startsWith("xl/worksheets/sheet") && e.getName.endsWith(".xml"))
        .toSeq.sortBy(_.getName)
      require(sheets.nonEmpty, s"xlsx: no worksheet part in $path")
      sheets.head
    }
  }

  private def xmlReader(zf: ZipFile, e: ZipEntry) = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.createXMLStreamReader(new BufferedInputStream(zf.getInputStream(e)))
  }

  /** sharedStrings.xml → string table (all `<t>` runs per `<si>`). */
  private def parseSharedStrings(zf: ZipFile, e: ZipEntry): Array[String] = {
    val r = xmlReader(zf, e)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var inT = false
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "si" => cur.clear()
              case "t" => inT = true
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS if inT => cur.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "t" => inT = false
              case "si" => out += cur.toString
              case _ =>
            }
          case _ =>
        }
      }
    } finally r.close()
    out.toArray
  }

  /** sheet XML → rows of (column-ref-letters, typed value). */
  private def parseSheet(zf: ZipFile, e: ZipEntry, shared: Array[String]): Seq[Seq[(String, Any)]] = {
    val r = xmlReader(zf, e)
    val rows = scala.collection.mutable.ArrayBuffer[Seq[(String, Any)]]()
    var row: scala.collection.mutable.ArrayBuffer[(String, Any)] = null
    var cellRef: String = null
    var cellType: String = null
    var text: StringBuilder = null
    var inText = false
    var seq = 0 // fallback column counter for cells without r=
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "row" =>
                row = scala.collection.mutable.ArrayBuffer[(String, Any)]()
                seq = 0
              case "c" =>
                val explicit = Option(r.getAttributeValue(null, "r"))
                  .map(_.takeWhile(_.isLetter)).filter(_.nonEmpty)
                cellRef = explicit.getOrElse(ref(seq, 1).dropRight(1))
                // resync the fallback counter to the explicit ref —
                // sparse rows skip columns, so a blind increment would
                // attribute later r-less cells to the wrong header
                seq = explicit.map(colOf(_) + 1).getOrElse(seq + 1)
                cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
                text = new StringBuilder
              case "v" | "t" => inText = true
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS if inText && text != null =>
            text.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "v" | "t" => inText = false
              case "c" if text != null =>
                val raw = text.toString
                val v: Any = cellType match {
                  case "s" => shared(raw.trim.toInt)
                  case "b" => raw.trim == "1"
                  case "inlineStr" | "str" => raw
                  case _ => // numeric (or date-styled numeric)
                    try raw.trim.toDouble catch { case _: NumberFormatException => raw }
                }
                if (raw.nonEmpty || cellType == "inlineStr" || cellType == "str")
                  row += ((cellRef, v))
                text = null
              case "row" =>
                if (row.nonEmpty) rows += row.toSeq
                row = null
              case _ =>
            }
          case _ =>
        }
      }
    } finally r.close()
    rows.toSeq
  }

  /** Strip a `file:` scheme so java.io can open driver-local paths. */
  private def localPath(path: String): String =
    if (path.startsWith("file://")) path.substring(7)
    else if (path.startsWith("file:")) path.substring(5)
    else path
}
