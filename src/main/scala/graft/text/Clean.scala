package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style LINE-level corpus cleaning (Raffel et al. 2020 §2.2) — the
  * sub-document granularity the doc-level [[QualityFilter]] gate can't
  * express: each document's lines are kept or dropped independently
  * (terminal punctuation, minimum word count, banned substrings), and
  * the document is re-assembled from the survivors.
  *
  * Everything is a per-row higher-order-function chain (split →
  * `filter` lambda → `array_join`) inside whole-stage codegen: map-only,
  * no explode, no shuffle, no UDF — a 100 TB pass costs one scan. The
  * line separator is a parameter because real corpora use '\n' while
  * the oracle-facing tests use a printable separator (DuckDB E-string
  * escape rules make embedded newlines in oracle SQL fragile).
  */
object Clean {

  /** C4's banned-content markers (lowercased substring match). */
  val DefaultBanned: Seq[String] = Seq("lorem ipsum", "javascript", "{")

  private def lineOk(l: Column, minWords: Int, banned: Seq[String]): Column = {
    val terminal = substring(l, -1, 1).isin(".", "!", "?", "\"")
    val enoughWords = size(split(l, " ")) >= minWords
    val clean = banned.map(s => !contains(lower(l), lit(s))).reduce(_ && _)
    terminal && enoughWords && clean
  }

  /** (idCol, n_lines, n_kept, clean_text): per-document line audit plus
    * the re-assembled cleaned text ('' when nothing survives).
    */
  def c4Clean(df: DataFrame, idCol: String, textCol: String,
      sep: String = "\n", minWords: Int = 5,
      banned: Seq[String] = DefaultBanned): DataFrame = {
    val sepRe = java.util.regex.Pattern.quote(sep)
    val lines = split(col(textCol), sepRe)
    val kept = filter(lines, l => lineOk(l, minWords, banned))
    df.select(col(idCol),
      size(lines).as("n_lines"),
      size(kept).as("n_kept"),
      array_join(kept, sep).as("clean_text"))
  }

  /** DuckDB twin of [[c4Clean]] (literal-separator split, same lambda). */
  def c4CleanDuckSql(table: String, idCol: String, textCol: String,
      sep: String = "\n", minWords: Int = 5,
      banned: Seq[String] = DefaultBanned): String = {
    def esc(s: String) = s.replace("'", "''")
    val bannedPred = banned.map(s => s"NOT contains(lower(l), '${esc(s)}')").mkString(" AND ")
    val ok = s"l -> substring(l, -1, 1) IN ('.', '!', '?', '\"') " +
      s"AND len(string_split(l, ' ')) >= $minWords AND $bannedPred"
    s"""SELECT $idCol,
       |  CAST(len(lines) AS INT) AS n_lines,
       |  CAST(len(list_filter(lines, $ok)) AS INT) AS n_kept,
       |  coalesce(array_to_string(list_filter(lines, $ok), '${esc(sep)}'), '') AS clean_text
       |FROM (SELECT $idCol, string_split($textCol, '${esc(sep)}') AS lines FROM $table) t""".stripMargin
  }
}
