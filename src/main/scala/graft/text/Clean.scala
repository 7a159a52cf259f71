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

  /** Cross-document boilerplate removal (the RefinedWeb/C4 step that
    * [[c4Clean]]'s within-document rules cannot express): a line that
    * occurs in more than `minDocs` DISTINCT documents is boilerplate
    * (nav bars, footers, cookie banners) and is dropped from every
    * document.
    *
    * Scale shape: the line-frequency pass is one explode (per-document
    * DISTINCT lines, so a footer repeated inside one page counts once)
    * + one keyed partial-agg count — corpus-linear. The boilerplate
    * SET is bounded by contract (lines crossing a high document
    * threshold are few — `maxBoilerplate` enforces it loudly), so it
    * collects to the driver and ships back as a 60-bit-hash literal
    * array in a map-only filter — the eval-set-broadcast shape of
    * decontamination, never a corpus-to-corpus join. Returns
    * (idCol, n_lines, n_kept, clean_text).
    */
  def dropBoilerplate(df: DataFrame, idCol: String, textCol: String,
      sep: String = "\n", minDocs: Long = 100,
      maxBoilerplate: Int = 100000): DataFrame = {
    val sepRe = java.util.regex.Pattern.quote(sep)
    val lines = split(col(textCol), sepRe)
    graft.functions.GraftFunctions.register(df.sparkSession)
    val common = df
      .select(explode(array_distinct(transform(lines,
        l => TextFunctions.portableHash60(l)))).as("__h"))
      .groupBy("__h").agg(count(lit(1)).as("__n"))
      .filter(col("__n") > minDocs)
      .select("__h")
      .collect().map(_.getLong(0))
    require(common.length <= maxBoilerplate,
      s"boilerplate set ${common.length} exceeds $maxBoilerplate — threshold too low for this corpus")
    // membership is a binary search over the sorted hash set
    // ([[graft.functions.SortedLongContains]]): O(lines x log|set|)
    // per scan — at the 100k cap that is ~17 comparisons per line
    // where the previous `array_contains` literal scan cost O(100k)
    val commonArr = typedLit(common.sorted.toSeq)
    val kept = filter(lines,
      l => !call_function("graft_sorted_contains",
        TextFunctions.portableHash60(l), commonArr))
    df.select(col(idCol),
      size(lines).as("n_lines"),
      size(kept).as("n_kept"),
      array_join(kept, sep).as("clean_text"))
  }

  /** DuckDB twin of [[dropBoilerplate]] — same per-document-distinct
    * count and threshold, re-assembly via an explode + anti-join +
    * positional re-group. The membership test runs on the SAME 60-bit
    * line hash the Spark side filters on (every hashed operator keeps
    * both engines on the hash, so equality is by construction, not up
    * to hash collisions).
    */
  def dropBoilerplateDuckSql(table: String, idCol: String, textCol: String,
      sep: String = "\n", minDocs: Long = 100): String = {
    def esc(s: String) = s.replace("'", "''")
    val s = esc(sep)
    val h = "CAST(concat('0x', substr(md5(line), 1, 15)) AS UBIGINT)"
    s"""WITH lined AS (
       |  SELECT $idCol, string_split($textCol, '$s') AS lines FROM $table),
       |common AS (
       |  SELECT lh FROM (
       |    SELECT $idCol, unnest(list_distinct(list_transform(lines,
       |      line -> $h))) AS lh FROM lined) t
       |  GROUP BY lh HAVING count(*) > $minDocs),
       |pos AS (
       |  SELECT $idCol, lines[i] AS line, i FROM lined,
       |       unnest(range(1, len(lines) + 1)) AS u(i)),
       |kept AS (
       |  SELECT p.$idCol, p.line, p.i FROM pos p
       |  WHERE $h NOT IN (SELECT lh FROM common))
       |SELECT l.$idCol,
       |  CAST(len(l.lines) AS INT) AS n_lines,
       |  CAST(coalesce(k.nk, 0) AS INT) AS n_kept,
       |  coalesce(k.txt, '') AS clean_text
       |FROM lined l LEFT JOIN (
       |  SELECT $idCol, count(*) AS nk,
       |         string_agg(line, '$s' ORDER BY i) AS txt
       |  FROM kept GROUP BY $idCol) k USING ($idCol)""".stripMargin
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
