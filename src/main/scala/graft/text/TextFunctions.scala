package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for large-scale training-data pipelines:
  * tokenization, quality ratios, language-ID heuristics, fingerprints.
  *
  * Everything here is a pure Catalyst expression built from Column
  * combinators (codegen'd, no UDFs, no SQL-string interpolation — safe
  * for computed/backticked input columns), and every hash is md5-derived
  * so the same computation is expressible in DuckDB for the correctness
  * oracle ([[portableHash60]] ==
  * `CAST(concat('0x', substr(md5(s),1,15)) AS UBIGINT)`).
  */
object TextFunctions {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish word/number/punctuation chunks via regex (lowercased). */
  def regexTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))

  /** Deterministic 60-bit hash from md5 (portable to DuckDB). */
  def portableHash60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** English-ish stopwords used by quality + langid heuristics. */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  private def stopwordArray: Column = array(stopwords.map(lit): _*)

  /** Fraction of tokens that are stopwords (0 when empty). */
  def stopwordRatio(toks: Column): Column =
    when(size(toks) === 0, lit(0.0)).otherwise(
      size(filter(toks, x => array_contains(stopwordArray, x))).cast("double") /
        size(toks).cast("double"))

  def stopwordRatioDuck(toksSql: String): String = {
    val arr = stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
    s"CASE WHEN len($toksSql) = 0 THEN 0 ELSE len(list_filter($toksSql, x -> list_contains($arr, x))) / CAST(len($toksSql) AS DOUBLE) END"
  }

  /** Mean token length (0 when empty). */
  def meanTokenLen(toks: Column): Column =
    when(size(toks) === 0, lit(0.0)).otherwise(
      aggregate(toks, lit(0L), (acc, x) => acc + length(x)).cast("double") /
        size(toks).cast("double"))

  /** Ratio of non-alphanumeric, non-space chars to all chars. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      length(regexp_replace(text, "[a-z0-9 ]", "")).cast("double") /
        length(text).cast("double"))

  def digitRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      (length(text) - length(regexp_replace(text, "[0-9]", ""))).cast("double") /
        length(text).cast("double"))

  /** Order-insensitive content fingerprint: md5 of the sorted distinct
    * token set. Detects bag-of-words duplicates regardless of word order.
    */
  def tokenSetFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  def tokenSetFingerprintDuck(textSql: String): String =
    s"md5(array_to_string(list_sort(list_distinct(string_split($textSql, ' '))), ' '))"

  /** Token w-gram shingles (distinct). Basis for MinHash / Jaccard. */
  def shingles(text: Column, w: Int = 3): Column = {
    val t = tokens(text)
    when(size(t) < w, array().cast("array<string>")).otherwise(
      array_distinct(transform(
        sequence(lit(0), size(t) - w),
        i => concat_ws(" ", slice(t, i + lit(1), lit(w))))))
  }

  /** DuckDB equivalent of [[shingles]] (1-based, end-exclusive range:
    * shingle count = len - w + 1).
    */
  def shinglesDuck(textSql: String, w: Int = 3): String = {
    val t = s"string_split($textSql, ' ')"
    s"list_distinct(list_transform(range(1, greatest(len($t) - ${w - 2}, 1)), i -> array_to_string($t[i:i+${w - 1}], ' ')))"
  }
}
