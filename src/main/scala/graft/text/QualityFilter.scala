package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gopher-style composite quality gate (cf. Rae et al. 2021 §A1.1 /
  * the C4 heuristics): length, mean token length, stopword presence,
  * punctuation and digit density — each rule a pure column predicate
  * over [[TextFunctions]] ratios, evaluated in ONE scan with no
  * shuffle. Emits per-rule flags (ints, for portable hashing) plus the
  * conjunction, so a pipeline can either filter (`passes = 1`) or audit
  * rule-level rejection rates with a follow-up facet.
  *
  * All ratios are exact-integer divisions evaluated identically in
  * Spark and DuckDB, so threshold comparisons are bit-reproducible
  * across engines.
  */
object QualityFilter {

  final case class Thresholds(
      minToks: Int = 20,
      maxToks: Int = 90,
      minMeanTokLen: Double = 3.0,
      maxMeanTokLen: Double = 10.0,
      minStopRatio: Double = 0.02,
      maxPunctRatio: Double = 0.25,
      maxDigitRatio: Double = 0.3)

  /** The gate as ONE boolean Column (for pipelines that filter rather
    * than audit) — same native-stats rules as [[flags]]'s `passes`.
    */
  def passes(text: org.apache.spark.sql.Column,
      t: Thresholds = Thresholds()): org.apache.spark.sql.Column = {
    val qs = TextFunctions.qualityStats(text)
    (qs.nTokens >= t.minToks) && (qs.nTokens <= t.maxToks) &&
      (qs.meanTokLen >= t.minMeanTokLen) && (qs.meanTokLen <= t.maxMeanTokLen) &&
      (qs.stopRatio >= t.minStopRatio) &&
      (qs.punctRatio <= t.maxPunctRatio) && (qs.digitRatio <= t.maxDigitRatio)
  }

  // shared Duck SQL ratio fragments (single source for the flag-form
  // and predicate-form oracles — a threshold/regex tweak lands in both)
  private def meanLenDuck: String =
    "CASE WHEN len(toks) = 0 THEN 0 ELSE " +
      "list_sum(list_transform(toks, x -> length(x))) / CAST(len(toks) AS DOUBLE) END"
  private def punctDuck(textCol: String): String =
    s"CASE WHEN length($textCol) = 0 THEN 0 ELSE " +
      s"length(regexp_replace($textCol, '[a-z0-9 ]', '', 'g')) / CAST(length($textCol) AS DOUBLE) END"
  private def digitDuck(textCol: String): String =
    s"CASE WHEN length($textCol) = 0 THEN 0 ELSE " +
      s"(length($textCol) - length(regexp_replace($textCol, '[0-9]', '', 'g'))) / CAST(length($textCol) AS DOUBLE) END"

  /** DuckDB twin of [[passes]] as a WHERE-clause fragment; expects a
    * scope providing `$textCol` and `toks` (= string_split on space).
    */
  def passesDuckPred(textCol: String, t: Thresholds = Thresholds()): String =
    s"""len(toks) BETWEEN ${t.minToks} AND ${t.maxToks}
       |    AND (${meanLenDuck}) BETWEEN ${t.minMeanTokLen} AND ${t.maxMeanTokLen}
       |    AND ${TextFunctions.stopwordRatioDuck("toks")} >= ${t.minStopRatio}
       |    AND (${punctDuck(textCol)}) <= ${t.maxPunctRatio}
       |    AND (${digitDuck(textCol)}) <= ${t.maxDigitRatio}""".stripMargin

  /** (idCol, n_toks, len_ok, tok_len_ok, stop_ok, punct_ok, digit_ok,
    * passes) — flags as 0/1 ints.
    */
  def flags(df: DataFrame, idCol: String, textCol: String,
      t: Thresholds = Thresholds()): DataFrame = {
    // all five rules from ONE native byte scan (graft_text_stats);
    // ratios are bit-identical to the regex/lambda formulations the
    // oracle mirrors, so the threshold comparisons agree exactly
    val qs = TextFunctions.qualityStats(col(textCol))
    val nToks = qs.nTokens
    val lenOk = (nToks >= t.minToks) && (nToks <= t.maxToks)
    val meanLen = qs.meanTokLen
    val tokLenOk = (meanLen >= t.minMeanTokLen) && (meanLen <= t.maxMeanTokLen)
    val stopOk = qs.stopRatio >= t.minStopRatio
    val punctOk = qs.punctRatio <= t.maxPunctRatio
    val digitOk = qs.digitRatio <= t.maxDigitRatio
    df.select(col(idCol), nToks.as("n_toks"),
      lenOk.cast("int").as("len_ok"),
      tokLenOk.cast("int").as("tok_len_ok"),
      stopOk.cast("int").as("stop_ok"),
      punctOk.cast("int").as("punct_ok"),
      digitOk.cast("int").as("digit_ok"),
      (lenOk && tokLenOk && stopOk && punctOk && digitOk).cast("int").as("passes"))
  }

  /** DuckDB twin of [[flags]] (passes == [[passesDuckPred]] verbatim). */
  def flagsDuckSql(table: String, idCol: String, textCol: String,
      t: Thresholds = Thresholds()): String =
    s"""SELECT $idCol, CAST(len(toks) AS INT) AS n_toks,
       |  CAST(len(toks) BETWEEN ${t.minToks} AND ${t.maxToks} AS INT) AS len_ok,
       |  CAST((${meanLenDuck}) BETWEEN ${t.minMeanTokLen} AND ${t.maxMeanTokLen} AS INT) AS tok_len_ok,
       |  CAST(${TextFunctions.stopwordRatioDuck("toks")} >= ${t.minStopRatio} AS INT) AS stop_ok,
       |  CAST((${punctDuck(textCol)}) <= ${t.maxPunctRatio} AS INT) AS punct_ok,
       |  CAST((${digitDuck(textCol)}) <= ${t.maxDigitRatio} AS INT) AS digit_ok,
       |  CAST(${passesDuckPred(textCol, t)} AS INT) AS passes
       |FROM (SELECT $idCol, $textCol, string_split($textCol, ' ') AS toks FROM $table) t""".stripMargin
}
