package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Gopher-style repetition signals (Rae et al. 2021, "Scaling Language
  * Models", Table A1) adapted to the whitespace-token corpus: duplicate
  * token fraction, duplicate n-gram character fractions, and the
  * top-2-gram character fraction. Reference analog: the quality-signal
  * family the linkml-store pipelines compute per document
  * (src/linkml_store/utils — quality scoring); these are the standard
  * repetition gates an LLM training pipeline adds on top.
  *
  * Every stat is a per-row higher-order-function expression over the
  * token array — the operator is MAP-ONLY (one scan, zero shuffle),
  * which is the shape that survives 100 TB: repetition of a document
  * never needs data from any other document. Costs are O(n log n) per
  * row (one array_sort for the run-length pass).
  *
  * Definitions (all in [0, 1], 0 for degenerate/empty docs):
  *  - dup_token_frac   = (n_tokens - n_distinct_tokens) / n_tokens —
  *    fraction of token occurrences beyond each token's first.
  *  - dup_{w}gram_frac = chars in w-gram occurrences beyond the first,
  *    over all w-gram chars (occurrence-weighted; overlap positions are
  *    not deduplicated, matching the cheap variant used in practice).
  *  - top_2gram_frac   = (count of the most frequent 2-gram x its char
  *    length) / doc char length. Ties resolve by char weight, then the
  *    sort order of the gram (deterministic in both engines).
  */
object Repetition {

  /** All four stats from the native one-pass kernel
    * ([[graft.functions.RepetitionStats]]): array
    * `[dup_token_frac, dup_2gram_frac, dup_3gram_frac, top_2gram_frac]`.
    * This is the corpus-path entry point; the HOF columns below are its
    * spec-asserted reference twins — interpreted lambdas re-evaluate
    * child subtrees per iteration, so they are super-quadratic per row
    * and must never run over a corpus.
    */
  def statsNative(text: Column): Column =
    call_function("graft_repetition_stats", text)

  /** [[statsNative]] pre-rounded to 4dp by exact integer half-up
    * arithmetic on the underlying count rationals
    * ([[graft.functions.RepetitionStats.intRound4]]) — the
    * oracle-comparison entry point: `round(double, 4)` is not
    * engine-portable when a ratio lands exactly on a decimal boundary
    * (best/len = 57/800 = 0.07125 → Spark 0.0713, DuckDB 0.0712),
    * while the integer formula mirrored in [[statsDuckSql]] rounds the
    * true rational identically everywhere.
    */
  def statsNative4(text: Column): Column =
    call_function("graft_repetition_stats4", text)

  /** Non-distinct token w-grams (space-joined), [] when n_tokens < w. */
  def ngrams(text: Column, w: Int): Column = {
    val t = TextFunctions.tokens(text)
    when(size(t) < w, array().cast("array<string>")).otherwise(
      transform(
        sequence(lit(0), size(t) - w),
        i => concat_ws(" ", slice(t, i + lit(1), lit(w)))))
  }

  /** DuckDB twin of [[ngrams]]. */
  def ngramsDuck(textSql: String, w: Int): String = {
    val t = s"string_split($textSql, ' ')"
    s"list_transform(range(1, greatest(len($t) - ${w - 2}, 1)), i -> array_to_string($t[i:i+${w - 1}], ' '))"
  }

  /** Fraction of token occurrences beyond each token's first. */
  def dupTokenFrac(text: Column): Column = {
    val t = TextFunctions.tokens(text)
    (size(t) - size(array_distinct(t))).cast("double") / size(t).cast("double")
  }

  def dupTokenFracDuck(textSql: String): String = {
    val t = s"string_split($textSql, ' ')"
    s"(len($t) - len(list_distinct($t))) / CAST(len($t) AS DOUBLE)"
  }

  /** Chars in repeated w-gram occurrences / all w-gram chars. */
  def dupNgramCharFrac(text: Column, w: Int): Column = {
    val g = ngrams(text, w)
    val total = aggregate(g, lit(0L), (acc, x) => acc + length(x))
    val uniq = aggregate(array_distinct(g), lit(0L), (acc, x) => acc + length(x))
    when(total === 0L, lit(0.0))
      .otherwise((total - uniq).cast("double") / total.cast("double"))
  }

  def dupNgramCharFracDuck(textSql: String, w: Int): String = {
    val g = ngramsDuck(textSql, w)
    val total = s"coalesce(list_sum(list_transform($g, x -> length(x))), 0)"
    val uniq = s"coalesce(list_sum(list_transform(list_distinct($g), x -> length(x))), 0)"
    s"CASE WHEN $total = 0 THEN 0.0 ELSE ($total - $uniq) / CAST($total AS DOUBLE) END"
  }

  /** Char weight (count x length) of the most frequent 2-gram, via a
    * run-length pass over the SORTED gram array: run boundaries are the
    * 0-based positions where the sorted array changes value; the best
    * run's (length x gram chars) is the numerator.
    */
  def top2gramCharFrac(text: Column): Column = {
    val s = array_sort(ngrams(text, 2))
    val m = size(s)
    // 0-based boundary positions (guard m<=1: sequence(1,0) would count DOWN)
    val bounds = when(m <= 1, array().cast("array<int>")).otherwise(
      filter(sequence(lit(1), m - 1),
        i => element_at(s, i + 1) =!= element_at(s, i)))
    val all = concat(array(lit(0)), bounds, array(m))
    val best = aggregate(
      sequence(lit(1), size(all) - 1), lit(0L),
      (acc, j) => greatest(acc,
        (element_at(all, j + 1) - element_at(all, j)).cast("long") *
          length(element_at(s, element_at(all, j) + 1))))
    when(m === 0 || length(text) === 0, lit(0.0))
      .otherwise(best.cast("double") / length(text).cast("double"))
  }

  /** DuckDB oracle for the full stat row — deliberately a DIFFERENT
    * formulation (unnest + GROUP BY gram counts instead of the per-row
    * sorted run-length pass), so a hash match checks the semantics, not
    * the shared shape. Docs with no w-grams fall out of the gram CTEs
    * and rejoin with 0 via LEFT JOIN + coalesce.
    */
  def statsDuckSql(table: String): String = {
    def gramCte(w: Int) =
      s"SELECT doc_id, unnest(${ngramsDuck("text", w)}) AS gram FROM d"
    def aggCte(src: String, withBest: Boolean) =
      s"""SELECT doc_id, sum(c * l) AS total, sum((c - 1) * l) AS dup${if (withBest) ", max(c * l) AS best" else ""}
         |  FROM (SELECT doc_id, count(*) AS c, length(gram) AS l
         |        FROM $src GROUP BY doc_id, gram) GROUP BY doc_id""".stripMargin
    // exact integer half-up 4dp of the rational p/q — the mirror of
    // RepetitionStats.intRound4 (round(double, 4) flips on decimal-
    // boundary ratios like 57/800 = 0.07125; integer rounding of the
    // true rational cannot)
    def r4(p: String, q: String) =
      s"CASE WHEN coalesce($q, 0) = 0 THEN 0.0 " +
        s"ELSE ((20000 * $p + $q) // (2 * $q)) / 10000.0 END"
    s"""WITH d AS MATERIALIZED (
       |  SELECT doc_id, text, string_split(text, ' ') AS toks FROM $table
       |),
       |g2 AS (${gramCte(2)}),
       |g3 AS (${gramCte(3)}),
       |s2 AS (${aggCte("g2", withBest = true)}),
       |s3 AS (${aggCte("g3", withBest = false)})
       |SELECT d.doc_id,
       |  ${r4("(len(toks) - len(list_distinct(toks)))", "len(toks)")} AS dup_token_frac,
       |  ${r4("coalesce(s2.dup, 0)", "coalesce(s2.total, 0)")} AS dup_2gram_frac,
       |  ${r4("coalesce(s3.dup, 0)", "coalesce(s3.total, 0)")} AS dup_3gram_frac,
       |  CASE WHEN len(toks) < 2 THEN 0.0
       |    ELSE ${r4("coalesce(s2.best, 0)", "length(d.text)")} END AS top_2gram_frac
       |FROM d LEFT JOIN s2 USING (doc_id) LEFT JOIN s3 USING (doc_id)""".stripMargin
  }
}
