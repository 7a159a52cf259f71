package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact duplicated-SPAN detection — substring-granular dedup (the
  * public ExactSubstr idea: training corpora repeat passages inside
  * otherwise-distinct documents — boilerplate, licenses, quotes — and
  * document-level near-dup misses them). A span is reported when every
  * token in it is covered by some L-token shingle whose hash occurs in
  * MORE THAN ONE document.
  *
  * Spark shape (no suffix array, no pair join):
  *   1. per-position L-gram hashes ride the existing one-pass shingle
  *      kernel ([[graft.functions.MinHashSigs]] family) — one scan;
  *   2. cross-document grams = two-level aggregate on the gram hash
  *      (partial map-side combine; nothing pairwise);
  *   3. marked positions semi-join back (keyed shuffle, AQE-sized) and
  *      per-document runs merge with a lag window (interval overlap:
  *      a break only where the position gap exceeds L) — the window
  *      partitions by document, never globally.
  * Everything is corpus-linear; the only joins are keyed on the gram
  * hash, so skew is bounded by gram frequency, not document count.
  */
object SpanDedup {

  /** (idCol, span_start, span_end, n_span_toks) — maximal duplicated
    * spans per document, token-position inclusive bounds.
    */
  def duplicatedSpans(df: DataFrame, idCol: String, textCol: String,
                      minLen: Int = 8,
                      scope: graft.api.CacheScope = graft.api.CacheScope.global): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    // UNDEDUPED positional shingles: array index == token offset. The
    // deduped kernel (graft_hashed_shingles) must NOT be used here —
    // dedup collapses repeated shingles so positions stop being token
    // offsets, and Spark/DuckDB disagree on distinct ORDER.
    // Persisted: the gram stream feeds both the distinct-doc aggregate
    // and the position semi-join.
    val grams = scope.persist(df
      .select(col(idCol),
        expr(graft.text.TextFunctions.positionalShinglesSql(textCol, minLen)).as("__hs"))
      .select(col(idCol), posexplode(col("__hs")).as(Seq("p", "gh"))))
    val dupGh = grams.groupBy(col("gh"))
      .agg(countDistinct(col(idCol)).as("__nd"))
      .filter(col("__nd") > 1)
      .select(col("gh"))
    val marked = grams.join(dupGh, Seq("gh"), "left_semi")
    val w = Window.partitionBy(col(idCol)).orderBy(col("p"))
    val lagP = lag(col("p"), 1).over(w)
    // shingle at p covers [p, p+L-1]; two marked positions belong to
    // one span iff the later one starts before the earlier one ends+1
    val runs = marked
      .withColumn("__new", when(lagP.isNull || col("p") - lagP > minLen, 1).otherwise(0))
      .withColumn("__run", sum(col("__new")).over(w))
    runs.groupBy(col(idCol), col("__run"))
      .agg(min(col("p")).cast("int").as("span_start"),
        (max(col("p")) + (minLen - 1)).cast("int").as("span_end"))
      .select(col(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("n_span_toks"))
  }

  /** The ExactSubstr DELETION pass built on [[duplicatedSpans]]:
    * rewrite each document dropping the tokens inside its duplicated
    * spans (boilerplate, licenses, quoted passages) and keep the rest
    * — substring-granular dedup that saves the document instead of
    * dropping it. Documents without spans pass through byte-identical
    * (the rewrite path normalizes nothing).
    *
    * Shape: the span table (only docs WITH duplication appear — tiny
    * next to the corpus) aggregates to one range-list per doc and
    * joins back keyed on the id; the rewrite is one map-side
    * higher-order filter per row (token index covered by any range →
    * dropped). Span lists are per-doc-bounded, so the membership test
    * is O(tokens · spans_per_doc).
    */
  def removeDuplicatedSpans(df: DataFrame, idCol: String, textCol: String,
                            minLen: Int = 8,
                            scope: graft.api.CacheScope = graft.api.CacheScope.global): DataFrame = {
    val spans = duplicatedSpans(df, idCol, textCol, minLen, scope)
    val ranges = spans.groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("__spans"))
    val toks = split(col(textCol), " ")
    val kept = filter(toks, (_, i) =>
      !exists(col("__spans"), sp =>
        i >= sp.getField("span_start") && i <= sp.getField("span_end")))
    df.join(ranges, Seq(idCol), "left")
      .select(col(idCol),
        when(col("__spans").isNull, col(textCol))
          .otherwise(array_join(kept, " ")).as("clean_text"),
        when(col("__spans").isNull, size(toks))
          .otherwise(size(kept)).cast("int").as("n_kept"),
        when(col("__spans").isNull, lit(0))
          .otherwise(size(toks) - size(kept)).cast("int").as("n_dropped"))
  }

  /** DuckDB twin of [[removeDuplicatedSpans]]. */
  def removeDuplicatedSpansDuckSql(table: String, idCol: String, textCol: String,
                                   minLen: Int = 8): String =
    s"""WITH spans AS (${duplicatedSpansDuckSql(table, idCol, textCol, minLen)}),
       |ranges AS (
       |  SELECT $idCol, list({'s': span_start, 'e': span_end}) AS sp
       |  FROM spans GROUP BY $idCol),
       |joined AS (
       |  SELECT d.$idCol, d.$textCol AS t, r.sp,
       |    string_split(d.$textCol, ' ') AS toks
       |  FROM $table d LEFT JOIN ranges r USING ($idCol))
       |SELECT $idCol,
       |  CASE WHEN sp IS NULL THEN t
       |    -- coalesce: DuckDB array_to_string([]) is NULL, Spark
       |    -- array_join([]) is '' (a fully-covered doc empties out)
       |    ELSE coalesce(array_to_string(list_filter(
       |      list_transform(range(1, len(toks) + 1),
       |        i -> CASE WHEN len(list_filter(sp, x -> i - 1 >= x['s'] AND i - 1 <= x['e'])) > 0
       |               THEN NULL ELSE toks[i] END),
       |      tk -> tk IS NOT NULL), ' '), '') END AS clean_text,
       |  CAST(CASE WHEN sp IS NULL THEN len(toks)
       |    ELSE len(toks) - len(list_filter(range(1, len(toks) + 1),
       |      i -> len(list_filter(sp, x -> i - 1 >= x['s'] AND i - 1 <= x['e'])) > 0)) END AS INT) AS n_kept,
       |  CAST(CASE WHEN sp IS NULL THEN 0
       |    ELSE len(list_filter(range(1, len(toks) + 1),
       |      i -> len(list_filter(sp, x -> i - 1 >= x['s'] AND i - 1 <= x['e'])) > 0)) END AS INT) AS n_dropped
       |FROM joined
       |ORDER BY $idCol""".stripMargin

  /** DuckDB twin of [[duplicatedSpans]] (parallel unnest aligns the
    * position range with the shingle hashes, like the Spark
    * posexplode).
    */
  def duplicatedSpansDuckSql(table: String, idCol: String, textCol: String,
                             minLen: Int = 8): String =
    s"""WITH base AS (
       |  SELECT $idCol, ${graft.text.TextFunctions.positionalShinglesDuckSql("th", minLen)} AS hs
       |  FROM (SELECT $idCol, ${graft.text.TextFunctions.tokenHashesDuckSql(textCol)} AS th
       |        FROM $table) __b0),
       |grams AS (
       |  SELECT $idCol, unnest(range(0, len(hs))) AS p, unnest(hs) AS gh FROM base),
       |dup AS (SELECT gh FROM grams GROUP BY gh HAVING count(DISTINCT $idCol) > 1),
       |marked AS (SELECT * FROM grams WHERE gh IN (SELECT gh FROM dup)),
       |runs AS (
       |  SELECT $idCol, p,
       |    CASE WHEN lag(p) OVER (PARTITION BY $idCol ORDER BY p) IS NULL
       |           OR p - lag(p) OVER (PARTITION BY $idCol ORDER BY p) > $minLen
       |         THEN 1 ELSE 0 END AS nw
       |  FROM marked),
       |r2 AS (
       |  SELECT $idCol, p,
       |    sum(nw) OVER (PARTITION BY $idCol ORDER BY p
       |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
       |  FROM runs)
       |SELECT $idCol,
       |  CAST(min(p) AS INT) AS span_start,
       |  CAST(max(p) + ${minLen - 1} AS INT) AS span_end,
       |  CAST(max(p) + ${minLen - 1} - min(p) + 1 AS INT) AS n_span_toks
       |FROM r2 GROUP BY $idCol, run
       |ORDER BY $idCol, span_start""".stripMargin
}
