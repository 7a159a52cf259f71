package graft.ops

import graft.text.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-sample category enrichment — the engine analog of the
  * reference's EnrichmentAnalyzer (reference: src/linkml_store/utils/
  * enrichment_analyzer.py:108-188: per-sample category counts vs global
  * counts, fold change, exact test p-value, BH/Bonferroni correction).
  *
  * Divergence (documented): the reference uses scipy's two-sided Fisher
  * exact test; we compute the hypergeometric UPPER-TAIL p-value
  * P(X >= k) — the standard one-sided enrichment test — because it is
  * expressible as a closed fold that runs IDENTICALLY in Spark and
  * DuckDB (no scipy on either side):
  *
  *   ln pmf(k) = lnC(K,k) + lnC(N-K, n-k) - lnC(N,n)
  *     with lnC(a,b) = sum_{j=1..b} ln((a-b+j)/j)       (b terms, exact)
  *   tail = sum_{i>=k} pmf(i) = pmf(k) * sum of cumulative products of
  *     r(i) = pmf(i+1)/pmf(i) = ((K-i)(n-i)) / ((i+1)(N-K-n+i+1))
  *
  * Everything is one distributed pipeline: explode annotations, three
  * bounded aggregations, then the p-value fold runs per (sample,
  * category) row — no driver loop. BH correction is two window
  * functions per sample partition.
  */
object Enrichment {

  /** ln C(a, b) as a Spark SQL expression over column names. */
  private def lnC(a: String, b: String): String =
    s"IF(($b) = 0, 0D, aggregate(sequence(1, $b), 0D, " +
      s"(acc, j) -> acc + ln((($a) - ($b) + j) / cast(j as double))))"

  /** Hypergeometric P(X >= k) for columns k_s, k_g, n_s, n_g. The
    * lnC(n_g, n_s) term is sample-constant and arrives precomputed as
    * column `lnc_ns` (hoisted: ~n_s ln() calls per SAMPLE instead of
    * per category row — the dominant cost at large n_s).
    */
  private def pUpperExpr: String = {
    val lnPmf = s"${lnC("k_g", "k_s")} + ${lnC("n_g - k_g", "n_s - k_s")} - lnc_ns"
    val ratio = "(cast(k_g - i as double) * (n_s - i)) / (cast(i + 1 as double) * (n_g - k_g - n_s + i + 1))"
    val tail = s"IF(least(k_g, n_s) <= k_s, 1D, aggregate(" +
      s"transform(sequence(k_s, least(k_g, n_s) - 1), i -> array($ratio, 0D)), " +
      s"array(1D, 1D), (acc, x) -> array(acc[0] * x[0], acc[1] + acc[0] * x[0]))[1])"
    s"exp($lnPmf) * ($tail)"
  }

  /** Enrichment of whitespace-token categories per `sampleCol`. */
  def enrich(df: DataFrame, sampleCol: String, textCol: String, minOccurrences: Int = 5): DataFrame = {
    val ann = df.select(col(sampleCol).as("sample"),
      explode(TextFunctions.tokens(col(textCol))).as("category"))
    val globalTot = ann.agg(count(lit(1)).as("n_g"))
    val sampleTot = ann.groupBy("sample").agg(count(lit(1)).as("n_s"))
      .crossJoin(broadcast(globalTot))
      .withColumn("lnc_ns", expr(lnC("n_g", "n_s")))
    val catGlobal = ann.groupBy("category").agg(count(lit(1)).as("k_g"))
      .filter(col("k_g") >= minOccurrences)
    val catSample = ann.groupBy("sample", "category").agg(count(lit(1)).as("k_s"))
    val base = catSample
      .join(catGlobal, "category")
      .join(broadcast(sampleTot), "sample")
    val scored = base
      .withColumn("fold_change",
        round((col("k_s") / col("n_s")) / (col("k_g") / col("n_g")), 4))
      .withColumn("p_raw", expr(pUpperExpr))
    // Benjamini-Hochberg within each sample: rank ascending by p, then
    // adjusted p = running min of p*m/rank taken from the LARGEST p down.
    val part = Window.partitionBy("sample")
    val byRankDesc = part.orderBy(col("__r").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored
      .withColumn("__m", count(lit(1)).over(part))
      .withColumn("__r", row_number().over(part.orderBy(col("p_raw").asc, col("category").asc)))
      .withColumn("__adj", min(col("p_raw") * col("__m") / col("__r")).over(byRankDesc))
      .select(
        col("sample"), col("category"),
        col("k_s").as("sample_count"), col("k_g").as("global_count"),
        col("fold_change"),
        round(col("p_raw"), 4).as("p_value"),
        round(least(col("__adj"), lit(1.0)), 4).as("p_adj"))
      .orderBy("sample", "category")
  }

  /** DuckDB twin: same folds via list_reduce (sequential left fold,
    * matching Spark's `aggregate`); explicit DOUBLE casts keep DuckDB
    * from binding the literals as DECIMAL.
    */
  def oracleSql(table: String, sampleCol: String, textCol: String, minOccurrences: Int = 5): String = {
    def lnCd(a: String, b: String): String =
      s"CASE WHEN ($b) = 0 THEN CAST(0 AS DOUBLE) ELSE list_reduce(" +
        s"list_transform(range(1, ($b) + 1), j -> ln((($a) - ($b) + j) / CAST(j AS DOUBLE))), " +
        s"(acc, x) -> acc + x) END"
    val lnPmf = s"${lnCd("k_g", "k_s")} + ${lnCd("n_g - k_g", "n_s - k_s")} - ${lnCd("n_g", "n_s")}"
    val ratio = "(CAST(k_g - i AS DOUBLE) * (n_s - i)) / (CAST(i + 1 AS DOUBLE) * (n_g - k_g - n_s + i + 1))"
    val tail = s"CASE WHEN least(k_g, n_s) <= k_s THEN CAST(1 AS DOUBLE) ELSE list_reduce(" +
      s"list_prepend([CAST(1 AS DOUBLE), CAST(1 AS DOUBLE)], " +
      s"list_transform(range(k_s, least(k_g, n_s)), i -> [$ratio, CAST(0 AS DOUBLE)])), " +
      s"(acc, x) -> [acc[1] * x[1], acc[2] + acc[1] * x[1]])[2] END"
    s"""WITH ann AS (
       |  SELECT $sampleCol AS sample, unnest(string_split($textCol, ' ')) AS category
       |  FROM $table),
       |st AS (SELECT sample, count(*) AS n_s FROM ann GROUP BY 1),
       |gt AS (SELECT count(*) AS n_g FROM ann),
       |cg AS (SELECT category, count(*) AS k_g FROM ann GROUP BY 1
       |       HAVING count(*) >= $minOccurrences),
       |cs AS (SELECT sample, category, count(*) AS k_s FROM ann GROUP BY 1, 2),
       |base AS (
       |  SELECT cs.sample, cs.category, k_s, k_g, n_s, n_g
       |  FROM cs JOIN cg USING (category) JOIN st USING (sample), gt),
       |scored AS (
       |  SELECT sample, category, k_s, k_g,
       |    round((k_s / n_s) / (k_g / n_g), 4) AS fold_change,
       |    exp($lnPmf) * ($tail) AS p_raw
       |  FROM base),
       |ranked AS (
       |  SELECT *, count(*) OVER (PARTITION BY sample) AS m,
       |    row_number() OVER (PARTITION BY sample ORDER BY p_raw ASC, category ASC) AS r
       |  FROM scored)
       |SELECT sample, category, k_s AS sample_count, k_g AS global_count,
       |  fold_change, round(p_raw, 4) AS p_value,
       |  round(least(min(p_raw * m / r) OVER (
       |    PARTITION BY sample ORDER BY r DESC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 1.0), 4) AS p_adj
       |FROM ranked
       |ORDER BY sample, category""".stripMargin
  }
}
