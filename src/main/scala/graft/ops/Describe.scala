package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column statistics, the engine analog of the reference's `describe`
  * command (reference: src/linkml_store/cli.py:656-671, which collects
  * to pandas and calls df.describe — a driver-side loop we replace with
  * one distributed pass).
  *
  * Scale design: ONE wide aggregation computes all 8 stats for all N
  * columns (map-side partial aggregation, no row explosion, no skewed
  * per-column groups), then the single result row pivots into
  * (column, stats...) rows. Percentiles are exact (linear
  * interpolation, matching DuckDB's quantile_cont); exact percentiles
  * buffer per-partition value multisets, so at 100 TB swap
  * `percentile` for `percentile_approx` (documented tradeoff) — the
  * rest of the stats stream in constant memory either way.
  */
object Describe {
  def describe(df: DataFrame, cols: Seq[String], roundTo: Int = 4): DataFrame = {
    require(cols.nonEmpty, "describe needs at least one column")
    def stats(c: String) = Seq(
      count(col(c)).as(s"${c}__count"),
      round(avg(col(c)), roundTo).as(s"${c}__mean"),
      round(stddev_samp(col(c)), roundTo).as(s"${c}__stddev"),
      round(min(col(c)).cast("double"), roundTo).as(s"${c}__min"),
      round(expr(s"percentile(`$c`, 0.25)"), roundTo).as(s"${c}__p25"),
      round(expr(s"percentile(`$c`, 0.5)"), roundTo).as(s"${c}__p50"),
      round(expr(s"percentile(`$c`, 0.75)"), roundTo).as(s"${c}__p75"),
      round(max(col(c)).cast("double"), roundTo).as(s"${c}__max"))
    val aggs = cols.flatMap(stats)
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(
        lit(c).as("column"),
        col(s"${c}__count").as("count"),
        col(s"${c}__mean").as("mean"),
        col(s"${c}__stddev").as("stddev"),
        col(s"${c}__min").as("min"),
        col(s"${c}__p25").as("p25"),
        col(s"${c}__p50").as("p50"),
        col(s"${c}__p75").as("p75"),
        col(s"${c}__max").as("max"))
    }
    one.select(explode(array(entries: _*)).as("e"))
      .select("e.*")
      .orderBy("column")
  }

  /** DuckDB oracle SQL for [[describe]] over the same columns. */
  def oracleSql(table: String, cols: Seq[String], roundTo: Int = 4): String =
    cols.sorted.map { c =>
      s"""SELECT '$c' AS "column", count($c) AS count,
         |  round(avg($c), $roundTo) AS mean,
         |  round(stddev_samp($c), $roundTo) AS stddev,
         |  round(CAST(min($c) AS DOUBLE), $roundTo) AS min,
         |  round(quantile_cont($c, 0.25), $roundTo) AS p25,
         |  round(quantile_cont($c, 0.5), $roundTo) AS p50,
         |  round(quantile_cont($c, 0.75), $roundTo) AS p75,
         |  round(CAST(max($c) AS DOUBLE), $roundTo) AS max
         |FROM $table""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
}
