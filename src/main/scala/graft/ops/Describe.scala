package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column statistics, the engine analog of the reference's `describe`
  * command (reference: src/linkml_store/cli.py:656-671, which collects
  * to pandas and calls df.describe — a driver-side loop we replace with
  * one distributed pass).
  *
  * Scale design: all N columns are computed in a SINGLE scan — values
  * are stacked into (column, value) rows and aggregated grouped by
  * column name, so the shuffle carries only N×(#stats) values.
  * Percentiles are exact (linear interpolation, matching DuckDB's
  * quantile_cont) — swap `percentile` for `percentile_approx` at
  * 100 TB when approximate quantiles suffice.
  */
object Describe {
  def describe(df: DataFrame, cols: Seq[String], roundTo: Int = 4): DataFrame = {
    require(cols.nonEmpty, "describe needs at least one column")
    val stacked = cols.map(c => s"'$c', cast(`$c` as double)").mkString(", ")
    df.selectExpr(s"stack(${cols.size}, $stacked) as (column, value)")
      .groupBy(col("column"))
      .agg(
        count(col("value")).as("count"),
        round(avg("value"), roundTo).as("mean"),
        round(stddev_samp(col("value")), roundTo).as("stddev"),
        round(min("value"), roundTo).as("min"),
        round(expr("percentile(value, 0.25)"), roundTo).as("p25"),
        round(expr("percentile(value, 0.5)"), roundTo).as("p50"),
        round(expr("percentile(value, 0.75)"), roundTo).as("p75"),
        round(max("value"), roundTo).as("max"))
      .orderBy("column")
  }

  /** DuckDB oracle SQL for [[describe]] over the same columns. */
  def oracleSql(table: String, cols: Seq[String], roundTo: Int = 4): String =
    cols.sorted.map { c =>
      s"""SELECT '$c' AS "column", count($c) AS count,
         |  round(avg($c), $roundTo) AS mean,
         |  round(stddev_samp($c), $roundTo) AS stddev,
         |  round(min($c), $roundTo) AS min,
         |  round(quantile_cont($c, 0.25), $roundTo) AS p25,
         |  round(quantile_cont($c, 0.5), $roundTo) AS p50,
         |  round(quantile_cont($c, 0.75), $roundTo) AS p75,
         |  round(max($c), $roundTo) AS max
         |FROM $table""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
}
