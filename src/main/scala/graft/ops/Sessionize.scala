package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream: a new session starts
  * when the gap to the user's previous event exceeds `gapSeconds`.
  * Classic two-window composition — lag to detect breaks, running sum
  * to number sessions — partitioned BY USER, so the heavy work
  * distributes across users (no low-cardinality window skew; per-user
  * event counts bound each task). Gap comparison uses integer
  * microseconds (exact, portable to the DuckDB oracle).
  */
object Sessionize {

  def sessionize(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      valueCol: String,
      orderTieBreak: String,
      gapSeconds: Long = 1800): DataFrame = {
    val byTime = Window.partitionBy(userCol).orderBy(col(tsCol), col(orderTieBreak))
    val gapUs = gapSeconds * 1000000L
    events
      .withColumn("__prev", lag(col(tsCol), 1).over(byTime))
      .withColumn("__brk",
        when(col("__prev").isNull ||
          unix_micros(col(tsCol)) - unix_micros(col("__prev")) > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("__brk")).over(
        byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("session_id"))
      .agg(
        date_format(min(col(tsCol)), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
        date_format(max(col(tsCol)), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col(valueCol)), 4).as("sum_value"))
      .orderBy(userCol, "session_id")
  }

  def oracleSql(
      table: String,
      userCol: String,
      tsCol: String,
      valueCol: String,
      orderTieBreak: String,
      gapSeconds: Long = 1800): String = {
    val gapUs = gapSeconds * 1000000L
    // events.ts is TIMESTAMP(NANOS) in the parquet; cast to micros to
    // match the Spark-side conversion in Tables.df.
    s"""WITH e AS (
       |  SELECT $userCol, CAST($tsCol AS TIMESTAMP) AS ts, $valueCol, $orderTieBreak
       |  FROM $table),
       |l AS (
       |  SELECT *, lag(ts) OVER (PARTITION BY $userCol ORDER BY ts, $orderTieBreak) AS prev
       |  FROM e),
       |m AS (
       |  SELECT *, CASE WHEN prev IS NULL OR epoch_us(ts) - epoch_us(prev) > $gapUs
       |    THEN 1 ELSE 0 END AS brk
       |  FROM l),
       |s AS (
       |  SELECT *, sum(brk) OVER (PARTITION BY $userCol ORDER BY ts, $orderTieBreak
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
       |  FROM m)
       |SELECT $userCol, CAST(session_id AS BIGINT) AS session_id,
       |  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       |  strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
       |  count(*) AS n_events,
       |  round(sum($valueCol), 4) AS sum_value
       |FROM s
       |GROUP BY $userCol, session_id
       |ORDER BY $userCol, session_id""".stripMargin
  }
}
