package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key exponentially-weighted moving average of a value stream —
  * the smoothing primitive under drift dashboards and alert
  * hysteresis (reference analog: the event-stream analytics family,
  * SURVEY §2 row 54; EWMA itself is an LLM-pipeline extension like
  * the z-score monitor it pairs with).
  *
  * Truncated `lags`-term form rather than the recursion (which no
  * declarative engine expresses): ewma_t = Σ w_i·x_{t-i} / Σ w_i over
  * the lags that exist, w_i = decay^i. With the default decay 0.75
  * and 8 terms the truncation tail is < 0.75⁸ ≈ 10% of one step
  * weight. ONE window pass partitioned on the (max-cardinality) key —
  * no shuffle beyond the window sort, map-only after it, so the shape
  * survives 100 TB the same way q_anomaly's z-window does.
  *
  * Determinism: 0.75 is dyadic (3/4), so every weight, product and
  * left-assoc partial sum is bit-identical across engines; the DuckDB
  * twin repeats the same lag columns and the same left-assoc
  * arithmetic string.
  */
object Ewma {

  val DefaultLags = 8
  val DefaultDecay = 0.75

  private def weights(lags: Int, decay: Double): Seq[Double] =
    (0 until lags).map(i => math.pow(decay, i))

  /** Adds `ewma` (rounded 4dp) per row; output (idCol, keyCol, ewma). */
  def ewma(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
           valueCol: String, lags: Int = DefaultLags,
           decay: Double = DefaultDecay): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol).asc, col(tieCol).asc)
    val ws = weights(lags, decay)
    val withLags = df
      .select(Seq(col(tieCol), col(keyCol), col(valueCol)) ++
        (1 until lags).map(i => lag(valueCol, i).over(w).as(s"__l$i")): _*)
    val num = (1 until lags).foldLeft(col(valueCol) * lit(ws(0))) {
      (acc, i) => acc + coalesce(col(s"__l$i"), lit(0.0)) * lit(ws(i))
    }
    val den = (1 until lags).foldLeft(lit(ws(0)).cast("double")) {
      (acc, i) => acc + when(col(s"__l$i").isNotNull, lit(ws(i))).otherwise(lit(0.0))
    }
    withLags.select(col(tieCol), col(keyCol), round(num / den, 4).as("ewma"))
  }

  /** DuckDB twin — identical lag columns and left-assoc arithmetic.
    * `tsSql` must already be the micros-comparable timestamp
    * expression (e.g. `CAST(ts AS TIMESTAMP)`).
    */
  def ewmaDuckSql(table: String, keyCol: String, tsSql: String, tieCol: String,
                  valueCol: String, lags: Int = DefaultLags,
                  decay: Double = DefaultDecay): String = {
    val ws = weights(lags, decay)
    val lagCols = (1 until lags)
      .map(i => s"lag($valueCol, $i) OVER w AS l$i").mkString(",\n    ")
    val num = (1 until lags).foldLeft(s"$valueCol * ${ws(0)}") {
      (acc, i) => s"$acc + coalesce(l$i, 0.0) * ${ws(i)}"
    }
    val den = (1 until lags).foldLeft(s"CAST(${ws(0)} AS DOUBLE)") {
      (acc, i) => s"$acc + CASE WHEN l$i IS NOT NULL THEN ${ws(i)} ELSE 0.0 END"
    }
    s"""SELECT $tieCol, $keyCol,
       |  round(($num) / ($den), 4) AS ewma
       |FROM (
       |  SELECT $tieCol, $keyCol, $valueCol,
       |    $lagCols
       |  FROM $table
       |  WINDOW w AS (PARTITION BY $keyCol ORDER BY $tsSql, $tieCol))""".stripMargin
  }
}
