package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward temporal) join — for each left row, the single
  * LATEST right row with equal keys and right ts <= left ts (the
  * classic "price as of the trade" / "last touch before conversion"
  * operator that plain equi-joins cannot express).
  *
  * Spark-first shape: NOT a range join (which Catalyst would plan as a
  * broadcast nested loop) — instead the UNION-WINDOW formulation: tag
  * both sides, sort each key's timeline once (right rows before left
  * at ts ties for inclusive semantics), and take `last(right payload,
  * ignoreNulls)` over the running frame. One shuffle on the join keys,
  * one sort, zero candidate blowup: cost is |L| + |R| regardless of
  * time skew — the shape that survives 100 TB. Ties among right rows
  * at the same ts break deterministically by `rightIdCol` (max wins,
  * mirrored in the oracle — engines must agree on WHICH right row
  * matched, not just that one did).
  *
  * All left columns pass through (packed in a struct across the
  * union); right columns arrive as `asof_<name>`. `tsCol` must be
  * non-null on both sides.
  */
object AsofJoin {

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      rightIdCol: String,
      rightCols: Seq[String],
      inclusive: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    // inclusive: right sorts BEFORE left at equal ts (a right row at
    // the same instant matches); strict: after (it does not)
    val (sideL, sideR) = if (inclusive) (1, 0) else (0, 1)
    val ridType = right.schema(rightIdCol).dataType
    val leftStructType = org.apache.spark.sql.types.StructType(left.schema.fields)
    // the right payload rides as ONE struct so every asof_* column
    // comes from the SAME matched row — per-column last(ignoreNulls)
    // would silently mix rows when a payload column is NULL (the
    // newest non-null value of each column independently)
    val rStructType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c)))
    val lhs = left.select(
      keys.map(col) ++ Seq(
        col(tsCol).as("__ts"), lit(sideL).as("__side"),
        lit(null).cast(ridType).as("__rid"),
        struct(left.columns.map(col): _*).as("__l"),
        lit(null).cast(rStructType).as("__r")): _*)
    val rhs = right.select(
      keys.map(col) ++ Seq(
        col(tsCol).as("__ts"), lit(sideR).as("__side"),
        col(rightIdCol).as("__rid"),
        lit(null).cast(leftStructType).as("__l"),
        struct(rightCols.map(col): _*).as("__r")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__rid").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lhs.unionByName(rhs)
      .select(col("*"), last(col("__r"), ignoreNulls = true).over(w).as("__m"))
      .filter(col("__side") === lit(sideL))
      .select(col("__l.*") +: rightCols.map(c => col(s"__m.$c").as(s"asof_$c")): _*)
  }
}
