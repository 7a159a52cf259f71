package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pearson correlation matrix over numeric columns in ONE aggregation
  * pass — the feature-diagnostics grid behind scatter/heatmap plots
  * (the reference ships plotting renderers; graft ships the
  * computation — SURVEY §6) and the redundancy check run before
  * feeding correlated quality signals into a learned gate.
  *
  * Engine-portable by construction, the q_score_length_corr recipe
  * generalized to a matrix:
  *  - inputs quantize to integers (`round(col·scale)` — exact for
  *    fixed-decimal data like prices/ratios at the right scale), so
  *    every sum is an EXACT integer — no float summation-order drift
  *    between Spark partial aggregates and DuckDB's single-node fold;
  *  - sums accumulate in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) —
  *    a 100 TB × (1e7)² pair sum overflows a BIGINT, and Spark's
  *    non-ANSI long sum would WRAP silently where DuckDB widens;
  *  - the textbook corr formula is evaluated on doubles cast from
  *    those exact sums in mirrored operation order, rounded at 4dp
  *    (full-entropy quotients — the decimal-boundary hazard of
  *    integer RATIOS does not apply to sqrt quotients).
  *
  * One scan, one shuffle-free global aggregate (k + k(k+1)/2 sums),
  * k(k−1)/2 output rows assembled by exploding a literal-indexed
  * array over the single aggregate row.
  */
object CorrMatrix {

  def corrMatrix(df: DataFrame, cols: Seq[String],
                 scale: Long = 100L): DataFrame = {
    require(cols.size >= 2, "corrMatrix needs at least two columns")
    def q(c: String): Column =
      round(col(c) * lit(scale), 0).cast("long")
    val sums =
      Seq(count(lit(1)).as("n")) ++
        cols.map(c => sum(q(c).cast("decimal(38,0)")).as(s"s_$c")) ++
        pairs(cols).map { case (a, b) =>
          sum((q(a) * q(b)).cast("decimal(38,0)")).as(s"p_${a}_$b")
        } ++
        cols.map(c => sum((q(c) * q(c)).cast("decimal(38,0)")).as(s"p_${c}_$c"))
    val agg = df.agg(sums.head, sums.tail: _*)
    val nd = col("n").cast("double")
    def d(name: String): Column = col(name).cast("double")
    def corr(a: String, b: String): Column = {
      val num = nd * d(s"p_${a}_$b") - d(s"s_$a") * d(s"s_$b")
      val den = sqrt((nd * d(s"p_${a}_$a") - d(s"s_$a") * d(s"s_$a")) *
        (nd * d(s"p_${b}_$b") - d(s"s_$b") * d(s"s_$b")))
      round(when(den === 0.0, lit(null)).otherwise(num / den), 4)
    }
    val rows = array(pairs(cols).map { case (a, b) =>
      struct(lit(a).as("col_a"), lit(b).as("col_b"), corr(a, b).as("corr"))
    }: _*)
    agg.select(explode(rows).as("r"))
      .select(col("r.col_a"), col("r.col_b"), col("r.corr"))
      .orderBy("col_a", "col_b")
  }

  /** DuckDB twin — identical quantization, exact HUGEINT sums, and the
    * same mirrored double arithmetic per pair.
    */
  def corrMatrixDuckSql(table: String, cols: Seq[String],
                        scale: Long = 100L): String = {
    def q(c: String) = s"CAST(round($c * $scale) AS BIGINT)"
    val sums =
      Seq("CAST(count(*) AS BIGINT) AS n") ++
        cols.map(c => s"sum(${q(c)}) AS s_$c") ++
        (pairs(cols) ++ cols.map(c => (c, c))).map { case (a, b) =>
          s"sum(${q(a)} * ${q(b)}) AS p_${a}_$b"
        }
    def d(name: String) = s"CAST($name AS DOUBLE)"
    def corrSql(a: String, b: String) = {
      val num = s"${d("n")} * ${d(s"p_${a}_$b")} - ${d(s"s_$a")} * ${d(s"s_$b")}"
      val den = s"sqrt((${d("n")} * ${d(s"p_${a}_$a")} - ${d(s"s_$a")} * ${d(s"s_$a")}) * " +
        s"(${d("n")} * ${d(s"p_${b}_$b")} - ${d(s"s_$b")} * ${d(s"s_$b")}))"
      s"round(CASE WHEN $den = 0 THEN NULL ELSE ($num) / ($den) END, 4)"
    }
    val rows = pairs(cols).map { case (a, b) =>
      s"SELECT '$a' AS col_a, '$b' AS col_b, ${corrSql(a, b)} AS corr FROM agg"
    }
    s"""WITH agg AS MATERIALIZED (
       |  SELECT ${sums.mkString(",\n    ")}
       |  FROM $table)
       |${rows.mkString("\nUNION ALL\n")}
       |ORDER BY col_a, col_b""".stripMargin
  }

  private def pairs(cols: Seq[String]): Seq[(String, String)] =
    for {
      i <- cols.indices
      j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
}
