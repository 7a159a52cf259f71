package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group skewness and excess kurtosis — the distribution-SHAPE
  * profile describe's mean/std can't see (a value column whose std is
  * flat while its kurtosis explodes is developing a heavy tail: fraud
  * bursts, price-outage spikes, drifting sensors). Population moments
  * from RAW POWER SUMS in one grouped aggregate: inputs quantize to
  * integers (skew/kurtosis are scale-invariant, so cent quantization
  * only matters through the quantizer both engines share), the four
  * power sums accumulate in DECIMAL(38,0)/HUGEINT (the CorrMatrix
  * rule — a 100 TB fourth-power sum wraps a BIGINT), and the central-
  * moment algebra runs on doubles cast from those exact sums in
  * mirrored operation order.
  *
  * Per-row widening: q² fits a long for |value·scale| ≤ ~3e9, but q³
  * and q⁴ do not (q = 56 021 already wraps q⁴) — the cube and fourth
  * power multiply q² AS A DECIMAL/HUGEINT, so no 64-bit intermediate
  * ever forms.
  */
object Moments {

  def groupMoments(df: DataFrame, groupCol: String, valCol: String,
      scale: Long = 100L): DataFrame = {
    // floor(x·s + 0.5), not round(x·s): the portable half-up quantizer
    // (PortableRound's rule — Spark's round works on the shortest
    // decimal string, DuckDB's on the binary value; floor agrees
    // everywhere, including for negative inputs, where it rounds
    // half-toward-+∞ in both engines). Same form as winsorizedMeans.
    val q = floor(col(valCol).cast("double") * lit(scale) + lit(0.5)).cast("long")
    // decimal(19)·decimal(10/19) keeps every product precision ≤ 38
    // (exact); q² itself is long-safe
    val q2d = (q * q).cast("decimal(19,0)")
    // NULL values must not inflate n: the power sums skip NULLs, so the
    // count must too (the winsorizedMeans/groupQuantiles convention)
    val agg = df.filter(col(valCol).isNotNull).groupBy(groupCol).agg(
      count(lit(1)).as("n"),
      sum(q.cast("decimal(38,0)")).as("s1"),
      sum((q * q).cast("decimal(38,0)")).as("s2"),
      sum(q2d * q.cast("decimal(10,0)")).as("s3"),
      sum(q2d * q2d).as("s4"))
    val nd = col("n").cast("double")
    def d(c: String): Column = col(c).cast("double")
    val withMu = agg.withColumn("mu", d("s1") / nd)
    val mu = col("mu")
    val withM = withMu
      .withColumn("m2", d("s2") / nd - mu * mu)
      .withColumn("m3",
        d("s3") / nd - lit(3.0) * mu * (d("s2") / nd) + lit(2.0) * mu * mu * mu)
      .withColumn("m4",
        d("s4") / nd - lit(4.0) * mu * (d("s3") / nd) +
          lit(6.0) * mu * mu * (d("s2") / nd) - lit(3.0) * mu * mu * mu * mu)
    withM.select(col(groupCol), col("n"),
      round(mu / lit(scale.toDouble), 4).as("mean"),
      round(when(col("m2") <= 0.0, lit(null)).otherwise(
        col("m3") / (col("m2") * sqrt(col("m2")))), 4).as("skew"),
      round(when(col("m2") <= 0.0, lit(null)).otherwise(
        col("m4") / (col("m2") * col("m2")) - lit(3.0)), 4).as("ex_kurtosis"))
      .orderBy(groupCol)
  }

  /** DuckDB twin — identical quantizer, HUGEINT power sums, and the
    * same double algebra stage-for-stage (CTE per stage mirrors the
    * withColumn chain so every intermediate is the same IEEE value).
    */
  def groupMomentsDuckSql(table: String, groupCol: String, valCol: String,
      scale: Long = 100L): String = {
    val q = s"CAST(floor(CAST($valCol AS DOUBLE) * $scale + 0.5) AS BIGINT)"
    s"""WITH agg AS MATERIALIZED (
       |  SELECT $groupCol, CAST(count(*) AS BIGINT) AS n,
       |    sum(CAST($q AS HUGEINT)) AS s1,
       |    sum(CAST($q * $q AS HUGEINT)) AS s2,
       |    sum(CAST($q * $q AS HUGEINT) * $q) AS s3,
       |    sum(CAST($q * $q AS HUGEINT) * CAST($q * $q AS HUGEINT)) AS s4
       |  FROM $table WHERE $valCol IS NOT NULL GROUP BY $groupCol),
       |t1 AS (
       |  SELECT *, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu FROM agg),
       |t2 AS (
       |  SELECT *,
       |    CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) - mu * mu AS m2,
       |    CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)
       |      - 3.0 * mu * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
       |      + 2.0 * mu * mu * mu AS m3,
       |    CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE)
       |      - 4.0 * mu * (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE))
       |      + 6.0 * mu * mu * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
       |      - 3.0 * mu * mu * mu * mu AS m4
       |  FROM t1)
       |SELECT $groupCol, n,
       |  round(mu / $scale.0, 4) AS mean,
       |  round(CASE WHEN m2 <= 0.0 THEN NULL
       |    ELSE m3 / (m2 * sqrt(m2)) END, 4) AS skew,
       |  round(CASE WHEN m2 <= 0.0 THEN NULL
       |    ELSE m4 / (m2 * m2) - 3.0 END, 4) AS ex_kurtosis
       |FROM t2
       |ORDER BY $groupCol""".stripMargin
  }
}
