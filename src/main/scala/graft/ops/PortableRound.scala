package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable 4dp rounding of integer-count ratios.
  *
  * `round(p / q, 4)` on a double is NOT portable between Spark and
  * DuckDB when the true rational p/q lands exactly on a decimal
  * boundary: Spark rounds the SHORTEST-STRING decimal of the double
  * (BigDecimal(Double.toString), so 57/800 → "0.07125" → 0.0713
  * half-up) while DuckDB rounds the exact BINARY value
  * (0.0712499…96 → 0.0712). Rare per ratio (the 5th decimal must be
  * an exact trailing 5), but a 50k-row ratio column hits it at scale —
  * q_repetition did at sf1.
  *
  * The portable form rounds the TRUE RATIONAL in integer arithmetic:
  * round4(p/q) = ⌊(20000·p + q) / (2·q)⌋ / 10000, identical in every
  * engine. Here the integer floor-divide is expressed as
  * (num − num mod den) / den — the double division is EXACT because
  * the numerator is an exact multiple of den and all magnitudes stay
  * far below 2^53 (p ≤ ~1e9 counts → num ≤ 2e13).
  *
  * Use for any 4dp output column whose numerator and denominator are
  * integer counts (rates, shares, fractions); plain `round` stays
  * fine for genuinely-float quantities, where exact decimal
  * boundaries have measure ~zero.
  */
object PortableRound {

  /** round4(p/q) for integral columns (q > 0); 0.0 when q = 0. Sign-
    * safe: the floor-divide is a true FLOOR in both engines (Spark via
    * pmod, DuckDB via an explicit positive-mod — its bare `//`
    * truncates toward zero, which would diverge from Spark on negative
    * numerators). Negative ratios round half-toward-+∞ (-0.00005 → 0),
    * the same direction positives round, in both engines.
    */
  def intRound4(p: Column, q: Column): Column = {
    val num = lit(20000L) * p.cast("long") + q.cast("long")
    val den = lit(2L) * q.cast("long")
    when(q === 0, lit(0.0))
      .otherwise(((num - pmod(num, den)) / den) / lit(10000.0))
  }

  /** DuckDB twin — same integer formula with an explicit floor-mod
    * (`((x % d) + d) % d`), because DuckDB's `%` follows the dividend
    * sign and `//` truncates: bare `num // den` is NOT a floor for
    * negative numerators. After subtracting the positive mod the
    * numerator is an exact multiple of den, so `//` is exact division
    * regardless of its rounding mode.
    */
  def intRound4Duck(p: String, q: String): String = {
    val num = s"(20000 * ($p) + ($q))"
    val den = s"(2 * ($q))"
    s"CASE WHEN ($q) = 0 THEN 0.0 " +
      s"ELSE (($num - ((($num % $den) + $den) % $den)) // $den) / 10000.0 END"
  }

  /** round(scale · p/q) as an exact LONG — the fixed-point quantizer
    * (`round(ratio * 10000)` is the same boundary hazard in disguise).
    */
  def intScaled(p: Column, q: Column, scale: Long = 10000L): Column = {
    val num = lit(2L * scale) * p.cast("long") + q.cast("long")
    val den = lit(2L) * q.cast("long")
    when(q === 0, lit(0L))
      .otherwise(((num - pmod(num, den)) / den).cast("long"))
  }

  def intScaledDuck(p: String, q: String, scale: Long = 10000L): String = {
    val num = s"(${2 * scale} * ($p) + ($q))"
    val den = s"(2 * ($q))"
    s"CASE WHEN ($q) = 0 THEN 0 " +
      s"ELSE ($num - ((($num % $den) + $den) % $den)) // $den END"
  }

  /** Portable 4dp for NON-NEGATIVE float quantities whose exact
    * rational does not fit the integer forms above (e.g. the KMV
    * (k−1)·2^60/(h+1) estimators — the numerator needs 68 bits):
    * rounds the BINARY double via ⌊x·10⁴ + 0.5⌋/10⁴ — pure IEEE
    * arithmetic on the same double both engines computed, so the
    * result is bit-identical cross-engine BY CONSTRUCTION, with no
    * dependence on either engine's round() tie handling (Spark rounds
    * the shortest-string decimal, DuckDB the exact binary value — the
    * q_repetition divergence this object exists for). Magnitudes must
    * stay under 2^53/10⁴ (≈9·10¹¹) for the scaling to be exact-enough;
    * sketch estimates are corpus cardinalities, far below that.
    */
  def floatRound4(x: Column): Column =
    floor(x * lit(10000.0) + lit(0.5)) / lit(10000.0)

  /** DuckDB twin of [[floatRound4]] — the identical IEEE ops (DuckDB
    * floor returns DOUBLE, Spark's returns BIGINT; both are exact
    * integer values below 2^53, so the division agrees).
    */
  def floatRound4Duck(x: String): String =
    s"(floor(($x) * 10000.0 + 0.5) / 10000.0)"
}
