package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float|double>` columns as pure Catalyst
  * expressions (codegen'd; no UDF, no driver round-trip). Semantics match
  * DuckDB's list_cosine_similarity / list_dot_product for the oracle.
  */
object VectorFunctions {

  /** Dot product of two numeric array columns (as double) — the native
    * codegen [[DotProduct]] expression (tight primitive loop inside
    * whole-stage codegen; bit-identical to the sequential fold).
    * Sessions register it via GraftExtensions / GraftFunctions.register
    * (Tables.df does so automatically).
    */
  def dot(a: Column, b: Column): Column =
    call_function("graft_dot", a.cast("array<double>"), b.cast("array<double>"))

  /** Composable fallback with identical semantics (no registration
    * needed; interpreted per element).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Manhattan (L1) distance — the native codegen [[ManhattanDistance]]
    * expression; fold order matches DuckDB's list_sum.
    */
  def l1(a: Column, b: Column): Column =
    call_function("graft_l1", a.cast("array<double>"), b.cast("array<double>"))

  /** Literal query vector as an array<double> column. */
  def vecLit(v: Seq[Double]): Column = array(v.map(lit): _*)
}
