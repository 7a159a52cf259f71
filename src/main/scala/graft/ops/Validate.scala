package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative row validation — the engine analog of the reference's
  * iter_validate_collection (reference: src/linkml_store/api/
  * collection.py:1220-1260, which streams objects through a JSON-Schema
  * validator on the driver). Here each rule compiles to a Catalyst
  * predicate and ALL rules are evaluated in one scan; the result is a
  * distributed DataFrame of violations (row id, field, code, value),
  * empty when the collection is valid.
  */
object Validate {

  sealed trait Rule {
    def field: String
    def code: String
    /** True when the row VIOLATES the rule. */
    def violation: Column
  }
  final case class Required(field: String) extends Rule {
    val code = "required"
    def violation: Column = col(field).isNull
  }
  final case class Enum(field: String, allowed: Seq[Any]) extends Rule {
    val code = "enum"
    def violation: Column = col(field).isNotNull && !col(field).isin(allowed: _*)
  }
  final case class Range(field: String, min: Option[Double], max: Option[Double]) extends Rule {
    val code = "range"
    def violation: Column = {
      val lo = min.map(col(field) < _)
      val hi = max.map(col(field) > _)
      col(field).isNotNull && Seq(lo, hi).flatten.reduce(_ || _)
    }
  }
  final case class Pattern(field: String, regex: String) extends Rule {
    val code = "pattern"
    def violation: Column = col(field).isNotNull && !col(field).rlike(regex)
  }

  /** One scan: every rule's violation becomes a struct; non-violations
    * are filtered inside the array before the explode, so clean rows
    * contribute zero output.
    */
  def validate(df: DataFrame, idCol: String, rules: Seq[Rule]): DataFrame = {
    val checks = rules.map { r =>
      when(r.violation, struct(
        lit(r.field).as("field"),
        lit(r.code).as("code"),
        col(r.field).cast("string").as("value")))
    }
    df.select(col(idCol).as("row_id"),
        explode(filter(array(checks: _*), _.isNotNull)).as("v"))
      .select(col("row_id"), col("v.field"), col("v.code"), col("v.value"))
      .orderBy("row_id", "field", "code")
  }
}
