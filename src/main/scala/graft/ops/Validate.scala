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
    * contribute zero output. The violation stream is UNORDERED —
    * map-only, zero shuffle at any scale (a dirty 100 TB table can
    * emit violations row-bounded in size; a global sort of that
    * stream was the single superlinear step the sf1 bench caught:
    * 800k violations → 13× wall at 10× data). Callers that render a
    * report sort their own bounded slice.
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
  }

  /** A declared foreign-key-style reference: values of `from.fkCol`
    * must resolve in `to.keyCol` (reference: database.py:703
    * _validate_referential_integrity — which resolves slot ranges to
    * collections, then `get_one`s EVERY value on the driver).
    */
  final case class Ref(from: String, fkCol: String, to: String, keyCol: String)

  /** Referential-integrity validation across collections: one LEFT
    * ANTI join + count per declared reference — orphan values fall out
    * of a keyed hash join, never a per-row lookup. `tables` maps
    * collection name → frame. Output: (collection, column,
    * ref_collection, value, n_rows) per DISTINCT orphan value, so a
    * hot broken key reports once with its row count (at 100 TB the
    * violation set stays value-bounded, not row-bounded). NULL fk
    * values are not violations (an absent reference is `Required`'s
    * job, mirroring SQL FK semantics).
    */
  def referentialIntegrity(tables: Map[String, DataFrame], refs: Seq[Ref]): DataFrame = {
    require(refs.nonEmpty, "no references declared")
    refs.map { r =>
      val from = tables.getOrElse(r.from,
        throw new IllegalArgumentException(s"unknown collection '${r.from}'"))
      val to = tables.getOrElse(r.to,
        throw new IllegalArgumentException(s"unknown collection '${r.to}'"))
      from.select(col(r.fkCol).cast("string").as("value"))
        .filter(col("value").isNotNull)
        .join(to.select(col(r.keyCol).cast("string").as("value")).distinct(),
          Seq("value"), "left_anti")
        .groupBy(col("value")).agg(count(lit(1)).as("n_rows"))
        .select(lit(r.from).as("collection"), lit(r.fkCol).as("col_name"),
          lit(r.to).as("ref_collection"), col("value"), col("n_rows"))
    }.reduce(_.unionByName(_))
      .orderBy("collection", "col_name", "value")
  }

  /** DuckDB twin of [[referentialIntegrity]] for one reference over a
    * restricted target (used by the oracle, which checks real orphans
    * by shrinking the target set deterministically).
    */
  def referentialIntegrityDuckSql(from: String, fkCol: String,
                                  toSql: String, keyCol: String,
                                  toName: String): String =
    s"""SELECT '$from' AS collection, '$fkCol' AS col_name, '$toName' AS ref_collection,
       |  CAST($fkCol AS VARCHAR) AS value, count(*) AS n_rows
       |FROM $from
       |WHERE $fkCol IS NOT NULL
       |  AND CAST($fkCol AS VARCHAR) NOT IN (
       |    SELECT DISTINCT CAST($keyCol AS VARCHAR) FROM ($toSql) WHERE $keyCol IS NOT NULL)
       |GROUP BY $fkCol
       |ORDER BY collection, col_name, value""".stripMargin
}
