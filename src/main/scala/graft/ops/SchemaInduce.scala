package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType

/** Schema induction from data — the engine analog of the reference's
  * induce_class_definition_from_objects (reference:
  * src/linkml_store/api/collection.py:1065-1131: per-attribute type,
  * multivalued flag, nullability observed from the objects).
  *
  * Static shape (name, type, multivalued) comes from the Catalyst
  * schema; OBSERVED nullability and non-null counts need data and are
  * computed for all columns in a single scan (one agg row, then
  * exploded into per-column rows — no per-column jobs).
  */
object SchemaInduce {

  def induce(df: DataFrame): DataFrame = {
    val fields = df.schema.fields.toSeq
    val aggs = count(lit(1)).as("__total") +:
      fields.map(f => count(col(f.name)).as(s"__n_${f.name}"))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = fields.map { f =>
      val (dtype, multivalued) = f.dataType match {
        case ArrayType(et, _) => (et.simpleString, true)
        case dt => (dt.simpleString, false)
      }
      struct(
        lit(f.name).as("column"),
        lit(dtype).as("dtype"),
        lit(multivalued).as("multivalued"),
        (col("__total") > col(s"__n_${f.name}")).as("has_nulls"),
        col(s"__n_${f.name}").as("n_nonnull"))
    }
    one.select(explode(array(entries: _*)).as("e"))
      .select("e.*")
      .orderBy("column")
  }

  /** Duck oracle: expected dtype/multivalued are pinned constants (they
    * are deterministic for a fixed table); the observed stats are
    * recomputed independently.
    */
  def oracleSql(table: String, expected: Seq[(String, String, Boolean)]): String =
    expected.sortBy(_._1).map { case (name, dtype, mv) =>
      s"""SELECT '$name' AS "column", '$dtype' AS dtype, $mv AS multivalued,
         |  count(*) - count($name) > 0 AS has_nulls, count($name) AS n_nonnull
         |FROM $table""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
}
