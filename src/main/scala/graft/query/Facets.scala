package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType

/** Faceted counting, re-expressed for Spark scale.
  *
  * Semantics follow the reference (reference:
  * src/linkml_store/utils/sql_utils.py:110-146): for each facet column,
  * count distinct values with the base where applied — EXCEPT any
  * conditions on the facet column itself, which are removed so the user
  * sees counts for all values of that column; multivalued (array)
  * columns are unnested first; results ordered by count DESC with a
  * limit (default 100, reference:
  * src/linkml_store/api/collection.py:52).
  *
  * Scale design: the reference issues one GROUP BY query per facet
  * column (N scans of the table). Here, every facet column whose
  * conditions are NOT constrained by the where clause shares ONE
  * scan + ONE shuffle: values are packed into an array of
  * (field, value) structs, exploded, and counted grouped by
  * (field, value). Only columns that actually need where-exclusion run
  * as separate passes. At 100 TB this is 1 scan instead of N.
  */
object Facets {

  /** Facet counts for one column. Returns DataFrame(value, count). */
  def facetCounts(
      df: DataFrame,
      where: Filter,
      facetCol: String,
      limit: Int = 100): DataFrame = {
    val effWhere = where.without(facetCol).getOrElse(Filter.True)
    val base = df.filter(effWhere.toColumn)
    val isArray = df.schema.find(_.name == facetCol).exists(_.dataType.isInstanceOf[ArrayType])
    val src = if (isArray) base.select(explode(col(facetCol)).as(facetCol)) else base
    src
      .groupBy(col(facetCol))
      .agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc, col(facetCol).asc_nulls_last)
      .limit(limit)
  }

  /** Facet counts for a tuple of columns (compound facet).
    * Returns DataFrame(col1, ..., colN, count).
    */
  def facetCountsTuple(
      df: DataFrame,
      where: Filter,
      facetCols: Seq[String],
      limit: Int = 100): DataFrame = {
    val eff = facetCols.foldLeft(Option(where): Option[Filter]) {
      case (acc, c) => acc.flatMap(_.without(c))
    }.getOrElse(Filter.True)
    df.filter(eff.toColumn)
      .groupBy(facetCols.map(col): _*)
      .agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc +: facetCols.map(c => col(c).asc_nulls_last): _*)
      .limit(limit)
  }

  /** Batched facet counts over many columns in (at most) two passes.
    * Returns DataFrame(facet_field, facet_value, count) with values cast
    * to string. Columns constrained by `where` each get their own pass
    * (where-exclusion); all others share a single explode pass.
    */
  def facetCountsBatched(
      df: DataFrame,
      where: Filter,
      facetCols: Seq[String],
      limitPerFacet: Int = 100): DataFrame = {
    val (constrained, free) = facetCols.partition(where.fields.contains)

    // per-facet top-N via the salted two-phase window: facet_field is
    // LOW-cardinality (one partition per facet would sort every
    // distinct value of that facet in one task — unbounded for id-like
    // facet columns at scale); output is identical to the plain window
    // because the (count desc, value asc) order is total per facet
    def ranked(counts: DataFrame): DataFrame =
      graft.ops.WindowOps.topKPerGroup(counts, Seq("facet_field"),
        Seq(col("count").desc, col("facet_value").asc_nulls_last),
        limitPerFacet, rankCol = "__rank").drop("__rank")

    val freePart: Option[DataFrame] = if (free.isEmpty) None else {
      val pairs = free.map { c =>
        val isArray = df.schema.find(_.name == c).exists(_.dataType.isInstanceOf[ArrayType])
        val valueCol = if (isArray) col(c).cast("array<string>")
                       else array(col(c).cast("string"))
        struct(lit(c).as("f"), valueCol.as("vs"))
      }
      // Plain explode (not explode_outer): null/empty ARRAYS drop out,
      // matching the single-column facetCounts (and SQL UNNEST); null
      // SCALAR values survive because the scalar path wraps them as a
      // one-element array whose element is null.
      Some(
        df.filter(where.toColumn)
          .select(explode(array(pairs: _*)).as("p"))
          .select(col("p.f").as("facet_field"), explode(col("p.vs")).as("facet_value"))
          .groupBy(col("facet_field"), col("facet_value"))
          .agg(count(lit(1)).as("count")))
    }
    val constrainedParts: Seq[DataFrame] = constrained.map { c =>
      facetCounts(df, where, c, Int.MaxValue)
        .select(lit(c).as("facet_field"), col(c).cast("string").as("facet_value"), col("count"))
    }
    val all = (freePart.toSeq ++ constrainedParts).reduce(_ unionByName _)
    ranked(all).orderBy(col("facet_field"), col("count").desc, col("facet_value").asc_nulls_last)
  }
}
