package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Collection diff / patch — the engine analog of the reference's
  * patches_from_objects_lists / apply_patches_to_keyed_list (reference:
  * src/linkml_store/utils/patch_utils.py:13-117, JSON-Patch on keyed
  * object lists, driver-side). Re-expressed as one full-outer join by
  * primary key; field-level comparison is null-safe and patch values are
  * carried as strings (cast back on apply using the target schema).
  *
  * Patch rows: (op, key, field, value)
  *  - remove:  key present in src only              (field/value null)
  *  - add:     key present in dst only — one row per column
  *  - replace: key in both, field value changed — one row per changed column
  *
  * Invariant (spec-checked): applyPatches(src, diff(src, dst)) == dst.
  */
object Diff {

  def diff(src: DataFrame, dst: DataFrame, pk: String): DataFrame = {
    require(src.columns.sorted.sameElements(dst.columns.sorted),
      "diff requires identical column sets")
    val cols = src.columns.filterNot(_ == pk).toSeq
    val s = src.select(col(pk).cast("string").as("__k"),
      struct(cols.map(col): _*).as("__s"))
    val d = dst.select(col(pk).cast("string").as("__k"),
      struct(cols.map(col): _*).as("__d"))
    val j = s.join(d, Seq("__k"), "full_outer")

    val removes = j.filter(col("__d").isNull && col("__s").isNotNull)
      .select(lit("remove").as("op"), col("__k").as("key"),
        lit(null).cast("string").as("field"), lit(null).cast("string").as("value"))

    val addFields = cols.map(c =>
      struct(lit(c).as("field"), col(s"__d.$c").cast("string").as("value")))
    val adds = j.filter(col("__s").isNull && col("__d").isNotNull)
      .select(col("__k"), explode(array(addFields: _*)).as("fv"))
      .select(lit("add").as("op"), col("__k").as("key"),
        col("fv.field"), col("fv.value"))

    val changedFields = cols.map(c =>
      when(!(col(s"__s.$c") <=> col(s"__d.$c")),
        struct(lit(c).as("field"), col(s"__d.$c").cast("string").as("value"))))
    val replaces = j.filter(col("__s").isNotNull && col("__d").isNotNull)
      .select(col("__k"), explode(filter(array(changedFields: _*), _.isNotNull)).as("fv"))
      .select(lit("replace").as("op"), col("__k").as("key"),
        col("fv.field"), col("fv.value"))

    removes.union(adds).union(replaces).orderBy("key", "op", "field")
  }

  /** Apply a patch set produced by [[diff]] back onto `src`. Values are
    * cast from their string carrier to the source column types. Pivot
    * widths are bounded by the column count, so the plan stays a
    * key-local join + union — no driver loop.
    */
  def applyPatches(src: DataFrame, patches: DataFrame, pk: String): DataFrame = {
    val cols = src.columns.filterNot(_ == pk).toSeq
    val typeOf = src.schema.map(f => f.name -> f.dataType).toMap
    val srcKey = col(pk).cast("string")

    val removeKeys = patches.filter(col("op") === "remove" || col("op") === "replace")
      .select(col("key")).distinct()
    // replace keys are NOT removed; keep them, they get patched below
    val dropKeys = patches.filter(col("op") === "remove").select(col("key")).distinct()
    val afterRemove = src.join(dropKeys, srcKey === dropKeys("key"), "left_anti")

    // wrap values in a struct so "patched to NULL" is distinguishable
    // from "not patched" after the pivot
    val repPvt = patches.filter(col("op") === "replace")
      .groupBy("key").pivot("field", cols)
      .agg(first(struct(col("value").as("v"))))
      .select(col("key").as("__pk") +: cols.map(c => col(c).as(s"__p_$c")): _*)
    val joined = afterRemove.join(repPvt, srcKey === col("__pk"), "left_outer")
    val replaced = joined.select(col(pk) +: cols.map { c =>
      val p = col(s"__p_$c")
      when(p.isNotNull, p.getField("v").cast(typeOf(c))).otherwise(col(c)).as(c)
    }: _*)

    val addPvt = patches.filter(col("op") === "add")
      .groupBy("key").pivot("field", cols).agg(first(col("value")))
    val added = addPvt.select(
      col("key").cast(typeOf(pk)).as(pk) +:
        cols.map(c => col(c).cast(typeOf(c)).as(c)): _*)

    replaced.unionByName(added)
  }
}
