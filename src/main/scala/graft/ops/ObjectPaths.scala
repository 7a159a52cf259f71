package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Path-based access and update of nested columns — the Spark analog of
  * the reference's dot/bracket object paths (reference:
  * src/linkml_store/utils/object_utils.py object_path_update /
  * object_path_get, the engine behind CLI `update --set a[0].b.c=v`).
  *
  * Paths use the reference's notation: `a[0].b.c` = field `a`, element
  * 0 (0-based, like the reference), field `b`, field `c`.
  *
  * Spark adaptation (schemas are typed, rows are immutable):
  *  - struct fields update in place via `withField`; a MISSING struct
  *    field is ADDED, with any remaining path materialized as fresh
  *    nested structs (the reference's setdefault-chain).
  *  - array elements update via `transform` with an index match; an
  *    index past the end PADS the array with typed nulls (the
  *    reference pads with `{}`), and a null/missing element being
  *    descended into is rebuilt as a fresh struct.
  *  - everything is a pure Column expression — one projection, no
  *    driver round-trip, vectorizes over the whole DataFrame (the
  *    reference deep-copies one object at a time).
  */
object ObjectPaths {

  private sealed trait Seg
  private final case class Field(name: String) extends Seg
  private final case class Index(i: Int) extends Seg

  /** "a[0].b" → [Field(a), Index(0), Field(b)]; bare "[1]" segments and
    * multi-index "a[0][1]" are accepted.
    */
  private def parse(path: String): List[Seg] =
    path.split('.').toList.flatMap { part =>
      val open = part.indexOf('[')
      if (open < 0) List(Field(part))
      else {
        val head = part.substring(0, open)
        val ms = "\\[(\\d+)\\]".r.findAllMatchIn(part).toList
        val idxs = ms.map(m => Index(m.group(1).toInt))
        // the segment must be EXACTLY head + concatenated [n] groups —
        // interior text ("a[1]b[2]") would otherwise be silently
        // dropped and the update land on the wrong location
        require(idxs.nonEmpty && head + ms.map(_.matched).mkString == part,
          s"malformed path segment '$part'")
        (if (head.nonEmpty) List(Field(head)) else Nil) ::: idxs
      }
    }

  /** The value at `path` under `root` (null where the path misses). */
  def pathGet(root: Column, path: String): Column =
    parse(path).foldLeft(root) { (acc, seg) =>
      seg match {
        case Field(n) => acc.getField(n)
        // 1-based; try_ variant: a missing index is a null, not an
        // ANSI out-of-bounds error
        case Index(i) => try_element_at(acc, lit(i + 1))
      }
    }

  /** A fresh value of `dt` carrying only `segs := value`; everything
    * else is a typed null (the reference's `{}` scaffolding).
    */
  private def fresh(segs: List[Seg], value: Column, dt: DataType): Column =
    (segs, dt) match {
      case (Nil, _) => value.cast(dt)
      case (Field(n) :: rest, st: StructType) =>
        val idx = st.fieldIndex(n) // throws on a path the schema can't hold
        struct(st.fields.zipWithIndex.map { case (f, i) =>
          val v = if (i == idx) fresh(rest, value, f.dataType)
            else lit(null).cast(f.dataType)
          v.as(f.name)
        }.toSeq: _*)
      case (Index(i) :: rest, at: ArrayType) =>
        // [null × i, fresh]
        concat(
          array_repeat(lit(null).cast(at.elementType), i),
          array(fresh(rest, value, at.elementType)))
      case (seg :: _, other) =>
        throw new IllegalArgumentException(
          s"path segment $seg cannot descend into $other")
    }

  /** Scaffold the remaining path of a brand-new field from the value's
    * own shape (nulls everywhere but the leaf; non-matching rows get a
    * null leaf via the `where` guard).
    */
  private def scaffold(segs: List[Seg], value: Column, where: Column): Column =
    segs.foldRight(when(where, value)) { (seg, v) =>
      seg match {
        case Field(fn) => struct(v.as(fn))
        case Index(i) =>
          // [null × i, v] — nulls take v's type via the when
          transform(sequence(lit(0), lit(i)), j => when(j === i, v))
      }
    }

  /** The `where` guard applies at the LEAF (set vs keep-current), so a
    * path that widens the schema (new struct fields) still produces ONE
    * consistent column type for matching and non-matching rows alike.
    */
  private def updateCol(
      cur: Column, dt: DataType, segs: List[Seg], value: Column,
      where: Column): Column =
    segs match {
      case Nil => when(where, value.cast(dt)).otherwise(cur)
      case Field(n) :: rest =>
        val st = dt match {
          case s: StructType => s
          case other => throw new IllegalArgumentException(
            s"field '$n' addressed under non-struct $other")
        }
        st.find(_.name == n) match {
          case Some(f) =>
            val inner = updateCol(cur.getField(n), f.dataType, rest, value, where)
            // a null CHILD struct being descended into is rebuilt fresh
            // (withField on null yields null) — but only where matched
            val updated =
              if (rest.isEmpty) cur.withField(n, inner)
              else cur.withField(n,
                when(cur.getField(n).isNull && where, fresh(rest, value, f.dataType))
                  .otherwise(inner))
            // ... and a null struct ITSELF (withField on a null parent
            // also yields null) materializes with just the addressed
            // path set where matched — leaf sets included, matching the
            // reference's setdefault-chain scaffolding
            when(cur.isNull && where, fresh(Field(n) :: rest, value, st))
              .otherwise(updated)
          case None =>
            // ADD a new field; remaining path materializes as fresh
            // structs of the value's own shape. A null struct ITSELF
            // needs the same rebuild as the Some branch (withField on a
            // null parent yields null): existing fields become typed
            // nulls, the new field carries the scaffold.
            val nullStruct = struct(st.fields.toSeq.map(f =>
              lit(null).cast(f.dataType).as(f.name)): _*)
            when(cur.isNull && where,
              nullStruct.withField(n, scaffold(rest, value, where)))
              .otherwise(cur.withField(n, scaffold(rest, value, where)))
        }
      case Index(i) :: rest =>
        val at = dt match {
          case a: ArrayType => a
          case other => throw new IllegalArgumentException(
            s"index [$i] addressed under non-array $other")
        }
        // null-array materialization and padding apply ONLY to rows the
        // update touches (where must be coalesced: a NULL predicate is a
        // non-match, and !where || … three-valued logic would otherwise
        // pad those rows) — every other row keeps its original value,
        // nulls included
        val matched = coalesce(where, lit(false))
        val base = when(matched, coalesce(cur, array().cast(at))).otherwise(cur)
        val needsPad = size(base) < i + 1
        val padded = when(matched && needsPad,
          concat(base, array_repeat(lit(null).cast(at.elementType),
            lit(i + 1) - size(base))))
          .otherwise(base)
        transform(padded, (x, j) => when(j === i,
          if (rest.isEmpty) when(where, value.cast(at.elementType)).otherwise(x)
          else when(x.isNull && where, fresh(rest, value, at.elementType))
            .otherwise(updateCol(x, at.elementType, rest, value, where)))
          .otherwise(x))
    }

  /** `df` with `path := value` in every row matching `where` (other
    * rows keep their original value; a brand-new root column is null
    * for them). Top-level columns are the path roots.
    */
  def pathUpdate(
      df: DataFrame,
      path: String,
      value: Column,
      where: Column = lit(true)): DataFrame = {
    val segs = parse(path)
    segs.head match {
      case Field(rootName) =>
        if (!df.schema.fieldNames.contains(rootName)) {
          // whole-column create, scaffolding the rest of the path; the
          // where guard nulls the LEAF for non-matching rows (wrapping
          // the whole scaffold would null the containers too)
          df.withColumn(rootName, scaffold(segs.tail, value, where))
        } else {
          val f = df.schema(rootName)
          df.withColumn(rootName,
            updateCol(col(rootName), f.dataType, segs.tail, value, where))
        }
      case other =>
        throw new IllegalArgumentException(s"path must start with a field, got $other")
    }
  }

  /** Flatten nested struct columns into dotted top-level columns
    * (reference: src/linkml_store/utils/pandas_utils.py flatten_dict /
    * nested_objects_to_dataframe — `{a: 1, b: {c: 2}}` → columns
    * `a, b.c`). Arrays and scalars pass through; one projection, no
    * data movement.
    */
  def flatten(df: DataFrame, sep: String = "."): DataFrame = {
    def expand(name: String, c: Column, dt: DataType): Seq[(String, Column)] =
      dt match {
        case st: StructType =>
          st.fields.toSeq.flatMap(f =>
            expand(s"$name$sep${f.name}", c.getField(f.name), f.dataType))
        case _ => Seq(name -> c)
      }
    val cols = df.schema.fields.toSeq.flatMap(f => expand(f.name, col(f.name), f.dataType))
    df.select(cols.map { case (n, c) => c.as(n) }: _*)
  }
}
