package graft.query

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Mongo-style filter semantics, compiled to Catalyst [[Column]] predicates.
  *
  * Mirrors the where-clause language of the reference engine
  * (reference: src/linkml_store/utils/query_utils.py:4-13 — `$eq $ne $gt
  * $gte $lt $lte $in $nin`, nested `a.b.c` paths, implicit AND across
  * keys), but compiles declaratively into the Spark plan so predicate
  * pushdown / partition pruning stay free. Matching follows the
  * reference's SQL backend (reference:
  * src/linkml_store/utils/sql_utils.py:35-80): `$ne` on a NULL value
  * does not match (SQL three-valued logic), unlike the in-memory Python
  * matcher.
  *
  * Extensions beyond the reference: `$or`, `$and`, `$not`, `$exists`,
  * `$regex`, `$contains` (array membership), `$between`.
  */
sealed trait Filter {
  def toColumn: Column
  def &&(other: Filter): Filter = Filter.And(Seq(this, other))
  def ||(other: Filter): Filter = Filter.Or(Seq(this, other))
  def unary_! : Filter = Filter.Not(this)

  /** Column names this filter constrains at top level (used by facet
    * queries, which must exclude conditions on the facet column itself —
    * reference: src/linkml_store/utils/sql_utils.py:110-117).
    */
  def fields: Set[String]

  /** Remove all conditions that constrain `field`; used by facets. */
  def without(field: String): Option[Filter]
}

object Filter {

  /** Always-true filter (empty where clause). */
  case object True extends Filter {
    def toColumn: Column = lit(true)
    def fields: Set[String] = Set.empty
    def without(field: String): Option[Filter] = Some(this)
  }

  final case class Pred(field: String, op: Op, value: Any) extends Filter {
    def toColumn: Column = op.compile(col(field), value)
    def fields: Set[String] = Set(field)
    def without(f: String): Option[Filter] = if (f == field) None else Some(this)
  }

  final case class And(parts: Seq[Filter]) extends Filter {
    def toColumn: Column = parts.map(_.toColumn).reduceOption(_ && _).getOrElse(lit(true))
    def fields: Set[String] = parts.flatMap(_.fields).toSet
    def without(f: String): Option[Filter] = {
      val kept = parts.flatMap(_.without(f))
      if (kept.isEmpty) None else Some(And(kept))
    }
  }

  final case class Or(parts: Seq[Filter]) extends Filter {
    def toColumn: Column = parts.map(_.toColumn).reduceOption(_ || _).getOrElse(lit(false))
    def fields: Set[String] = parts.flatMap(_.fields).toSet
    // An OR mentioning the excluded field is dropped ENTIRELY — the
    // logical substitution semantics: replacing the excluded predicate
    // with `true` makes the whole disjunction true, so conditions on
    // OTHER fields inside the same $or stop constraining the facet
    // counts. This deliberately broadens the result (documented
    // divergence; the reference's where-exclusion is only defined for
    // flat conjunctions — reference: src/linkml_store/utils/
    // sql_utils.py:110-117).
    def without(f: String): Option[Filter] = if (fields.contains(f)) None else Some(this)
  }

  final case class Not(part: Filter) extends Filter {
    def toColumn: Column = !part.toColumn
    def fields: Set[String] = part.fields
    def without(f: String): Option[Filter] = if (fields.contains(f)) None else Some(this)
  }

  sealed trait Op { def compile(c: Column, v: Any): Column }
  object Op {
    case object Eq extends Op { def compile(c: Column, v: Any): Column = c === lit(v) }
    case object Ne extends Op { def compile(c: Column, v: Any): Column = c =!= lit(v) }
    case object Gt extends Op { def compile(c: Column, v: Any): Column = c > lit(v) }
    case object Gte extends Op { def compile(c: Column, v: Any): Column = c >= lit(v) }
    case object Lt extends Op { def compile(c: Column, v: Any): Column = c < lit(v) }
    case object Lte extends Op { def compile(c: Column, v: Any): Column = c <= lit(v) }
    case object In extends Op {
      def compile(c: Column, v: Any): Column = c.isin(seqOf(v): _*)
    }
    case object Nin extends Op {
      def compile(c: Column, v: Any): Column = !c.isin(seqOf(v): _*)
    }
    /** `$in` on an ARRAY column: any-element membership (reference's
      * in-memory matcher accepts list-valued fields — reference:
      * src/linkml_store/utils/query_utils.py MONGO_OPERATORS). Selected
      * by [[Filter.bind]] when the schema says the column is an array.
      */
    case object AnyIn extends Op {
      def compile(c: Column, v: Any): Column =
        arrays_overlap(c, array(seqOf(v).map(lit): _*))
    }
    case object Exists extends Op {
      def compile(c: Column, v: Any): Column =
        if (v == true) c.isNotNull else c.isNull
    }
    case object Regex extends Op {
      def compile(c: Column, v: Any): Column = c.rlike(v.toString)
    }
    /** Array column contains the given scalar. */
    case object Contains extends Op {
      def compile(c: Column, v: Any): Column = array_contains(c, v)
    }
    case object Between extends Op {
      def compile(c: Column, v: Any): Column = v match {
        case (lo, hi) => c >= lit(lo) && c <= lit(hi)
        case s: Seq[_] if s.size == 2 => c >= lit(s(0)) && c <= lit(s(1))
        case other => throw new IllegalArgumentException(s"$$between needs (min,max), got $other")
      }
    }

    val byName: Map[String, Op] = Map(
      "$eq" -> Eq, "$ne" -> Ne, "$gt" -> Gt, "$gte" -> Gte, "$lt" -> Lt,
      "$lte" -> Lte, "$in" -> In, "$nin" -> Nin, "$exists" -> Exists,
      "$regex" -> Regex, "$contains" -> Contains, "$between" -> Between)
  }

  /** Schema-aware rebind: swap `$in`/`$nin` on ArrayType columns to
    * any-element membership semantics. Called by Collection.find, which
    * knows the DataFrame schema; the plain `toColumn` path (schemaless)
    * keeps scalar semantics.
    */
  def bind(f: Filter, schema: org.apache.spark.sql.types.StructType): Filter = {
    def isArray(field: String): Boolean =
      schema.find(_.name == field).exists(_.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
    f match {
      case Pred(field, Op.In, v) if isArray(field) => Pred(field, Op.AnyIn, v)
      case Pred(field, Op.Nin, v) if isArray(field) => Not(Pred(field, Op.AnyIn, v))
      case And(ps) => And(ps.map(bind(_, schema)))
      case Or(ps) => Or(ps.map(bind(_, schema)))
      case Not(p) => Not(bind(p, schema))
      case other => other
    }
  }

  private def seqOf(v: Any): Seq[Any] = v match {
    case s: Seq[_] => s
    case a: Array[_] => a.toSeq
    case other => Seq(other)
  }

  /** Parse a Mongo-style where map, e.g.
    * `Map("name" -> "foo", "age" -> Map("$gte" -> 25, "$lt" -> 40))`.
    * Keys starting with `$` at the top level are logical connectives
    * (`$or`, `$and`, `$not`) taking a list of sub-maps.
    */
  def parse(where: Map[String, Any]): Filter = {
    if (where == null || where.isEmpty) return True
    val parts: Seq[Filter] = where.toSeq.map {
      case ("$or", vs) => Or(subMaps(vs).map(parse))
      case ("$and", vs) => And(subMaps(vs).map(parse))
      case ("$not", v: Map[_, _]) => Not(parse(v.asInstanceOf[Map[String, Any]]))
      case (field, ops: Map[_, _]) if ops.keys.exists(_.toString.startsWith("$")) =>
        And(ops.asInstanceOf[Map[String, Any]].toSeq.map { case (opName, v) =>
          val op = Op.byName.getOrElse(opName,
            throw new IllegalArgumentException(s"Unsupported operator: $opName"))
          Pred(field, op, v): Filter
        })
      case (field, nested: Map[_, _]) =>
        // nested object condition: {a: {b: 1}} == {"a.b": 1}
        parse(nested.asInstanceOf[Map[String, Any]].map { case (k, v) => s"$field.$k" -> v })
      case (field, value) => Pred(field, Op.Eq, value)
    }
    if (parts.size == 1) parts.head else And(parts)
  }

  private def subMaps(v: Any): Seq[Map[String, Any]] = v match {
    case s: Seq[_] => s.map(_.asInstanceOf[Map[String, Any]])
    case other => throw new IllegalArgumentException(s"Expected list of maps, got $other")
  }

  def eq(field: String, v: Any): Filter = Pred(field, Op.Eq, v)
  def ne(field: String, v: Any): Filter = Pred(field, Op.Ne, v)
  def gt(field: String, v: Any): Filter = Pred(field, Op.Gt, v)
  def gte(field: String, v: Any): Filter = Pred(field, Op.Gte, v)
  def lt(field: String, v: Any): Filter = Pred(field, Op.Lt, v)
  def lte(field: String, v: Any): Filter = Pred(field, Op.Lte, v)
  def in(field: String, vs: Seq[Any]): Filter = Pred(field, Op.In, vs)
  def nin(field: String, vs: Seq[Any]): Filter = Pred(field, Op.Nin, vs)
}
