package graft.query

import graft.SparkSpec
import org.scalacheck.{Gen, rng}

/** Property test: for randomly generated filters, Spark's evaluation of
  * `Filter.toColumn` must agree cell-for-cell (including SQL
  * three-valued logic) with an independent in-memory evaluator. All
  * generated filters are checked in ONE Spark job (each filter becomes
  * a boolean projection column).
  */
case class FilterPropRow(id: Int, a: Option[Int], b: String)

class FilterPropertySpec extends SparkSpec {
  import spark.implicits._

  private type R = FilterPropRow
  private val R = FilterPropRow

  private val rows: Seq[R] =
    (0 until 40).map { i =>
      R(i, if (i % 7 == 3) None else Some(i % 11 - 3), ("w" + (i % 5)) * (i % 3 + 1))
    }

  // --- independent 3VL evaluator -----------------------------------
  private def evalPred(p: Filter.Pred, r: R): Option[Boolean] = {
    import Filter.Op._
    def num: Option[Int] = p.field match {
      case "a" => r.a
      case "id" => Some(r.id)
      case _ => None
    }
    def str: Option[String] = if (p.field == "b") Some(r.b) else None
    p.op match {
      case Eq => if (p.field == "b") str.map(_ == p.value) else num.map(_ == p.value)
      case Ne => if (p.field == "b") str.map(_ != p.value) else num.map(_ != p.value)
      case Gt => num.map(_ > p.value.asInstanceOf[Int])
      case Gte => num.map(_ >= p.value.asInstanceOf[Int])
      case Lt => num.map(_ < p.value.asInstanceOf[Int])
      case Lte => num.map(_ <= p.value.asInstanceOf[Int])
      case In =>
        val vs = p.value.asInstanceOf[Seq[Any]]
        if (p.field == "b") str.map(vs.contains) else num.map(vs.contains)
      case Nin =>
        val vs = p.value.asInstanceOf[Seq[Any]]
        if (p.field == "b") str.map(v => !vs.contains(v)) else num.map(v => !vs.contains(v))
      case Exists =>
        val present = if (p.field == "b") true else num.isDefined
        Some(if (p.value == true) present else !present)
      case Between =>
        val Seq(lo: Int, hi: Int) = p.value.asInstanceOf[Seq[Any]]
        num.map(v => v >= lo && v <= hi)
      case other => fail(s"unexpected op in generator: $other")
    }
  }

  private def eval(f: Filter, r: R): Option[Boolean] = f match {
    case Filter.True => Some(true)
    case p: Filter.Pred => evalPred(p, r)
    case Filter.And(ps) =>
      val es = ps.map(eval(_, r))
      if (es.contains(Some(false))) Some(false)
      else if (es.forall(_ == Some(true))) Some(true)
      else None
    case Filter.Or(ps) =>
      val es = ps.map(eval(_, r))
      if (es.contains(Some(true))) Some(true)
      else if (es.forall(_ == Some(false))) Some(false)
      else None
    case Filter.Not(p) => eval(p, r).map(!_)
  }

  // --- filter generator --------------------------------------------
  private val genNumPred: Gen[Filter] = for {
    field <- Gen.oneOf("a", "id")
    v <- Gen.choose(-5, 12)
    op <- Gen.oneOf[Any](Filter.Op.Eq, Filter.Op.Ne, Filter.Op.Gt, Filter.Op.Gte,
      Filter.Op.Lt, Filter.Op.Lte)
  } yield Filter.Pred(field, op.asInstanceOf[Filter.Op], v)

  private val genSpecial: Gen[Filter] = Gen.oneOf(
    for { vs <- Gen.nonEmptyListOf(Gen.choose(-5, 12)) }
      yield Filter.Pred("a", Filter.Op.In, vs.toSeq),
    for { vs <- Gen.nonEmptyListOf(Gen.choose(-5, 12)) }
      yield Filter.Pred("a", Filter.Op.Nin, vs.toSeq),
    for { b <- Gen.oneOf(true, false) } yield Filter.Pred("a", Filter.Op.Exists, b),
    for { lo <- Gen.choose(-5, 5); d <- Gen.choose(0, 8) }
      yield Filter.Pred("a", Filter.Op.Between, Seq(lo, lo + d)),
    for { s <- Gen.oneOf("w0", "w1w1", "w2", "zzz") }
      yield Filter.Pred("b", Filter.Op.Eq, s))

  private def genFilter(depth: Int): Gen[Filter] =
    if (depth <= 0) Gen.frequency(3 -> genNumPred, 2 -> genSpecial)
    else Gen.frequency(
      3 -> genNumPred,
      2 -> genSpecial,
      2 -> Gen.listOfN(2, genFilter(depth - 1)).map(Filter.And(_)),
      2 -> Gen.listOfN(2, genFilter(depth - 1)).map(Filter.Or(_)),
      1 -> genFilter(depth - 1).map(Filter.Not(_)))

  test("spark evaluation of 200 random filters matches the 3VL evaluator") {
    val params = Gen.Parameters.default
    val filters: Seq[Filter] = (0 until 200).flatMap { i =>
      genFilter(3).apply(params, rng.Seed(i.toLong))
    }
    filters.size should be >= 190 // generator rarely fails

    val df = rows.toDF()
    val cols = org.apache.spark.sql.functions.col("id") +:
      filters.zipWithIndex.map { case (f, i) => f.toColumn.as(s"f$i") }
    val got = df.select(cols: _*).collect()
      .map(r => r.getInt(0) -> r).toMap

    for ((f, i) <- filters.zipWithIndex; r <- rows) {
      val sparkCell = {
        val row = got(r.id)
        if (row.isNullAt(i + 1)) None else Some(row.getBoolean(i + 1))
      }
      val expected = eval(f, r)
      withClue(s"filter #$i $f on row $r: ") { sparkCell shouldBe expected }
    }
  }
}
