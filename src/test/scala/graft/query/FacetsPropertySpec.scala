package graft.query

import graft.SparkSpec
import org.scalacheck.{Gen, rng}

/** Property: for random where-filters, the batched multi-facet result
  * must equal the per-column facet results (same counts, same
  * exclusion semantics), and every facet count must equal a direct
  * filtered count.
  */
class FacetsPropertySpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = (0 until 300).map { i =>
    (s"s${i % 4}", s"p${i % 7}", (i * 13 % 50).toDouble, i)
  }.toDF("status", "prio", "price", "id")

  private val genWhere: Gen[Filter] = Gen.oneOf(
    Gen.const(Filter.True),
    Gen.choose(0, 3).map(i => Filter.eq("status", s"s$i")),
    Gen.choose(0.0, 50.0).map(v => Filter.gt("price", v)),
    for { i <- Gen.choose(0, 3); v <- Gen.choose(0.0, 50.0) }
      yield Filter.eq("status", s"s$i") && Filter.gt("price", v),
    for { i <- Gen.choose(0, 6); v <- Gen.choose(0.0, 50.0) }
      yield Filter.eq("prio", s"p$i") && Filter.lte("price", v))

  test("batched facets equal per-column facets under 25 random wheres") {
    val params = Gen.Parameters.default
    val wheres = (0 until 25).flatMap(i => genWhere(params, rng.Seed(i.toLong)))
    for (w <- wheres) {
      val batched = Facets.facetCountsBatched(df, w, Seq("status", "prio"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      val perCol = Seq("status", "prio").flatMap { c =>
        Facets.facetCounts(df, w, c)
          .collect().map(r => (c, String.valueOf(r.get(0)), r.getLong(1)))
      }.toSet
      withClue(s"where=$w: ") { batched shouldBe perCol }
      // each count is a direct filtered count with the exclusion applied
      for ((field, value, cnt) <- batched) {
        val eff = w.without(field).getOrElse(Filter.True)
        val direct = df.filter(eff.toColumn)
          .filter(org.apache.spark.sql.functions.col(field) === value).count()
        withClue(s"where=$w facet=$field=$value: ") { cnt shouldBe direct }
      }
    }
  }
}
