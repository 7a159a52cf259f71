package graft.query

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}

class FacetsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df: DataFrame = Seq(
    ("F", "HIGH", 10.0, Seq("a", "b")),
    ("F", "LOW", 20.0, Seq("a")),
    ("O", "HIGH", 30.0, Seq("b", "c")),
    ("O", "HIGH", 40.0, Seq.empty[String]),
    ("P", "LOW", 50.0, Seq("c"))
  ).toDF("status", "prio", "price", "tags")

  private def rows(d: DataFrame): Seq[Seq[Any]] =
    d.collect().toSeq.map(_.toSeq)

  test("single-column facet counts, ordered count DESC then value") {
    rows(Facets.facetCounts(df, Filter.True, "status")) shouldBe
      Seq(Seq("F", 2L), Seq("O", 2L), Seq("P", 1L))
  }

  test("facet-column conditions are excluded from the where") {
    // where status='F' AND price>15: status condition must NOT constrain
    // the status facet, but price>15 must.
    val f = Filter.eq("status", "F") && Filter.gt("price", 15.0)
    rows(Facets.facetCounts(df, f, "status")) shouldBe
      Seq(Seq("O", 2L), Seq("F", 1L), Seq("P", 1L))
  }

  test("array column facet unnests and drops empty arrays") {
    rows(Facets.facetCounts(df, Filter.True, "tags")) shouldBe
      Seq(Seq("a", 2L), Seq("b", 2L), Seq("c", 2L))
  }

  test("tuple facet counts") {
    val r = rows(Facets.facetCountsTuple(df, Filter.True, Seq("status", "prio")))
    r.head shouldBe Seq("O", "HIGH", 2L)
    r.size shouldBe 4
  }

  test("batched facets equal per-column facets (scalar + array)") {
    val batched = Facets.facetCountsBatched(df, Filter.True, Seq("status", "tags"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val singleStatus = Facets.facetCounts(df, Filter.True, "status")
      .collect().map(r => ("status", String.valueOf(r.get(0)), r.getLong(1))).toSet
    val singleTags = Facets.facetCounts(df, Filter.True, "tags")
      .collect().map(r => ("tags", String.valueOf(r.get(0)), r.getLong(1))).toSet
    batched shouldBe (singleStatus ++ singleTags)
  }

  test("batched facets: constrained column gets its own exclusion pass") {
    val f = Filter.eq("status", "F") && Filter.gt("price", 15.0)
    val batched = Facets.facetCountsBatched(df, f, Seq("status", "prio"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // status counts exclude the status condition (price>15 only)
    batched should contain(("status", "O", 2L))
    batched should contain(("status", "F", 1L))
    // prio counts apply the FULL where (status='F' AND price>15 -> 1 row)
    batched should contain(("prio", "LOW", 1L))
  }

  test("null scalar values are counted as a null facet value") {
    val withNull = Seq(("F", Some("x")), ("O", None), ("P", None))
      .toDF("status", "opt")
    val r = Facets.facetCounts(withNull, Filter.True, "opt").collect()
    r.map(x => Option(x.get(0)) -> x.getLong(1)).toSet shouldBe
      Set(None -> 2L, Some("x") -> 1L)
    val batched = Facets.facetCountsBatched(withNull, Filter.True, Seq("opt"))
      .collect().map(x => Option(x.get(1)) -> x.getLong(2)).toSet
    batched shouldBe Set(None -> 2L, Some("x") -> 1L)
  }
}
