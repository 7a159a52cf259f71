package graft.query

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Mongo-filter semantics, including the reference's SQL-backend
  * behaviors (3VL on $ne, implicit AND) — behavior source:
  * reference tests/test_api/test_collection.py + utils/query_utils.py.
  */
class FilterSpec extends SparkSpec {
  import spark.implicits._

  private lazy val people: DataFrame = Seq(
    (1, "alice", Some(30), "NYC", Seq("read", "ski")),
    (2, "bob", Some(25), "LA", Seq("surf")),
    (3, "carol", None, "NYC", Seq("read")),
    (4, "dave", Some(40), "SF", Seq.empty[String])
  ).toDF("id", "name", "age", "city", "hobbies")

  private def ids(f: Filter): Seq[Int] =
    people.filter(Filter.bind(f, people.schema).toColumn)
      .select("id").as[Int].collect().toSeq.sorted

  test("equality") { ids(Filter.eq("city", "NYC")) shouldBe Seq(1, 3) }

  test("range operators") {
    ids(Filter.gt("age", 25)) shouldBe Seq(1, 4)
    ids(Filter.gte("age", 25)) shouldBe Seq(1, 2, 4)
    ids(Filter.lt("age", 30)) shouldBe Seq(2)
    ids(Filter.lte("age", 30)) shouldBe Seq(1, 2)
  }

  test("$ne follows SQL three-valued logic: null never matches") {
    // carol has null age: $ne 30 does NOT return her (SQL semantics,
    // matching the reference's SQL backend, not its python matcher)
    ids(Filter.ne("age", 30)) shouldBe Seq(2, 4)
  }

  test("$in and $nin on scalar columns") {
    ids(Filter.in("city", Seq("NYC", "SF"))) shouldBe Seq(1, 3, 4)
    ids(Filter.nin("city", Seq("NYC", "SF"))) shouldBe Seq(2)
  }

  test("$in on an ARRAY column matches any-element membership via bind") {
    ids(Filter.in("hobbies", Seq("read"))) shouldBe Seq(1, 3)
    ids(Filter.in("hobbies", Seq("ski", "surf"))) shouldBe Seq(1, 2)
    ids(Filter.nin("hobbies", Seq("read"))) shouldBe Seq(2, 4)
  }

  test("implicit AND across keys") {
    ids(Filter.parse(Map("city" -> "NYC", "name" -> "alice"))) shouldBe Seq(1)
  }

  test("multiple operators on one field are ANDed") {
    ids(Filter.parse(Map("age" -> Map("$gte" -> 25, "$lt" -> 40)))) shouldBe Seq(1, 2)
  }

  test("$or / $and / $not composition") {
    ids(Filter.parse(Map("$or" -> Seq(
      Map("city" -> "LA"), Map("age" -> Map("$gt" -> 35)))))) shouldBe Seq(2, 4)
    ids(Filter.parse(Map("$and" -> Seq(
      Map("city" -> "NYC"), Map("age" -> Map("$gte" -> 30)))))) shouldBe Seq(1)
    ids(Filter.parse(Map("$not" -> Map("city" -> "NYC")))) shouldBe Seq(2, 4)
  }

  test("$between accepts Seq and Tuple2") {
    ids(Filter.parse(Map("age" -> Map("$between" -> Seq(25, 30))))) shouldBe Seq(1, 2)
    ids(Filter.parse(Map("age" -> Map("$between" -> ((25, 30)))))) shouldBe Seq(1, 2)
    an[IllegalArgumentException] should be thrownBy
      Filter.parse(Map("age" -> Map("$between" -> 25))).toColumn
  }

  test("$exists") {
    ids(Filter.parse(Map("age" -> Map("$exists" -> true)))) shouldBe Seq(1, 2, 4)
    ids(Filter.parse(Map("age" -> Map("$exists" -> false)))) shouldBe Seq(3)
  }

  test("$regex and $contains") {
    ids(Filter.parse(Map("name" -> Map("$regex" -> "^[ab]")))) shouldBe Seq(1, 2)
    ids(Filter.parse(Map("hobbies" -> Map("$contains" -> "read")))) shouldBe Seq(1, 3)
  }

  test("nested object condition equals dotted path") {
    val df = Seq((1, ("x", 5)), (2, ("y", 7))).toDF("id", "meta")
      .selectExpr("id", "named_struct('tag', meta._1, 'n', meta._2) AS meta")
    val f1 = Filter.parse(Map("meta" -> Map("tag" -> "x")))
    val f2 = Filter.parse(Map("meta.tag" -> "x"))
    df.filter(f1.toColumn).select("id").as[Int].collect() shouldBe Array(1)
    df.filter(f2.toColumn).select("id").as[Int].collect() shouldBe Array(1)
  }

  test("empty where matches everything") {
    ids(Filter.True) shouldBe Seq(1, 2, 3, 4)
    ids(Filter.parse(Map.empty)) shouldBe Seq(1, 2, 3, 4)
  }

  test("unsupported operator raises") {
    an[IllegalArgumentException] should be thrownBy
      Filter.parse(Map("age" -> Map("$weird" -> 1)))
  }

  test("without() removes only conditions on the given field") {
    val f = Filter.eq("city", "NYC") && Filter.gt("age", 20)
    val kept = f.without("city").get
    ids(kept) shouldBe Seq(1, 2, 4)
    // an OR mentioning the field is dropped entirely (documented broadening)
    val or = Filter.parse(Map("$or" -> Seq(
      Map("city" -> "NYC"), Map("age" -> Map("$gt" -> 35)))))
    or.without("city") shouldBe None
    // removing the only condition yields None => caller treats as True
    Filter.eq("city", "NYC").without("city") shouldBe None
  }
}
