package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class ObjectPathsSpec extends SparkSpec {
  import spark.implicits._

  private def nestedDf = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      Row(1L, Row("alice", 30), Seq(Row("a", 1), Row("b", 2))),
      Row(2L, Row("bob", 25), Seq(Row("c", 3))))),
    org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, who STRUCT<name: STRING, age: INT>, " +
      "tags ARRAY<STRUCT<k: STRING, v: INT>>"))

  test("pathGet walks dot and bracket segments") {
    val got = nestedDf.select(
      ObjectPaths.pathGet(col("who"), "name").as("n"),
      ObjectPaths.pathGet(col("tags"), "[0].k").as("k0"),
      ObjectPaths.pathGet(col("tags"), "[5].k").as("miss"))
      .as[(String, String, Option[String])].collect().toSeq.sortBy(_._1)
    got.head shouldBe ("alice", "a", None)
  }

  test("update an existing nested struct field") {
    val got = ObjectPaths.pathUpdate(nestedDf, "who.age", lit(99))
      .select($"id", $"who.age").as[(Long, Int)].collect().toMap
    got shouldBe Map(1L -> 99, 2L -> 99)
  }

  test("add a NEW struct field, scaffolding the remaining path") {
    val df = ObjectPaths.pathUpdate(nestedDf, "who.address.city", lit("oslo"))
    df.select($"who.address.city").as[String].collect().toSet shouldBe Set("oslo")
    // existing fields untouched
    df.select($"who.name").as[String].collect().toSet shouldBe Set("alice", "bob")
  }

  test("update an array element's field by index") {
    val got = ObjectPaths.pathUpdate(nestedDf, "tags[0].v", lit(42))
      .filter($"id" === 1L)
      .select($"tags").as[Seq[(String, Int)]].collect().head
    got shouldBe Seq(("a", 42), ("b", 2))
  }

  test("index past the end pads with typed nulls, reference-style") {
    val got = ObjectPaths.pathUpdate(nestedDf, "tags[2].v", lit(7))
      .filter($"id" === 2L)
      .select($"tags").collect().head.getSeq[Row](0)
    got.size shouldBe 3
    got(0) shouldBe Row("c", 3)
    got(1) shouldBe null // padded slot stays a typed null
    got(2) shouldBe Row(null, 7) // fresh element carries only the set leaf
  }

  test("whole-column create mirrors the reference doctest") {
    // object_path_update({}, 'persons[0].foo.bar', 1)
    //   == {'persons': [{'foo': {'bar': 1}}]}
    val df = ObjectPaths.pathUpdate(Seq(1).toDF("x"), "persons[0].foo.bar", lit(1))
    val row = df.select($"persons"(0)("foo")("bar")).as[Int].collect().head
    row shouldBe 1
  }

  test("flatten expands nested structs to dotted columns, doctest-style") {
    // pandas_utils doctest: {'a': 1, 'b': {'c': 2, 'd': {'e': 3}}}
    //   -> {'a': 1, 'b.c': 2, 'b.d.e': 3}
    val df = spark.sql("SELECT 1 AS a, named_struct('c', 2, 'd', named_struct('e', 3)) AS b")
    val flat = ObjectPaths.flatten(df)
    flat.columns.toSeq shouldBe Seq("a", "b.c", "b.d.e")
    flat.as[(Int, Int, Int)].collect().head shouldBe ((1, 2, 3))
    // arrays pass through untouched
    val withArr = ObjectPaths.flatten(nestedDf)
    withArr.columns.toSeq shouldBe Seq("id", "who.name", "who.age", "tags")
  }

  test("scalar array element set with pad") {
    val df = Seq((1, Seq(10, 20))).toDF("id", "xs")
    val got = ObjectPaths.pathUpdate(df, "xs[3]", lit(99))
      .select($"xs").as[Seq[Option[Int]]].collect().head
    got shouldBe Seq(Some(10), Some(20), None, Some(99))
  }

  test("malformed segment with interior text is rejected, not misparsed") {
    // 'a[1]b[2]' must error — the old parser dropped the 'b' and
    // updated a[1][2] instead
    val df = Seq((1, Seq(Seq(10)))).toDF("id", "a")
    an[IllegalArgumentException] should be thrownBy
      ObjectPaths.pathUpdate(df, "a[1]b[2]", lit(9))
  }

  test("non-matching rows keep a NULL array (not rewritten to empty)") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, Seq(1, 2)), Row(2L, null))),
      org.apache.spark.sql.types.StructType.fromDDL(
        "id BIGINT, xs ARRAY<INT>"))
    val got = ObjectPaths.pathUpdate(df, "xs[0]", lit(9), where = col("id") === 1L)
      .select($"id", $"xs").as[(Long, Option[Seq[Option[Int]]])]
      .collect().toMap
    got(1L) shouldBe Some(Seq(Some(9), Some(2)))
    got(2L) shouldBe None // null stays null — the contract for untouched rows
  }

  test("NULL where-predicate rows are untouched (no pad, no rewrite)") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "x", Seq(1)), Row(2L, null, Seq(2)))),
      org.apache.spark.sql.types.StructType.fromDDL(
        "id BIGINT, tag STRING, xs ARRAY<INT>"))
    // where = (tag = 'x') is NULL for row 2 — it must keep xs = [2],
    // not get padded through three-valued-logic fallthrough
    val got = ObjectPaths.pathUpdate(df, "xs[1]", lit(9), where = col("tag") === "x")
      .select($"id", $"xs").as[(Long, Seq[Option[Int]])].collect().toMap
    got(1L) shouldBe Seq(Some(1), Some(9))
    got(2L) shouldBe Seq(Some(2))
  }

  test("ADDING a new field to a NULL parent struct also scaffolds the container") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, Row("alice", 30)), Row(2L, null))),
      org.apache.spark.sql.types.StructType.fromDDL(
        "id BIGINT, who STRUCT<name: STRING, age: INT>"))
    // 'city' is NOT in the schema → the add-new-field branch; row 2's
    // null struct must materialize (existing fields null, city set)
    val got = ObjectPaths.pathUpdate(df, "who.city", lit("oslo"))
      .select($"id", $"who.name", $"who.city").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    got(1L) shouldBe ("alice", "oslo")
    got(2L) shouldBe (null, "oslo")
    // non-matching rows keep the null struct
    val miss = ObjectPaths.pathUpdate(df, "who.city", lit("oslo"), where = col("id") === 1L)
      .filter($"id" === 2L).select($"who").collect().head
    miss.isNullAt(0) shouldBe true
  }

  test("leaf set on a NULL parent struct scaffolds the container where matched") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, Row("alice", 30)), Row(2L, null))),
      org.apache.spark.sql.types.StructType.fromDDL(
        "id BIGINT, who STRUCT<name: STRING, age: INT>"))
    val out = ObjectPaths.pathUpdate(df, "who.age", lit(99))
    val got = out.select($"id", $"who").collect()
      .map(r => r.getLong(0) -> r.getStruct(1)).toMap
    got(1L) shouldBe Row("alice", 99)
    got(2L) shouldBe Row(null, 99) // reference scaffolds {} then sets the leaf
    // ... but NOT where the predicate misses: the null struct survives
    val miss = ObjectPaths.pathUpdate(df, "who.age", lit(99), where = col("id") === 1L)
      .filter($"id" === 2L).select($"who").collect().head
    miss.isNullAt(0) shouldBe true
  }
}
