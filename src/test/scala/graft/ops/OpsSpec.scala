package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("schema induction reports dtype, multivalued, observed nulls") {
    val df = Seq(
      (1, Some("a"), Seq(1.0, 2.0)),
      (2, None, Seq.empty[Double])
    ).toDF("id", "tag", "scores")
    val r = SchemaInduce.induce(df).collect()
      .map(x => (x.getString(0), x.getString(1), x.getBoolean(2), x.getBoolean(3), x.getLong(4)))
    r shouldBe Array(
      ("id", "int", false, false, 2L),
      ("scores", "double", true, false, 2L),
      ("tag", "string", false, true, 1L))
  }

  test("induced class definition carries range/multivalued/inlined/required and round-trips") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, "a", Seq(1.0, 2.0),
          org.apache.spark.sql.Row("x", 1), Seq(org.apache.spark.sql.Row("y", 2))),
        org.apache.spark.sql.Row(2L, null, Seq(3.0),
          org.apache.spark.sql.Row("z", 3), Seq.empty[org.apache.spark.sql.Row]))),
      org.apache.spark.sql.types.StructType.fromDDL(
        "id BIGINT, tag STRING, scores ARRAY<DOUBLE>, " +
        "who STRUCT<name: STRING, n: INT>, kids ARRAY<STRUCT<k: STRING, v: INT>>"))
    val cd = SchemaInduce.induceClassDefinition(df, "Thing")
    cd.name shouldBe "Thing"
    val byName = cd.attributes.map(s => s.name -> s).toMap
    byName("id") shouldBe SchemaInduce.SlotDefinition("id", Some("integer"),
      multivalued = false, inlined = false, required = true)
    // observed null → not required (the reference's observation heuristic)
    byName("tag").required shouldBe false
    byName("tag").range shouldBe Some("string")
    byName("scores") shouldBe SchemaInduce.SlotDefinition("scores", Some("float"),
      multivalued = true, inlined = false, required = true)
    // nested object → inlined, no range (reference collection.py:1128)
    byName("who").inlined shouldBe true
    byName("who").range shouldBe None
    // list of objects → inlined_as_list
    byName("kids").multivalued shouldBe true
    byName("kids").inlinedAsList shouldBe true
    // the artifact is exportable: JSON round-trips to an equal value
    SchemaInduce.ClassDefinition.fromJson(cd.toJson) shouldBe cd
  }

  test("validate emits one violation row per broken rule, none for clean rows") {
    val df = Seq(
      (1, "F", 10.0, "1-URGENT"),
      (2, "X", -5.0, "9-BAD"),     // enum + range + pattern violations
      (3, null.asInstanceOf[String], 20.0, "2-HIGH") // required violation
    ).toDF("id", "status", "price", "prio")
    val r = Validate.validate(df, "id", Seq(
      Validate.Required("status"),
      Validate.Enum("status", Seq("F", "O")),
      Validate.Range("price", Some(0.0), None),
      Validate.Pattern("prio", "^[1-5]-")))
      .collect().map(x => (x.getInt(0), x.getString(1), x.getString(2)))
    // the violation stream is deliberately unordered (map-only op) —
    // sort here, not in the plan
    r.sortBy(identity) shouldBe Array(
      (2, "price", "range"),
      (2, "prio", "pattern"),
      (2, "status", "enum"),
      (3, "status", "required"))
  }

  private lazy val srcDf = Seq(
    (1, "alice", 30), (2, "bob", 25), (3, "carol", 41)
  ).toDF("id", "name", "age")
  private lazy val dstDf = Seq(
    (1, "alice", 31),          // replace age
    (3, "carol", 41),          // unchanged
    (4, "dave", 20)            // add
  ).toDF("id", "name", "age")  // 2/bob removed

  test("diff emits remove/add/replace patch rows") {
    val p = Diff.diff(srcDf, dstDf, "id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    p should contain(("remove", "2", null, null))
    p should contain(("replace", "1", "age", "31"))
    p should contain(("add", "4", "name", "dave"))
    p should contain(("add", "4", "age", "20"))
    // unchanged row contributes nothing
    p.exists(_._2 == "3") shouldBe false
  }

  test("applyPatches(src, diff(src, dst)) round-trips to dst") {
    val patches = Diff.diff(srcDf, dstDf, "id")
    val applied = Diff.applyPatches(srcDf, patches, "id")
      .orderBy("id").collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2)))
    val expected = dstDf.orderBy("id").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2)))
    applied shouldBe expected
  }

  test("applyPatches handles replace-to-null distinctly from not-patched") {
    val dst2 = Seq((1, null.asInstanceOf[String], 30), (2, "bob", 25), (3, "carol", 41))
      .toDF("id", "name", "age")
    val patches = Diff.diff(srcDf, dst2, "id")
    val applied = Diff.applyPatches(srcDf, patches, "id").orderBy("id").collect()
    applied(0).isNullAt(1) shouldBe true   // alice's name patched to null
    applied(0).getInt(2) shouldBe 30       // age untouched
  }

  test("describe reports NULL stats for an all-null column and handles decimals") {
    val df = Seq((Option.empty[Double], BigDecimal("1.50")),
      (Option.empty[Double], BigDecimal("2.50")))
      .toDF("empty", "dec")
    val rows = Describe.describe(df, Seq("empty", "dec")).collect()
      .map(r => r.getString(0) -> r).toMap
    val e = rows("empty")
    e.getAs[Long]("count") shouldBe 0
    e.isNullAt(e.fieldIndex("mean")) shouldBe true
    e.isNullAt(e.fieldIndex("min")) shouldBe true
    e.isNullAt(e.fieldIndex("max")) shouldBe true
    val d = rows("dec")
    d.getAs[Double]("mean") shouldBe 2.0
    d.getAs[Double]("p50") shouldBe 2.0
  }

  test("mutual information: ln(2) for identical balanced columns, ~0 for independent") {
    val df = Seq(
      ("a", "a", "x"), ("a", "a", "y"), ("b", "b", "x"), ("b", "b", "y")
    ).toDF("c1", "c2", "c3")
    val mi = graft.ops.Stats.mutualInfoPairs(df, Seq("c1", "c2", "c3"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    mi(("c1", "c2")) shouldBe (math.rint(math.log(2) * 1e4) / 1e4) // identical
    mi(("c1", "c3")) shouldBe 0.0 // independent by construction
    mi(("c2", "c3")) shouldBe 0.0
  }

  test("describe computes exact stats in one pass") {
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val r = Describe.describe(df, Seq("x")).collect().head
    r.getAs[Long]("count") shouldBe 4
    r.getAs[Double]("mean") shouldBe 2.5
    r.getAs[Double]("p50") shouldBe 2.5
    r.getAs[Double]("p25") shouldBe 1.75
    r.getAs[Double]("max") shouldBe 4.0
  }

  test("groupQuantiles interpolates quantile_cont semantics per group") {
    // group a: [10, 20, 30, 40] -> p50 = 25 (pos 1.5), p90 = 37 (pos 2.7)
    // group b: [5] -> p50 = p90 = 5 (single element, pos 0)
    val df = (Seq(("a", 10), ("a", 20), ("a", 30), ("a", 40), ("b", 5)))
      .toDF("g", "v")
    val rows = Describe.groupQuantiles(df, "g", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n"), r.getAs[Double]("p50"), r.getAs[Double]("p90")))).toMap
    rows("a") shouldBe ((4L, 25.0, 37.0))
    rows("b") shouldBe ((1L, 5.0, 5.0))
  }

  test("winsorizedMeans caps the outlier's pull while the raw mean moves") {
    // 99 values at 10.0 plus one 10000.0 outlier: raw mean ≈ 109.9,
    // winsorized mean stays ≈ 10 + the capped outlier's share
    val df = (Seq.fill(99)(10.0) :+ 10000.0).map(("g", _)).toDF("g", "v")
    val r = Describe.winsorizedMeans(df, "g", "v").collect().head
    r.getAs[Long]("n") shouldBe 100L
    r.getAs[Double]("mean_raw") shouldBe 109.9 +- 1e-6
    r.getAs[Double]("mean_winsor") shouldBe 10.0 +- 1e-9
    // degenerate caps (p05 == p95 == 10): the 99 ties clip low, only
    // the outlier clips high — categories stay disjoint
    r.getAs[Long]("n_lo") shouldBe 99L
    r.getAs[Long]("n_hi") shouldBe 1L
  }

  test("winsorizedMeans without outliers reproduces the raw mean") {
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("g", "v")
    val r = Describe.winsorizedMeans(df, "g", "v").collect().head
    r.getAs[Double]("mean_raw") shouldBe 50.5 +- 1e-9
    // clipping a symmetric uniform at symmetric caps keeps the mean
    r.getAs[Double]("mean_winsor") shouldBe 50.5 +- 0.2
  }
}
