package graft.text

import graft.SparkSpec
import graft.index.TrigramIndexer
import org.apache.spark.sql.functions._

class HashEmbedSpec extends SparkSpec {
  import spark.implicits._

  test("dense vector counts match the driver-side hash, norm is the L2 length") {
    val dim = 8
    val text = "spark spark query"
    val out = HashEmbed.embed(Seq((1L, text)).toDF("id", "text"), "id", "text", dim)
      .collect().head
    val expected = Array.fill(dim)(0)
    text.split(" ").foreach { t =>
      expected(math.floorMod(TrigramIndexer.hash60(t), dim.toLong).toInt) += 1
    }
    out.getSeq[Int](1) shouldBe expected.toSeq
    out.getInt(2) shouldBe 3
    val norm = math.sqrt(expected.map(c => c.toDouble * c).sum)
    out.getDouble(3) shouldBe (BigDecimal(norm).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("identical docs embed identically; different docs (usually) differ") {
    val out = HashEmbed.embed(
      Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z w")).toDF("id", "text"),
      "id", "text", dim = 16)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toMap
    out(1L) shouldBe out(2L)
    out(3L) should not be out(1L)
  }

  test("sparse twin carries the same mass as the dense vector") {
    val df = Seq((1L, "a b b c c c")).toDF("id", "text")
    val sparse = HashEmbed.embedSparse(df, "id", "text", dim = 4)
      .agg(sum("cnt")).as[Long].head()
    sparse shouldBe 6L
    val dense = HashEmbed.embed(df, "id", "text", dim = 4)
      .select(aggregate(col("vec"), lit(0), _ + _)).as[Int].head()
    dense shouldBe 6
  }

  test("native expression is bit-identical to the lambda formulation") {
    val docs = (Seq((1L, ""), (2L, "a"), (3L, "  double  spaces  ")) ++
      (4L to 40L).map(i => (i, s"word$i the spark table join row ${i % 7}")))
      .toDF("id", "text")
    val native = HashEmbed.embed(docs, "id", "text", dim = 8)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1), r.getInt(2), r.getDouble(3)))
    val lambda = HashEmbed.embedLambda(docs, "id", "text", dim = 8)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1), r.getInt(2), r.getDouble(3)))
    native.sortBy(_._1) shouldBe lambda.sortBy(_._1)
  }

  test("SQL callers get an ANALYSIS error for dim <= 0, not a codegen crash") {
    graft.functions.GraftFunctions.register(spark)
    val df = Seq((1L, "a b c")).toDF("id", "text")
    df.createOrReplaceTempView("hes_docs")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_hash_embed(text, 0) FROM hes_docs").collect()
    }
    e.getMessage should include("dim must be >= 1")
  }

  test("dense path is map-only (no exchange); lowercasing folds case") {
    val df = Seq((1L, "Spark SPARK")).toDF("id", "text")
    val plan = HashEmbed.embed(df, "id", "text", 8).queryExecution.executedPlan.toString
    (plan should not).include("Exchange")
    val vec = HashEmbed.embed(df, "id", "text", 8).collect().head.getSeq[Int](1)
    vec.max shouldBe 2 // both casings land in one bucket
  }
}
