package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class BottomKStructAggSpec extends SparkSpec {
  import spark.implicits._

  private def agg(df: org.apache.spark.sql.DataFrame, k: Int): Map[String, Seq[(Long, String, Double)]] = {
    GraftFunctions.register(spark)
    df.groupBy("g").agg(expr(s"graft_bottom_k_struct(struct(h, id, v), $k)").as("bk"))
      .collect().map(r => r.getString(0) ->
        r.getAs[scala.collection.Seq[Row]]("bk").toSeq
          .map(s => (s.getLong(0), s.getString(1), s.getDouble(2)))).toMap
  }

  test("k smallest rows in struct (field-by-field) order; short groups return all") {
    val df = Seq(
      ("a", 5L, "x", 1.0), ("a", 3L, "y", 2.0), ("a", 9L, "z", 3.0),
      ("a", 1L, "w", 4.0), ("a", 7L, "q", 5.0),
      ("b", 42L, "only", 0.5)).toDF("g", "h", "id", "v")
    val r = agg(df, 3)
    r("a") shouldBe Seq((1L, "w", 4.0), (3L, "y", 2.0), (5L, "x", 1.0))
    r("b") shouldBe Seq((42L, "only", 0.5))
  }

  test("ties on the first field break on later fields (total struct order)") {
    val df = Seq(
      ("a", 1L, "bb", 9.0), ("a", 1L, "aa", 8.0), ("a", 1L, "cc", 7.0),
      ("a", 0L, "zz", 6.0)).toDF("g", "h", "id", "v")
    agg(df, 3)("a") shouldBe Seq((0L, "zz", 6.0), (1L, "aa", 8.0), (1L, "bb", 9.0))
  }

  test("MULTISET semantics: identical rows are kept, not collapsed (contrast graft_bottom_k)") {
    val df = Seq(
      ("a", 1L, "dup", 1.0), ("a", 1L, "dup", 1.0), ("a", 2L, "x", 2.0),
      ("a", 3L, "y", 3.0)).toDF("g", "h", "id", "v")
    agg(df, 3)("a") shouldBe Seq((1L, "dup", 1.0), (1L, "dup", 1.0), (2L, "x", 2.0))
  }

  test("null structs are skipped; empty group yields empty array") {
    GraftFunctions.register(spark)
    val df = Seq(("a", Some(2L)), ("a", None), ("n", None)).toDF("g", "h")
    val out = df
      .withColumn("s", when(col("h").isNotNull, struct(col("h"))))
      .groupBy("g").agg(expr("graft_bottom_k_struct(s, 4)").as("bk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Row](1).map(_.getLong(0))).toMap
    out("a") shouldBe Seq(2L)
    out("n") shouldBe Seq.empty
  }

  test("partitioning-invariant (merge associativity + serialize round-trip): shuffled input, same sample") {
    GraftFunctions.register(spark)
    val big = spark.range(0, 20000)
      .select(lit("g").as("g"),
        ((col("id") * 2654435761L) % 100000L).as("h"),
        concat(lit("id"), col("id")).as("id"),
        (col("id") % 977).cast("double").as("v"))
    val a = agg(big, 100)
    val b = agg(big.repartition(13), 100)
    a shouldBe b
    a("g").length shouldBe 100
    a("g") shouldBe a("g").sortBy(t => (t._1, t._2, t._3))
  }

  test("rejects non-struct input and non-literal k at analysis") {
    GraftFunctions.register(spark)
    val df = Seq(("a", 1L)).toDF("g", "h")
    an[Exception] should be thrownBy
      df.groupBy("g").agg(expr("graft_bottom_k_struct(h, 4)")).collect()
    an[Exception] should be thrownBy
      df.groupBy("g").agg(expr("graft_bottom_k_struct(struct(h), h)")).collect()
  }
}
