package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BottomKLongAggSpec extends SparkSpec {
  import spark.implicits._

  private def agg(df: org.apache.spark.sql.DataFrame, k: Int) = {
    GraftFunctions.register(spark)
    df.groupBy("g").agg(expr(s"graft_bottom_k(v, $k)").as("bk"))
      .collect().map(r => r.getString(0) ->
        r.getAs[scala.collection.Seq[Long]]("bk").toSeq).toMap
  }

  test("k smallest DISTINCT values, sorted; short groups return all") {
    val df = Seq(
      ("a", 5L), ("a", 3L), ("a", 9L), ("a", 3L), ("a", 1L), ("a", 7L),
      ("b", 42L), ("b", 42L)).toDF("g", "v")
    val r = agg(df, 3)
    r("a") shouldBe Seq(1L, 3L, 5L) // dup 3 collapsed, top of the heap cut
    r("b") shouldBe Seq(42L) // short group: everything, once
  }

  test("null inputs are skipped; empty group yields empty array") {
    val df = Seq(("a", Some(2L)), ("a", None), ("n", None)).toDF("g", "v")
    val r = agg(df, 4)
    r("a") shouldBe Seq(2L)
    r("n") shouldBe Seq.empty
  }

  test("partitioning-invariant (merge associativity): shuffled input, same buffer") {
    val big = spark.range(0, 20000)
      .select(lit("g").as("g"), ((col("id") * 2654435761L) % 100000L).as("v"))
    val a = agg(big, 64)
    val b = agg(big.repartition(13), 64)
    a shouldBe b
    a("g").length shouldBe 64
    a("g") shouldBe a("g").sorted
    a("g").distinct.length shouldBe 64
  }

  test("negative values order correctly (signed long sort)") {
    val df = Seq(("a", -5L), ("a", 3L), ("a", -9L), ("a", 0L)).toDF("g", "v")
    agg(df, 2)("a") shouldBe Seq(-9L, -5L)
  }
}
