package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ArraySumAggSpec extends SparkSpec {
  import spark.implicits._

  test("element-wise sums per group across partitions (merge path)") {
    val rows = Seq(
      ("a", Array(1.0f, 2.0f)),
      ("a", Array(10.0f, 20.0f)),
      ("b", Array(0.5f, -0.5f)),
      ("a", Array(100.0f, 200.0f)))
    val df = rows.toDF("k", "v").repartition(4) // force partial buffers + merge
    val got = df.groupBy("k")
      .agg(call_function("graft_array_sum", col("v")).as("s"))
      .as[(String, Array[Double])].collect().toMap
    got("a") shouldBe Array(111.0, 222.0)
    got("b") shouldBe Array(0.5, -0.5)
  }

  test("null arrays are skipped; all-null group yields null") {
    val df = Seq(
      ("a", Some(Array(1.0f))),
      ("a", None),
      ("b", None)).toDF("k", "v")
    val got = df.groupBy("k")
      .agg(call_function("graft_array_sum", col("v")).as("s"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    got("a").isDefined shouldBe true
    got("b") shouldBe None
  }

  test("double arrays are supported") {
    val df = Seq((1, Array(1.5, 2.5)), (1, Array(0.5, 0.5))).toDF("k", "v")
    val got = df.groupBy("k")
      .agg(call_function("graft_array_sum", col("v")).as("s"))
      .as[(Int, Array[Double])].collect().head._2
    got shouldBe Array(2.0, 3.0)
  }

  test("matches the posexplode formulation on random vectors") {
    val rng = new scala.util.Random(11)
    val df = (0 until 200).map { i =>
      (i % 5, Array.fill(16)(rng.nextFloat() - 0.5f))
    }.toDF("k", "v").repartition(8)
    val fast = df.groupBy("k")
      .agg(call_function("graft_array_sum", col("v")).as("s"))
      .as[(Int, Array[Double])].collect().toMap
    val slow = df.select(col("k"), posexplode(col("v")))
      .groupBy("k", "pos").agg(sum(col("col").cast("double")).as("s"))
      .as[(Int, Int, Double)].collect()
      .groupBy(_._1).map { case (k, rows) =>
        k -> rows.sortBy(_._2).map(_._3).toArray
      }
    fast.keys.toSet shouldBe slow.keys.toSet
    fast.foreach { case (k, arr) =>
      arr.zip(slow(k)).foreach { case (a, b) => a shouldBe b +- 1e-6 }
    }
  }
}
