package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class WindowOpsSpec extends SparkSpec {
  import spark.implicits._

  test("salted two-phase top-k equals the single-window top-k") {
    val df = (1 to 1000).map(i => (s"g${i % 3}", i * 37 % 500, i)).toDF("g", "v", "id")
    val naive = df.withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)))
      .filter(col("rn") <= 5)
      .select("g", "rn", "id").collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    val salted = WindowOps.topKPerGroup(df, Seq("g"),
        Seq(col("v").desc, col("id").asc), k = 5, saltOn = col("id"))
      .select("g", "rn", "id").collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    salted shouldBe naive
  }

  test("top-k with k larger than group size returns whole groups") {
    val df = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("g", "v")
    WindowOps.topKPerGroup(df, Seq("g"), Seq(col("v").desc), k = 10, saltOn = col("v"))
      .count() shouldBe 3
  }
}
