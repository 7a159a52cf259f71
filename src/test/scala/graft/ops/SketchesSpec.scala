package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val nums = spark.range(0, 10000)
    .select(col("id"), (col("id") % 100).as("m"), (col("id") % 7).as("s"))

  test("approxDistinct: one aggregation, within HLL rsd of the exact counts") {
    val r = Sketches.approxDistinct(nums, Seq("id", "m", "s"), rsd = 0.02).collect().head
    r.getAs[Long]("id_distinct").toDouble shouldBe 10000.0 +- 10000 * 0.05
    r.getAs[Long]("m_distinct").toDouble shouldBe 100.0 +- 8
    r.getAs[Long]("s_distinct") shouldBe 7
  }

  test("approxQuantiles: one row per column, values near exact quantiles") {
    val rows = Sketches.approxQuantiles(nums, Seq("id", "m"), Seq(0.1, 0.5, 0.9))
      .collect().map(r => r.getAs[String]("column") ->
        r.getAs[scala.collection.Seq[Double]]("quantiles")).toMap
    rows.keySet shouldBe Set("id", "m")
    val idQ = rows("id")
    idQ(0) shouldBe 1000.0 +- 50
    idQ(1) shouldBe 5000.0 +- 50
    idQ(2) shouldBe 9000.0 +- 50
    an[IllegalArgumentException] should be thrownBy Sketches.approxQuantiles(nums, Nil)
  }

  test("frequentItems surfaces the heavy hitter") {
    val skewed = spark.range(0, 1000)
      .select(when(col("id") < 600, lit("hot")).otherwise(concat(lit("v"), col("id"))).as("k"))
    val items = Sketches.frequentItems(skewed, Seq("k"), support = 0.3)
      .collect().head.getAs[scala.collection.Seq[String]]("k_freqItems")
    items should contain("hot")
  }

  test("cmsTopK: estimates dominate exact counts; exact at generous width") {
    import spark.implicits._
    val docs = Seq(
      "hot hot hot hot warm warm cold",
      "hot hot warm tepid",
      "hot cold").toDF("text")
    val out = Sketches.cmsTopK(docs, "text", k = 3, depth = 4, width = 4096)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    graft.api.CacheScope.global.release()
    // exact top-3 by count, ties lexicographic
    out.map(t => (t._1, t._2)).toSeq shouldBe Seq(("hot", 7L), ("warm", 3L), ("cold", 2L))
    // CMS guarantee: est >= exact; at width 4096 over 5 tokens, exact
    out.foreach { case (_, exact, est) => est shouldBe exact }
  }

  test("cmsTopK: narrow width over-estimates but never under-estimates") {
    import spark.implicits._
    val docs = (1 to 50).map(i => s"tok$i common common").toDF("text")
    val out = Sketches.cmsTopK(docs, "text", k = 5, depth = 2, width = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    graft.api.CacheScope.global.release()
    out.foreach { case (_, exact, est) => est should be >= exact }
    // 150 tokens into 2x4 cells: collisions are certain somewhere
    out.head._1 shouldBe "common"
    out.head._2 shouldBe 100L
  }

  test("bloom filter: never a false negative; fpp in range") {
    val members = spark.range(0, 5000).toDF("v")
    val bloom = Sketches.buildBloom(members, col("v"), 5000, fpp = 0.01)
    // all members test positive
    val misses = members.filter(!Sketches.mightContain(members, bloom, col("v"))).count()
    misses shouldBe 0
    // non-members: ~1% false positives
    val non = spark.range(1000000, 1050000).toDF("v")
    val fp = non.filter(Sketches.mightContain(non, bloom, col("v"))).count()
    fp.toDouble should be < 50000 * 0.05
  }
}
