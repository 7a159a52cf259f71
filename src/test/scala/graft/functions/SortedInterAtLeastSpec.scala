package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The Ed-Join count-filter kernel: thresholded sorted-merge
  * intersection. The contract the filter relies on —
  * result >= needed  ⟺  |a ∩ b| >= needed, and when the result is
  * >= needed it IS the exact count — is pinned against the reference
  * HashSet form ([[ContainedCount]]) on randomized sorted inputs,
  * through BOTH execution paths (codegen and interpreted eval).
  */
class SortedInterAtLeastSpec extends SparkSpec {
  import spark.implicits._

  private def interCall(needed: Int) = call_function(
    "graft_sorted_inter_at_least", col("a"), col("b"), lit(needed))

  test("equals the HashSet count whenever it reports >= needed; -1 only below") {
    graft.functions.GraftFunctions.register(spark)
    // deterministic pseudo-random distinct sorted arrays (LCG, no RNG)
    val rows = (0 until 200).map { i =>
      val a = (0 until 50 + i % 37).map(j => ((i * 7919L + j * 104729L) % 401L)).distinct.sorted
      val b = (0 until 50 + (i * 3) % 41).map(j => ((i * 12007L + j * 104729L) % 401L)).distinct.sorted
      (a.toArray, b.toArray)
    }
    val df = rows.toDF("a", "b")
    for (needed <- Seq(0, 1, 5, 20, 60)) {
      val got = df.select(
        interCall(needed).as("fast"),
        call_function("graft_contained_count", col("a"), col("b")).as("ref"))
        .as[(Int, Int)].collect()
      got.foreach { case (fast, ref) =>
        if (ref >= needed) fast shouldBe ref
        else assert(fast < needed, s"fast=$fast must stay below needed=$needed when ref=$ref")
      }
    }
  }

  test("interpreted eval agrees with codegen") {
    val e = SortedInterAtLeast(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1L, 3L, 5L, 7L), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(3L, 4L, 5L, 9L), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.catalyst.expressions.Literal(2))
    e.eval(null) shouldBe 2 // {3, 5}
    val strict = SortedInterAtLeast(e.first, e.second,
      org.apache.spark.sql.catalyst.expressions.Literal(3))
    strict.eval(null) shouldBe -1 // aborts: 2 < 3 provable mid-walk
  }

  test("exact ed-join results are unchanged by the kernel (oracle twin shape)") {
    graft.functions.GraftFunctions.register(spark)
    // strings with a few edits apart plus unrelated ones — the same
    // corpus shape EdJoinSpec brute-forces; here we just pin that the
    // full operator still emits the brute-force pair set
    val base = "the quick brown fox jumps over the lazy dog and then runs far away home"
    val rows = Seq(
      (1L, base),
      (2L, base.replace("quick", "quack")),                // few edits
      (3L, base.replace("lazy", "hazy").replace("far", "fur")),
      (4L, "completely different text about spark query optimization and shuffles here"),
      (5L, base.toUpperCase))
    val df = rows.toDF("id", "s")
    val got = graft.dedup.EdJoin.edPairs(df, "id", "s", q = 3, d = 8)
      .orderBy("id_a", "id_b").as[(Long, Long, Long)].collect()
    def lev(a: String, b: String): Long = {
      val dp = Array.tabulate(b.length + 1)(_.toLong)
      for (i <- 1 to a.length) {
        var prev = dp(0); dp(0) = i.toLong
        for (j <- 1 to b.length) {
          val cur = dp(j)
          dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(b.length)
    }
    val brute = for {
      (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
      dd = lev(sa, sb) if dd <= 8
    } yield (ia, ib, dd)
    got.toSeq shouldBe brute.sortBy(p => (p._1, p._2))
  }
}
