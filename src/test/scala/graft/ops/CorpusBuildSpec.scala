package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusBuildSpec extends SparkSpec {
  import spark.implicits._

  // 30 tokens, stopword-bearing, no punct/digits: passes the default gate
  private val good =
    "the data table scan join merge sort group filter index " +
      "the data table scan join merge sort group filter index " +
      "the data table scan join merge sort group filter index"
  private val goodShuffled = // same token SET (fingerprint-equal)
    "index filter group sort merge join scan table data the " +
      "the data table scan join merge sort group filter index " +
      "the data table scan join merge sort group filter index"
  private val evalText =
    "the benchmark answer sequence alpha beta gamma delta epsilon zeta " +
      "the benchmark answer sequence alpha beta gamma delta epsilon zeta " +
      "the benchmark answer sequence alpha beta gamma delta epsilon zeta"
  private val leaky = // shares the 4-gram "alpha beta gamma delta" with eval
    "the data table scan join merge sort group filter index " +
      "alpha beta gamma delta the data table scan join merge " +
      "sort group filter index the data table scan join merge"
  private val goodB =
    "the rows columns pages bytes blocks caches spills stages tasks " +
      "the rows columns pages bytes blocks caches spills stages tasks " +
      "the rows columns pages bytes blocks caches spills stages tasks"

  private val docs = Seq(
    (10L, "s1", evalText), // eval slice (id % 10 == 0): never emitted
    (1L, "s1", good),
    (2L, "s1", goodShuffled), // dup of 1 by token-set fingerprint
    (3L, "s1", leaky),        // contaminated by the eval 4-gram
    (4L, "s1", "tiny text"),  // fails the length gate
    (5L, "s2", goodB)
  ).toDF("id", "src", "text")

  private def run(budget: Long) =
    CorpusBuild.trainingSubset(docs, "id", "src", "text",
      evalPred = col("id") % 10 === 0, w = 4,
      budgetPerSource = budget, salt = "t")

  test("every stage filters: eval, dup, contaminated and low-quality rows drop") {
    val ids = run(budget = 10000).select("id").as[Long].collect().toSet
    ids shouldBe Set(1L, 5L)
  }

  test("keep-first picks the LOWEST id of a fingerprint group") {
    val swapped = docs.withColumn("id",
      when(col("id") === 1, 2L).when(col("id") === 2, 1L).otherwise(col("id")))
    val ids = CorpusBuild.trainingSubset(swapped, "id", "src", "text",
      evalPred = col("id") % 10 === 0, w = 4, budgetPerSource = 10000, salt = "t")
      .select("id").as[Long].collect().toSet
    ids shouldBe Set(1L, 5L) // still the lowest id, whichever row carried it
  }

  test("budget truncates per source, not globally") {
    // each good doc is 30 tokens; budget 10 admits only the first doc
    // of EACH source's hash order
    val out = run(budget = 10).select("id", "src").as[(Long, String)].collect()
    out.map(_._2).toSet shouldBe Set("s1", "s2") // s2 not starved by s1
    out.length shouldBe 2
  }

  test("output carries resume offsets") {
    val rows = run(budget = 10000)
      .select("id", "n_toks", "cum_before").as[(Long, Int, Long)].collect()
    rows.foreach { case (_, nt, _) => nt shouldBe 30 }
    rows.map(_._3).min shouldBe 0L
  }
}
