package graft.ops

import org.apache.spark.sql.execution.LocalLimitExec
import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

class HardNegativesSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "web", "apple banana cherry"),
    (2L, "web", "apple banana date"),
    (3L, "book", "apple banana cherry"),
    (4L, "book", "zebra yak xylophone"),
    (5L, "wiki", "apple zebra cherry"),
    (6L, "wiki", "date elderberry fig"),
    (7L, "web", "grape honeydew kiwi"),
    (8L, "book", "apple banana fig")
  ).toDF("doc_id", "source", "text")

  test("probe set is bounded by nProbes and deterministic") {
    val out = HardNegatives.mine(docs, "doc_id", "source", "text",
      dim = 8, nProbes = 3, topK = 2).cache()
    try {
      val probeIds = out.select("probe_id").distinct().as[Long].collect().sorted
      probeIds.length should be <= 3
      // deterministic: a second run picks the identical probes
      val again = HardNegatives.mine(docs, "doc_id", "source", "text",
        dim = 8, nProbes = 3, topK = 2)
        .select("probe_id").distinct().as[Long].collect().sorted
      again shouldBe probeIds
      // every negative really is cross-source and ranked within topK
      val srcOf = docs.select("doc_id", "source").as[(Long, String)]
        .collect().toMap
      out.select("probe_id", "neg_id", "rnk").as[(Long, Long, Int)]
        .collect().foreach { case (p, n, r) =>
          srcOf(p) should not be srcOf(n)
          r should be <= 2
        }
    } finally out.unpersist()
  }

  test("the broadcast side carries a global limit — constant at any corpus size") {
    // the scale contract: probes are a hash-ordered global top-n
    // (TakeOrderedAndProject), NOT a fraction of the corpus — the
    // BNLJ's build side is <= nProbes rows no matter how large df is
    val plan = HardNegatives.mine(docs, "doc_id", "source", "text",
      dim = 8, nProbes = 3, topK = 2).queryExecution.sparkPlan
    val all = flattenPlan(plan)
    val bnlj = all.collect { case b: BroadcastNestedLoopJoinExec => b }
    bnlj should not be empty
    val limited = all.exists {
      case t: TakeOrderedAndProjectExec => t.limit == 3
      case l: LocalLimitExec => l.limit == 3
      case _ => false
    }
    assert(limited, s"no limit-3 operator found under:\n$plan")
  }

  test("spark and duckdb formulations agree on shape at tiny scale") {
    // the full value-equality check is the driver oracle; here we pin
    // the row bound: <= nProbes x topK rows, rnk dense from 1
    val out = HardNegatives.mine(docs, "doc_id", "source", "text",
      dim = 8, nProbes = 4, topK = 2).collect()
    out.length should be <= 8
    out.groupBy(_.getLong(0)).values.foreach { rows =>
      rows.map(_.getInt(3)).sorted shouldBe (1 to rows.length)
    }
  }
}
