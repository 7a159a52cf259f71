package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec

/** Plan-shape guardrails over EVERY registered query at sf0.001: the
  * properties that keep the engine viable at 100 TB, asserted on the
  * physical plan so a regression fails CI, not the cluster.
  */
class PlanAuditSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def plan(name: String): SparkPlan = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    try df.queryExecution.sparkPlan
    finally graft.api.CacheScope.global.release()
  }

  test("no registered query plans a cartesian product") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted.filter { name =>
      plan(name).collect { case c: CartesianProductExec => c }.nonEmpty
    }
    offenders shouldBe empty
  }

  test("no registered query plans a partition-less window") {
    // a Window with an empty partitionSpec drags every row into ONE
    // task — the classic all-data-to-one-partition collapse
    val offenders = SparkEntry.queries.keys.toSeq.sorted.filter { name =>
      plan(name).collect { case w: WindowExec if w.partitionSpec.isEmpty => w }.nonEmpty
    }
    offenders shouldBe empty
  }
}
