package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Shared local SparkSession for all suites (tests fork one JVM). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(s)
    s
  }
}

trait SparkSpec extends AnyFunSuite with Matchers {
  lazy val spark: SparkSession = SparkTestSession.spark

  /** Every node of a physical plan, descending through the boundaries
    * `TreeNode.collect` treats as leaves: the AQE wrapper (present
    * whenever the plan has exchanges — a naive collect over
    * `executedPlan` silently sees NOTHING inside and any assertion on
    * it passes vacuously) and cached subplans.
    */
  protected def flattenPlan(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
    (p +: p.children.flatMap(flattenPlan)) ++ (p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        flattenPlan(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        // post-execution AQE materializes stages as leaf wrappers —
        // without this case a flatten over an executed plan sees
        // nothing inside any stage
        flattenPlan(q.plan)
      case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        flattenPlan(m.relation.cachedPlan)
      case _ => Nil
    })
}
