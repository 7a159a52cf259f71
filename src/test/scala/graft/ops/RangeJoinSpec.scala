package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("range join matches a naive containment filter on random data") {
    val rnd = new scala.util.Random(11)
    val pts = (1L to 300L).map(i => (i, s"k${rnd.nextInt(4)}", rnd.nextInt(10000).toLong))
    val ivs = (1L to 100L).map { i =>
      val lo = rnd.nextInt(10000).toLong
      (1000L + i, s"k${rnd.nextInt(4)}", lo, lo + rnd.nextInt(700).toLong)
    }
    val l = pts.toDF("pid", "k", "pt")
    val r = ivs.toDF("iid", "k", "lo", "hi")
    val out = RangeJoin.rangeJoin(l, r, Seq("k"), "pt", "lo", "hi", bucketWidth = 500L)
      .select("pid", "r_iid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val naive = (for {
      (pid, pk, pt) <- pts
      (iid, ik, lo, hi) <- ivs
      if pk == ik && pt >= lo && pt <= hi
    } yield (pid, iid)).toSet
    out shouldBe naive
    naive should not be empty
  }

  test("range join bounds are inclusive on both ends") {
    val l = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 9L), (4L, "a", 21L))
      .toDF("pid", "k", "pt")
    val r = Seq((100L, "a", 10L, 20L)).toDF("iid", "k", "lo", "hi")
    val out = RangeJoin.rangeJoin(l, r, Seq("k"), "pt", "lo", "hi", bucketWidth = 7L)
      .select("pid").collect().map(_.getLong(0)).toSet
    out shouldBe Set(1L, 2L)
  }

  test("range join plans a hash join, not a nested loop") {
    val l = Seq((1L, "a", 10L)).toDF("pid", "k", "pt")
    val r = Seq((100L, "a", 5L, 15L)).toDF("iid", "k", "lo", "hi")
    val plan = RangeJoin.rangeJoin(l, r, Seq("k"), "pt", "lo", "hi", 10L)
      .queryExecution.sparkPlan
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    plan.collect { case j: BroadcastNestedLoopJoinExec => j } shouldBe empty
    plan.collect { case j: CartesianProductExec => j } shouldBe empty
  }

  test("negative points and interval edges bucket correctly") {
    val l = Seq((1L, "a", -3L), (2L, "a", -20L)).toDF("pid", "k", "pt")
    val r = Seq((100L, "a", -10L, 0L)).toDF("iid", "k", "lo", "hi")
    val out = RangeJoin.rangeJoin(l, r, Seq("k"), "pt", "lo", "hi", bucketWidth = 7L)
      .select("pid").collect().map(_.getLong(0)).toSet
    out shouldBe Set(1L)
  }
}
