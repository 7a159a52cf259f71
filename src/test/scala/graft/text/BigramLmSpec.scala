package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BigramLmSpec extends SparkSpec {
  import spark.implicits._

  test("matches a hand-computed interpolated bigram model on a tiny corpus") {
    // two docs over a tiny token set; nBuckets large enough that no
    // buckets collide for these tokens (verified below)
    val df = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val out = BigramLm.crossEntropy(df, "doc_id", "text",
      nBuckets = 1024, lambdaPm = 700)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    // recompute on the driver with the same bucket hashes
    def bucket(tok: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(8)
      (java.lang.Long.parseLong(hex, 16) % TextFunctions.ShingleMod) % 1024
    }
    val docs = Map(1L -> Seq("a", "b", "a", "b"), 2L -> Seq("a", "b", "c"))
    Seq("a", "b", "c").map(bucket).distinct should have size 3
    val stream = docs.toSeq.flatMap { case (id, toks) =>
      toks.map(bucket).sliding(2).map(w => (id, w(0), w(1))).toSeq
    }
    val bi = stream.groupBy(t => (t._2, t._3)).view.mapValues(_.size).toMap
    val ctx = stream.groupBy(_._2).view.mapValues(_.size).toMap
    val uni = stream.groupBy(_._3).view.mapValues(_.size).toMap
    val n = stream.size.toDouble
    def lp(p: Long, c: Long): Double =
      math.log(0.7 * bi((p, c)) / ctx(p) + 0.3 * (uni(c) + 1) / (n + 1024))
    val want = docs.toSeq.sortBy(_._1).map { case (id, toks) =>
      val bgs = toks.map(bucket).sliding(2).map(w => (w(0), w(1))).toSeq
      (id, bgs.size.toLong,
        BigDecimal(-bgs.map { case (p, c) => lp(p, c) }.sum / bgs.size)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    out.toSeq shouldBe want
    graft.api.CacheScope.global.release(blocking = true)
  }

  test("repetitive documents score lower cross-entropy than shuffled-token ones") {
    val rep = (1 to 40).map(_ => "x y").mkString(" ")
    val varied = (1 to 80).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, rep), (2L, varied)).toDF("doc_id", "text")
    val m = BigramLm.crossEntropy(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    m(1L) should be < m(2L)
    graft.api.CacheScope.global.release(blocking = true)
  }

  test("documents with fewer than two tokens drop out; rejects bad params") {
    val df = Seq((1L, "only"), (2L, "two tokens here")).toDF("doc_id", "text")
    BigramLm.crossEntropy(df, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSeq shouldBe Seq(2L)
    an[IllegalArgumentException] should be thrownBy
      BigramLm.crossEntropy(df, "doc_id", "text", nBuckets = 1)
    an[IllegalArgumentException] should be thrownBy
      BigramLm.crossEntropy(df, "doc_id", "text", lambdaPm = 1001)
    graft.api.CacheScope.global.release(blocking = true)
  }

  test("plan: no cartesian product, no partition-less window, no hinted grouped broadcast") {
    val df = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val qe = BigramLm.crossEntropy(df, "doc_id", "text").queryExecution
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    import org.apache.spark.sql.execution.window.WindowExec
    val nodes = flattenPlan(qe.executedPlan)
    nodes.collect { case c: CartesianProductExec => c } shouldBe empty
    nodes.collect { case w: WindowExec if w.partitionSpec.isEmpty => w } shouldBe empty
    // the model join must NOT be broadcast-hinted (a grouped aggregate:
    // bounded by B^2, but AQE decides at runtime, not a hint)
    import org.apache.spark.sql.catalyst.plans.logical.Join
    qe.optimizedPlan.collect {
      case j: Join if j.hint.leftHint.exists(_.strategy.isDefined) ||
        j.hint.rightHint.exists(_.strategy.isDefined) => j
    }.filter { j =>
      // the 1-row totals crossJoin stays hinted (bounded); grouped
      // sides must not be
      def grouped(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
        p.collectFirst {
          case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
            a.groupingExpressions.nonEmpty
        }.getOrElse(false)
      (j.hint.leftHint.exists(_.strategy.isDefined) && grouped(j.left)) ||
        (j.hint.rightHint.exists(_.strategy.isDefined) && grouped(j.right))
    } shouldBe empty
    graft.api.CacheScope.global.release(blocking = true)
  }
}
