package graft.ann

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // two tight clusters around the x and y axes; 101 duplicates 1,
  // 103 near-duplicates 3; 2 and 4 are distinct members
  private lazy val vecs = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Seq(0.8f, 0.6f, 0.0f, 0.0f)),    // same cluster, cos 0.8 to 1
    (3L, Seq(0.0f, 0.0f, 1.0f, 0.0f)),
    (4L, Seq(0.0f, 0.0f, 0.6f, 0.8f)),    // same cluster, cos 0.6 to 3
    (101L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),  // exact dup of 1
    (103L, Seq(0.0f, 0.02f, 1.0f, 0.0f))  // near dup of 3 (cos ~0.9998)
  ).toDF("vec_id", "embedding")

  test("semDedup drops exactly the within-cluster near-duplicates") {
    val r = SemDedup.semDedup(vecs, "vec_id", "embedding",
      k = 2, iters = 4, threshold = 0.95)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    r.map(x => x._1 -> x._3).toMap shouldBe Map(
      1L -> true, 2L -> true, 3L -> true, 4L -> true,
      101L -> false, 103L -> false)
    // the duplicate landed in its source's cluster
    val byId = r.map(x => x._1 -> x._2).toMap
    byId(101L) shouldBe byId(1L)
    byId(103L) shouldBe byId(3L)
  }

  test("semDedup direct-witness rule is not transitive") {
    // chain a-b-c where a~b and b~c but a!~c: only b and c have a
    // lower-id witness; a survives, and c is dropped by its DIRECT
    // witness b even though b itself is dropped
    val chain = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(0.98f, 0.199f, 0.0f, 0.0f)),  // cos(1,2) ~ 0.98
      (3L, Seq(0.92f, 0.392f, 0.0f, 0.0f))   // cos(2,3) ~ 0.98, cos(1,3) ~ 0.92
    ).toDF("vec_id", "embedding")
    val r = SemDedup.semDedup(chain, "vec_id", "embedding",
      k = 1, iters = 2, threshold = 0.95)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    r.map(x => x._1 -> x._3).toMap shouldBe Map(1L -> true, 2L -> false, 3L -> false)
  }

  test("outliers flags the farthest floor(q*n) rows per cluster") {
    // one cluster (k=1): 10 points at distance ~0 and one far point
    val pts = ((1 to 10).map(i => (i.toLong, Seq(1.0f, 0.0f, 0.0f, 0.0f))) :+
      (99L, Seq(1.0f, 3.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val r = SemDedup.outliers(pts, "vec_id", "embedding", k = 1, iters = 3, q = 0.1)
      .as[(Long, Long, Double, Boolean)].collect()
    // floor(11 * 0.1) = 1 outlier: the far point
    r.filter(_._4).map(_._1) shouldBe Array(99L)
    r.find(_._1 == 99L).get._3 should be > r.find(_._1 == 1L).get._3
  }

  test("assignWithDist distance is the true Euclidean distance, clamped") {
    val df = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val model = KMeans.fit(df, "vec_id", "embedding", k = 2, maxIters = 2)
    val d = KMeans.assignWithDist(df, "vec_id", "embedding", model)
      .as[(Long, Long, Double)].collect().map(x => x._1 -> x._3).toMap
    // each point IS its centroid -> distance 0 (and never NaN)
    d(1L) shouldBe 0.0
    d(2L) shouldBe 0.0
  }
}
