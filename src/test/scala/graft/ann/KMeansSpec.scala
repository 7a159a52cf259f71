package graft.ann

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  test("lloyd's converges: wcss after more iterations never increases") {
    val one = KMeans.fit(emb, "vec_id", "embedding", k = 8, maxIters = 1)
    val many = KMeans.fit(emb, "vec_id", "embedding", k = 8, maxIters = 10)
    many.wcss should be <= one.wcss + 1e-9
    many.iters should be >= 1
  }

  test("fit is deterministic and assigns every row to an existing centroid") {
    val m1 = KMeans.fit(emb, "vec_id", "embedding", k = 4, maxIters = 5)
    val m2 = KMeans.fit(emb, "vec_id", "embedding", k = 4, maxIters = 5)
    m1.centroids.map(_._1).toSeq shouldBe m2.centroids.map(_._1).toSeq
    m1.wcss shouldBe m2.wcss
    val assigned = KMeans.assign(emb, "vec_id", "embedding", m1)
    assigned.count() shouldBe 500
    val cids = m1.centroids.map(_._1).toSet
    assigned.select("cluster").distinct().collect().map(_.getLong(0))
      .foreach(c => cids should contain(c))
  }

  test("separated clusters are recovered exactly") {
    // two tight blobs far apart: k=2 must split them perfectly
    val pts = (1 to 50).map(i => (i.toLong, Seq(0.0 + i * 0.001, 0.0))) ++
      (51 to 100).map(i => (i.toLong, Seq(100.0 + i * 0.001, 0.0)))
    val df = pts.toDF("id", "v")
    val m = KMeans.fit(df, "id", "v", k = 2, maxIters = 10)
    val byCluster = KMeans.assign(df, "id", "v", m)
      .groupBy("cluster").agg(min("id").as("lo"), max("id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sorted
    byCluster shouldBe Array((1L, 50L), (51L, 100L))
  }

  test("a trained codebook drops into the persisted IVF index and keeps parity") {
    val m = KMeans.fit(emb, "vec_id", "embedding", k = 16, maxIters = 5)
    val dir = java.nio.file.Files.createTempDirectory("ivf-km").toString
    IvfIndex.build(emb, "vec_id", "embedding", m.centroids, dir)
    val qv = emb.filter(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    // k = 11 then drop the query row itself: symmetric with the naive
    // probe below so the recall comparison is like-for-like
    val got = IvfIndex.probe(spark, dir, qv, k = 11, nProbe = 4)
      .collect().map(_.getLong(0)).filter(_ != 0L).take(10)
    got should not be empty
    // trained cells are tighter than the naive first-16 quantizer:
    // recall@10 vs brute truth must not regress
    val truth = Knn.bruteForceTopK(emb, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val naiveDir = java.nio.file.Files.createTempDirectory("ivf-naive").toString
    IvfIndex.build(emb, "vec_id", "embedding", nCells = 16, naiveDir)
    val naive = IvfIndex.probe(spark, naiveDir, qv, k = 11, nProbe = 4)
      .collect().map(_.getLong(0)).filter(_ != 0L).take(10).toSet
    val trained = got.toSet
    info(f"recall@10: naive=${(truth & naive).size / 10.0}%.2f trained=${(truth & trained).size / 10.0}%.2f")
    (truth & trained).size should be >= (truth & naive).size - 2 // no collapse
  }

  test("cellBalance: counts sum to N, fracs to 1, mean load is 1") {
    val pts = (1 to 50).map(i => (i.toLong, Seq(0.0 + i * 0.001, 0.0))) ++
      (51 to 75).map(i => (i.toLong, Seq(100.0 + i * 0.001, 0.0)))
    val df = pts.toDF("id", "v")
    val m = KMeans.fit(df, "id", "v", k = 2, maxIters = 10)
    val rows = KMeans.cellBalance(df, "id", "v", m)
      .as[(Long, Long, Double, Double)].collect().toSeq
    graft.api.CacheScope.global.release()
    rows.map(_._2).sum shouldBe 75L
    rows.map(_._3).sum shouldBe 1.0 +- 1e-3
    // 2 cells of 50/25: loads 50*2/75 and 25*2/75
    rows.map(_._4).sorted shouldBe Seq(
      math.rint(25.0 * 2 / 75 * 10000) / 10000,
      math.rint(50.0 * 2 / 75 * 10000) / 10000)
  }

  test("silhouette: separated blobs score near 1, one-blob split scores near 0") {
    // two tight blobs far apart: centroid-silhouette must be ~1
    val far = ((1 to 40).map(i => (i.toLong, Seq(i * 0.001, 0.0))) ++
      (41 to 80).map(i => (i.toLong, Seq(100.0 + i * 0.001, 0.0)))).toDF("id", "v")
    val mFar = KMeans.fit(far, "id", "v", k = 2, maxIters = 10)
    val sFar = KMeans.silhouette(far, "id", "v", mFar)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    sFar.length shouldBe 2
    sFar.map(_._2).sum shouldBe 80
    sFar.foreach { case (_, _, s) => s should be > 0.9 }
    // one uniform line split in two: boundary points sit between the
    // centroids, so the mean silhouette is far from 1
    val line = (1 to 80).map(i => (i.toLong, Seq(i * 1.0, 0.0))).toDF("id", "v")
    val mLine = KMeans.fit(line, "id", "v", k = 2, maxIters = 10)
    val sLine = KMeans.silhouette(line, "id", "v", mLine)
      .collect().map(_.getDouble(2))
    all(sLine) should be < 0.75
    // map-only up to the final bounded-key aggregate: no window, no join
    val plan = KMeans.silhouette(far, "id", "v", mFar).queryExecution.sparkPlan
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    plan.collect { case c: CartesianProductExec => c } shouldBe empty
    plan.collect { case b: BroadcastNestedLoopJoinExec => b } shouldBe empty
  }
}
