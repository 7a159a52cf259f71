package graft.ann

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** IVF+PQ persisted index: recall floors vs exact brute force, the
  * residual-encoding edge over flat PQ, partition-pruned probes, and
  * the on-disk size claim that justifies the whole component.
  */
class IvfPqSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  private def truth(queryId: Long, k: Int): Set[Long] =
    Knn.bruteForceTopK(emb, "vec_id", "embedding", queryId, k)
      .collect().map(_.getLong(0)).toSet

  private def qv(queryId: Long): Seq[Double] =
    emb.filter(col("vec_id") === queryId)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)

  test("re-ranked probe hits a recall floor vs exact brute force") {
    val root = java.nio.file.Files.createTempDirectory("ivfpq").toString
    val coll = new graft.api.ParquetCollection(spark, root, "emb")
    coll.replace(emb)
    coll.attachVectorIndexPq("vec_id", "embedding", nCells = 16, m = 8, ks = 16)
    val queries = Seq(0L, 7L, 42L)
    val recalls = queries.map { q =>
      val got = coll.searchVectorPq("vec_id", "embedding", qv(q), k = 11,
          nProbe = 4, rerank = 60)
        .collect().map(_.getLong(0)).filter(_ != q).take(10).toSet
      (truth(q, 10) & got).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    info(f"ivfpq rerank recall@10 = $mean%.2f (per-query: ${recalls.mkString(", ")})")
    // approximate by construction; the floor is the alarm, not the goal
    mean should be >= 0.5
  }

  test("residual encoding beats flat PQ at equal code budget") {
    // flat PQ over raw vectors, same m/ks — the ablation that justifies
    // the residual join in build
    val pqFlat = Pq.fit(emb, "vec_id", "embedding", m = 8, ks = 16, maxIters = 5)
    val encFlat = Pq.encode(emb, "vec_id", "embedding", pqFlat).persist()
    val root = java.nio.file.Files.createTempDirectory("ivfpq2").toString
    IvfPqIndex.build(emb, "vec_id", "embedding", root, nCells = 16, m = 8, ks = 16)
    val queries = Seq(3L, 11L, 99L)
    def recallOf(got: Seq[Long], q: Long): Double =
      (truth(q, 10) & got.filter(_ != q).take(10).toSet).size / 10.0
    val (flatR, ivfR) = queries.map { q =>
      val f = Pq.search(encFlat, "vec_id", pqFlat, qv(q), k = 11)
        .collect().map(_.getLong(0)).toSeq
      // ADC-only (no re-rank): isolates the encoding quality
      val i = IvfPqIndex.probe(spark, root, qv(q), k = 11, nProbe = 16)
        .collect().map(_.getLong(0)).toSeq
      (recallOf(f, q), recallOf(i, q))
    }.unzip
    encFlat.unpersist()
    val (fMean, iMean) = (flatR.sum / flatR.size, ivfR.sum / ivfR.size)
    info(f"ADC recall@10: flat=$fMean%.2f residual-ivf=$iMean%.2f")
    // nProbe = nCells removes the coarse-probe variable: any edge is
    // pure residual-vs-raw quantization error (allow a one-hit tie)
    iMean should be >= fMean - 0.1
  }

  test("probe plans a partition-pruned scan of the code partitions") {
    val root = java.nio.file.Files.createTempDirectory("ivfpq3").toString
    IvfPqIndex.build(emb, "vec_id", "embedding", root, nCells = 16, m = 8, ks = 16)
    val probe = IvfPqIndex.probe(spark, root, Seq.fill(64)(0.1), k = 5, nProbe = 3)
    val scans = probe.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec if s.relation.location.rootPaths.exists(_.toString.contains("cells")) => s
    }
    scans should not be empty
    scans.head.partitionFilters should not be empty
    scans.head.relation.location.listFiles(scans.head.partitionFilters, Nil)
      .size should be <= 3
  }

  test("re-rank pushes the candidate ids into the raw-vector scan") {
    val root = java.nio.file.Files.createTempDirectory("ivfpq6").toString
    val coll = new graft.api.ParquetCollection(spark, root, "emb")
    coll.replace(emb)
    coll.attachVectorIndexPq("vec_id", "embedding", nCells = 8, m = 8, ks = 16)
    val r = coll.searchVectorPq("vec_id", "embedding", qv(0), k = 5,
      nProbe = 4, rerank = 20)
    // the exact re-rank reads ~rerank rows via an In predicate on the
    // raw scan (row-group skipping), not a corpus-wide join
    val pushed = r.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec
        if s.relation.location.rootPaths.exists(_.toString.contains("v_0")) =>
        s.metadata.getOrElse("PushedFilters", "[]")
    }
    pushed should not be empty
    pushed.exists(_.contains("In(vec_id")) shouldBe true
    r.collect().length shouldBe 5
  }

  test("code storage is an order of magnitude smaller than raw vectors") {
    val root = java.nio.file.Files.createTempDirectory("ivfpq4").toString
    IvfPqIndex.build(emb, "vec_id", "embedding", root, nCells = 8, m = 8, ks = 16)
    val rawDir = java.nio.file.Files.createTempDirectory("ivfpq4raw").toString
    emb.write.mode("overwrite").parquet(rawDir)
    def bytes(dir: String): Long = {
      val p = java.nio.file.Paths.get(dir)
      java.nio.file.Files.walk(p).filter(_.toString.endsWith(".parquet"))
        .mapToLong(f => java.nio.file.Files.size(f)).sum()
    }
    val (code, raw) = (bytes(s"$root/cells"), bytes(rawDir))
    info(s"codes=${code}B raw=${raw}B ratio=${raw.toDouble / code}")
    code.toDouble should be < raw / 4.0
  }

  test("searchVectorPq without an index raises") {
    val root = java.nio.file.Files.createTempDirectory("ivfpq5").toString
    val coll = new graft.api.ParquetCollection(spark, root, "emb")
    coll.replace(emb)
    an[IllegalArgumentException] should be thrownBy
      coll.searchVectorPq("vec_id", "embedding", Seq(1.0), k = 3)
  }
}
