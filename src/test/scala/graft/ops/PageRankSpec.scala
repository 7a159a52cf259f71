package graft.ops

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(pairs: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    PageRank.ranks(pairs.toDF("id_a", "id_b"), "id_a", "id_b", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("path graph 1-2-3: hand-computed fixed-point ranks") {
    // deg 1:1, 2:2, 3:1; r0 = 1e8 each (1e-8 fixed point).
    // iter1: r1 = r3 = 15e6 + 85*(1e8 div 2) div 100 = 57_500_000
    //        r2       = 15e6 + 85*(1e8 + 1e8)  div 100 = 185_000_000
    // iter2: r1 = r3 = 15e6 + 85*(185e6 div 2) div 100 = 93_625_000
    //        r2       = 15e6 + 85*(57_500_000 * 2) div 100 = 112_750_000
    ranksOf(Seq((1L, 2L), (2L, 3L)), iters = 1) shouldBe
      Map(1L -> 57500000L, 2L -> 185000000L, 3L -> 57500000L)
    ranksOf(Seq((1L, 2L), (2L, 3L)), iters = 2) shouldBe
      Map(1L -> 93625000L, 2L -> 112750000L, 3L -> 93625000L)
  }

  test("star hub dominates and leaves stay symmetric") {
    // star: hub 10 connected to 11..15
    val pairs = (11L to 15L).map(l => (10L, l))
    val r = ranksOf(pairs, iters = 5)
    val leafRanks = (11L to 15L).map(r)
    leafRanks.distinct should have size 1 // symmetry: identical integers
    r(10L) should be > leafRanks.head // the hub is the template
  }

  test("disconnected components do not exchange rank") {
    // two separate 2-cliques: all four nodes see the same local graph
    val r = ranksOf(Seq((1L, 2L), (7L, 8L)), iters = 5)
    r.values.toSeq.distinct should have size 1
    // a 2-clique is rank-conserving: each node passes its whole rank
    // to the other, so ranks stay at the fixed point 1e8... damped:
    // r' = 0.15 + 0.85*r converges to 1.0 exactly in fixed point
    r(1L) shouldBe 100000000L
  }

  test("ranks are deterministic across runs (integer arithmetic)") {
    val pairs = for (i <- 1L to 30L; j <- (i + 1) to math.min(i + 3, 30L)) yield (i, j)
    ranksOf(pairs, iters = 5) shouldBe ranksOf(pairs, iters = 5)
  }

  test("opt-in reliable checkpoint dir yields identical ranks (default unchanged)") {
    import spark.implicits._
    val pairs = (for (i <- 1L to 40L; j <- (i + 1) to math.min(i + 4, 40L)) yield (i, j))
      .toDF("id_a", "id_b")
    val dir = java.nio.file.Files.createTempDirectory("pr_ckpt").toString
    // threshold 0: pin the DISTRIBUTED rounds (the checkpoint surface —
    // the driver fast path never writes checkpoint files)
    val local = PageRank.ranks(pairs, "id_a", "id_b", iters = 5,
      driverFoldThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val reliable = PageRank.ranks(pairs, "id_a", "id_b", iters = 5,
      checkpointDir = Some(dir), driverFoldThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    reliable shouldBe local
    def countFiles(p: java.io.File): Int =
      if (p.isFile) 1 else Option(p.listFiles).map(_.map(countFiles).sum).getOrElse(0)
    countFiles(new java.io.File(dir)) should be > 0
  }

  test("driver fast path and distributed path produce identical ranks") {
    import spark.implicits._
    val pairs = (for (i <- 1L to 60L; j <- (i + 1) to math.min(i + 4, 60L)) yield (i, j))
      .toDF("id_a", "id_b")
    val driver = PageRank.ranks(pairs, "id_a", "id_b", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val distributed = PageRank.ranks(pairs, "id_a", "id_b", iters = 5,
      driverFoldThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    distributed shouldBe driver
  }
}
