package graft.dedup

import graft.SparkSpec

class ClusterSpec extends SparkSpec {
  import spark.implicits._

  test("connected components assign the min id of each component") {
    // chain 1-2-3-4 (diameter 3: exercises multi-round propagation),
    // separate pair 10-11, and 20-21/21-22 triangle-ish
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)
    ).toDF("id_a", "id_b")
    val cc = Cluster.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cc shouldBe Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L)
  }

  test("a long chain converges within maxIter and a short budget fails loudly") {
    // force the DISTRIBUTED path (threshold 0) — the driver fast path
    // has no iteration budget to exercise
    val chain = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cc = Cluster.connectedComponents(chain, "id_a", "id_b",
      driverFoldThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cc.values.toSet shouldBe Set(1L)
    an[IllegalArgumentException] should be thrownBy
      Cluster.connectedComponents(chain, "id_a", "id_b", maxIter = 2,
        driverFoldThreshold = 0L).collect()
  }

  test("driver fast path survives a deep descending chain (no stack overflow)") {
    // edges in DESCENDING order build a parent chain as deep as the
    // edge count — a recursive find() would blow the 1MB default stack
    // well under the 50k driverFoldThreshold
    val n = 30000L
    val chain = (n to 2L by -1L).map(i => (i - 1, i)).toDF("id_a", "id_b")
    val cc = Cluster.connectedComponents(chain, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cc.size shouldBe n
    cc.values.toSet shouldBe Set(1L)
  }

  test("driver fast path and distributed path produce identical output") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val fast = Cluster.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Cluster.connectedComponents(pairs, "id_a", "id_b",
      driverFoldThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    fast shouldBe dist
  }

  test("opt-in reliable checkpoint dir substitutes checkpoint() with identical output (default unchanged)") {
    // the round-12 roadmap item: localCheckpoint blocks are not rebuilt
    // on executor loss — a real cluster run opts into a fault-tolerant
    // dir; results must be IDENTICAL either way
    val rnd = new scala.util.Random(31)
    val pairs = (1 to 300).map(_ =>
      (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }.toDF("id_a", "id_b")
    val dir = java.nio.file.Files.createTempDirectory("cc_ckpt").toString
    val local = Cluster.connectedComponents(pairs, "id_a", "id_b",
      driverFoldThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val reliable = Cluster.connectedComponents(pairs, "id_a", "id_b",
      driverFoldThreshold = 0L, checkpointDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    reliable shouldBe local
    // the reliable path actually wrote checkpoint data to the dir
    def countFiles(p: java.io.File): Int =
      if (p.isFile) 1 else Option(p.listFiles).map(_.map(countFiles).sum).getOrElse(0)
    countFiles(new java.io.File(dir)) should be > 0
  }
}
