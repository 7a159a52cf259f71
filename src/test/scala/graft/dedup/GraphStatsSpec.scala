package graft.dedup

import graft.SparkSpec

class GraphStatsSpec extends SparkSpec {
  import spark.implicits._

  test("triangle census on a hand graph (fused degree aggregate)") {
    // triangle 1-2-3 plus pendant 3-4: 4 nodes, 4 edges,
    // degs = (1:2, 2:2, 3:3, 4:1) -> wedges = 1+1+3+0 = 5, 1 triangle,
    // cc = 3*1/5 = 0.6
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val row = GraphStats.triangleCensus(edges).collect().head
    row.getLong(row.fieldIndex("n_nodes")) shouldBe 4L
    row.getLong(row.fieldIndex("n_edges")) shouldBe 4L
    row.getLong(row.fieldIndex("n_wedges")) shouldBe 5L
    row.getLong(row.fieldIndex("n_triangles")) shouldBe 1L
    row.getDouble(row.fieldIndex("global_cc")) shouldBe 0.6
  }

  test("edge-free and triangle-free graphs") {
    val path = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val row = GraphStats.triangleCensus(path).collect().head
    row.getLong(row.fieldIndex("n_nodes")) shouldBe 3L
    row.getLong(row.fieldIndex("n_edges")) shouldBe 2L
    row.getLong(row.fieldIndex("n_wedges")) shouldBe 1L
    row.getLong(row.fieldIndex("n_triangles")) shouldBe 0L
  }
}
