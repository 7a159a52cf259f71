package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structural statistics of the near-dup pair graph (edges as ordered
  * (a, b) rows, a < b — the MinHash/SimHash pair-finder contract).
  */
object GraphStats {

  /** One-row triangle census: node/edge/wedge/triangle counts and the
    * global clustering coefficient 3T/W. Every triangle a<b<c is
    * counted exactly once as the ordered path a→b→c closed by (a, c);
    * wedges = Σ C(deg, 2) in exact integers. The edge-edge join is
    * bounded by Σ deg², which the pair-finder's bucket cap bounds.
    * `edges` is referenced five times — callers pass a persisted frame
    * (the query registers it in the global CacheScope).
    */
  def triangleCensus(edges: DataFrame): DataFrame = {
    val e = edges.select(col(edges.columns(0)).as("a"), col(edges.columns(1)).as("b"))
    // ONE degree aggregation yields nodes, edges and wedges together
    // (previously three independent branches over the edge list):
    // n_nodes = |degree table|, n_edges = Σdeg/2 exactly (each edge
    // contributes twice; shiftright is the exact halving of an even
    // non-negative sum), wedges = Σ C(deg, 2) as before.
    val degStats = e.select(col("a").as("id"))
      .unionAll(e.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("dg"))
      .agg(count(lit(1)).as("n_nodes"),
        shiftright(sum(col("dg")), 1).as("n_edges"),
        sum(expr("(dg * (dg - 1)) div 2")).as("n_wedges"))
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .join(e.as("e3"),
        col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
      .agg(count(lit(1)).as("n_triangles"))
    degStats.crossJoin(tri)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        graft.ops.PortableRound.intRound4(
          lit(3L) * col("n_triangles"), col("n_wedges")).as("global_cc"))
  }
}
