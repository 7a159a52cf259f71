package graft.dedup

import graft.SparkSpec
import scala.util.Random

/** Property test: distributed min-label connected components must agree
  * with a driver-side union-find on random graphs (chains, blobs,
  * multiple components). Randomness is SEEDED so failures reproduce.
  */
class ClusterPropertySpec extends SparkSpec {
  import spark.implicits._

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // canonical root = min of component (union always hangs the larger
    // root under the smaller, and path compression preserves roots)
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("random graphs: distributed components equal a driver union-find") {
    val rnd = new Random(42)
    for (trial <- 1 to 5) {
      val n = 10 + rnd.nextInt(30)
      val nEdges = 5 + rnd.nextInt(40)
      val edges = (1 to nEdges).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        val expected = unionFind(edges)
        // exercise BOTH execution paths: threshold 0 forces the
        // distributed min-label rounds, the default takes the driver
        // union-find fast path
        for (threshold <- Seq(0L, 50000L)) {
          val got = Cluster.connectedComponents(
            edges.toDF("id_a", "id_b"), "id_a", "id_b",
            driverFoldThreshold = threshold)
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          withClue(s"trial $trial, threshold=$threshold, edges=$edges: ") {
            got shouldBe expected
          }
        }
      }
    }
  }
}
