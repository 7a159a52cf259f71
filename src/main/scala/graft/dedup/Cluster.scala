package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster assignment: near-dup PAIRS (from MinHash / SimHash
  * / embedding banding) are edges; each document's cluster id is the
  * MINIMUM doc id reachable through them (connected components). The
  * standard pipeline step after pair finding — "keep one doc per
  * duplicate cluster" needs the clusters, not the pairs.
  *
  * Algorithm: iterative min-label propagation — each round every node
  * takes the min of its own label and its neighbors' labels; converges
  * in O(component diameter) rounds. Each round is one join + one
  * aggregation (all distributed, label table is |nodes| rows, edges
  * never grow), the join-based formulation that scales where a
  * driver-side union-find cannot. Near-dup components have tiny
  * diameters (dups of a doc are dups of each other), so a handful of
  * rounds suffices; `maxIter` bounds pathological chains.
  */
object Cluster {

  /** (id, cluster) for every id appearing in `pairs`; cluster = min id
    * of the component. Deterministic.
    *
    * Two execution paths with the identical output contract:
    *  - ≤ `driverFoldThreshold` directed pairs: BOUNDED-MODEL-STATE fast
    *    path (the MMR re-rank / IVF-centroids pattern) — the duplicate
    *    graph holds only docs that HAVE a duplicate, orders smaller
    *    than the corpus, and the bound is CHECKED by count before any
    *    collect. One job + a driver union-find replaces O(diameter)
    *    distributed rounds (each a join + checkpoint + action).
    *  - above it: iterative min-label propagation, fully distributed.
    */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 25,
      driverFoldThreshold: Long = 50000L,
      checkpointDir: Option[String] = None): DataFrame = {
    // opt-in RELIABLE lineage truncation: localCheckpoint blocks are
    // not rebuilt on executor loss (fine at local[32]; a 100-node run
    // losing an executor mid-iteration must rerun the job) — pass a
    // checkpoint dir (HDFS/object store) to substitute fault-tolerant
    // checkpoint() per round instead. Results are IDENTICAL either way
    // (spec-pinned); default unchanged.
    checkpointDir.foreach(pairs.sparkSession.sparkContext.setCheckpointDir)
    def truncate(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()
    // Unlike the lazy pair-finders, this builder is EAGER (the loop
    // materializes every round), so cache lifetime is internal: a local
    // scope released before returning — callers never accumulate pinned
    // edge caches.
    val scope = new graft.api.CacheScope
    // Persist the directed projection ONCE, then mirror it — the
    // incoming `pairs` is typically the full pair-finding pipeline
    // (shingles, signatures, band join, verify), and two bare
    // references would evaluate it twice.
    val p0 = scope.persist(
      pairs.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst")))
    // Iterative plans MUST truncate lineage each round: every round
    // references the previous labels twice (propagation + convergence
    // check), so without truncation the logical plan DOUBLES per round
    // and analysis OOMs after ~10 rounds. localCheckpoint materializes
    // the round eagerly and replaces the lineage with the stored blocks
    // (the documented tradeoff: blocks are not rebuilt on executor
    // loss — rerun the job on failure; a reliable checkpoint dir slots
    // in where that matters).
    try {
      val nPairs = p0.count()
      if (nPairs <= driverFoldThreshold) {
        val edges = p0.collect().map(r => (r.getLong(0), r.getLong(1)))
        val labels = driverUnionFind(edges.toSeq)
        val spark = pairs.sparkSession
        return spark.createDataFrame(
          spark.sparkContext.parallelize(
            labels.toSeq.sortBy(_._1)
              .map { case (id, c) => org.apache.spark.sql.Row(id, c) }, 1),
          org.apache.spark.sql.types.StructType.fromDDL(
            "id BIGINT NOT NULL, cluster BIGINT NOT NULL"))
      }
      // Near-dup graphs are usually TINY next to the corpus (nodes =
      // docs that have a duplicate): on a moderate graph, 32-partition
      // rounds are pure scheduling overhead, so coalesce each round to
      // a few partitions. A genuinely large graph keeps the
      // cluster-wide parallelism.
      val parts = if (nPairs < 500000) 4
        else pairs.sparkSession.sparkContext.defaultParallelism
      // undirected: propagate along both directions
      val edges = scope.persist(
        p0.unionByName(p0.select(col("dst").as("src"), col("src").as("dst")))
          .distinct().coalesce(parts))
      // Initial labels FOLD IN the first propagation round: every node
      // (mirrored edges ⇒ every node appears as src) starts at
      // min(self, direct neighbors) — one aggregation instead of a
      // full join round.
      var labels = truncate(edges.groupBy(col("src").as("id"))
        .agg(min(col("dst")).as("nmin"))
        .select(col("id"), least(col("id"), col("nmin")).as("label"))
        .coalesce(parts))
      var converged = false
      var iter = 0
      while (!converged && iter < maxIter) {
        // neighbor-min labels: for each node, the min label over its
        // neighbors this round (mirrored edges cover every node, so the
        // left join below always matches; left + least is belt-and-braces)
        val neighborMin = edges
          .join(labels.select(col("id").as("src"), col("label")), "src")
          .groupBy(col("dst").as("id")).agg(min("label").as("nlabel"))
        // Carry the convergence flag INSIDE the checkpointed round: the
        // follow-up "did anything shrink" check is then a bare scan of
        // the materialized blocks, not another join job.
        val next = truncate(labels.join(neighborMin, Seq("id"), "left")
          .select(col("id"), least(col("label"), col("nlabel")).as("label"),
            coalesce(col("nlabel") < col("label"), lit(false)).as("shrank"))
          .coalesce(parts))
        val changed = next.filter(col("shrank")).limit(1).count()
        labels = next.drop("shrank")
        converged = changed == 0
        iter += 1
      }
      require(converged, s"connectedComponents did not converge in $maxIter rounds")
      labels.select(col("id"), col("label").as("cluster"))
    } finally {
      // labels is checkpoint-truncated — it no longer references edges,
      // so the caches can go (also on the non-convergence throw)
      scope.release()
    }
  }

  /** Union-find with path compression, larger root hung under smaller —
    * the canonical root is therefore the component MINIMUM, matching
    * the distributed min-label contract exactly.
    */
  private def driverUnionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    // ITERATIVE find (walk to root, then compress): a chain-shaped
    // duplicate graph built in descending edge order creates a parent
    // chain up to the fold threshold deep — a recursive find would
    // overflow the default JVM stack on inputs the distributed path
    // handles fine
    def find(x: Long): Long = {
      var r = parent.getOrElseUpdate(x, x)
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  /** DuckDB twin: recursive label walk — every label reachable from a
    * node is enumerated, min per node = the component minimum. `pairsSql`
    * must yield columns ($aCol, $bCol).
    */
  def connectedComponentsDuckSql(pairsSql: String, aCol: String, bCol: String): String =
    s"""WITH RECURSIVE pr AS MATERIALIZED ($pairsSql),
       |edges AS MATERIALIZED (
       |  SELECT CAST($aCol AS BIGINT) AS src, CAST($bCol AS BIGINT) AS dst FROM pr
       |  UNION
       |  SELECT CAST($bCol AS BIGINT) AS src, CAST($aCol AS BIGINT) AS dst FROM pr),
       |walk(id, label) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.id
       |  WHERE w.label < e.dst),
       |cc AS (SELECT id, min(label) AS cluster FROM walk GROUP BY id)
       |SELECT id, cluster FROM cc""".stripMargin
}
