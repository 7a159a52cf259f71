package graft.ann

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication and prototypicality filtering
  * (Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
  * through semantic deduplication").
  *
  * Both operators ride the distributed [[KMeans]] fit: the embedding
  * space is clustered first, and every subsequent pairwise/ranking
  * computation happens WITHIN a cluster — the learned, data-adaptive
  * analog of an LSH bucket, so candidate generation is bounded by
  * cluster sizes and nothing all-pairs ever forms. At corpus scale k
  * is chosen ~n/targetClusterSize (the paper uses tens of thousands of
  * clusters); a maxCluster cap mirrors the LSH finders' skew guard so
  * one degenerate cluster cannot go quadratic.
  *
  * The DuckDB oracles replay the ENTIRE pipeline — the unrolled
  * Lloyd's training loop ([[KMeans.trainLoopCtes]]), the final
  * assignment, and the within-cluster pair/rank logic — so the
  * integer/boolean outputs are exact up to genuine distance ties.
  */
object SemDedup {

  /** Semantic near-duplicate pruning: a row is dropped when a LOWER-ID
    * member of ITS cluster sits within cosine `threshold` (the
    * direct-witness rule — one deterministic pass, no transitive
    * closure, so the survivor set is engine-independent). Returns
    * (idCol, cluster, kept) for every non-null-embedding row.
    */
  def semDedup(df: DataFrame, idCol: String, vecCol: String,
               k: Int, iters: Int, threshold: Double,
               maxCluster: Int = 10000,
               scope: graft.api.CacheScope = graft.api.CacheScope.global): DataFrame = {
    val model = KMeans.fit(df, idCol, vecCol, k, maxIters = iters)
    val asg = KMeans.assign(df.filter(col(vecCol).isNotNull), idCol, vecCol, model)
    val e = df.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .filter(col("__v").isNotNull)
      .withColumn("__n", VectorFunctions.norm(col("__v")))
    // pinned: BOTH sides of the within-cluster self-join and the final
    // kept-join read m — unpersisted, each reference re-ran the
    // k-literal argmin assignment and the cluster-size window
    val m = scope.persist(asg.join(e, idCol)
      // skew guard: the same-keyed window reuses the join exchange
      .withColumn("__csz", count(lit(1)).over(Window.partitionBy("cluster"))))
    val paired = m.filter(col("__csz") <= maxCluster)
    // direct-witness EXISTS as a LEFT SEMI join (round 14): the old
    // form enumerated EVERY qualifying pair, then distinct'd the b ids
    // — one extra exchange, and every witness beyond the first was
    // wasted cosine work. A semi join emits each b row at most once
    // and stops probing its cluster's build rows at the FIRST lower-id
    // witness, so dup-dense clusters short-circuit; the selected id
    // set is EXACTLY the old one (exists ⟺ at least one pair row).
    val dropped = paired
      .select(col("cluster").as("__cb"), col(idCol).as("__idb"),
        col("__v").as("__vb"), col("__n").as("__nb"))
      .join(paired.select(col("cluster").as("__ca"), col(idCol).as("__ida"),
          col("__v").as("__va"), col("__n").as("__na")),
        col("__ca") === col("__cb") && col("__ida") < col("__idb") &&
          round(VectorFunctions.dot(col("__va"), col("__vb")) /
            (col("__na") * col("__nb")), 4) >= threshold,
        "left_semi")
      .select(col("__idb"))
      .withColumn("__drop", lit(true))
    m.join(dropped, m(idCol) === dropped("__idb"), "left")
      .select(m(idCol), col("cluster"),
        coalesce(!col("__drop"), lit(true)).as("kept"))
  }

  /** DuckDB twin of [[semDedup]] on `table` (same training loop, same
    * direct-witness rule).
    */
  def semDedupDuckSql(table: String, idCol: String, vecCol: String,
                      k: Int, iters: Int, threshold: Double, dim: Int,
                      maxCluster: Int = 10000): String = {
    def dot(x: String, y: String) =
      s"list_sum(list_transform(range(1, ${dim + 1}), i -> $x[i] * $y[i]))"
    s"""WITH ${KMeans.trainLoopCtes(table, idCol, vecCol, k, iters, dim)},
       |m AS (
       |  SELECT id, cid AS cluster, v, sqrt(${dot("v", "v")}) AS nrm,
       |         count(*) OVER (PARTITION BY cid) AS csz
       |  FROM afinal),
       |dropped AS (
       |  SELECT DISTINCT b.id
       |  FROM m a JOIN m b ON a.cluster = b.cluster AND a.id < b.id
       |  WHERE a.csz <= $maxCluster AND b.csz <= $maxCluster
       |    AND round(${dot("a.v", "b.v")} / (a.nrm * b.nrm), 4) >= $threshold)
       |SELECT m.id AS $idCol, cluster, (dropped.id IS NULL) AS kept
       |FROM m LEFT JOIN dropped ON m.id = dropped.id
       |ORDER BY $idCol""".stripMargin
  }

  /** Prototypicality outliers: per cluster, flag the ceil-free top
    * floor(q·n_c) rows by distance-to-centroid (ties to the lower id)
    * — the rows SemDeDup's prototypicality filter would drop as least
    * representative of their cluster. Returns (idCol, cluster, dist,
    * outlier).
    */
  def outliers(df: DataFrame, idCol: String, vecCol: String,
               k: Int, iters: Int, q: Double): DataFrame = {
    val model = KMeans.fit(df, idCol, vecCol, k, maxIters = iters)
    val byC = Window.partitionBy("cluster")
    KMeans.assignWithDist(df, idCol, vecCol, model)
      .withColumn("__rn", row_number().over(
        byC.orderBy(col("dist").desc, col(idCol).asc)))
      .withColumn("__n", count(lit(1)).over(byC))
      .select(col(idCol), col("cluster"), col("dist"),
        (col("__rn") <= floor(col("__n") * q)).as("outlier"))
  }

  /** DuckDB twin of [[outliers]]. */
  def outliersDuckSql(table: String, idCol: String, vecCol: String,
                      k: Int, iters: Int, q: Double, dim: Int): String =
    s"""WITH ${KMeans.trainLoopCtes(table, idCol, vecCol, k, iters, dim)}
       |SELECT id AS $idCol, cid AS cluster,
       |  round(sqrt(greatest(d2, 0)), 4) AS dist,
       |  (row_number() OVER (PARTITION BY cid
       |     ORDER BY round(sqrt(greatest(d2, 0)), 4) DESC, id ASC)
       |   <= floor(count(*) OVER (PARTITION BY cid) * $q)) AS outlier
       |FROM afinal
       |ORDER BY $idCol""".stripMargin
}
