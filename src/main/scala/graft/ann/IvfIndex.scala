package graft.ann

import graft.functions.VectorFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF vector index — the "build once, probe many" tier of
  * [[Knn.ivfTopK]] (which recomputes cell assignments on every call).
  *
  * Build writes the cell assignments PARTITIONED BY CELL, so a probe
  * is a partition-pruned read of `nProbe` directories — at 100 TB the
  * probe I/O is corpus_size × nProbe / nCells, not a full scan, and
  * the pruning happens in the planner (spec-asserted), not at runtime.
  * Centroids use the same deterministic first-nCells-by-id pattern as
  * [[Knn.ivfTopK]], stored beside the cells; both are bounded model
  * state (nCells rows).
  *
  * Layout under `dir`: `centroids/` (cid, vec) and `cells/`
  * (__cell=<cid>/ partitioned parquet of id, vec).
  */
object IvfIndex {

  /** Assign every row to its nearest centroid (max dot product, ties
    * to the lower cid — the [[Knn.ivfTopK]] argmin) and persist.
    * Centroids default to the deterministic first-nCells-by-id coarse
    * quantizer; pass a [[KMeans.Model]]'s centroids via the overload
    * for a trained codebook (tighter cells ⇒ better recall at the
    * same nProbe).
    */
  def build(df: DataFrame, idCol: String, vecCol: String, nCells: Int,
            dir: String): Unit = {
    val e = normalized(df, idCol, vecCol)
    val cent: Array[(Long, Seq[Double])] = e.orderBy(col("id").asc).limit(nCells)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    write(e, cent, dir)
  }

  /** Build with a provided codebook (e.g. [[KMeans.fit]] centroids). */
  def build(df: DataFrame, idCol: String, vecCol: String,
            centroids: Array[(Long, Seq[Double])], dir: String): Unit =
    write(normalized(df, idCol, vecCol), centroids, dir)

  /** Normalized index schema (id, __v) regardless of source names. */
  private def normalized(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"), col(vecCol).cast("array<double>").as("__v"))

  private def write(e: DataFrame, cent: Array[(Long, Seq[Double])], dir: String): Unit = {
    require(cent.nonEmpty, "cannot build an IVF index with no centroids")
    val spark = e.sparkSession
    import spark.implicits._
    cent.toSeq.toDF("cid", "vec")
      .write.mode("overwrite").parquet(s"$dir/centroids")
    e.withColumn("__cell", Knn.ivfCellExpr(cent))
      .write.mode("overwrite").partitionBy("__cell").parquet(s"$dir/cells")
    // bounded metadata for listings (no spark job to answer "what
    // indexes exist with what geometry")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "_CELLS"), cent.length.toString)
  }

  /** Incremental ingest into a standing index — the daily-delta path
    * at 100 TB (the [[graft.dedup.SignatureIndex]] contract applied
    * to vectors): the delta is assigned with the PERSISTED codebook
    * (same `ivfCellExpr`, so placement is identical to a full
    * rebuild) and appended as new files under the touched cell
    * directories only. The standing corpus is never read, never
    * shuffled, never rewritten; cells the delta misses gain nothing.
    * A probe afterwards sees old + new rows indistinguishably —
    * spec-pinned equal to a probe of a from-scratch rebuild on the
    * union (deterministic placement makes them the same table).
    * The codebook itself is intentionally frozen: re-training
    * centroids on drifted data is a REBUILD decision (build), not an
    * ingest decision.
    */
  def append(df: DataFrame, idCol: String, vecCol: String, dir: String): Unit = {
    val spark = df.sparkSession
    val cent = spark.read.parquet(s"$dir/centroids")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    require(cent.nonEmpty, s"no centroids at $dir — build the index first")
    normalized(df, idCol, vecCol)
      .withColumn("__cell", Knn.ivfCellExpr(cent))
      .write.mode("append").partitionBy("__cell").parquet(s"$dir/cells")
  }

  /** Exact cosine top-k within the `nProbe` cells whose centroids best
    * match the query vector. One partition-pruned scan ending in
    * TakeOrdered; only the centroid frame (nCells rows) is collected.
    */
  def probe(spark: SparkSession, dir: String, queryVec: Seq[Double], k: Int,
            nProbe: Int = 4): DataFrame = {
    val cent = spark.read.parquet(s"$dir/centroids")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    // shared with the scan-time tier: same dot fold, same -0.0
    // normalization, same (nd, cid) tie-break
    val probeCells = Knn.ivfProbeCells(cent, queryVec, nProbe)
    val qvLit = typedLit(queryVec)
    spark.read.parquet(s"$dir/cells")
      .filter(col("__cell").isin(probeCells: _*)) // planner partition pruning
      .select(col("id"),
        round(VectorFunctions.cosine(col("__v"), qvLit), 4).as("score"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
  }
}
