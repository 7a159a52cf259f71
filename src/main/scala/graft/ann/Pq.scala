package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization for memory-bound ANN at corpus scale: each
  * d-dim vector compresses to `m` small codes (one per contiguous
  * subspace, codebook trained by [[KMeans]] per block), and search
  * scores candidates by ASYMMETRIC DISTANCE — the query stays exact,
  * each block contributes a table lookup.
  *
  * Why this matters at 100 TB: a float32 64-dim embedding is 256
  * bytes; its PQ code at m=8 is 8 bytes — a 32× memory/IO reduction,
  * which is the difference between an index that fits in cluster RAM
  * and one that doesn't. The Spark shape keeps everything codegen:
  *  - fit: m independent [[KMeans]] fits over `slice()`d subvectors
  *    (each one aggregation job per iteration);
  *  - encode: per block, the same literal-centroid Euclidean argmin
  *    kernel, emitting the PALETTE INDEX — map-only;
  *  - search: the query's per-block distance tables (m × ks doubles)
  *    ship as literals, and the score is Σ element_at(table, code) —
  *    m array lookups per row inside whole-stage codegen, no vector
  *    math against the corpus at all.
  *
  * Approximate by construction (quantization error); recall floors
  * are pinned by PqSpec against exact Euclidean brute force.
  */
object Pq {

  /** m codebooks of ks centroids each (length d/m subvectors). */
  final case class Model(m: Int, ks: Int, dsub: Int,
      codebooks: Array[Array[Array[Double]]])

  /** Train one KMeans codebook per subspace block. */
  def fit(df: DataFrame, idCol: String, vecCol: String, m: Int,
          ks: Int = 16, maxIters: Int = 5): Model = {
    val v = col(vecCol).cast("array<double>")
    val d = df.select(size(v).as("__d")).filter(col("__d") > 0).head().getInt(0)
    require(d % m == 0, s"dim $d must divide into m=$m blocks")
    val dsub = d / m
    val codebooks = (0 until m).map { b =>
      val sub = df.select(col(idCol).as("id"),
        slice(v, b * dsub + 1, dsub).as("sub"))
      val model = KMeans.fit(sub, "id", "sub", k = ks, maxIters = maxIters)
      // palette order: centroids sorted by their (deterministic) init
      // id, so codes are stable across runs
      model.centroids.sortBy(_._1).map(_._2.toArray)
    }.toArray
    Model(m, ks, dsub, codebooks)
  }

  /** Per-block Euclidean argmin emitting the palette INDEX. */
  private def codeExpr(sub: Column, palette: Array[Array[Double]]): Column =
    array_min(array(palette.zipWithIndex.map { case (cv, idx) =>
      val c2 = cv.map(x => x * x).sum
      struct((lit(c2) - graft.functions.VectorFunctions.dot(sub, typedLit(cv.toSeq)) * 2.0).as("nd"),
        lit(idx).as("cid"))
    }: _*)).getField("cid")

  /** Compress every vector to its m-code array — map-only. `keep`
    * passes extra columns through (e.g. an IVF cell id) so callers
    * don't need a join to re-attach them.
    */
  def encode(df: DataFrame, idCol: String, vecCol: String, model: Model,
             keep: Seq[String] = Nil): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val codes = (0 until model.m).map { b =>
      codeExpr(slice(v, b * model.dsub + 1, model.dsub), model.codebooks(b))
    }
    df.select(col(idCol) +: array(codes: _*).as("codes") +: keep.map(col): _*)
  }

  /** Asymmetric-distance top-k over an encoded frame: the query's
    * exact per-block distance tables ship as literals; each row costs
    * m array lookups. Returns (id, adc) ascending (squared distance).
    */
  def search(encoded: DataFrame, idCol: String, model: Model,
             queryVec: Seq[Double], k: Int): DataFrame = {
    require(queryVec.length == model.m * model.dsub,
      s"query dim ${queryVec.length} != ${model.m * model.dsub}")
    val score = (0 until model.m).map { b =>
      val q = queryVec.slice(b * model.dsub, (b + 1) * model.dsub)
      val table: Seq[Double] = model.codebooks(b).map { cv =>
        cv.zip(q).map { case (c, x) => (c - x) * (c - x) }.sum
      }.toSeq
      element_at(typedLit(table), element_at(col("codes"), b + 1) + 1)
    }.reduce(_ + _)
    encoded
      .select(col(idCol), round(score, 4).as("adc"))
      .orderBy(col("adc").asc, col(idCol).asc)
      .limit(k)
  }
}
