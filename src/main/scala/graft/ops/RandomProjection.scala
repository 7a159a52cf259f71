package graft.ops

import graft.functions.VectorFunctions
import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection — the TRAINING-FREE
  * dimensionality-reduction tier beside [[Pca]] (Achlioptas 2003:
  * a ±1/√k sign matrix preserves pairwise distances in expectation).
  * At 100 TB this is the reduction you can apply in the SAME scan
  * that ingests the vectors: no covariance pass, no driver eigen
  * work, no model state to version — the matrix derives from a seed,
  * so any executor (and any engine) reconstructs it bit-identically.
  *
  * The sign matrix comes from md5("jl:<seed>:<out-dim>:<in-dim>")
  * parity — deterministic, order-free, and buildable on the DRIVER
  * as k·d literals (k·d ≤ a few thousand for embedding-scale inputs),
  * so the projection itself is the same literal-dot-product shape as
  * [[Pca.project]]: map-only codegen, zero shuffle, and the DuckDB
  * twin re-derives nothing — it replays the identical literals.
  */
object RandomProjection {

  /** The ±1 sign for output dim `j`, input dim `i` (md5 parity —
    * first hex nibble even ⇒ +1). Public so the spec can pin the
    * derivation independently.
    */
  def sign(seed: String, j: Int, i: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"jl:$seed:$j:$i".getBytes("UTF-8"))
    if (((h(0) >> 4) & 1) == 0) 1.0 else -1.0
  }

  /** The k×d sign matrix, scaled 1/√k (JL normalization). */
  def matrix(seed: String, k: Int, d: Int): Array[Array[Double]] = {
    val s = 1.0 / math.sqrt(k.toDouble)
    Array.tabulate(k, d)((j, i) => sign(seed, j, i) * s)
  }

  /** Project `vecCol` (dim d) to k dims as columns p1..pk (4dp). */
  def project(df: DataFrame, idCol: String, vecCol: String,
              k: Int, d: Int, seed: String = "0"): DataFrame = {
    val m = matrix(seed, k, d)
    val v = col(vecCol).cast("array<double>")
    val ps = m.zipWithIndex.map { case (row, j) =>
      round(VectorFunctions.dot(v, typedLit(row.toSeq)), 4).as(s"p${j + 1}")
    }
    df.select(col(idCol) +: ps.toSeq: _*)
  }

  /** DuckDB twin — the identical literal matrix (Double.toString
    * round-trips), the same left-to-right dot fold as `graft_dot`.
    */
  def projectDuckSql(table: String, idCol: String, vecCol: String,
                     k: Int, d: Int, seed: String = "0"): String = {
    val m = matrix(seed, k, d)
    val rows = m.zipWithIndex.map { case (row, j) =>
      val lit = row.mkString("[", ", ", "]::DOUBLE[]")
      // "+ 0" folds DuckDB's round(-1e-9, 4) = -0.0 into +0.0 (the
      // Pca.projectDuckSql lesson — a zero-centered projection
      // straddles zero at scale)
      (s"$lit AS c${j + 1}",
        s"round(list_sum(list_transform(range(1, ${d + 1}), " +
          s"i -> CAST($vecCol[i] AS DOUBLE) * m.c${j + 1}[i])), 4) + 0 AS p${j + 1}")
    }
    s"""WITH m AS (SELECT ${rows.map(_._1).mkString(",\n  ")})
       |SELECT $idCol,
       |  ${rows.map(_._2).mkString(",\n  ")}
       |FROM $table, m
       |ORDER BY $idCol""".stripMargin
  }
}
