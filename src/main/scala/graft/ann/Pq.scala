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
    if (maxIters == 0) {
      // INIT-codebook fast path: zero Lloyd's steps means every block's
      // palette is exactly the per-block slices of the first ks vectors
      // by id — ONE collect instead of a dim-probe job plus one
      // KMeans init collect per block (identical centroids: KMeans init
      // is first-k-by-id, and slicing commutes with taking rows)
      // size > 0, not just non-null: the slow path probes PAST empty
      // vectors for d (first row with size(v) > 0); taking d from an
      // empty head row would yield dsub = 0 and empty codebooks
      val firstKs = df.select(col(idCol).cast("long").as("id"), v.as("__v"))
        .filter(col("__v").isNotNull && size(col("__v")) > 0)
        .orderBy(col("id").asc).limit(ks).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1)))
        .sortBy(_._1)
      require(firstKs.nonEmpty, "cannot fit k-means on an empty collection")
      val d = firstKs.head._2.length
      require(d % m == 0, s"dim $d must divide into m=$m blocks")
      val dsub = d / m
      val codebooks = (0 until m).map { b =>
        firstKs.map(_._2.slice(b * dsub, (b + 1) * dsub).toArray)
      }.toArray
      return Model(m, ks, dsub, codebooks)
    }
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

  /** DuckDB twin of `search(encode(df, fit(df, maxIters = 0)), qv(queryId))`
    * — the INIT codebook (first-ks-by-id subvectors, zero Lloyd's
    * steps), so the whole encode + asymmetric-distance pipeline is
    * closed-form SQL: palette = ranked init slices, code = the same
    * `c2 − 2·dot` argmin with the lower-idx tie-break as [[Pq.encode]],
    * ADC = per-block squared distance of the query residual to the
    * CODED palette entry. Training itself is oracle-proven separately
    * by the unrolled-Lloyd's `q_kmeans` twin ([[KMeans.assignDuckSql]]);
    * this one proves the quantize/search arithmetic. Keep m = 2: the
    * final per-row sum has two float terms, and two-term addition is
    * commutative bitwise, so the aggregation order cannot skew it.
    */
  def searchDuckSql(table: String, idCol: String, vecCol: String,
                    m: Int, ks: Int, queryId: Long, k: Int, dim: Int): String = {
    require(dim % m == 0, s"dim $dim must divide into m=$m blocks")
    val dsub = dim / m
    val rs = s"range(1, ${dsub + 1})"
    def sub(vec: String, b: String) = s"list_slice($vec, $b * $dsub + 1, ($b + 1) * $dsub)"
    s"""WITH e AS (
       |  SELECT CAST($idCol AS BIGINT) AS id, CAST($vecCol AS DOUBLE[]) AS v
       |  FROM $table WHERE $vecCol IS NOT NULL),
       |init AS (SELECT id, v FROM e ORDER BY id LIMIT $ks),
       |blocks AS (SELECT unnest(range($m)) AS b),
       |pal AS (
       |  SELECT b, row_number() OVER (PARTITION BY b ORDER BY id) - 1 AS idx,
       |    ${sub("v", "b")} AS pvec
       |  FROM init CROSS JOIN blocks),
       |codes AS (
       |  SELECT id, b, idx FROM (
       |    SELECT e.id, p.b, p.idx,
       |      row_number() OVER (PARTITION BY e.id, p.b ORDER BY
       |        list_sum(list_transform($rs, i -> p.pvec[i] * p.pvec[i]))
       |        - 2 * list_sum(list_transform($rs, i -> ${sub("e.v", "p.b")}[i] * p.pvec[i])),
       |        p.idx) AS rn
       |    FROM e CROSS JOIN pal p) t
       |  WHERE rn = 1),
       |q AS (SELECT v AS qv FROM e WHERE id = $queryId),
       |contrib AS (
       |  SELECT c.id,
       |    list_sum(list_transform($rs, i ->
       |      (p.pvec[i] - ${sub("q.qv", "c.b")}[i]) * (p.pvec[i] - ${sub("q.qv", "c.b")}[i]))) AS d
       |  FROM codes c JOIN pal p ON c.b = p.b AND c.idx = p.idx CROSS JOIN q)
       |SELECT id AS $idCol, adc FROM (
       |  SELECT id, round(sum(d), 4) AS adc FROM contrib GROUP BY id) t
       |ORDER BY adc ASC, $idCol ASC LIMIT $k""".stripMargin
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
