package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar quantization (int8) for memory-bound ANN — the simpler,
  * re-rank-friendly sibling of [[Pq]]: each dimension linearly maps to
  * an 8-bit code against per-dimension global [min, max] bounds,
  *
  *   code_j = min(255, floor((x_j − min_j) / (max_j − min_j) · 256))
  *
  * A float32 64-dim vector (256 B) becomes 64 codes (64 B) — 4× less
  * memory/IO with near-exact ranking (SQ loses far less precision than
  * PQ at 4× compression; PQ wins at 32×). Search scores candidates by
  * integer L2 distance between code arrays — EXACT integer arithmetic,
  * so ties and order are bit-identical in any engine.
  *
  * Scale (100 TB):
  *  - fit: per-dimension min/max via posexplode + partial aggregation
  *    on the d-bounded dimension key (map-side combine collapses each
  *    partition to ≤ d rows before the shuffle); model state is 2·d
  *    doubles on the driver — the KMeans-centers pattern.
  *  - encode: map-only codegen transform with the bounds as literal
  *    arrays; this is the pass whose output a real deployment persists.
  *  - search: integer subtract/multiply/sum per row + TakeOrdered —
  *    no global sort, no float math against the corpus.
  */
object Sq {

  /** Per-dimension bounds; scales(j) = max_j − min_j (0 for constant
    * dimensions, which quantize to code 0).
    */
  final case class Model(mins: Array[Double], scales: Array[Double]) {
    def dim: Int = mins.length

    /** Driver-side quantization of a probe vector — the same IEEE
      * double ops (subtract, divide, scale, floor) the in-plan encode
      * and the DuckDB oracle run, in the same order.
      */
    def quantize(v: Seq[Double]): Array[Long] = {
      require(v.length == dim, s"probe dim ${v.length} != model dim $dim")
      Array.tabulate(dim) { j =>
        if (scales(j) == 0.0) 0L
        else math.min(255L, math.floor((v(j) - mins(j)) / scales(j) * 256.0).toLong)
      }
    }
  }

  /** Per-dimension global [min, max] over the corpus. */
  def fit(df: DataFrame, vecCol: String): Model = {
    val rows = df
      .select(posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "val")))
      .groupBy("pos")
      .agg(min("val").as("mn"), max("val").as("mx"))
      .orderBy("pos")
      .collect()
    Model(rows.map(_.getDouble(1)), rows.map(r => r.getDouble(2) - r.getDouble(1)))
  }

  /** Map-only int8 encode with the model bounds as literal arrays. */
  def codeExpr(vec: Column, model: Model): Column = {
    val mins = typedLit(model.mins.toSeq)
    val scales = typedLit(model.scales.toSeq)
    transform(vec.cast("array<double>"), (x, i) => {
      val mn = element_at(mins, (i + 1).cast("int"))
      val s = element_at(scales, (i + 1).cast("int"))
      when(s === 0.0, lit(0L))
        .otherwise(least(lit(255L), floor((x - mn) / s * 256.0).cast("long")))
    })
  }

  /** (idCol, code: array<bigint>) — the persisted form at scale. */
  def encode(df: DataFrame, idCol: String, vecCol: String, model: Model): DataFrame =
    df.select(col(idCol), codeExpr(col(vecCol), model).as("code"))

  /** Top-k by integer L2 distance between the probe's codes and each
    * row's codes. `encoded` is [[encode]]'s output (or any frame with
    * a `code` array column).
    */
  def search(encoded: DataFrame, idCol: String, model: Model,
      probe: Seq[Double], k: Int): DataFrame = {
    val qc = typedLit(model.quantize(probe).toSeq)
    encoded
      .withColumn("qdist",
        aggregate(zip_with(col("code"), qc, (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x))
      .select(col(idCol), col("qdist"))
      .orderBy(col("qdist").asc, col(idCol).asc)
      .limit(k)
  }

  /** DuckDB twin: replays fit (per-dim min/max via zipped unnest),
    * probe + corpus quantization, and the integer distance top-k —
    * the full loop, not just the answer.
    */
  def searchDuckSql(table: String, idCol: String, vecCol: String,
      queryId: Long, k: Int, dim: Int): String = {
    val quant = (e: String) =>
      s"""list_transform(range(1, ${dim + 1}), j -> CASE
         |    WHEN m.scales[j] = 0 THEN 0
         |    ELSE least(255, CAST(floor(($e[j] - m.mins[j]) / m.scales[j] * 256) AS BIGINT)) END)""".stripMargin
    s"""WITH v AS (
       |  SELECT $idCol, list_transform($vecCol, x -> CAST(x AS DOUBLE)) AS e
       |  FROM $table),
       |ex AS (
       |  SELECT unnest(range(1, ${dim + 1})) AS pos, unnest(e) AS val FROM v),
       |dims AS (
       |  SELECT pos, min(val) AS mn, max(val) - min(val) AS s
       |  FROM ex GROUP BY pos),
       |m AS (
       |  SELECT list(mn ORDER BY pos) AS mins, list(s ORDER BY pos) AS scales
       |  FROM dims),
       |qc AS (
       |  SELECT ${quant("v.e")} AS q
       |  FROM v, m WHERE v.$idCol = $queryId),
       |codes AS (
       |  SELECT v.$idCol, ${quant("v.e")} AS c
       |  FROM v, m)
       |SELECT codes.$idCol,
       |  CAST(list_sum(list_transform(range(1, ${dim + 1}),
       |    j -> (qc.q[j] - codes.c[j]) * (qc.q[j] - codes.c[j]))) AS BIGINT) AS qdist
       |FROM codes, qc
       |ORDER BY qdist ASC, codes.$idCol ASC
       |LIMIT $k""".stripMargin
  }
}
