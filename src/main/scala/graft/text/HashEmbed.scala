package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Feature-hashing document embeddings ("the hashing trick",
  * Weinberger et al. 2009): token → md5-derived bucket → per-bucket
  * term counts as a DENSE fixed-dim vector. This is the bridge from a
  * raw text corpus into every vector operator in the engine (k-means /
  * SemDeDup / ANN / PCA) WITHOUT an external embedding model — exactly
  * what a 100 TB bootstrap pipeline runs before any learned encoder
  * exists.
  *
  * Scale shape: map-only. The vector is built per row by a
  * fixed-arity `transform(sequence(0, dim-1), filter-count)` chain in
  * whole-stage codegen — no explode, no shuffle, no UDF; cost is
  * O(dim x tokens) per document with a small constant (a native
  * one-pass Expression is the upgrade path if dim grows past a few
  * hundred — the sparse (id, bucket, cnt) form of
  * [[graft.index.TrigramIndexer]] is the right representation at that
  * point, and [[embedSparse]] provides it). Counts are exact integers;
  * the only float is the final norm.
  */
object HashEmbed {

  /** (idCol, vec: array<int>[dim], n_toks, norm): dense hashed
    * bag-of-words per document; `norm` (the L2 length, 4dp) is emitted
    * so downstream cosine ops can normalize without a second pass.
    */
  def embed(df: DataFrame, idCol: String, textCol: String, dim: Int = 16): DataFrame = {
    require(dim >= 1, s"dim must be >= 1 (got $dim)")
    graft.functions.GraftFunctions.register(df.sparkSession)
    // one native pass: O(tokens + dim) per row in codegen
    // ([[graft.functions.HashEmbedCounts]]), bit-identical to the
    // lambda form [[embedLambda]] (spec-asserted), which stays as the
    // oracle's formulation twin; the token COUNT is spaces+1
    // arithmetic ([[TextFunctions.wsTokenCount]]) — no token array is
    // ever materialized on this path
    val vec = call_function("graft_hash_embed", col(textCol), lit(dim))
    df.select(col(idCol), vec.as("vec"),
        TextFunctions.wsTokenCount(col(textCol)).cast("int").as("n_toks"))
      .select(col(idCol), col("vec"), col("n_toks"),
        round(sqrt(aggregate(col("vec"), lit(0L),
          (acc, v) => acc + v.cast("long") * v.cast("long")).cast("double")), 4).as("norm"))
  }

  /** The higher-order-function formulation of [[embed]]'s vector —
    * O(tokens x dim) interpreted, kept as the bit-equality twin of the
    * native expression (and the shape the DuckDB oracle mirrors).
    */
  def embedLambda(df: DataFrame, idCol: String, textCol: String, dim: Int): DataFrame = {
    val toks = split(lower(col(textCol)), " ")
    val bucketed = transform(toks, t =>
      pmod(TextFunctions.portableHash60(t), lit(dim.toLong)))
    val vec = transform(sequence(lit(0), lit(dim - 1)), b =>
      size(filter(bucketed, h => h === b.cast("long"))))
    df.select(col(idCol), vec.as("vec"), size(toks).as("n_toks"))
      .select(col(idCol), col("vec"), col("n_toks"),
        round(sqrt(aggregate(col("vec"), lit(0L),
          (acc, v) => acc + v.cast("long") * v.cast("long")).cast("double")), 4).as("norm"))
  }

  /** Sparse twin (idCol, bucket, cnt) for large `dim` — one explode +
    * one keyed aggregation, the trigram-index shape.
    */
  def embedSparse(df: DataFrame, idCol: String, textCol: String, dim: Int): DataFrame = {
    require(dim >= 1, s"dim must be >= 1 (got $dim)")
    val toks = split(lower(col(textCol)), " ")
    df.select(col(idCol),
        explode(transform(toks, t =>
          pmod(TextFunctions.portableHash60(t), lit(dim.toLong)))).as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** DuckDB twin of [[embed]]. */
  def embedDuckSql(table: String, idCol: String, textCol: String, dim: Int = 16): String =
    s"""SELECT $idCol,
       |  list_transform(range(0, $dim),
       |    b -> CAST(len(list_filter(bt, h -> h = b)) AS INT)) AS vec,
       |  CAST(len(toks) AS INT) AS n_toks,
       |  round(sqrt(CAST(list_sum(list_transform(range(0, $dim),
       |    b -> CAST(len(list_filter(bt, h -> h = b)) AS BIGINT)
       |       * CAST(len(list_filter(bt, h -> h = b)) AS BIGINT))) AS DOUBLE)), 4) AS norm
       |FROM (
       |  SELECT $idCol, toks,
       |    list_transform(toks, t -> CAST(
       |      CAST(concat('0x', substr(md5(t), 1, 15)) AS UBIGINT) % $dim AS BIGINT)) AS bt
       |  FROM (SELECT $idCol, string_split(lower($textCol), ' ') AS toks FROM $table) t0) t1""".stripMargin
}
