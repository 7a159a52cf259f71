package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.{HashEmbed, TextFunctions}

/** Hard-negative mining for retrieval training: for each probe
  * document in a BOUNDED probe set, the top-k most-similar documents
  * drawn from a DIFFERENT source — the classic contrastive-pairs
  * builder (cf. linkml-store's vector search surface; built here on
  * the hashing-trick embeddings so it runs before any learned encoder
  * exists).
  *
  * Scale shape: the probe set is a FIXED-SIZE deterministic sample —
  * global top-`nProbes` by a portable 60-bit hash of the id (one
  * TakeOrderedAndProject: per-partition top-k, then a driver merge of
  * `nProbes` rows per partition). That bounds the broadcast side by a
  * CONSTANT regardless of corpus size, so the cross-source BNLJ costs
  * O(nProbes x corpus) — one corpus scan per run, linear at any
  * scale. (The earlier `id % 50` formulation sampled a constant
  * FRACTION: the broadcast grew with the corpus and the join went
  * O(n²/50) — exactly the shape this module exists to avoid.)
  * Integer dot products over 4dp-rounded norms keep Spark and the
  * DuckDB oracle bit-equal.
  */
object HardNegatives {

  /** (probe_id, neg_id, sim, rnk): top-`topK` cross-source negatives
    * per probe, cosine on dim-`dim` hashed embeddings.
    */
  def mine(df: DataFrame, idCol: String, srcCol: String, textCol: String,
      dim: Int = 16, nProbes: Int = 24, topK: Int = 3): DataFrame = {
    require(nProbes >= 1 && topK >= 1, s"nProbes/topK must be >= 1")
    val emb = HashEmbed.embed(df, idCol, textCol, dim)
      .join(df.select(col(idCol), col(srcCol)), Seq(idCol))
      .filter(col("norm") > 0)
      .select(col(idCol), col(srcCol),
        col("vec").cast("array<double>").as("v"), col("norm"))
    // deterministic fixed-size probe sample: hash-ordered global top-n
    val probes = emb
      .orderBy(TextFunctions.portableHash60(col(idCol).cast("string")).asc,
        col(idCol).asc)
      .limit(nProbes)
      .select(col(idCol).as("probe_id"), col(srcCol).as("psrc"),
        col("v").as("pv"), col("norm").as("pn"))
    emb.join(broadcast(probes), col(srcCol) =!= col("psrc"))
      .withColumn("sim", round(
        call_function("graft_dot", col("pv"), col("v")) / (col("pn") * col("norm")), 4))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("probe_id")
          .orderBy(col("sim").desc, col(idCol).asc)))
      .filter(col("rnk") <= topK)
      .select(col("probe_id"), col(idCol).as("neg_id"), col("sim"), col("rnk"))
  }

  /** DuckDB twin of [[mine]] (same hash-ordered probe sample, same
    * integer dots / 4dp norms), ordered for the comparator.
    */
  def mineDuckSql(table: String, idCol: String, srcCol: String,
      textCol: String, dim: Int = 16, nProbes: Int = 24, topK: Int = 3): String =
    s"""WITH emb AS (
       |  SELECT e.$idCol, d.$srcCol, e.vec, e.norm
       |  FROM (${HashEmbed.embedDuckSql(table, idCol, textCol, dim)}) e
       |  JOIN $table d USING ($idCol)
       |  WHERE e.norm > 0),
       |probes AS (
       |  SELECT $idCol AS probe_id, $srcCol AS psrc, vec AS pv, norm AS pn
       |  FROM emb
       |  ORDER BY CAST(concat('0x', substr(md5(CAST($idCol AS VARCHAR)), 1, 15)) AS UBIGINT) ASC,
       |           $idCol ASC
       |  LIMIT $nProbes),
       |scored AS (
       |  SELECT p.probe_id, e.$idCol AS neg_id,
       |    round(list_sum(list_transform(range(1, ${dim + 1}),
       |      i -> CAST(p.pv[i] AS DOUBLE) * e.vec[i])) / (p.pn * e.norm), 4) AS sim
       |  FROM probes p JOIN emb e ON e.$srcCol <> p.psrc)
       |SELECT probe_id, neg_id, sim, CAST(rnk AS INT) AS rnk FROM (
       |  SELECT probe_id, neg_id, sim, row_number() OVER (
       |    PARTITION BY probe_id ORDER BY sim DESC, neg_id ASC) AS rnk
       |  FROM scored) r
       |WHERE rnk <= $topK
       |ORDER BY probe_id, rnk""".stripMargin
}
