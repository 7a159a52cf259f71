package graft.dedup

import graft.text.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact n-gram Jaccard similarity pairs via an inverted shingle index —
  * the scalable formulation of all-pairs set similarity: explode
  * (doc, shingle), self-join on the shingle, count shared shingles per
  * pair, then jaccard = inter / (|A| + |B| - inter). Pairs only form for
  * documents that actually SHARE a shingle, so the shuffle is bounded by
  * shingle document-frequency, not |corpus|².
  *
  * Skew guard: shingles with document frequency above `maxDf` are
  * DROPPED before the join (from both the postings and the set sizes) —
  * each hot shingle otherwise contributes df² join rows, and one
  * stop-word trigram shared by 1% of a 100 TB corpus is ~10¹⁴ pairs in
  * a single bucket. High-DF shingles carry no near-dup signal (they are
  * the corpus' stop-grams); dropping them is the standard frequency
  * filter of set-similarity joins. The cap window partitions on the
  * SAME key as the self-join, so its exchange is reused, and the oracle
  * applies the identical cap — results stay engine-equal.
  */
object NgramJaccard {

  /** Default shingle document-frequency cap. Far above the frequency at
    * which a shingle still discriminates near-duplicates, far below the
    * df² blowup region.
    */
  val DefaultMaxDf = 1000

  def jaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      w: Int = 3,
      threshold: Double = 0.5,
      maxDf: Int = DefaultMaxDf,
      scope: graft.api.CacheScope = graft.api.CacheScope.global): DataFrame = {
    // integer shingles (one md5 per token, native one-pass expression;
    // see TextFunctions/HashedShingles) — the inverted-index join
    // shuffles 8-byte keys instead of strings
    graft.functions.GraftFunctions.register(df.sparkSession)
    val raw = df.select(col(idCol),
      explode(call_function("graft_hashed_shingles", col(textCol), lit(w))).as("s"))
    // persisted AFTER the df-cap: referenced by the size aggregation and
    // BOTH sides of the inverted-index self-join (three subplan
    // evaluations otherwise), and the cached blocks arrive
    // hash-partitioned on `s` from the cap window's exchange
    val sh = scope.persist(raw
      .withColumn("__df", count(lit(1)).over(Window.partitionBy("s")))
      .filter(col("__df") <= maxDf)
      .drop("__df"))
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val inter = sh.select(col(idCol).as("id_a"), col("s"))
      .join(sh.select(col(idCol).as("id_b"), col("s")), Seq("s"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col(idCol).as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col(idCol).as("id_b"), col("sz").as("sz_b")), "id_b")
      .withColumn("jaccard", round(col("inter").cast("double") /
        (col("sz_a") + col("sz_b") - col("inter")).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .orderBy("id_a", "id_b")
  }

  def jaccardPairsDuckSql(
      table: String,
      idCol: String,
      textCol: String,
      w: Int = 3,
      threshold: Double = 0.5,
      maxDf: Int = DefaultMaxDf): String = {
    s"""WITH sh0 AS (
       |  SELECT $idCol, unnest(${TextFunctions.hashedShinglesFromDuckSql("th", w)}) AS s
       |  FROM (SELECT $idCol, ${TextFunctions.tokenHashesDuckSql(textCol)} AS th FROM $table) t0),
       |sh AS MATERIALIZED (
       |  SELECT $idCol, s FROM sh0
       |  QUALIFY count(*) OVER (PARTITION BY s) <= $maxDf),
       |sizes AS (SELECT $idCol, count(*) AS sz FROM sh GROUP BY $idCol),
       |inter AS (
       |  SELECT a.$idCol AS id_a, b.$idCol AS id_b, count(*) AS inter
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.$idCol < b.$idCol
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b, jaccard FROM (
       |  SELECT id_a, id_b,
       |    round(inter / CAST(sa.sz + sb.sz - inter AS DOUBLE), 4) AS jaccard
       |  FROM inter JOIN sizes sa ON inter.id_a = sa.$idCol
       |             JOIN sizes sb ON inter.id_b = sb.$idCol) t
       |WHERE jaccard >= $threshold
       |ORDER BY id_a, id_b""".stripMargin
  }
}
