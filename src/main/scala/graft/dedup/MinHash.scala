package graft.dedup

import graft.text.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH banding near-duplicate detection over a text column.
  *
  * Pipeline (all declarative, one scan of the corpus):
  *   1. w-token shingles per document ([[TextFunctions.shingles]])
  *   2. k MinHash values: min over shingles of a seeded 60-bit md5 hash
  *   3. band keys: md5 over bands of r signature values
  *   4. candidate pairs: self-join on (band, key) — pairs only form
  *      inside buckets, so the shuffle is bounded by bucket sizes, not
  *      |corpus|² (the scale property that makes this work at 100 TB)
  *   5. verify: exact Jaccard on shingle sets, threshold filter
  *
  * Hashes are md5-derived so the identical computation runs in DuckDB
  * for the oracle (`CAST(concat('0x', substr(md5(..),1,15)) AS UBIGINT)`).
  */
object MinHash {

  /** Spark SQL expression for one seeded minhash value over `shingles`. */
  private def minhashExpr(shinglesSql: String, seed: Int): String =
    s"array_min(transform($shinglesSql, s -> cast(conv(substr(md5(concat('$seed:', s)), 1, 15), 16, 10) as bigint)))"

  // Outer CAST to signed BIGINT: values are 60-bit so they fit, and it
  // keeps DuckDB's pandas conversion integral (UBIGINT aggregates come
  // back as lossy float64 otherwise).
  private def minhashDuck(shinglesSql: String, seed: Int): String =
    s"CAST(list_min(list_transform($shinglesSql, s -> CAST(concat('0x', substr(md5(concat('$seed:', s)), 1, 15)) AS UBIGINT))) AS BIGINT)"

  /** doc signatures: (idCol, mh_0 .. mh_{k-1}). Empty-shingle docs drop out. */
  def signatures(df: DataFrame, idCol: String, textCol: String, k: Int = 8, w: Int = 3): DataFrame = {
    val sh = "__shingles"
    val base = df
      .withColumn(sh, TextFunctions.shingles(col(textCol), w))
      .filter(size(col(sh)) > 0)
    val sigCols = (0 until k).map(i => expr(minhashExpr(sh, i)).as(s"mh_$i"))
    base.select(col(idCol) +: sigCols: _*)
  }

  def signaturesDuckSql(table: String, idCol: String, textCol: String, k: Int = 8, w: Int = 3): String = {
    val sh = TextFunctions.shinglesDuck(textCol, w)
    val sigs = (0 until k).map(i => s"${minhashDuck("sh", i)} AS mh_$i").mkString(",\n  ")
    s"""SELECT $idCol, $sigs
       |FROM (SELECT $idCol, $sh AS sh FROM $table) t
       |WHERE len(sh) > 0""".stripMargin
  }

  /** Near-duplicate pairs (a < b) with exact Jaccard >= threshold.
    * bands*rowsPerBand must equal k of the signature step.
    */
  def nearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      w: Int = 3,
      bands: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    val sigs = signatures(df, idCol, textCol, k, w)
    // band key = md5 of the ':'-joined signature slice
    val bandKeys = (0 until bands).map { b =>
      val slice = (b * r until (b + 1) * r).map(i => s"mh_$i")
      struct(lit(b).as("band"), md5(concat_ws(":", slice.map(col): _*)).as("bkey"))
    }
    val exploded = sigs
      .select(col(idCol), explode(array(bandKeys: _*)).as("bk"))
      .select(col(idCol), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    val a = exploded.select(col("band"), col("bkey"), col(idCol).as("id_a"))
    val b = exploded.select(col("band"), col("bkey"), col(idCol).as("id_b"))
    val candidates = a.join(b, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    // verify with exact Jaccard on shingle sets (recompute per side:
    // cheaper than carrying shingle arrays through the band shuffle)
    val sh = df.select(col(idCol), TextFunctions.shingles(col(textCol), w).as("sh"))
    val verified = candidates
      .join(sh.select(col(idCol).as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col(idCol).as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("jaccard", round(col("inter") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    verified.orderBy("id_a", "id_b")
  }

  def nearDupPairsDuckSql(
      table: String,
      idCol: String,
      textCol: String,
      k: Int = 8,
      w: Int = 3,
      bands: Int = 4,
      threshold: Double = 0.5): String = {
    val r = k / bands
    val bandSelects = (0 until bands).map { b =>
      val slice = (b * r until (b + 1) * r).map(i => s"CAST(mh_$i AS VARCHAR)").mkString(", ")
      s"SELECT $idCol, $b AS band, md5(concat_ws(':', $slice)) AS bkey FROM sig"
    }.mkString("\nUNION ALL\n")
    val shDuck = TextFunctions.shinglesDuck(textCol, w)
    s"""WITH sig AS (${signaturesDuckSql(table, idCol, textCol, k, w)}),
       |bk AS ($bandSelects),
       |cand AS (
       |  SELECT DISTINCT a.$idCol AS id_a, b.$idCol AS id_b
       |  FROM bk a JOIN bk b ON a.band = b.band AND a.bkey = b.bkey
       |  WHERE a.$idCol < b.$idCol),
       |sh AS (SELECT $idCol, $shDuck AS sh FROM $table)
       |SELECT id_a, id_b, jaccard FROM (
       |  SELECT id_a, id_b,
       |    round(len(list_filter(sa.sh, x -> list_contains(sb.sh, x))) /
       |      CAST(len(sa.sh) + len(sb.sh) - len(list_filter(sa.sh, x -> list_contains(sb.sh, x))) AS DOUBLE), 4) AS jaccard
       |  FROM cand JOIN sh sa ON cand.id_a = sa.$idCol
       |            JOIN sh sb ON cand.id_b = sb.$idCol) t
       |WHERE jaccard >= $threshold
       |ORDER BY id_a, id_b""".stripMargin
  }
}
