package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash fingerprinting: a 60-bit locality-sensitive hash where
  * near-identical documents differ in few bits (compare by hamming
  * distance). 60 bits (not 64) so the md5-derived token hash fits a
  * signed BIGINT in both Spark and DuckDB for the oracle.
  *
  * Per document: hash each distinct token to 60 bits; fingerprint bit b
  * is 1 iff more token hashes have bit b set than not. The per-bit
  * tallies are generated as flat codegen-friendly expressions over the
  * token-hash array — one scan, no shuffle beyond the final ordering.
  */
object SimHash {
  val Bits = 60

  private def tokenHashesExpr(textCol: String): String =
    s"transform(array_distinct(split($textCol, ' ')), t -> cast(conv(substr(md5(t), 1, 15), 16, 10) as bigint))"

  private def tokenHashesDuck(textCol: String): String =
    s"list_transform(list_distinct(string_split($textCol, ' ')), t -> CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT))"

  /** SimHash fingerprint column for `textCol` (uses a precomputed
    * token-hash array column named `hs`).
    */
  private def fingerprintFromHashes(hs: String): String =
    (0 until Bits).map { b =>
      s"IF(aggregate($hs, 0L, (acc, h) -> acc + IF((shiftright(h, $b) & 1) = 1, 1L, -1L)) > 0, shiftleft(cast(1 as bigint), $b), 0L)"
    }.mkString(" + ")

  private def fingerprintFromHashesDuck(hs: String): String =
    (0 until Bits).map { b =>
      s"CASE WHEN list_sum(list_transform($hs, h -> CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END)) > 0 THEN (CAST(1 AS BIGINT) << $b) ELSE CAST(0 AS BIGINT) END"
    }.mkString(" + ")

  def fingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), expr(tokenHashesExpr(textCol)).as("__hs"))
      .select(col(idCol), expr(fingerprintFromHashes("__hs")).as("simhash"))
      .orderBy(idCol)

  def fingerprintsDuckSql(table: String, idCol: String, textCol: String): String =
    s"""SELECT $idCol, ${fingerprintFromHashesDuck("hs")} AS simhash
       |FROM (SELECT $idCol, ${tokenHashesDuck(textCol)} AS hs FROM $table) t
       |ORDER BY $idCol""".stripMargin

  /** Near-duplicate pairs by hamming distance <= maxDist. For corpus-scale
    * use, candidates should be banded on fingerprint chunks first (same
    * LSH idea as MinHash); the all-pairs form here is for bounded inputs.
    */
  def nearDupPairs(fp: DataFrame, idCol: String, maxDist: Int): DataFrame = {
    val a = fp.select(col(idCol).as("id_a"), col("simhash").as("sh_a"))
    val b = fp.select(col(idCol).as("id_b"), col("simhash").as("sh_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
      .orderBy("id_a", "id_b")
  }
}
