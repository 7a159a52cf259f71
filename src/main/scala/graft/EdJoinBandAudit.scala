package graft

/** Evidence main for the length-banded Ed-Join self-join key: runs
  * [[graft.dedup.EdJoin.bandFuelAudit]] on the documents corpus at the
  * given SF dir — the unbanded token-group pair fuel (what the
  * pre-band join enumerated) vs the banded (token, len-band) fuel
  * (what [[graft.dedup.EdJoin.edPairs]] enumerates now). Both are
  * vocabulary-sized aggregations; no pair join runs.
  *
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
  * Writes EDJOIN_BAND_AUDIT.json (committed-evidence convention).
  */
object EdJoinBandAudit {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = LocalSession.build()

    val docs = Tables.df(spark, sfDir, "documents")
    val row = graft.dedup.EdJoin.bandFuelAudit(docs, "doc_id", "text", q = 3, d = 8)
      .collect().head
    graft.api.CacheScope.global.release(blocking = true)
    val line = s"""{"metric":"edjoin_band_audit","q":3,"d":8,"band_width":8,"sf":"$sfDir",""" +
      s""""n_tokens":${row.getAs[Long]("n_tokens")},""" +
      s""""n_postings":${row.getAs[Long]("n_postings")},""" +
      s""""n_bands":${row.getAs[Long]("n_bands")},""" +
      s""""fuel_unbanded":${row.getAs[Long]("fuel_unbanded")},""" +
      s""""fuel_banded":${row.getAs[Long]("fuel_banded")},""" +
      s""""fuel_ratio":${row.getAs[Double]("fuel_ratio")}}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("EDJOIN_BAND_AUDIT.json"), line + "\n")
    catch { case e: Exception =>
      System.err.println(s"[edjoinband] write failed: ${e.getMessage}") }
    println(line)
    spark.stop()
  }
}
