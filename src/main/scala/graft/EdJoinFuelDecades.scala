package graft

import org.apache.spark.sql.functions._

/** Multi-decade evidence for the Ed-Join prefix blocking's candidate
  * fuel — the [[BucketLoadDecades]] convention on the edit-distance
  * surface: runs [[graft.dedup.EdJoin.fuelAudit]] (the q_edjoin_fuel
  * machinery) on 1×/10×/100× salted copies of the sf0.01 documents —
  * THREE decades of corpus — and reports the raw candidate-pair fuel
  * Σ c·(c−1)/2 per scale. The audit is one tokenize + df + prefix
  * pass plus a vocabulary-sized aggregation per scale (no pair join),
  * so the 100× point is affordable where the full finder is not;
  * n_cand_pairs IS the size of the inverted-index join output the
  * length/count filters receive, the quantity whose growth decides
  * whether the rarest-first prefix order keeps the blocking
  * sub-quadratic as shared word-interior grams get k× hotter.
  *
  * The salted-copy construction is [[ScaleCorpus.docsX]] — the SAME
  * builder ScaleSmoke's `edjoin` finder uses, so the two evidence
  * files stay comparable by construction.
  *
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01),
  * SPARK_GRAFT_EDJOIN_SCALES (default "1,10,100").
  * Writes EDJOIN_FUEL_DECADES.json (committed-evidence convention).
  */
object EdJoinFuelDecades {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val scales = sys.env.getOrElse("SPARK_GRAFT_EDJOIN_SCALES", "1,10,100")
      .split(',').map(_.trim.toInt).toSeq
    val spark = LocalSession.build()

    val docs = Tables.df(spark, sfDir, "documents").select("doc_id", "lang", "text")

    val results = scales.map { k =>
      val corpus = ScaleCorpus.docsX(docs, k)
      val n = corpus.count()
      val t0 = System.nanoTime()
      val agg = graft.dedup.EdJoin.fuelAudit(corpus, "doc_id", "text", q = 3, d = 8)
        .agg(sum("n_cand_pairs").as("cand_pairs"),
          max("max_bucket").as("max_bucket"),
          sum("n_tokens").as("n_tokens"),
          sum("n_postings").as("n_postings"))
        .collect().head
      graft.api.CacheScope.global.release(blocking = true)
      val secs = (System.nanoTime() - t0) / 1e9
      val cand = agg.getAs[Long]("cand_pairs")
      val maxB = agg.getAs[Long]("max_bucket")
      val nTok = agg.getAs[Long]("n_tokens")
      val nPost = agg.getAs[Long]("n_postings")
      System.err.println(f"[edjoinfuel] x$k%-4d docs=$n " +
        f"cand_pairs=$cand max_bucket=$maxB n_tokens=$nTok n_postings=$nPost ($secs%.1f s)")
      (k, n, cand, maxB, nTok, nPost, secs)
    }
    val ratios = results.sliding(2).collect {
      case Seq((k0, _, c0, _, _, _, _), (k1, _, c1, _, _, _, _)) =>
        s""""x${k0}_to_x$k1":${c1.toDouble / math.max(c0, 1L)}"""
    }.toSeq
    val scaleJson = results.map { case (k, n, c, mb, nt, np, secs) =>
      s""""x$k":{"docs":$n,"cand_pairs":$c,"max_bucket":$mb,"n_tokens":$nt,"n_postings":$np,"secs":$secs}"""
    }
    val line = s"""{"metric":"edjoin_fuel_decades","q":3,"d":8,"sf":"$sfDir",""" +
      s""""scales":{${scaleJson.mkString(",")}},"cand_pair_growth":{${ratios.mkString(",")}}}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("EDJOIN_FUEL_DECADES.json"), line + "\n")
    catch { case e: Exception =>
      System.err.println(s"[edjoinfuel] write failed: ${e.getMessage}") }
    println(line)
    spark.stop()
  }
}
