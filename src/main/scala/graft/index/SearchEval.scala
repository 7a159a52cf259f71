package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Retrieval-quality evaluation for the lexical search surface — the
  * BM25/trigram twin of the vector tiers' `recallAtK` (ann/Matcher):
  * self-retrieval MRR@k. Each probe document's first `nTerms` tokens
  * form a query; a healthy index ranks the probe document itself at
  * or near #1. Falling MRR flags tokenization drift, scoring bugs, or
  * boilerplate floods (many docs sharing the probe's opening terms).
  *
  * Shape: probes are a FIXED bounded list (ids chosen by the caller),
  * each probe runs one [[Bm25.search]] top-k (one corpus scan + a
  * 1-row stats aggregate + TakeOrdered), and the rank extraction walks
  * the ≤k collected rows on the driver — the MMR bounded-re-rank
  * pattern. Total cost: nProbes corpus scans, nothing quadratic; at
  * 100 TB an eval runs against a sampled slice, not the full corpus.
  */
object SearchEval {

  /** Probe queries captured by the most recent [[bm25SelfMrr]] call —
    * lets the oracle (built after the queries run; the Pca.lastFit
    * pattern) inline the same query strings as literals.
    */
  @volatile var lastProbes: Seq[(Long, String)] = Seq.empty

  /** (probe_id, query, rank, rr) per probe: rank of the probe doc in
    * its own query's BM25 top-k (0 = not retrieved, rr = 0), rr
    * rounded to 4dp. Mean of rr over probes = MRR@k.
    */
  def bm25SelfMrr(df: DataFrame, idCol: String, textCol: String,
      probeIds: Seq[Long], nTerms: Int = 4, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.functions.col
    val spark = df.sparkSession
    // bounded driver state: one row per probe id
    val probes: Seq[(Long, String)] = df
      .filter(col(idCol).isin(probeIds: _*))
      .select(col(idCol).cast("long"), col(textCol).cast("string"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty)
          .take(nTerms).mkString(" "))
      .sortBy(_._1).toSeq
    lastProbes = probes
    val rows = probes.map { case (pid, q) =>
      // ≤ k rows to the driver per probe — the MMR bounded pattern
      val topk = Bm25.search(df, idCol, textCol, q, k)
        .collect().map(_.getLong(0))
      val idx = topk.indexOf(pid)
      val rank = idx + 1 // 0 when absent
      val rr = if (idx < 0) 0.0
        else BigDecimal(1.0 / rank).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (pid, q, rank, rr)
    }
    mkDF(spark, rows)
  }

  private def mkDF(spark: SparkSession, rows: Seq[(Long, String, Int, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("probe_id", "query", "rank", "rr")
  }

  /** Probe queries captured by the most recent [[retrieverAgreement]]
    * call — oracle plumbing, the [[lastProbes]] pattern.
    */
  @volatile var lastAgreeProbes: Seq[(Long, String)] = Seq.empty

  /** Retriever-agreement report: for each probe query, the top-k
    * overlap between the BM25 lexical ranking and the trigram-cosine
    * ranking — the "are my two retrieval surfaces seeing the same
    * corpus" diagnostic (low overlap flags tokenization drift between
    * the surfaces, or a stale index; it is also the signal that hybrid
    * retrieval would add value). Same bounded shape as [[bm25SelfMrr]]:
    * fixed probe list, ≤k rows per retriever per probe to the driver;
    * the trigram index frame persists across the probe loop (one
    * build, nProbes scans).
    */
  def retrieverAgreement(df: DataFrame, idCol: String, textCol: String,
      probeIds: Seq[Long], nTerms: Int = 4, k: Int = 10,
      scope: graft.api.CacheScope = graft.api.CacheScope.global): DataFrame = {
    import org.apache.spark.sql.functions.col
    val spark = df.sparkSession
    val probes: Seq[(Long, String)] = df
      .filter(col(idCol).isin(probeIds: _*))
      .select(col(idCol).cast("long"), col(textCol).cast("string"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty)
          .take(nTerms).mkString(" "))
      .sortBy(_._1).toSeq
    lastAgreeProbes = probes
    val idx = scope.persist(TrigramIndexer.index(df, idCol, textCol))
    val rows = probes.map { case (pid, q) =>
      val bm = Bm25.search(df, idCol, textCol, q, k)
        .collect().map(_.getLong(0)).toSet
      val cos = Search.searchTrigram(spark, idx, idCol, q, k)
        .collect().map(_.getLong(0)).toSet
      val inter = (bm & cos).size
      (pid, q, inter,
        BigDecimal(inter.toDouble / k).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    import spark.implicits._
    rows.toDF("probe_id", "query", "n_overlap", "overlap_at_k")
  }

  /** DuckDB twin of [[retrieverAgreement]]: replays BOTH retrievers'
    * full top-k per probe and counts the id intersection.
    */
  def retrieverAgreementDuckSql(table: String, idCol: String, textCol: String,
      probes: Seq[(Long, String)], k: Int = 10): String = {
    val parts = probes.map { case (pid, q) =>
      val esc = q.replace("'", "''")
      s"""SELECT CAST($pid AS BIGINT) AS probe_id, '$esc' AS query,
         |  CAST((SELECT count(*)
         |    FROM (SELECT $idCol FROM (${Bm25.searchDuckSql(table, idCol, textCol, q, k)}) b$pid) bb$pid
         |    JOIN (SELECT $idCol FROM (${Search.searchTrigramDuckSql(table, idCol, textCol, q, k)}) c$pid) cc$pid
         |    USING ($idCol)) AS INT) AS n_overlap,
         |  round((SELECT count(*)
         |    FROM (SELECT $idCol FROM (${Bm25.searchDuckSql(table, idCol, textCol, q, k)}) b2$pid) bb2$pid
         |    JOIN (SELECT $idCol FROM (${Search.searchTrigramDuckSql(table, idCol, textCol, q, k)}) c2$pid) cc2$pid
         |    USING ($idCol)) / ${k}.0, 4) AS overlap_at_k""".stripMargin
    }
    parts.mkString("", "\nUNION ALL\n", "\nORDER BY probe_id")
  }

  /** DuckDB twin: replays each probe's full BM25 top-k (the captured
    * query literals) and the rank/rr extraction, one CTE pair per
    * probe, UNION ALL.
    */
  def bm25SelfMrrDuckSql(table: String, idCol: String, textCol: String,
      probes: Seq[(Long, String)], k: Int = 10): String = {
    val parts = probes.map { case (pid, q) =>
      val esc = q.replace("'", "''")
      // rank re-derives the search's OWN deterministic order
      // (score DESC, id ASC) — never the subquery's physical order
      s"""SELECT CAST($pid AS BIGINT) AS probe_id, '$esc' AS query,
         |  CAST(coalesce((SELECT rnk FROM (
         |     SELECT $idCol, row_number() OVER (ORDER BY score DESC, $idCol ASC) AS rnk
         |     FROM (${Bm25.searchDuckSql(table, idCol, textCol, q, k)}) t$pid
         |   ) r$pid WHERE $idCol = $pid), 0) AS INT) AS rank,
         |  round(coalesce((SELECT 1.0 / rnk FROM (
         |     SELECT $idCol, row_number() OVER (ORDER BY score DESC, $idCol ASC) AS rnk
         |     FROM (${Bm25.searchDuckSql(table, idCol, textCol, q, k)}) u$pid
         |   ) s$pid WHERE $idCol = $pid), 0), 4) AS rr""".stripMargin
    }
    parts.mkString("", "\nUNION ALL\n", "\nORDER BY probe_id")
  }
}
