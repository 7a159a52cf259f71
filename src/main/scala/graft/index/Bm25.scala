package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 ranked full-text retrieval (Robertson/Sparck Jones probabilistic
  * relevance framework, the Lucene `k1`/`b` formulation) — the lexical
  * counterpart to the cosine trigram search the reference exposes via
  * `Collection.search` (reference: src/linkml_store/api/collection.py
  * search; its SimpleIndexer has no tf-idf weighting, so BM25 is an
  * engine extension, not a port).
  *
  * Scale shape (the whole point): the query's term set is a bounded
  * literal, so
  *   1. per-document term frequencies are computed in the SCAN —
  *      `size(filter(tokens, = term))` per query term, a map-only
  *      projection with no explode and no shuffle;
  *   2. corpus statistics (N, Σdl, per-term document frequencies) are
  *      ONE partial-aggregated global row;
  *   3. that 1-row frame broadcasts back onto the per-doc frequencies
  *      and the score is a fixed-arity arithmetic expression — addition
  *      order is literal in the plan, so double results are
  *      bit-identical run-to-run and engine-to-engine;
  *   4. `orderBy desc limit k` compiles to TakeOrderedAndProject.
  * Total cost at 100 TB: one corpus scan + one 1-row aggregate +
  * top-k — no posting-list shuffle, nothing quadratic anywhere.
  */
object Bm25 {

  /** Distinct lowercased whitespace terms of a query string. */
  def queryTerms(query: String): Seq[String] =
    query.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct.toSeq

  /** Top-k documents by BM25(query). Returns (idCol, score) with score
    * rounded to 4dp; docs matching no term are dropped (sparse
    * semantics, as [[Search.searchTrigram]]).
    */
  def search(df: DataFrame, idCol: String, textCol: String, query: String,
      k: Int = 10, k1: Double = 1.2, b: Double = 0.75,
      scope: graft.api.CacheScope = null): DataFrame = {
    val terms = queryTerms(query)
    require(terms.nonEmpty, "query has no terms")
    val toks = split(lower(col(textCol)), " ")
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      size(filter(toks, x => x === lit(t))).as(s"__tf$i")
    }
    // persisted: the stats aggregate and the scoring pass are two
    // actions over the same NARROW (id, dl, tf...) frame — without the
    // cache the corpus would be scanned and tokenized twice. With no
    // caller-owned scope the cache is SHORT-LIVED: the top-k (≤ k
    // rows) materializes here and the frame unpersists immediately —
    // a long-lived session issuing many searches must not accumulate
    // one pinned corpus projection per query (the pre-round-8 leak:
    // every searchBm25 persisted into CacheScope.global and nothing
    // released it until the next Bench/Verify sweep).
    val localScope = if (scope == null) new graft.api.CacheScope else scope
    val base = localScope.persist(
      df.select(col(idCol) +: size(toks).as("__dl") +: tfCols: _*))
    val dfAggs = terms.indices.map(i =>
      sum((col(s"__tf$i") > 0).cast("int")).as(s"__df$i"))
    val stats = base.agg(count(lit(1)).as("__n"),
      sum("__dl").as("__sumdl") +: dfAggs: _*)
    val out = scoreAndTake(base, stats, idCol, terms.size, k, k1, b)
    if (scope != null) out
    else {
      // eager: k rows to the driver, cache released before returning
      val rows = out.collect()
      localScope.release()
      df.sparkSession.createDataFrame(
        java.util.Arrays.asList(rows: _*), out.schema)
    }
  }

  /** All probes' top-k in ONE plan: (probe_id, idCol, score), per probe
    * bit-identical to [[search]] of that probe's query. The union of
    * every probe's terms is still a bounded literal, so one scan
    * computes every tf column, ONE 1-row aggregate carries every df,
    * and the per-probe scores emit as an array-of-structs explode
    * (nProbes rows per matching doc — never a probe×corpus shuffle:
    * the rank filter compiles to WindowGroupLimit, which prunes to ≤k
    * rows per probe per partition MAP-SIDE before the exchange). Job
    * count is independent of the probe count — the round-8 evals ran
    * one plan per probe, serializing at large probe lists.
    * Result is eager (≤ nProbes·k rows) and the scan cache released.
    */
  def searchBatch(df: DataFrame, idCol: String, textCol: String,
      probes: Seq[(Long, String)], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(probes.nonEmpty, "no probes")
    val perProbe: Seq[(Long, Seq[String])] =
      probes.map { case (pid, q) => pid -> queryTerms(q) }
    perProbe.foreach { case (pid, ts) =>
      require(ts.nonEmpty, s"probe $pid has no terms") }
    val allTerms = perProbe.flatMap(_._2).distinct
    val termIdx = allTerms.zipWithIndex.toMap
    val toks = split(lower(col(textCol)), " ")
    val tfCols = allTerms.zipWithIndex.map { case (t, i) =>
      size(filter(toks, x => x === lit(t))).as(s"__tf$i")
    }
    val localScope = new graft.api.CacheScope
    val base = localScope.persist(
      df.select(col(idCol) +: size(toks).as("__dl") +: tfCols: _*))
    val dfAggs = allTerms.indices.map(i =>
      sum((col(s"__tf$i") > 0).cast("int")).as(s"__df$i"))
    val stats = base.agg(count(lit(1)).as("__n"),
      sum("__dl").as("__sumdl") +: dfAggs: _*)
    def contribution(i: Int): Column = {
      val tf = col(s"__tf$i").cast("double")
      val dfi = col(s"__df$i").cast("double")
      val n = col("__n").cast("double")
      val sumdl = col("__sumdl").cast("double")
      val idf = log(lit(1.0) + (n - dfi + lit(0.5)) / (dfi + lit(0.5)))
      val dl = col("__dl").cast("double")
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl * n / sumdl))
    }
    // per-probe (score, matched) structs — contribution ADDITION ORDER
    // follows each probe's own term order, as the single search does
    val probeStructs = perProbe.map { case (pid, ts) =>
      val score = round(ts.map(t => contribution(termIdx(t))).reduce(_ + _), 4)
      val matched = ts.map(t => col(s"__tf${termIdx(t)}") > 0).reduce(_ || _)
      struct(lit(pid).as("probe_id"), score.as("score"), matched.as("m"))
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_id").orderBy(col("score").desc, col(idCol).asc)
    val out = base.crossJoin(broadcast(stats))
      .select(col(idCol), explode(array(probeStructs: _*)).as("p"))
      .filter(col("p.m"))
      .select(col("p.probe_id").as("probe_id"), col(idCol),
        col("p.score").as("score"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .select("probe_id", idCol, "score")
    val rows = out.collect()
    localScope.release()
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), out.schema)
  }

  private def scoreAndTake(base: DataFrame, stats: DataFrame, idCol: String,
      nTerms: Int, k: Int, k1: Double, b: Double): DataFrame = {
    val contributions: Seq[Column] = (0 until nTerms).map { i =>
      val tf = col(s"__tf$i").cast("double")
      val dfi = col(s"__df$i").cast("double")
      val n = col("__n").cast("double")
      val sumdl = col("__sumdl").cast("double")
      val idf = log(lit(1.0) + (n - dfi + lit(0.5)) / (dfi + lit(0.5)))
      val dl = col("__dl").cast("double")
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl * n / sumdl))
    }
    val anyMatch = (0 until nTerms).map(i => col(s"__tf$i") > 0).reduce(_ || _)
    base.crossJoin(broadcast(stats))
      .filter(anyMatch)
      .select(col(idCol), round(contributions.reduce(_ + _), 4).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** DuckDB twin of [[search]] — identical tokenization, identical
    * fixed-order arithmetic (sums/divisions written in the same
    * association), so the 4dp-rounded scores agree exactly.
    */
  def searchDuckSql(table: String, idCol: String, textCol: String, query: String,
      k: Int = 10, k1: Double = 1.2, b: Double = 0.75): String = {
    val terms = queryTerms(query)
    require(terms.nonEmpty, "query has no terms")
    def esc(s: String) = s.replace("'", "''")
    val tfSelects = terms.zipWithIndex.map { case (t, i) =>
      s"len(list_filter(toks, x -> x = '${esc(t)}')) AS tf$i"
    }.mkString(",\n    ")
    val dfAggs = terms.indices.map(i =>
      s"sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i").mkString(",\n    ")
    val contribs = terms.indices.map { i =>
      val idf = s"ln(1.0 + (CAST(n AS DOUBLE) - CAST(df$i AS DOUBLE) + 0.5) / (CAST(df$i AS DOUBLE) + 0.5))"
      s"$idf * (CAST(tf$i AS DOUBLE) * ${k1 + 1.0}) / " +
        s"(CAST(tf$i AS DOUBLE) + $k1 * (${1.0 - b} + $b * CAST(dl AS DOUBLE) * CAST(n AS DOUBLE) / CAST(sumdl AS DOUBLE)))"
    }.mkString("\n    + ")
    val anyMatch = terms.indices.map(i => s"tf$i > 0").mkString(" OR ")
    s"""WITH base AS (
       |  SELECT $idCol, len(toks) AS dl,
       |    $tfSelects
       |  FROM (SELECT $idCol, string_split(lower($textCol), ' ') AS toks FROM $table) t),
       |stats AS (
       |  SELECT count(*) AS n, sum(dl) AS sumdl,
       |    $dfAggs
       |  FROM base)
       |SELECT $idCol, round($contribs, 4) AS score
       |FROM base, stats
       |WHERE $anyMatch
       |ORDER BY score DESC, $idCol ASC
       |LIMIT $k""".stripMargin
  }
}
