package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cosine top-k search over a sparse trigram index — the "S" of the
  * reference's CRUDSI surface (reference: src/linkml_store/api/
  * collection.py:810-905 search; utils/vector_utils.py:60-92 top-k).
  *
  * The query vector is tiny (bounded by query length), so it ships as a
  * broadcast join on `bucket`: each index posting meets only its own
  * bucket's query weight. dot and norms are integer sums — exact — and
  * the only float op is the final division. `orderBy desc limit k`
  * compiles to TakeOrderedAndProject (no global sort).
  */
object Search {

  /** Top-k docs by cosine between the sparse index and a query string.
    * Returns (idCol, score) with score rounded to 4dp.
    */
  def searchTrigram(
      spark: SparkSession,
      index: DataFrame,
      idCol: String,
      query: String,
      k: Int = 10,
      dim: Int = TrigramIndexer.DefaultDim): DataFrame = {
    val qv = TrigramIndexer.queryVector(query, dim)
    require(qv.nonEmpty, "query has no trigrams")
    val qNorm = math.sqrt(qv.map { case (_, c) => c.toDouble * c }.sum)
    // The query vector rides along as a map LITERAL: each posting looks
    // up its own bucket's query weight, so dot and norm come out of ONE
    // aggregation (single shuffle, no join). Zero-dot docs are dropped,
    // matching the sparse inner-join semantics.
    val qMap = map(qv.toSeq.flatMap { case (b, c) => Seq(lit(b), lit(c)) }: _*)
    index
      .withColumn("__qcnt", coalesce(element_at(qMap, col("bucket")), lit(0L)))
      .groupBy(col(idCol))
      .agg(sum(col("cnt") * col("__qcnt")).as("dot"),
        sum(col("cnt") * col("cnt")).as("nrm2"))
      .filter(col("dot") > 0)
      .select(col(idCol),
        round(col("dot") / (sqrt(col("nrm2")) * lit(qNorm)), 4).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** All probes' trigram-cosine top-k in ONE plan: (probe_id, idCol,
    * score), per probe bit-identical to [[searchTrigram]]. Each probe's
    * query vector rides as its own map literal; ONE aggregation over
    * the index computes every probe's dot plus the shared doc norm,
    * then the per-probe scores explode and the rank filter compiles to
    * WindowGroupLimit (map-side ≤k per probe per partition). Job count
    * independent of probe count. Eager (≤ nProbes·k rows).
    */
  def searchTrigramBatch(
      spark: SparkSession,
      index: DataFrame,
      idCol: String,
      probes: Seq[(Long, String)],
      k: Int = 10,
      dim: Int = TrigramIndexer.DefaultDim): DataFrame = {
    require(probes.nonEmpty, "no probes")
    val qvs = probes.map { case (pid, q) =>
      val qv = TrigramIndexer.queryVector(q, dim)
      require(qv.nonEmpty, s"probe $pid has no trigrams")
      (pid, qv, math.sqrt(qv.map { case (_, c) => c.toDouble * c }.sum))
    }
    val dotAggs = qvs.zipWithIndex.map { case ((_, qv, _), i) =>
      val qMap = map(qv.toSeq.flatMap { case (b, c) => Seq(lit(b), lit(c)) }: _*)
      sum(col("cnt") * coalesce(element_at(qMap, col("bucket")), lit(0L)))
        .as(s"__dot$i")
    }
    val probeStructs = qvs.zipWithIndex.map { case ((pid, _, qNorm), i) =>
      struct(lit(pid).as("probe_id"),
        round(col(s"__dot$i") / (sqrt(col("nrm2")) * lit(qNorm)), 4).as("score"),
        (col(s"__dot$i") > 0).as("m"))
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_id").orderBy(col("score").desc, col(idCol).asc)
    val out = index
      .groupBy(col(idCol))
      .agg(sum(col("cnt") * col("cnt")).as("nrm2"), dotAggs: _*)
      .select(col(idCol), explode(array(probeStructs: _*)).as("p"))
      .filter(col("p.m"))
      .select(col("p.probe_id").as("probe_id"), col(idCol),
        col("p.score").as("score"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .select("probe_id", idCol, "score")
    val rows = out.collect()
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
  }

  /** Duck SQL twin of [[searchTrigram]]. */
  def searchTrigramDuckSql(
      table: String,
      idCol: String,
      textCol: String,
      query: String,
      k: Int = 10,
      dim: Int = TrigramIndexer.DefaultDim): String =
    s"""WITH idx AS (${TrigramIndexer.indexDuckSql(table, idCol, textCol, dim)}),
       |qv AS (${TrigramIndexer.queryVectorDuckSql(query, dim)}),
       |norms AS (SELECT $idCol, sqrt(sum(cnt * cnt)) AS nrm FROM idx GROUP BY $idCol),
       |qn AS (SELECT sqrt(sum(qcnt * qcnt)) AS qnorm FROM qv),
       |dots AS (
       |  SELECT $idCol, sum(cnt * qcnt) AS dot
       |  FROM idx JOIN qv USING (bucket) GROUP BY $idCol)
       |SELECT dots.$idCol, round(dot / (nrm * qnorm), 4) AS score
       |FROM dots JOIN norms ON dots.$idCol = norms.$idCol, qn
       |ORDER BY score DESC, dots.$idCol ASC
       |LIMIT $k""".stripMargin

  /** Hybrid retrieval by reciprocal-rank fusion (Cormack et al. 2009):
    * fuse the BM25 lexical top-`fetchK` and the trigram-cosine
    * top-`fetchK` into one ranking with score(d) = Σ_r 1/(c + rank_r(d))
    * — the standard score-scale-free way to combine retrievers (raw
    * BM25 and cosine scores are incomparable; ranks always are). Docs
    * absent from a list contribute nothing for it (rank reported 0).
    *
    * Scale shape: both retrievals stay distributed (one corpus scan +
    * TakeOrdered each); the fusion itself touches only the two
    * ≤fetchK-row lists on the driver — the MMR bounded-re-rank
    * pattern, which also keeps the plan free of partition-less
    * windows. Returns (idCol, r_bm, r_cos, rrf) — top `k` by fused
    * score, ties to the lower id.
    */
  def hybridRrf(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      textCol: String,
      query: String,
      k: Int = 10,
      fetchK: Int = 20,
      c: Int = 60): DataFrame = {
    val bm = Bm25.search(df, idCol, textCol, query, fetchK)
      .collect().map(_.getLong(0))
    val idx = TrigramIndexer.index(df, idCol, textCol)
    val cos = searchTrigram(spark, idx, idCol, query, fetchK)
      .collect().map(_.getLong(0))
    val rBm = bm.zipWithIndex.map { case (id, i) => id -> (i + 1) }.toMap
    val rCos = cos.zipWithIndex.map { case (id, i) => id -> (i + 1) }.toMap
    val fused = (bm ++ cos).distinct.map { id =>
      val tb = rBm.get(id).map(r => 1.0 / (c + r)).getOrElse(0.0)
      val tc = rCos.get(id).map(r => 1.0 / (c + r)).getOrElse(0.0)
      // same addition order as the oracle's coalesce(bm)+coalesce(cos)
      val rrf = BigDecimal.decimal(tb + tc)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, rBm.getOrElse(id, 0), rCos.getOrElse(id, 0), rrf)
    }.sortBy { case (id, _, _, rrf) => (-rrf, id) }.take(k)
    import spark.implicits._
    fused.toSeq.toDF(idCol, "r_bm", "r_cos", "rrf")
  }

  /** DuckDB twin of [[hybridRrf]] — both retrievers' top-fetchK
    * re-ranked (the search's own deterministic order), full-outer
    * joined, fused with the identical arithmetic.
    */
  def hybridRrfDuckSql(
      table: String,
      idCol: String,
      textCol: String,
      query: String,
      k: Int = 10,
      fetchK: Int = 20,
      c: Int = 60): String =
    s"""WITH b AS (
       |  SELECT $idCol, row_number() OVER (ORDER BY score DESC, $idCol ASC) AS r
       |  FROM (${Bm25.searchDuckSql(table, idCol, textCol, query, fetchK)}) t),
       |cc AS (
       |  SELECT $idCol, row_number() OVER (ORDER BY score DESC, $idCol ASC) AS r
       |  FROM (${searchTrigramDuckSql(table, idCol, textCol, query, fetchK)}) t)
       |SELECT COALESCE(b.$idCol, cc.$idCol) AS $idCol,
       |  CAST(coalesce(b.r, 0) AS INT) AS r_bm,
       |  CAST(coalesce(cc.r, 0) AS INT) AS r_cos,
       |  round(coalesce(1.0 / ($c + b.r), 0) + coalesce(1.0 / ($c + cc.r), 0), 4) AS rrf
       |FROM b FULL OUTER JOIN cc ON b.$idCol = cc.$idCol
       |ORDER BY rrf DESC, $idCol ASC
       |LIMIT $k""".stripMargin

  /** Cosine top-`fetchK` retrieval followed by an MMR-diversified
    * re-rank down to `k` (reference: collection.py search with
    * mmr_relevance_factor). The re-rank touches only the bounded
    * top-`fetchK` rows on the driver; the retrieval stays distributed.
    * Returns (idCol, score, mmr_rank) in diversified order.
    */
  def searchTrigramMmr(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      textCol: String,
      query: String,
      k: Int = 10,
      fetchK: Int = 50,
      relevanceFactor: Double = 0.7,
      dim: Int = TrigramIndexer.DefaultDim): DataFrame = {
    val idx = TrigramIndexer.index(df, idCol, textCol, dim)
    val retrieved = searchTrigram(spark, idx, idCol, query, fetchK, dim)
      .join(df.select(col(idCol), col(textCol)), idCol)
    // Deterministic candidate order (the join above does not preserve
    // the retrieval sort): the greedy loop breaks exact-score ties by
    // first index, so the index order must be reproducible — it is the
    // tie-break contract the DuckDB oracle mirrors via row_number.
    val top = retrieved.orderBy(col("score").desc, col(idCol).asc)
      .collect() // bounded: fetchK rows
    def dense(m: Map[Long, Long]): Array[Double] = {
      val a = new Array[Double](dim)
      m.foreach { case (b, c) => a(b.toInt) = c.toDouble }
      a
    }
    val qv = dense(TrigramIndexer.queryVector(query, dim))
    val docVs = top.map(r => dense(TrigramIndexer.queryVector(
      Option(r.getAs[String](textCol)).getOrElse(""), dim))).toIndexedSeq
    val order = mmrRerank(qv, docVs, relevanceFactor, k)
    // carry the ORIGINAL id value (and its type) through the re-rank —
    // stringifying it would silently change the id column's type vs
    // search/searchTrigram
    val rows = order.zipWithIndex.map { case (i, rank) =>
      org.apache.spark.sql.Row(top(i).get(0), top(i).getAs[Double]("score"), rank + 1)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      retrieved.schema(idCol),
      org.apache.spark.sql.types.StructField("score", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("mmr_rank", org.apache.spark.sql.types.IntegerType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Duck SQL twin of [[searchTrigramMmr]] — the greedy MMR loop as a
    * recursive CTE. The recursion carries the FULL candidate state
    * (penalty = running max similarity to the chosen set) and marks each
    * step's pick with a window row_number; no correlated subqueries
    * (DuckDB silently mis-binds list correlation at depth 2 and rejects
    * correlated outer joins).
    *
    * Bit-reproducibility: trigram dots and squared norms are exact
    * integers in both engines, every float op (sqrt, *, /, the MMR
    * objective) is applied in the same order with the same correctly-
    * rounded IEEE semantics, so the argmax sequence is identical —
    * ties break on retrieval rank in both engines.
    */
  def searchTrigramMmrDuckSql(
      table: String,
      idCol: String,
      textCol: String,
      query: String,
      k: Int = 10,
      fetchK: Int = 50,
      relevanceFactor: Double = 0.7,
      dim: Int = TrigramIndexer.DefaultDim): String = {
    val rf = relevanceFactor.toString // Scala Double.toString round-trips
    s"""WITH RECURSIVE
       |idx AS MATERIALIZED (${TrigramIndexer.indexDuckSql(table, idCol, textCol, dim)}),
       |qv AS MATERIALIZED (${TrigramIndexer.queryVectorDuckSql(query, dim)}),
       |qn AS (SELECT sqrt(sum(qcnt * qcnt)) AS qnorm FROM qv),
       |norms AS (SELECT $idCol, sqrt(sum(cnt * cnt)) AS nrm FROM idx GROUP BY $idCol),
       |dots AS (
       |  SELECT $idCol, sum(cnt * qcnt) AS dot
       |  FROM idx JOIN qv USING (bucket) GROUP BY $idCol),
       |cand AS MATERIALIZED (
       |  SELECT dots.$idCol AS id,
       |         round(dot / (nrm * qnorm), 4) AS score,
       |         dot / (nrm * qnorm) AS rel,
       |         row_number() OVER (ORDER BY round(dot / (nrm * qnorm), 4) DESC, dots.$idCol ASC) AS rnk
       |  FROM dots JOIN norms ON dots.$idCol = norms.$idCol, qn
       |  ORDER BY score DESC, id ASC
       |  LIMIT $fetchK),
       |cidx AS MATERIALIZED (
       |  -- candidates' postings only, BEFORE the bucket self-join:
       |  -- filters cannot be pushed into a MATERIALIZED CTE scan, so
       |  -- joining full idx to itself first is quadratic in the corpus
       |  -- (measured: the sf0.1 compare ran 90+ CPU-minutes)
       |  SELECT i.* FROM idx i WHERE i.$idCol IN (SELECT id FROM cand)),
       |sims AS MATERIALIZED (
       |  SELECT a.$idCol AS a, b.$idCol AS b,
       |         sum(a.cnt * b.cnt) / (na.nrm * nb.nrm) AS sim
       |  FROM cidx a
       |  JOIN cidx b ON a.bucket = b.bucket AND a.$idCol <> b.$idCol
       |  JOIN norms na ON na.$idCol = a.$idCol
       |  JOIN norms nb ON nb.$idCol = b.$idCol
       |  GROUP BY a.$idCol, b.$idCol, na.nrm, nb.nrm),
       |nsel AS (SELECT least($k, count(*)) AS n FROM cand),
       |state(step, id, score, rel, rnk, pen, sel_rank) AS (
       |  SELECT 0, id, score, rel, rnk, CAST(0.0 AS DOUBLE), CAST(NULL AS BIGINT) FROM cand
       |  UNION ALL
       |  SELECT u.step + 1, u.id, u.score, u.rel, u.rnk,
       |         CASE WHEN u.sel_rank IS NULL AND u.rn <> 1
       |              THEN greatest(u.pen, coalesce(m.sim, 0.0)) ELSE u.pen END,
       |         CASE WHEN u.rn = 1 THEN u.step + 1 ELSE u.sel_rank END
       |  FROM (
       |    SELECT t2.*, max(CASE WHEN t2.rn = 1 THEN t2.id END) OVER () AS pick_id
       |    FROM (
       |      SELECT t.*, row_number() OVER (
       |          ORDER BY (t.sel_rank IS NULL) DESC,
       |                   $rf * t.rel - (1 - $rf) * t.pen DESC,
       |                   t.rnk ASC) AS rn
       |      FROM state t WHERE t.step < (SELECT n FROM nsel)
       |    ) t2
       |  ) u
       |  LEFT JOIN sims m ON m.a = u.id AND m.b = u.pick_id
       |)
       |SELECT s.id AS $idCol, s.score, CAST(s.sel_rank AS INT) AS mmr_rank
       |FROM state s, nsel
       |WHERE s.step = nsel.n AND s.sel_rank IS NOT NULL
       |ORDER BY s.sel_rank""".stripMargin
  }

  /** Maximal Marginal Relevance re-rank of an already-retrieved top-k
    * (reference: src/linkml_store/utils/vector_utils.py:94-151).
    * Driver-side by design: k is bounded (<= 100s), and the selection
    * loop is inherently sequential. Returns indices into `docVectors`
    * in diversified order.
    */
  def mmrRerank(
      queryVector: Array[Double],
      docVectors: IndexedSeq[Array[Double]],
      relevanceFactor: Double = 0.5,
      topN: Int = -1): Seq[Int] = {
    val n = docVectors.size
    val effN = if (topN < 0) n else math.min(topN, n)
    if (effN == 0) return Nil
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    def norm(a: Array[Double]): Double = math.sqrt(dot(a, a))
    val qn = norm(queryVector)
    val norms = docVectors.map(norm)
    val rel = docVectors.indices.map(i => dot(docVectors(i), queryVector) / (norms(i) * qn))
    val selected = scala.collection.mutable.ArrayBuffer[Int]()
    val chosen = scala.collection.mutable.BitSet()
    while (selected.size < effN) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < n) {
        if (!chosen(i)) {
          val diversity =
            if (selected.isEmpty) 0.0
            else (1 - relevanceFactor) * selected.map(s =>
              dot(docVectors(i), docVectors(s)) / (norms(i) * norms(s))).max
          val score = relevanceFactor * rel(i) - diversity
          if (score > bestScore) { bestScore = score; best = i }
        }
        i += 1
      }
      selected += best
      chosen += best
    }
    selected.toSeq
  }
}
