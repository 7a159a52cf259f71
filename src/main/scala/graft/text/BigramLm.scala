package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hashed-bigram language-model scoring — the next rung above
  * [[UnigramLm]] on the CCNet/KenLM perplexity-filter ladder: per-doc
  * cross-entropy under an interpolated bigram model trained on the
  * corpus itself,
  *
  *   p(c | p) = λ · cnt(p,c)/cnt(p·)  +  (1−λ) · (cnt(c)+1)/(N+B)
  *
  * over md5-hashed token buckets (the DSIR hashing trick,
  * ops/Corpus.importanceWeights): hashing bounds the model's key space
  * to B unigrams / B² bigrams by construction, so model size never
  * scales with corpus vocabulary — the property that keeps a 100 TB
  * run's model joinable. Repetitive boilerplate scores low, rare-token
  * noise scores high; both tails get gated.
  *
  * Scale: the bigram stream is ONE map-only explode of a per-row
  * higher-order expression (the token-bucket array binds once per row);
  * the model is three partial aggregations of that stream; scoring is
  * one keyed join of the stream against the composed model table
  * (≤ min(|stream|, B²) rows — a LITERAL bound; AQE broadcasts it when
  * small, shuffles the honest keyed join when not). No driver state.
  *
  * Reference analog: the quality/describe family of
  * src/linkml_store/api/collection.py asked of token transitions.
  */
object BigramLm {

  /** SQL fragment: (p, c) hashed-bucket bigram structs per row; the
    * token-bucket array binds as a finish-lambda variable so it
    * evaluates once per row (TextFunctions.hashedShinglesSql idiom).
    */
  private def bigramsSql(textCol: String, nBuckets: Int): String = {
    val tb = s"transform(${TextFunctions.tokenHashesSql(textCol)}, h -> h % $nBuckets)"
    s"aggregate(array(0), $tb, (acc, x) -> acc, tb -> " +
      "IF(size(tb) < 2, cast(array() as array<struct<p: bigint, c: bigint>>), " +
      "transform(sequence(0, size(tb) - 2), i -> " +
      "named_struct('p', element_at(tb, i + 1), 'c', element_at(tb, i + 2)))))"
  }

  /** Per-document cross-entropy `-mean(ln p(c|p))` under the
    * interpolated hashed-bigram model. `lambdaPm` is the bigram
    * interpolation weight in PER MILLE (an integer, so the literal is
    * bit-identical in both engines). Documents with fewer than two
    * tokens carry no bigrams and drop out (their perplexity is
    * undefined; a pipeline gates them on length first).
    */
  def crossEntropy(df: DataFrame, idCol: String, textCol: String,
      nBuckets: Int = 1024, lambdaPm: Int = 700, roundTo: Int = 4,
      scope: graft.api.CacheScope = graft.api.CacheScope.global): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2 (got $nBuckets)")
    require(lambdaPm >= 0 && lambdaPm <= 1000, s"lambdaPm out of range: $lambdaPm")
    // one explode pass, cached: the model aggregations and the scoring
    // join both read it
    val stream = scope.persist(
      df.select(col(idCol), explode(expr(bigramsSql(textCol, nBuckets))).as("bg"))
        .select(col(idCol), col("bg.p").as("p"), col("bg.c").as("c")))
    val bi = scope.persist(stream.groupBy("p", "c").agg(count(lit(1)).as("cb")))
    // context/unigram/total counts are additive over the bigram table,
    // so they roll up from bi (<= B^2 rows) instead of re-aggregating
    // the corpus-sized stream — one corpus aggregation total, not three
    val ctx = bi.groupBy("p").agg(sum("cb").as("cp"))
    val uni = bi.groupBy(col("c").as("b")).agg(sum("cb").as("cu"))
    val tot = bi.agg(sum("cb").as("n"))
    // composed model: one row per OBSERVED bigram (<= B^2 by the hash
    // bound) carrying the full interpolated ln-probability
    val lam = lambdaPm / 1000.0
    val model = bi.join(ctx, "p")
      .join(uni, col("c") === col("b"))
      .crossJoin(broadcast(tot))
      .select(col("p"), col("c"),
        log(lit(lam) * col("cb").cast("double") / col("cp") +
          lit(1.0 - lam) * (col("cu") + 1).cast("double") / (col("n") + nBuckets))
          .as("lp"))
    stream.join(model, Seq("p", "c"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(-sum(col("lp")) / count(lit(1)), roundTo).as("xent"))
  }

  /** DuckDB twin of [[crossEntropy]]. */
  def crossEntropyDuckSql(table: String, idCol: String, textCol: String,
      nBuckets: Int = 1024, lambdaPm: Int = 700, roundTo: Int = 4): String = {
    val lam = lambdaPm / 1000.0
    val tb = s"list_transform(${TextFunctions.tokenHashesDuckSql(textCol)}, h -> h % $nBuckets)"
    s"""WITH stream AS (
       |  SELECT $idCol, bg['p'] AS p, bg['c'] AS c FROM (
       |    SELECT $idCol, unnest(CASE WHEN len(tb) < 2
       |      THEN CAST([] AS STRUCT(p BIGINT, c BIGINT)[])
       |      ELSE list_transform(range(1, len(tb)), i ->
       |        {'p': tb[i], 'c': tb[i + 1]}) END) AS bg
       |    FROM (SELECT $idCol, $tb AS tb FROM $table) t0) t1),
       |bi AS (SELECT p, c, count(*) AS cb FROM stream GROUP BY p, c),
       |ctx AS (SELECT p, count(*) AS cp FROM stream GROUP BY p),
       |uni AS (SELECT c AS b, count(*) AS cu FROM stream GROUP BY c),
       |tot AS (SELECT count(*) AS n FROM stream),
       |model AS (
       |  SELECT p, c,
       |    ln($lam * CAST(cb AS DOUBLE) / cp +
       |       ${1.0 - lam} * CAST(cu + 1 AS DOUBLE) / (n + $nBuckets)) AS lp
       |  FROM bi JOIN ctx USING (p) JOIN uni ON bi.c = uni.b, tot)
       |SELECT $idCol, count(*) AS n_bigrams,
       |  round(-sum(lp) / count(*), $roundTo) AS xent
       |FROM stream JOIN model USING (p, c)
       |GROUP BY $idCol
       |ORDER BY $idCol""".stripMargin
  }
}
