package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Approximate sketch operators — the sub-linear scale path for
  * corpus-wide statistics a 100 TB pipeline cannot afford exactly.
  * All of these ride Spark's partial-aggregating sketch built-ins
  * (HLL++, Greenwald-Khanna/KLL, count-min-backed freqItems, Bloom):
  * one map-side sketch per partition, one tiny merge — no shuffle of
  * raw values, bounded memory at any scale. The exact counterparts
  * (`distinctValues`, `Describe.percentiles`, `Corpus.topNgrams`,
  * `Corpus.decontaminate`) stay the oracle-checked semantics; these
  * are the drop-in replacements once the exact shuffle is the
  * bottleneck.
  */
object Sketches {

  /** DETERMINISTIC Count-Min sketch over a token stream (Cormode &
    * Muthukrishnan 2005), plus the estimate-vs-exact audit for the
    * corpus's heavy hitters — the sketch tier made oracle-checkable:
    * unlike `freqItems`/HLL (engine-internal randomness), every hash
    * here is the engine's portable md5-60bit + the multiply-shift
    * permutations ([[graft.dedup.MinHash.permConsts]]), so DuckDB
    * replays the identical table and the identical estimates.
    *
    * Scale shape: the sketch is ONE keyed partial aggregation into a
    * (depth x width)-bounded table (model state, bytes); estimating
    * joins the bounded probe set against it broadcast. The exact
    * counts for the audited top-k ride the same corpus scan the exact
    * top-ngrams operator uses. CMS guarantees est >= exact — the
    * audit emits both so the overestimate is visible.
    *
    * Returns (token, exact_n, cms_est) for the exact top-`k` tokens
    * (ties toward the lexicographically smaller token).
    */
  def cmsTopK(df: DataFrame, textCol: String, k: Int = 20,
      depth: Int = 4, width: Int = 1024,
      scope: graft.api.CacheScope = graft.api.CacheScope.global): DataFrame = {
    require(depth >= 1 && width >= 1, s"bad CMS shape ($depth x $width)")
    // 32-BIT base hash (first 8 md5 hex chars): the 29-bit multiply
    // constants then keep a*h + b < 2^62 — the same overflow-free
    // envelope MinHash documents — so the identical arithmetic runs
    // in DuckDB. Persisted: the sketch build and the exact top-k are
    // two aggregations over the same narrow (tok) frame.
    val toks = scope.persist(
      df.select(explode(graft.text.TextFunctions.tokens(lower(col(textCol)))).as("tok")))
    def bucket(d: Int): Column = {
      val h = conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long")
      val (a, b) = graft.dedup.MinHash.permConsts(d)
      pmod(lit(a) * h + lit(b), lit(graft.dedup.MinHash.Mersenne61.toLong)) % width
    }
    def withBuckets(in: DataFrame): DataFrame = in.select(
      (in.columns.map(col) :+
        explode(array((0 until depth).map(d =>
          struct(lit(d).as("d"), bucket(d).as("bucket"))): _*)).as("db")): _*)
      .withColumn("d", col("db.d")).withColumn("bucket", col("db.bucket"))
      .drop("db")
    val cms = withBuckets(toks).groupBy("d", "bucket").agg(count(lit(1)).as("c"))
    val topk = toks.groupBy("tok").agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("tok").asc).limit(k)
    withBuckets(topk)
      .join(broadcast(cms), Seq("d", "bucket"))
      .groupBy(col("tok").as("token"), col("exact_n"))
      .agg(min(col("c")).as("cms_est"))
      .orderBy(col("exact_n").desc, col("token").asc)
  }

  /** DuckDB twin of [[cmsTopK]]. */
  def cmsTopKDuckSql(table: String, textCol: String, k: Int = 20,
      depth: Int = 4, width: Int = 1024): String = {
    val m = graft.dedup.MinHash.Mersenne61
    val perms = (0 until depth).map { d =>
      val (a, b) = graft.dedup.MinHash.permConsts(d)
      s"($d, $a, $b)"
    }.mkString(", ")
    s"""WITH toks AS (
       |  SELECT unnest(string_split(lower($textCol), ' ')) AS tok FROM $table),
       |h AS (
       |  SELECT tok,
       |    CAST(CAST(concat('0x', substr(md5(tok), 1, 8)) AS UBIGINT) AS BIGINT) AS hv
       |  FROM toks),
       |perms(d, a, b) AS (VALUES $perms),
       |rows_ AS (
       |  SELECT tok, d, CAST(((a * hv + b) % $m) % $width AS BIGINT) AS bucket
       |  FROM h, perms),
       |cms AS (
       |  SELECT d, bucket, count(*) AS c FROM rows_ GROUP BY d, bucket),
       |topk AS (
       |  SELECT tok, count(*) AS exact_n FROM toks GROUP BY tok
       |  ORDER BY exact_n DESC, tok ASC LIMIT $k),
       |probes AS (
       |  SELECT t.tok, t.exact_n, r.d, r.bucket
       |  FROM topk t JOIN (SELECT DISTINCT tok, d, bucket FROM rows_) r
       |    ON t.tok = r.tok)
       |SELECT p.tok AS token, p.exact_n, min(c.c) AS cms_est
       |FROM probes p JOIN cms c ON p.d = c.d AND p.bucket = c.bucket
       |GROUP BY p.tok, p.exact_n
       |ORDER BY exact_n DESC, token ASC""".stripMargin
  }

  /** Approximate distinct count per column in ONE aggregation
    * (HLL++, `rsd` relative error) — the scale path for
    * `Collection.distinctValues` cardinality checks.
    * Result: one row, one `<col>_distinct` column per input column.
    */
  def approxDistinct(df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "approxDistinct needs at least one column")
    val aggs = cols.map(c => approx_count_distinct(col(c), rsd).as(s"${c}_distinct"))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Approximate quantiles per column in ONE aggregation
    * (percentile_approx; `accuracy` trades memory for error ~1/accuracy).
    * Result: (column, probs array, quantiles array) — the scale twin
    * of Describe's exact interpolated percentiles.
    */
  def approxQuantiles(
      df: DataFrame,
      cols: Seq[String],
      probs: Seq[Double] = Seq(0.25, 0.5, 0.75),
      accuracy: Int = 10000): DataFrame = {
    require(cols.nonEmpty, "approxQuantiles needs at least one column")
    val probsArr = array(probs.map(lit): _*)
    // cast to double so every column yields array<double> (the map
    // explode needs one value type; percentile_approx is type-preserving)
    val aggs = cols.map(c =>
      percentile_approx(col(c).cast("double"), probsArr, lit(accuracy)).as(c))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // one row per column: (column, quantiles)
    wide.select(explode(map(
      cols.flatMap(c => Seq(lit(c), col(c))): _*)).as(Seq("column", "quantiles")))
      .withColumn("probs", probsArr)
      .select("column", "probs", "quantiles")
  }

  /** Heavy hitters per column via Spark's single-pass freqItems
    * (support = minimum frequency share). False positives possible
    * (the count-min style guarantee), false negatives not.
    */
  def frequentItems(df: DataFrame, cols: Seq[String], support: Double = 0.01): DataFrame =
    df.stat.freqItems(cols.toArray, support)

  /** Bloom filter over an expression's values — bounded-size set
    * membership for filter pushdown across jobs (expected items /
    * fpp size the bits). The filter itself is driver-held and
    * broadcast-friendly: ~1.2 GB for 1e9 items at 1% fpp.
    */
  def buildBloom(df: DataFrame, expr: Column, expectedItems: Long, fpp: Double = 0.01): BloomFilter =
    df.stat.bloomFilter(expr, expectedItems, fpp)

  /** Membership-test column for a built Bloom filter (false-positive
    * rate `fpp`, never false-negative) — usable as a pre-filter that
    * keeps ALL true matches and drops ~(1-fpp) of true negatives
    * before an exact verify join.
    *
    * The probe MUST hash the same representation [[buildBloom]]
    * inserted: `df.stat.bloomFilter` puts longs for integral columns
    * and UTF-8 strings for string columns, so the probe path is chosen
    * from the expression's resolved type. A silent cast (the old
    * long-only path applied to a string key) would produce FALSE
    * NEGATIVES and drop matching rows — the one failure mode a Bloom
    * pre-filter must never have. Unsupported key types fail fast.
    */
  def mightContain(df: DataFrame, bloom: BloomFilter, expr: Column): Column = {
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(bloom)
    df.select(expr).schema.head.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        val f = udf((v: Long) => bc.value.mightContainLong(v))
        f(expr.cast("long"))
      case StringType =>
        val f = udf((v: String) => v != null && bc.value.mightContainString(v))
        f(expr)
      case other => throw new IllegalArgumentException(
        s"Bloom membership supports integral and string keys (buildBloom's " +
          s"insertion types); got $other — cast the key explicitly on BOTH " +
          s"the build and probe sides")
    }
  }
}
