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

  /** Scala twins of [[cmsTopK]]'s bucket arithmetic for the streaming
    * tier: md5 runs ONCE per token ([[cmsBaseHash]], thread-local
    * digest — the TokenHashes60 discipline), the per-depth buckets are
    * pure multiply-shift arithmetic over that cached base
    * ([[cmsBucketFromHash]]) — the same "1 hash, k permutations"
    * envelope the batch sketch documents.
    */
  private val cmsDigest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 8 md5 hex chars of the token as a 32-bit base hash. */
  def cmsBaseHash(tok: String): Long = {
    val md = cmsDigest.get()
    md.reset()
    val dg = md.digest(tok.getBytes("UTF-8"))
    // first 8 hex chars == first 4 bytes, big-endian, unsigned
    ((dg(0) & 0xffL) << 24) | ((dg(1) & 0xffL) << 16) |
      ((dg(2) & 0xffL) << 8) | (dg(3) & 0xffL)
  }

  /** Bucket for depth `d` from a [[cmsBaseHash]] value. */
  def cmsBucketFromHash(h: Long, d: Int, width: Int): Int = {
    val (a, b) = graft.dedup.MinHash.permConsts(d)
    (((a * h + b) % graft.dedup.MinHash.Mersenne61.toLong) % width).toInt
  }

  /** Composition of the two (one fresh md5) — test/reference form. */
  def cmsBucket(tok: String, d: Int, width: Int): Int =
    cmsBucketFromHash(cmsBaseHash(tok), d, width)

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

  // --------------------------------------------------------------------
  // Deterministic HLL / KMV — the oracle-REPLAYABLE sketch tier.
  //
  // Spark's own approx_count_distinct (HLL++) is correct but its hash
  // is engine-internal, so DuckDB can only check it rows-only. The
  // estimators below rebuild the classic sketches from the engine's
  // portable md5-60bit hash (Flajolet et al. 2007 HyperLogLog;
  // Bar-Yossef et al. 2002 / Beyer et al. 2007 KMV "k-minimum-values"),
  // so the oracle replays the REGISTERS themselves, not just the
  // answer. Determinism discipline (the q_cms_topk convention):
  //  - every per-row quantity is integer arithmetic on the 60-bit hash
  //    (register index = top p bits, rank = leading-zero count via
  //    length(bin(rest)) — identical minimal-width bin() in both
  //    engines);
  //  - the HLL denominator Σ 2^(-rank) is summed as the EXACT integer
  //    Σ 2^(maxRank - rank) (max 2^61, fits a long), so the sum is
  //    order-free — no float-accumulation drift across partitionings;
  //  - the only floats are one final division, one optional ln() in
  //    the standard small-range linear-counting correction, and the
  //    4dp output rounding.
  //
  // Scale shape: a register table is ONE partial-aggregating groupBy
  // into (groups × m) rows of bytes — no shuffle of raw values, and
  // registers MERGE by per-index max (the property [[hllUnionMerge]]
  // proves cross-engine): per-partition sketches union without rescan,
  // the whole point of sketching 100 TB.
  // --------------------------------------------------------------------

  /** Hash width of [[graft.text.TextFunctions.portableHash60]]. */
  private val HashBits = 60

  /** Standard HLL bias-correction constant for m = 2^p registers. */
  private def hllAlpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _ => 0.7213 / (1.0 + 1.079 / m)
  }

  /** Per-(group, register) max-rank table: idx = top `p` hash bits,
    * rank = leading zeros of the remaining (60-p) bits + 1. Duplicate
    * keys collapse for free (same (idx, rank) → max) — HLL insertion
    * is idempotent, no distinct pass needed.
    */
  private def hllRegisters(df: DataFrame, keyCol: String, groupCols: Seq[String], p: Int): DataFrame =
    hllRegistersFromHashes(
      df.select(groupCols.map(col) :+
          graft.text.TextFunctions.portableHash60(col(keyCol).cast("string")).as("h"): _*)
        // a NULL key would otherwise become a phantom (idx=NULL, r=NULL)
        // register: counted in nreg but skipped by the rank sum, biasing
        // v against an exact side that ignores nulls — dropped here and
        // in the Duck twins' WHERE identically
        .filter(col("h").isNotNull),
      groupCols, p)

  /** [[hllRegisters]] over an already-hashed frame carrying `h` — lets
    * a multi-p sweep ([[sketchTuning]]) hash the corpus ONCE.
    */
  private def hllRegistersFromHashes(hashed: DataFrame, groupCols: Seq[String], p: Int): DataFrame = {
    val restBits = HashBits - p
    val restMod = 1L << restBits
    val maxRank = restBits + 1
    hashed
      .withColumn("idx", shiftright(col("h"), restBits))
      .withColumn("rst", col("h") % restMod)
      .withColumn("r",
        when(col("rst") === 0, lit(maxRank))
          .otherwise(lit(maxRank) - length(bin(col("rst")))))
      .groupBy((groupCols.map(col) :+ col("idx")): _*)
      .agg(max(col("r")).as("r"))
  }

  /** Estimate column bundle from a register table: groups → (nreg, v,
    * raw, est). The raw estimate αm²/Σ2^(-M_j) divides two exact
    * integers (see the header note), so it is bit-identical across
    * engines and partitionings; the ≤2.5m small-range branch applies
    * the standard linear-counting correction m·ln(m/V).
    */
  private def hllEstimate(regs: DataFrame, groupCols: Seq[String], p: Int): DataFrame = {
    val m = 1 << p
    val maxRank = HashBits - p + 1
    val twoS = math.pow(2.0, maxRank) // exact power of two
    val alphaMM = hllAlpha(m) * m * m
    val grouped =
      if (groupCols.isEmpty) regs.groupBy()
      else regs.groupBy(groupCols.map(col): _*)
    grouped
      .agg(count(lit(1)).as("nreg"),
        sum(expr(s"shiftleft(cast(1 as bigint), $maxRank - r)")).as("dh"))
      .withColumn("v", lit(m.toLong) - col("nreg"))
      .withColumn("denom", col("v") * lit(1L << maxRank) + col("dh"))
      .withColumn("raw", (lit(alphaMM) * lit(twoS)) / col("denom").cast("double"))
      .withColumn("est",
        when(col("raw") <= lit(2.5 * m) && col("v") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("v").cast("double")))
          .otherwise(col("raw")))
  }

  /** DuckDB CTE fragment: `rows_<tag>` + `regs_<tag>` (per-g register
    * table) over a `h_<tag>(g, h)` CTE the caller supplies.
    */
  private def hllRegsDuck(tag: String, p: Int): String = {
    val restBits = HashBits - p
    val restMod = 1L << restBits
    val maxRank = restBits + 1
    s"""rows_$tag AS (
       |  SELECT g, (h >> $restBits) AS idx,
       |    CASE WHEN (h % $restMod) = 0 THEN $maxRank
       |         ELSE $maxRank - length(bin(h % $restMod)) END AS r
       |  FROM h_$tag),
       |regs_$tag AS (
       |  SELECT g, idx, max(r) AS r FROM rows_$tag GROUP BY g, idx)""".stripMargin
  }

  /** DuckDB CTE fragment: `agg_<tag>` + `fin_<tag>(g, v, est)` over an
    * arbitrary register relation `regsRel(g, idx, r)` — the exact
    * mirror of [[hllEstimate]]'s integer-denominator arithmetic.
    */
  private def hllFinDuck(tag: String, regsRel: String, p: Int): String = {
    val m = 1 << p
    val maxRank = HashBits - p + 1
    val twoS = math.pow(2.0, maxRank)
    val alphaMM = hllAlpha(m) * m * m
    // string-cast double literals: a bare decimal literal is DECIMAL in
    // DuckDB and the register sum would overflow DECIMAL(18) multiply
    val raw = s"((CAST('$alphaMM' AS DOUBLE) * CAST('$twoS' AS DOUBLE)) / " +
      s"CAST((($m - nreg) * ${1L << maxRank} + dh) AS DOUBLE))"
    s"""agg_$tag AS (
       |  SELECT g, count(*) AS nreg,
       |    sum((CAST(1 AS BIGINT) << ($maxRank - r))) AS dh
       |  FROM $regsRel GROUP BY g),
       |fin_$tag AS (
       |  SELECT g, ($m - nreg) AS v,
       |    CASE WHEN $raw <= ${2.5 * m} AND ($m - nreg) > 0
       |         THEN $m.0 * ln($m.0 / CAST(($m - nreg) AS DOUBLE))
       |         ELSE $raw END AS est
       |  FROM agg_$tag)""".stripMargin
  }

  /** The portable 60-bit hash as DuckDB SQL over a key expression. */
  private def hash60Duck(keySql: String): String =
    s"CAST(CAST(concat('0x', substr(md5(CAST($keySql AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT)"

  /** Public register-table builder for PERSISTED sketch rollups: one
    * row per (groupCols…, idx, r, hll_p). Write this per day/shard/
    * partition; any subset later merges by max(r) per (group, idx) and
    * estimates WITHOUT rescanning raw data — [[hllUnionMerge]] proves
    * the merge is bit-exact, SketchesSpec pins the parquet round-trip.
    * This is the day-over-day distinct-users rollup at 100 TB: bytes
    * per (day, group) instead of a rescan of every day in the window.
    *
    * `hll_p` persists the register width alongside the shards so the
    * read side can fail fast on a write/estimate p mismatch (a silent
    * mismatch would mis-split every hash into idx/rank and produce
    * confidently wrong estimates).
    */
  def hllRegisterTable(df: DataFrame, keyCol: String, groupCols: Seq[String],
      p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"p out of range [4,16]: $p")
    hllRegisters(df, keyCol, groupCols, p).withColumn("hll_p", lit(p))
  }

  /** Estimates from a (possibly merged, possibly reloaded) register
    * table — the read side of [[hllRegisterTable]]. Returns
    * (groupCols…, est). If the table still carries the `hll_p` column
    * (a max-merge that grouped it away loses it — acceptable, the
    * shards were validated at write time), any row whose recorded p
    * disagrees with this call's `p` raises at execution rather than
    * silently folding registers of the wrong width.
    */
  def hllEstimateTable(regs: DataFrame, groupCols: Seq[String], p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"p out of range [4,16]: $p")
    hllEstimate(hllCheckP(regs, p), groupCols, p)
      .select((groupCols.map(col) :+ col("est")): _*)
  }

  /** Guard shared by the register-table read paths: any row whose
    * recorded hll_p disagrees with this call's `p` raises at execution
    * rather than silently folding registers of the wrong width. The
    * guard rides the r column itself so column pruning can never
    * optimize the check away; coalesce makes a NULL hll_p (legacy
    * shard unioned in with allowMissingColumns) raise an INTELLIGIBLE
    * message, not a concat-with-NULL null message. Tables without the
    * column pass through with a stderr warning — the caller owns the
    * contract, but losing provenance silently was the round-12 ADVICE
    * asymmetry vs the KMV side.
    */
  private def hllCheckP(regs: DataFrame, p: Int): DataFrame =
    if (regs.columns.contains("hll_p")) {
      regs.withColumn("r",
        when(col("hll_p") === lit(p), col("r"))
          .otherwise(raise_error(concat(
            lit("hll_p mismatch: register table written at p="),
            coalesce(col("hll_p").cast("string"),
              lit("NULL (legacy shard without provenance)")),
            lit(s", estimated at p=$p")))))
    } else {
      System.err.println(s"[graft] hllCheckP: register table has no hll_p " +
        s"provenance column — cannot verify it was written at p=$p; a " +
        s"mismatched shard would mis-split every hash into idx/rank")
      regs
    }

  /** Merge register-table shards by per-(group, idx) max — the
    * PROVENANCE-PRESERVING rollup twin of [[kmvMergeSignatures]] (the
    * round-12 ADVICE asymmetry: an ad-hoc max-merge drops hll_p, after
    * which [[hllEstimateTable]] can no longer fail fast on a p
    * mismatch). Validates every shard's hll_p against `p` (riding the
    * r column, like the read path), merges by max(r), and re-stamps
    * hll_p. max is associative, so merging shard signatures equals
    * sketching the union directly ([[hllUnionMerge]] pins the
    * bit-equality); output schema matches [[hllRegisterTable]].
    */
  def hllMergeRegisterTables(regs: DataFrame, groupCols: Seq[String],
      p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"p out of range [4,16]: $p")
    hllCheckP(regs, p)
      .groupBy((groupCols :+ "idx").map(col): _*)
      .agg(max(col("r")).as("r"))
      .withColumn("hll_p", lit(p))
  }

  /** Per-group HLL distinct-count estimate AUDITED against the exact
    * count: (group, exact_distinct, hll_est, rel_err). `p` register
    * bits → m = 2^p registers, standard error ≈ 1.04/√m (p=8 → 6.5%).
    * The exact side is the audit; at 100 TB only the register pass
    * runs (one bounded partial agg, mergeable across days/shards).
    */
  def hllDistinct(df: DataFrame, keyCol: String, groupCol: String, p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"p out of range [4,16]: $p")
    // explicit projection, not withColumnRenamed: an input that already
    // carries a column named "g"/"k" would otherwise go ambiguous.
    // Deliberately TWO raw scans (register pass + exact audit), no
    // persisted projection: measured at sf0.1 the cache write costs
    // what the saved rescan saves (±, noise), and at 100 TB
    // materializing a corpus-sized projection to skip a columnar
    // rescan is a strictly worse trade (the exact side drops there
    // anyway — only the register pass runs).
    val est = hllEstimate(
      hllRegisters(df.select(col(groupCol).as("g"), col(keyCol).as("k")),
        "k", Seq("g"), p), Seq("g"), p)
    val exact = df.groupBy(col(groupCol).as("g"))
      .agg(countDistinct(col(keyCol)).as("exact_distinct"))
    exact.join(est, "g")
      .select(col("g").as(groupCol), col("exact_distinct"),
        round(col("est"), 4).as("hll_est"),
        round(abs(col("est") - col("exact_distinct")) / col("exact_distinct"), 4).as("rel_err"))
  }

  /** DuckDB twin of [[hllDistinct]]. */
  def hllDistinctDuckSql(table: String, keyCol: String, groupCol: String, p: Int = 8): String =
    s"""WITH h_d AS (
       |  SELECT $groupCol AS g, ${hash60Duck(keyCol)} AS h FROM $table
       |  WHERE $keyCol IS NOT NULL),
       |${hllRegsDuck("d", p)},
       |${hllFinDuck("d", "regs_d", p)},
       |ex AS (
       |  SELECT $groupCol AS g, count(DISTINCT $keyCol) AS exact_distinct
       |  FROM $table GROUP BY 1)
       |SELECT ex.g AS $groupCol, ex.exact_distinct,
       |  round(f.est, 4) AS hll_est,
       |  round(abs(f.est - ex.exact_distinct) / ex.exact_distinct, 4) AS rel_err
       |FROM ex JOIN fin_d f ON ex.g = f.g""".stripMargin

  /** The HLL MERGE proof, oracle-checked: per-group register tables
    * merged by per-index max estimate the distinct count of the UNION
    * — and the merged estimate is BIT-IDENTICAL to sketching the whole
    * input directly (max is associative; every downstream quantity is
    * integer until one final division). One row: (exact_distinct,
    * direct_est, merged_est, merge_exact=1). This is the property that
    * makes HLL the 100 TB path: per-shard/per-day sketches union
    * without rescanning raw data.
    */
  def hllUnionMerge(df: DataFrame, keyCol: String, groupCol: String, p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"p out of range [4,16]: $p")
    // Deliberately separate raw scans per side (see hllDistinct's
    // note): the DIRECT registers must fold raw hashes — deriving them
    // from perGroup would make the merge proof a tautology — and a
    // persisted hash projection measured neutral at sf0.1 while being
    // the wrong shape at 100 TB.
    val projected = df.select(col(groupCol).as("g"), col(keyCol).as("k"))
    val perGroup = hllRegisters(projected, "k", Seq("g"), p)
    val merged = hllEstimate(
      perGroup.groupBy("idx").agg(max(col("r")).as("r")), Nil, p)
      .select(col("est").as("merged_est_raw"))
    val direct = hllEstimate(hllRegisters(projected.select("k"), "k", Nil, p), Nil, p)
      .select(col("est").as("direct_est_raw"))
    val exact = df.agg(countDistinct(col(keyCol)).as("exact_distinct"))
    // 1-row global aggregates on every side: broadcast crossJoin is the
    // registry's totals idiom (never a CartesianProductExec)
    exact.crossJoin(broadcast(direct)).crossJoin(broadcast(merged))
      .select(col("exact_distinct"),
        round(col("direct_est_raw"), 4).as("direct_est"),
        round(col("merged_est_raw"), 4).as("merged_est"),
        (col("merged_est_raw") === col("direct_est_raw")).cast("int").as("merge_exact"))
  }

  /** DuckDB twin of [[hllUnionMerge]]. */
  def hllUnionMergeDuckSql(table: String, keyCol: String, groupCol: String, p: Int = 8): String =
    s"""WITH h_g AS (
       |  SELECT $groupCol AS g, ${hash60Duck(keyCol)} AS h FROM $table
       |  WHERE $keyCol IS NOT NULL),
       |${hllRegsDuck("g", p)},
       |h_u AS (SELECT 1 AS g, h FROM h_g),
       |${hllRegsDuck("u", p)},
       |regs_m AS (SELECT 1 AS g, idx, max(r) AS r FROM regs_g GROUP BY idx),
       |${hllFinDuck("u", "regs_u", p)},
       |${hllFinDuck("m", "regs_m", p)},
       |ex AS (SELECT count(DISTINCT $keyCol) AS exact_distinct FROM $table)
       |SELECT ex.exact_distinct,
       |  round(d.est, 4) AS direct_est,
       |  round(m.est, 4) AS merged_est,
       |  CAST(m.est = d.est AS INTEGER) AS merge_exact
       |FROM ex, fin_u d, fin_m m""".stripMargin

  /** Executor-side fold of one key into an HLL register array — the
    * Scala twin of [[hllRegisters]]'s per-row arithmetic (same 60-bit
    * hash, same idx/rank split; bitlen via numberOfLeadingZeros ==
    * `length(bin(x))`). Used by the streaming tier, whose state is
    * exactly this m-byte array per group.
    */
  def hllFold(registers: Array[Byte], key: String, p: Int): Unit = {
    require(registers.length == (1 << p),
      s"register array length ${registers.length} != 2^$p — p mismatch")
    val restBits = HashBits - p
    val h = graft.index.TrigramIndexer.hash60(key)
    val idx = (h >>> restBits).toInt
    val rest = h & ((1L << restBits) - 1)
    val rank =
      if (rest == 0) restBits + 1
      else restBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(rest))
    if (rank > registers(idx)) registers(idx) = rank.toByte
  }

  /** Estimate from a register array — the Scala twin of
    * [[hllEstimate]], mirrored operation-for-operation (exact integer
    * denominator; `StrictMath.log` matches Spark's Log codegen — the
    * Bm25Index convention), so a streamed register state reproduces
    * the batch estimate BIT-for-bit on the same data.
    */
  def hllEstimateScala(registers: Array[Byte], p: Int): Double = {
    val m = 1 << p
    val maxRank = HashBits - p + 1
    val twoS = math.pow(2.0, maxRank)
    val alphaMM = hllAlpha(m) * m * m
    var nreg = 0L
    var dh = 0L
    var i = 0
    while (i < m) {
      val r = registers(i)
      if (r > 0) {
        nreg += 1
        dh += 1L << (maxRank - r)
      }
      i += 1
    }
    val v = m - nreg
    val denom = v * (1L << maxRank) + dh
    val raw = (alphaMM * twoS) / denom.toDouble
    if (raw <= 2.5 * m && v > 0) m.toDouble * StrictMath.log(m.toDouble / v.toDouble)
    else raw
  }

  /** Per-group KMV (k-minimum-values / bottom-k) distinct estimate
    * AUDITED against the exact count: (group, exact_distinct, kmv_est,
    * rel_err). Estimator: (k-1) / U(k) with U(k) = (k-th smallest
    * 60-bit hash + 1) / 2^60 — pure integer arithmetic until one final
    * division, so both engines agree bit-for-bit before the 4dp round.
    * Groups with fewer than k distinct values report exactly.
    *
    * `exact_distinct` counts distinct HASHES (collision odds n²/2^61 —
    * the decontaminate argument), so the audit measures the ESTIMATOR,
    * not hash luck, and the oracle replays it exactly.
    *
    * Scale shape: the bottom-k rides
    * [[graft.functions.BottomKLongAgg]] — a k-capped sorted buffer per
    * group that partial-aggregates (each partition reduces to ≤ k
    * longs per key, duplicates collapse on insert), so NO distinct
    * shuffle of the hash set and NO per-group sort window ever run;
    * the exact_distinct audit is the only distinct aggregate left (it
    * drops at 100 TB where the sketch is the answer — or rides HLL).
    * Measured at sf1: 14.0 s (distinct + sort-window form) → the
    * one-pass agg; bottom-k is merge-associative, so the result is
    * partitioning-invariant (spec-pinned). The DuckDB twin keeps its
    * independent row_number formulation — two algorithms, one answer.
    */
  def kmvDistinct(df: DataFrame, keyCol: String, groupCol: String, k: Int = 64,
      scope: graft.api.CacheScope = graft.api.CacheScope.global): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    graft.functions.GraftFunctions.register(df.sparkSession)
    // (k-1) * 2^60 as ONE exact double literal, shared with the twin
    val num = (k - 1).toDouble * math.pow(2.0, HashBits)
    // NULL keys hash to NULL and the engines would RANK nulls
    // differently (Spark nulls-first, DuckDB nulls-last) — dropped
    // identically on both sides. Persisted: the md5-60bit projection
    // is the expensive per-row kernel and both aggregations read it.
    val hashed = scope.persist(
      df.select(col(groupCol).as("g"),
          graft.text.TextFunctions.portableHash60(col(keyCol).cast("string")).as("h"))
        .filter(col("h").isNotNull))
    // TWO separate aggregations joined on the bounded group domain —
    // NOT one groupBy: mixing countDistinct with the typed-imperative
    // bottom-k triggers Catalyst's distinct-rewrite Expand (row
    // duplication + (g, h)-keyed first stage whose cardinality blows
    // the ObjectHashAggregate map into its sort-based fallback) —
    // measured 35 s vs 3.2 s at sf1
    val bk = hashed.groupBy("g").agg(expr(s"graft_bottom_k(h, $k)").as("bk"))
      .select(col("g"),
        when(size(col("bk")) === k, element_at(col("bk"), k)).as("kth"),
        size(col("bk")).as("bk_n"))
    val ex = hashed.groupBy("g").agg(countDistinct(col("h")).as("exact_distinct"))
    ex.join(bk, "g")
      .withColumn("est",
        when(col("exact_distinct") < k, col("exact_distinct").cast("double"))
          .otherwise(lit(num) / (col("kth") + lit(1L)).cast("double")))
      .select(col("g").as(groupCol), col("exact_distinct"),
        round(col("est"), 4).as("kmv_est"),
        round(abs(col("est") - col("exact_distinct")) / col("exact_distinct"), 4).as("rel_err"))
  }

  /** DuckDB twin of [[kmvDistinct]]. */
  def kmvDistinctDuckSql(table: String, keyCol: String, groupCol: String, k: Int = 64): String = {
    val num = (k - 1).toDouble * math.pow(2.0, HashBits)
    s"""WITH d AS (
       |  SELECT DISTINCT $groupCol AS g, ${hash60Duck(keyCol)} AS h FROM $table
       |  WHERE $keyCol IS NOT NULL),
       |rn AS (
       |  SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn FROM d),
       |agg AS (
       |  SELECT g, count(*) AS exact_distinct,
       |    max(CASE WHEN rn = $k THEN h END) AS kth
       |  FROM rn GROUP BY g),
       |est AS (
       |  SELECT g, exact_distinct,
       |    CASE WHEN exact_distinct < $k THEN CAST(exact_distinct AS DOUBLE)
       |         ELSE CAST('$num' AS DOUBLE) / CAST(kth + 1 AS DOUBLE) END AS est
       |  FROM agg)
       |SELECT g AS $groupCol, exact_distinct,
       |  round(est, 4) AS kmv_est,
       |  round(abs(est - exact_distinct) / exact_distinct, 4) AS rel_err
       |FROM est""".stripMargin
  }

  /** Persisted distinct (g, h) postings of each group's w-gram shingle
    * set — the shared input of the KMV set-similarity/set-ops family.
    */
  private def shingleToks(df: DataFrame, groupCol: String, textCol: String,
      w: Int, scope: graft.api.CacheScope): DataFrame =
    scope.persist(
      df.select(col(groupCol).as("g"),
          explode(graft.text.Repetition.ngrams(lower(col(textCol)), w)).as("gram"))
        .select(col("g"), graft.text.TextFunctions.portableHash60(col("gram")).as("h"))
        .distinct())

  /** Shared KMV pair estimator over signature ARRAYS (g, sig) — sig
    * the group's bottom-k signature, sorted ascending, distinct, non-
    * empty. Returns (g1, g2, kmv_inter, kmv_n, kth) per unordered group
    * pair: the union's bottom-k cut (|K(A∪B) ∩ A ∩ B|, |K(A∪B)|, the
    * k-th union hash — the union-cardinality estimator's denominator)
    * from Beyer et al. 2007.
    *
    * Everything is per-pair ARRAY arithmetic inside one projection:
    * K(A∪B) = the first k of sort(union(sigA, sigB)) — valid because
    * every element of the union's bottom-k lies inside its own side's
    * bottom-k — and the intersection count is membership of the cut in
    * both signatures. The former row-level form (pair grid × posting
    * explode → union → (g1,g2,h) re-aggregate → per-pair bottom-k →
    * broadcast cut filter → final aggregate) shuffled the same data
    * five times and carried two pins; the array form joins two group-
    * count-sized frames once and needs no pin of its own (A/B and plan
    * evidence in OPTIMIZATION_r14.md / plans/r14). Results
    * bit-identical: same cut set (hashes distinct, so rank-k and
    * value-at-k agree), same membership counts.
    */
  private def kmvPairStats(sigArrs: DataFrame, k: Int): DataFrame = {
    val pairs = sigArrs.select(col("g").as("g1"), col("sig").as("__s1"))
      .join(sigArrs.select(col("g").as("g2"), col("sig").as("__s2")),
        col("g1") < col("g2"))
    pairs
      .withColumn("__cut",
        slice(array_sort(array_union(col("__s1"), col("__s2"))), 1, k))
      .select(col("g1"), col("g2"),
        size(array_intersect(array_intersect(col("__cut"), col("__s1")),
          col("__s2"))).cast("long").as("kmv_inter"),
        size(col("__cut")).cast("long").as("kmv_n"),
        element_at(col("__cut"), size(col("__cut"))).as("kth"))
  }

  /** Public KMV signature-table builder for PERSISTED sketch rollups —
    * the bottom-k counterpart of [[hllRegisterTable]]: one row per
    * group, (groupCols…, sig: sorted array of the k smallest distinct
    * key hashes, kmv_k = k). Write this per day/shard/partition; any
    * subset later merges by bottom-k of the concatenated signatures
    * ([[kmvMergeSignatures]] — merged == direct is the
    * [[graft.functions.BottomKLongAgg]] merge-associativity property,
    * spec-pinned incl. the parquet round-trip) and estimates
    * ([[kmvEstimateTable]]) or compares ([[kmvJaccardFromSignatures]])
    * WITHOUT rescanning raw data. `kmv_k` persists the signature width
    * so a later merge/estimate at a LARGER k (which a k-signature
    * cannot answer) fails fast instead of silently under-estimating.
    */
  def kmvSignatureTable(df: DataFrame, keyCol: String, groupCols: Seq[String],
      k: Int = 64): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(groupCols.map(col) :+
        graft.text.TextFunctions.portableHash60(col(keyCol).cast("string")).as("__h"): _*)
      .filter(col("__h").isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(expr(s"graft_bottom_k(__h, $k)").as("sig"))
      .withColumn("kmv_k", lit(k))
  }

  /** Guard: every signature row must have been written at kmv_k ≥ the
    * requested k — a narrower shard cannot answer a wider bottom-k.
    * The check rides the sig column itself so pruning can't drop it;
    * tables without the kmv_k column pass through WITH a stderr
    * warning (the caller owns the contract, but a shard whose column
    * was projected away — select("g","sig") — would silently
    * under-estimate at a wider k, the round-12 ADVICE hazard).
    */
  private def kmvCheckK(sigs: DataFrame, k: Int): DataFrame =
    if (!sigs.columns.contains("kmv_k")) {
      System.err.println(s"[graft] kmvCheckK: signature table has no kmv_k " +
        s"provenance column — cannot verify it was written at k >= $k; a " +
        s"narrower shard would silently under-estimate")
      sigs
    } else {
      // coalesce: NULL kmv_k (legacy shard) raises intelligibly, not
      // a concat-with-NULL null message
      sigs.withColumn("sig",
        when(col("kmv_k") >= lit(k), col("sig"))
          .otherwise(raise_error(concat(
            lit("kmv_k mismatch: signature written at k="),
            coalesce(col("kmv_k").cast("string"),
              lit("NULL (legacy shard without provenance)")),
            lit(s", read at k=$k — rebuild or lower k")))))
    }

  /** Merge signature shards: bottom-k of the concatenation, per group.
    * bottomK(A ∪ B) = bottomK(bottomK(A) ∪ bottomK(B)), so merging
    * shard signatures equals sketching the union directly — the
    * rollup never rescans raw data. Output schema matches
    * [[kmvSignatureTable]].
    */
  def kmvMergeSignatures(sigs: DataFrame, groupCols: Seq[String], k: Int = 64): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    graft.functions.GraftFunctions.register(sigs.sparkSession)
    kmvCheckK(sigs, k)
      .select(groupCols.map(col) :+ explode(col("sig")).as("__h"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(expr(s"graft_bottom_k(__h, $k)").as("sig"))
      .withColumn("kmv_k", lit(k))
  }

  /** Distinct-count estimates from a (possibly merged, possibly
    * reloaded) signature table — the read side of
    * [[kmvSignatureTable]]: (groupCols…, kmv_est), exact below k,
    * (k−1)·2^60/(h_k+1) at k — the same arithmetic as [[kmvDistinct]],
    * whose audit pins it against exact counts.
    */
  def kmvEstimateTable(sigs: DataFrame, groupCols: Seq[String], k: Int = 64): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    val num = (k - 1).toDouble * math.pow(2.0, HashBits)
    // a wider-than-k signature still answers k: its first k entries
    // ARE the k-signature (sorted ascending)
    kmvCheckK(sigs, k)
      .select(groupCols.map(col) :+ slice(col("sig"), 1, k).as("__sig"): _*)
      .select(groupCols.map(col) :+
        when(size(col("__sig")) < k, size(col("__sig")).cast("double"))
          .otherwise(lit(num) / (element_at(col("__sig"), k) + lit(1L)).cast("double"))
          .as("__est"): _*)
      .select(groupCols.map(col) :+ round(col("__est"), 4).as("kmv_est"): _*)
  }

  /** [[kmvSignatureTable]] over a text column's w-gram shingle sets —
    * the exact signature [[kmvJaccard]] builds live, persisted: one
    * row per group, sig = bottom-k of the group's distinct shingle
    * hashes. [[kmvJaccardFromSignatures]] over this table reproduces
    * kmvJaccard's kmv_j column bit-for-bit (spec-pinned).
    */
  def kmvShingleSignatureTable(df: DataFrame, groupCol: String, textCol: String,
      w: Int = 3, k: Int = 256): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(col(groupCol),
        explode(graft.text.Repetition.ngrams(lower(col(textCol)), w)).as("__gram"))
      .select(col(groupCol),
        graft.text.TextFunctions.portableHash60(col("__gram")).as("__h"))
      .filter(col("__h").isNotNull)
      .groupBy(col(groupCol))
      .agg(expr(s"graft_bottom_k(__h, $k)").as("sig"))
      .withColumn("kmv_k", lit(k))
  }

  /** All-pairs KMV set-similarity straight from a PERSISTED signature
    * table — the similarity path that never touches raw data: one row
    * per unordered group pair (source_a, source_b, kmv_j). At 100 TB
    * the corpus ships as k hashes per group; comparing two days/shards
    * is a join of kilobyte signatures. Estimates match the live
    * [[kmvJaccard]]'s kmv_j exactly when the table was built at the
    * same shingle definition and k' ≥ k (each signature is re-cut to
    * its first k entries).
    */
  def kmvJaccardFromSignatures(sigTable: DataFrame, groupCol: String, k: Int = 256,
      scope: graft.api.CacheScope = graft.api.CacheScope.global): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    graft.functions.GraftFunctions.register(sigTable.sparkSession)
    // a wider-than-k signature answers k by its first k entries (sorted
    // ascending); the pin covers the pair self-join's two reads
    val arrs = scope.persist(kmvCheckK(sigTable, k)
      .select(col(groupCol).as("g"), slice(col("sig"), 1, k).as("sig")))
    kmvPairStats(arrs, k)
      .select(col("g1").as("source_a"), col("g2").as("source_b"),
        PortableRound.intRound4(col("kmv_inter"), col("kmv_n")).as("kmv_j"))
  }

  /** KMV set-operation CARDINALITIES between groups, audited against
    * exact counts — the algebra that makes signatures a full substitute
    * for raw sets at 100 TB: per unordered group pair, |A∪B| from the
    * union bottom-k's k-th hash ((k−1)·2^60/(h_(k)+1); exact when the
    * union has fewer than k hashes) and |A∩B| via Beyer et al. 2007's
    * composition Ĵ·|A∪B|^ (the ratio estimator over the union sample
    * times the union estimate). Emits (source_a, source_b,
    * exact_union, union_est, union_rel_err, exact_inter, inter_est,
    * inter_err) — inter_err normalized by the exact union (an
    * intersection can be 0, a relative error on it cannot be defined).
    * |A\B| follows as |A| − |A∩B|; no separate estimator needed.
    *
    * Same scale shape as [[kmvJaccard]]: signatures-only estimate (k
    * hashes per group cross the wire, every ranking a bottom-k partial
    * aggregate, zero windows), exact side = the test-scale audit.
    */
  def kmvSetOps(df: DataFrame, groupCol: String, textCol: String,
      w: Int = 3, k: Int = 256,
      scope: graft.api.CacheScope = graft.api.CacheScope.global): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    graft.functions.GraftFunctions.register(df.sparkSession)
    val num = (k - 1).toDouble * math.pow(2.0, HashBits)
    val toks = shingleToks(df, groupCol, textCol, w, scope)
    // sizes is group-count-sized and read by both pair-expansion sides
    val sizes = scope.persist(toks.groupBy("g").agg(count(lit(1)).as("sz")))
    val inter = toks.as("a").join(toks.as("b"),
        col("a.h") === col("b.h") && col("a.g") < col("b.g"))
      .groupBy(col("a.g").as("g1"), col("b.g").as("g2"))
      .agg(count(lit(1)).as("inter_n"))
    // per-group signature ARRAYS, pinned: the pair self-join inside
    // kmvPairStats reads the frame twice
    val sigs = scope.persist(
      toks.groupBy("g").agg(expr(s"graft_bottom_k(h, $k)").as("sig")))
    val pairs = sizes.select(col("g").as("g1"), col("sz").as("sz1"))
      .join(sizes.select(col("g").as("g2"), col("sz").as("sz2")), col("g1") < col("g2"))
    val kmv = kmvPairStats(sigs, k)
    pairs.join(inter, Seq("g1", "g2"), "left")
      .join(kmv, Seq("g1", "g2"))
      .withColumn("inter_n", coalesce(col("inter_n"), lit(0L)))
      .withColumn("exact_union", col("sz1") + col("sz2") - col("inter_n"))
      .withColumn("union_raw",
        when(col("kmv_n") < k, col("kmv_n").cast("double"))
          .otherwise(lit(num) / (col("kth") + lit(1L)).cast("double")))
      .withColumn("inter_raw",
        (col("kmv_inter").cast("double") / col("kmv_n").cast("double")) * col("union_raw"))
      .select(col("g1").as("source_a"), col("g2").as("source_b"),
        col("exact_union"),
        // floatRound4, not round(x,4): the estimators' exact rationals
        // exceed 63 bits ((k−1)·2^60 numerators), so the integer
        // PortableRound forms don't apply — the portable-float form
        // rounds the identical IEEE double both engines computed,
        // independent of either engine's round() tie handling
        PortableRound.floatRound4(col("union_raw")).as("union_est"),
        PortableRound.floatRound4(
          abs(col("union_raw") - col("exact_union")) / col("exact_union"))
          .as("union_rel_err"),
        col("inter_n").as("exact_inter"),
        PortableRound.floatRound4(col("inter_raw")).as("inter_est"),
        PortableRound.floatRound4(
          abs(col("inter_raw") - col("inter_n")) / col("exact_union"))
          .as("inter_err"))
  }

  /** DuckDB twin of [[kmvSetOps]] — the independent pair-expanded
    * formulation, extending the [[kmvJaccardDuckSql]] CTEs with the
    * union-kth estimator.
    */
  def kmvSetOpsDuckSql(table: String, groupCol: String, textCol: String,
      w: Int = 3, k: Int = 256): String = {
    val num = (k - 1).toDouble * math.pow(2.0, HashBits)
    s"""WITH toks AS (
       |  SELECT DISTINCT $groupCol AS g,
       |    ${hash60Duck("gram")} AS h
       |  FROM (SELECT $groupCol, unnest(${graft.text.Repetition.ngramsDuck(s"lower($textCol)", w)}) AS gram
       |        FROM $table)),
       |grps AS (SELECT DISTINCT g FROM toks),
       |pairs AS (
       |  SELECT a.g AS g1, b.g AS g2 FROM grps a JOIN grps b ON a.g < b.g),
       |mem AS (
       |  SELECT g1, g2, h, max(in_a) AS in_a, max(in_b) AS in_b FROM (
       |    SELECT p.g1, p.g2, t.h, 1 AS in_a, 0 AS in_b
       |    FROM pairs p JOIN toks t ON t.g = p.g1
       |    UNION ALL
       |    SELECT p.g1, p.g2, t.h, 0 AS in_a, 1 AS in_b
       |    FROM pairs p JOIN toks t ON t.g = p.g2)
       |  GROUP BY g1, g2, h),
       |rn AS (
       |  SELECT *, row_number() OVER (PARTITION BY g1, g2 ORDER BY h) AS rn FROM mem),
       |agg AS (
       |  SELECT g1, g2,
       |    sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS inter_n,
       |    count(*) AS union_n,
       |    sum(CASE WHEN rn <= $k AND in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS kmv_inter,
       |    sum(CASE WHEN rn <= $k THEN 1 ELSE 0 END) AS kmv_n,
       |    max(CASE WHEN rn <= $k THEN h END) AS kth
       |  FROM rn GROUP BY g1, g2),
       |est AS (
       |  SELECT g1, g2, inter_n, union_n, kmv_inter, kmv_n,
       |    CASE WHEN kmv_n < $k THEN CAST(kmv_n AS DOUBLE)
       |         ELSE CAST('$num' AS DOUBLE) / CAST(kth + 1 AS DOUBLE) END AS union_raw
       |  FROM agg)
       |SELECT g1 AS source_a, g2 AS source_b,
       |  CAST(union_n AS BIGINT) AS exact_union,
       |  ${PortableRound.floatRound4Duck("union_raw")} AS union_est,
       |  ${PortableRound.floatRound4Duck("abs(union_raw - union_n) / union_n")} AS union_rel_err,
       |  CAST(inter_n AS BIGINT) AS exact_inter,
       |  ${PortableRound.floatRound4Duck("(CAST(kmv_inter AS DOUBLE) / CAST(kmv_n AS DOUBLE)) * union_raw")} AS inter_est,
       |  ${PortableRound.floatRound4Duck(
             "abs((CAST(kmv_inter AS DOUBLE) / CAST(kmv_n AS DOUBLE)) * union_raw - inter_n) / union_n")} AS inter_err
       |FROM est""".stripMargin
  }

  /** Sketch-accuracy tuning table: est-vs-exact for a grid of sketch
    * parameters over the SAME corpus — one row per (sketch, param):
    * (sketch ∈ {hll, kmv}, param = p or k, exact_distinct, est,
    * rel_err). The q_ann_recall convention for sketches: a user picks
    * p/k from measured error on their own key distribution, not from
    * docstring stderr formulas (1.04/√2^p for HLL, 1/√(k−2) for KMV —
    * real corpora sit anywhere inside those envelopes).
    *
    * `exact_distinct` counts distinct HASHES (the kmvDistinct
    * convention — both sketches estimate the hash set, and collision
    * odds are n²/2^61), so every row shares ONE truth column and the
    * oracle replays it. Scale shape: the corpus hashes ONCE
    * (persisted); each HLL cell is a bounded register aggregate, each
    * KMV cell one bottom-k partial aggregate — the sweep costs
    * |grid| bounded aggregations over the cached hash column, and the
    * exact side is the test-scale audit (at 100 TB, sweep a sampled
    * slice against its own exact count).
    *
    * PASS-FUSION NEGATIVES (round 14, measured, do not retry at bench
    * scale): (a) pre-deduping the pin (hashed.distinct()) — 2.14 →
    * 4.51 s isolated at sf0.1: the distinct shuffle costs more than
    * the duplicates the cells' partial aggregates collapse for free;
    * (b) fusing all HLL cells into one multi-p register pass (pinned
    * pmax table + prefix-regroup for coarser p) and all KMV cells into
    * one bottom-k(kmax) pin — 2.14 → 3.10 s isolated: the original's
    * |grid| independent rescans run as CONCURRENT stages inside ONE
    * union job over the cache, while each pin is its own serialized
    * job; at sf0.1/32 cores stage concurrency beats pass fusion. At
    * true corpus scale (rescans no longer ~free) the fused shape wins
    * on bytes — revisit only with a cluster-scale measurement.
    */
  def sketchTuning(df: DataFrame, keyCol: String,
      hllPs: Seq[Int] = Seq(8, 12), kmvKs: Seq[Int] = Seq(64, 256),
      scope: graft.api.CacheScope = graft.api.CacheScope.global): DataFrame = {
    hllPs.foreach(p => require(p >= 4 && p <= 16, s"p out of range [4,16]: $p"))
    kmvKs.foreach(k => require(k >= 2, s"k must be >= 2: $k"))
    require(hllPs.nonEmpty || kmvKs.nonEmpty, "empty parameter grid")
    graft.functions.GraftFunctions.register(df.sparkSession)
    val hashed = scope.persist(
      df.select(graft.text.TextFunctions.portableHash60(col(keyCol).cast("string")).as("h"))
        .filter(col("h").isNotNull))
    // fail fast on an empty/all-null-key corpus: the engines would
    // otherwise DISAGREE on the degenerate input (Spark's global
    // groupBy() emits one NULL-est row from 0/0; the Duck twin's
    // per-g aggregate emits zero rows) — round-12 ADVICE
    require(!hashed.isEmpty,
      "sketchTuning: empty corpus (no non-null keys) — nothing to tune against")
    val exact = hashed.agg(countDistinct(col("h")).as("exact_distinct"))
    val hllRows = hllPs.map { p =>
      hllEstimate(hllRegistersFromHashes(hashed, Nil, p), Nil, p)
        .select(lit("hll").as("sketch"), lit(p).as("param"), col("est"))
    }
    val kmvRows = kmvKs.map { k =>
      val num = (k - 1).toDouble * math.pow(2.0, HashBits)
      hashed.agg(expr(s"graft_bottom_k(h, $k)").as("__bk"))
        .select(lit("kmv").as("sketch"), lit(k).as("param"),
          when(size(col("__bk")) < k, size(col("__bk")).cast("double"))
            .otherwise(lit(num) / (element_at(col("__bk"), k) + lit(1L)).cast("double"))
            .as("est"))
    }
    // 1-row frames throughout: the broadcast-crossJoin totals idiom
    (hllRows ++ kmvRows).reduce(_ unionByName _)
      .crossJoin(broadcast(exact))
      .select(col("sketch"), col("param"), col("exact_distinct"),
        // floatRound4: the estimators' rationals exceed 63 bits, so
        // the portable-float form replaces round(x,4) — see kmvSetOps
        PortableRound.floatRound4(col("est")).as("est"),
        PortableRound.floatRound4(
          abs(col("est") - col("exact_distinct")) / col("exact_distinct")).as("rel_err"))
      .orderBy("sketch", "param")
  }

  /** DuckDB twin of [[sketchTuning]]. */
  def sketchTuningDuckSql(table: String, keyCol: String,
      hllPs: Seq[Int] = Seq(8, 12), kmvKs: Seq[Int] = Seq(64, 256)): String = {
    val hllCtes = hllPs.map { p =>
      s"""h_p$p AS (SELECT 1 AS g, h FROM ht),
         |${hllRegsDuck(s"p$p", p)},
         |${hllFinDuck(s"p$p", s"regs_p$p", p)}""".stripMargin
    }
    val kmvCtes = kmvKs.map { k =>
      val num = (k - 1).toDouble * math.pow(2.0, HashBits)
      s"""kmv_k$k AS (
         |  SELECT CASE WHEN ex.exact_distinct < $k THEN CAST(ex.exact_distinct AS DOUBLE)
         |    ELSE CAST('$num' AS DOUBLE) / CAST(
         |      (SELECT max(h) FROM (SELECT h FROM ht ORDER BY h LIMIT $k)) + 1 AS DOUBLE)
         |    END AS est
         |  FROM ex)""".stripMargin
    }
    val rows =
      hllPs.map(p =>
        s"""SELECT 'hll' AS sketch, $p AS param, ex.exact_distinct,
           |  ${PortableRound.floatRound4Duck("f.est")} AS est,
           |  ${PortableRound.floatRound4Duck(
                 "abs(f.est - ex.exact_distinct) / ex.exact_distinct")} AS rel_err
           |FROM ex, fin_p$p f""".stripMargin) ++
      kmvKs.map(k =>
        s"""SELECT 'kmv' AS sketch, $k AS param, ex.exact_distinct,
           |  ${PortableRound.floatRound4Duck("m.est")} AS est,
           |  ${PortableRound.floatRound4Duck(
                 "abs(m.est - ex.exact_distinct) / ex.exact_distinct")} AS rel_err
           |FROM ex, kmv_k$k m""".stripMargin)
    s"""WITH ht AS (
       |  SELECT DISTINCT ${hash60Duck(keyCol)} AS h FROM $table
       |  WHERE $keyCol IS NOT NULL),
       |ex AS (SELECT CAST(count(*) AS BIGINT) AS exact_distinct FROM ht),
       |${(hllCtes ++ kmvCtes).mkString(",\n")}
       |${rows.mkString("\nUNION ALL\n")}
       |ORDER BY sketch, param""".stripMargin
  }

  /** All-pairs set-similarity between GROUPS via KMV signatures,
    * audited against the exact Jaccard: one row per unordered group
    * pair (source_a, source_b, exact_j, kmv_j, abs_err). Sets are the
    * groups' distinct w-gram shingle hashes; the KMV estimate is the
    * classic bottom-k-of-the-union form |K(A∪B) ∩ A ∩ B| / |K(A∪B)|
    * (Beyer et al. 2007) — on the union's k smallest hashes, a
    * uniform sample of A∪B, both engines integer-identical; ratios
    * round via the exact-rational [[PortableRound]].
    *
    * Scale shape: group membership rides TWO equi-joins of the bounded
    * pair list (|groups|² rows — a source/language domain, dozens by
    * contract) against the per-group bottom-k SIGNATURES — never an
    * all-pairs join of the postings themselves. Both bottom-k's (the
    * per-group signatures and the per-pair union cut) ride
    * [[graft.functions.BottomKLongAgg]]'s k-capped partial aggregate:
    * no rank window ever touches the postings (the kmvDistinct
    * lesson — the window form shuffles the full distinct postings),
    * and at 100 TB only the signatures (k hashes each) need
    * materializing; signatures merge like any bottom-k
    * ([[kmvSignatureTable]] is the persisted form). The exact side is
    * the test-scale audit.
    */
  def kmvJaccard(df: DataFrame, groupCol: String, textCol: String,
      w: Int = 3, k: Int = 256,
      scope: graft.api.CacheScope = graft.api.CacheScope.global): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    graft.functions.GraftFunctions.register(df.sparkSession)
    // persisted: sizes, the co-occurrence self-join (both sides), and
    // the signature aggregate all read the distinct postings
    val toks = shingleToks(df, groupCol, textCol, w, scope)
    // sizes is group-count-sized and read by both pair-expansion sides
    val sizes = scope.persist(toks.groupBy("g").agg(count(lit(1)).as("sz")))
    // EXACT side: inverted-index co-occurrence — pairs form only where
    // a hash is SHARED (per-hash fan-out ≤ |groups|², typically far
    // sparser), never |pairs| × |postings|; |A∪B| = |A|+|B|−|A∩B|
    val inter = toks.as("a").join(toks.as("b"),
        col("a.h") === col("b.h") && col("a.g") < col("b.g"))
      .groupBy(col("a.g").as("g1"), col("b.g").as("g2"))
      .agg(count(lit(1)).as("inter_n"))
    // KMV side: per-group bottom-k SIGNATURES are sufficient — every
    // element of the union's bottom-k is inside its own side's
    // bottom-k, and membership h∈A is decidable from K(A) for exactly
    // those elements (the property that lets 100 TB corpora compare by
    // shipping k hashes per group)
    // per-group signature ARRAYS, pinned: the pair self-join inside
    // kmvPairStats reads the frame twice
    val sigs = scope.persist(
      toks.groupBy("g").agg(expr(s"graft_bottom_k(h, $k)").as("sig")))
    val pairs = sizes.select(col("g").as("g1"), col("sz").as("sz1"))
      .join(sizes.select(col("g").as("g2"), col("sz").as("sz2")), col("g1") < col("g2"))
    val kmv = kmvPairStats(sigs, k)
    pairs.join(inter, Seq("g1", "g2"), "left")
      .join(kmv, Seq("g1", "g2"))
      .withColumn("inter_n", coalesce(col("inter_n"), lit(0L)))
      .withColumn("union_n", col("sz1") + col("sz2") - col("inter_n"))
      .select(col("g1").as("source_a"), col("g2").as("source_b"),
        PortableRound.intRound4(col("inter_n"), col("union_n")).as("exact_j"),
        PortableRound.intRound4(col("kmv_inter"), col("kmv_n")).as("kmv_j"))
      .withColumn("abs_err", round(abs(col("exact_j") - col("kmv_j")), 4))
  }

  /** DuckDB twin of [[kmvJaccard]]. */
  def kmvJaccardDuckSql(table: String, groupCol: String, textCol: String,
      w: Int = 3, k: Int = 256): String =
    s"""WITH toks AS (
       |  SELECT DISTINCT $groupCol AS g,
       |    ${hash60Duck("gram")} AS h
       |  FROM (SELECT $groupCol, unnest(${graft.text.Repetition.ngramsDuck(s"lower($textCol)", w)}) AS gram
       |        FROM $table)),
       |grps AS (SELECT DISTINCT g FROM toks),
       |pairs AS (
       |  SELECT a.g AS g1, b.g AS g2 FROM grps a JOIN grps b ON a.g < b.g),
       |mem AS (
       |  SELECT g1, g2, h, max(in_a) AS in_a, max(in_b) AS in_b FROM (
       |    SELECT p.g1, p.g2, t.h, 1 AS in_a, 0 AS in_b
       |    FROM pairs p JOIN toks t ON t.g = p.g1
       |    UNION ALL
       |    SELECT p.g1, p.g2, t.h, 0 AS in_a, 1 AS in_b
       |    FROM pairs p JOIN toks t ON t.g = p.g2)
       |  GROUP BY g1, g2, h),
       |rn AS (
       |  SELECT *, row_number() OVER (PARTITION BY g1, g2 ORDER BY h) AS rn FROM mem),
       |agg AS (
       |  SELECT g1, g2,
       |    sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS inter_n,
       |    count(*) AS union_n,
       |    sum(CASE WHEN rn <= $k AND in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS kmv_inter,
       |    sum(CASE WHEN rn <= $k THEN 1 ELSE 0 END) AS kmv_n
       |  FROM rn GROUP BY g1, g2)
       |SELECT g1 AS source_a, g2 AS source_b,
       |  ${PortableRound.intRound4Duck("inter_n", "union_n")} AS exact_j,
       |  ${PortableRound.intRound4Duck("kmv_inter", "kmv_n")} AS kmv_j,
       |  round(abs((${PortableRound.intRound4Duck("inter_n", "union_n")})
       |          - (${PortableRound.intRound4Duck("kmv_inter", "kmv_n")})), 4) AS abs_err
       |FROM agg""".stripMargin

  /** Per-group quantile estimates from a DETERMINISTIC bottom-n hash
    * sample, audited against the exact quantiles: (group, n,
    * n_sample, <p>_exact, <p>_est, <p>_err per requested quantile).
    * The sample is the n rows with the smallest portable row-key
    * hashes per group (ties broken on the key, then the value — a
    * TOTAL order over everything the sample emits, so the sample
    * multiset is engine-identical even if `idCol` violates the
    * unique-row-key contract) — a coordinated, rerun/engine-identical
    * uniform sample (the [[Sampling]] hash discipline), so the oracle
    * replays the SAMPLE itself; both the sample and full-data
    * quantiles ride [[Describe.groupQuantiles]]'s proven interpolation
    * parity. This completes the sketch family's quantile axis beside
    * percentile_approx (whose KLL buffer is engine-internal, rows-only
    * checkable).
    *
    * Scale shape: the sample rides
    * [[graft.functions.BottomKStructAgg]] — a n-capped sorted buffer
    * of (hash, id, value) rows per group that partial-aggregates
    * (each partition reduces to ≤ n rows per key; bottom-k is
    * merge-associative, so the sample is partitioning-invariant,
    * spec-pinned) — NEVER a rank window over the raw relation (the
    * kmvDistinct lesson: the window form shuffles and sorts every
    * row). The exact side is the test-scale audit, dropped at 100 TB
    * where the sample IS the answer. Sample error ~ 1/(2√n)·1/f(q) —
    * n=512 → ~2-3 value-percentile points. The DuckDB twin keeps its
    * independent row_number formulation — two algorithms, one answer.
    */
  def quantileSketch(df: DataFrame, groupCol: String, valCol: String, idCol: String,
      n: Int = 512, ps: Seq[(String, Double)] = Seq("p50" -> 0.5, "p90" -> 0.9)): DataFrame = {
    require(n >= 8, s"sample size too small: $n")
    graft.functions.GraftFunctions.register(df.sparkSession)
    // NULL row keys would rank differently across engines (Spark
    // nulls-first vs DuckDB nulls-last) — excluded identically
    val keyed = df.filter(col(idCol).isNotNull)
      .select(col(groupCol),
        graft.text.TextFunctions.portableHash60(col(idCol).cast("string")).as("__h"),
        col(idCol).as("__id"),
        col(valCol).as("__v"))
    val sample = keyed.groupBy(groupCol)
      .agg(expr(s"graft_bottom_k_struct(struct(__h, __id, __v), $n)").as("__bk"))
      .select(col(groupCol), explode(col("__bk")).as("__s"))
      .select(col(groupCol), col("__s.__v").as(valCol))
    val est = Describe.groupQuantiles(sample, groupCol, valCol,
        ps.map { case (name, p) => s"${name}_est" -> p })
      .withColumnRenamed("n", "n_sample")
    val exact = Describe.groupQuantiles(df, groupCol, valCol,
      ps.map { case (name, p) => s"${name}_exact" -> p })
    val errCols = ps.map { case (name, _) =>
      round(abs(col(s"${name}_est") - col(s"${name}_exact")), 4).as(s"${name}_err")
    }
    exact.join(est, groupCol)
      .select(col(groupCol) +: col("n") +: col("n_sample") +:
        (ps.flatMap { case (name, _) =>
          Seq(col(s"${name}_exact"), col(s"${name}_est"))
        } ++ errCols): _*)
  }

  /** DuckDB twin of [[quantileSketch]] — the sample CTE replays the
    * identical hash ranking (value as the final tie-break, NULLS FIRST
    * to match Spark's nulls-first struct ordering), then both quantile
    * passes reuse [[Describe.groupQuantilesDuckSql]] over subquery
    * "tables".
    */
  def quantileSketchDuckSql(table: String, groupCol: String, valCol: String, idCol: String,
      n: Int = 512, ps: Seq[(String, Double)] = Seq("p50" -> 0.5, "p90" -> 0.9)): String = {
    val estSub =
      s"""(SELECT $groupCol, $valCol FROM (
         |  SELECT $groupCol, $valCol,
         |    row_number() OVER (PARTITION BY $groupCol
         |      ORDER BY ${hash60Duck(idCol)} ASC, $idCol ASC, $valCol ASC NULLS FIRST) AS srn
         |  FROM $table WHERE $idCol IS NOT NULL) ranked WHERE srn <= $n) smp""".stripMargin
    val est = Describe.groupQuantilesDuckSql(estSub, groupCol, valCol,
      ps.map { case (name, p) => s"${name}_est" -> p })
    val exact = Describe.groupQuantilesDuckSql(table, groupCol, valCol,
      ps.map { case (name, p) => s"${name}_exact" -> p })
    val errCols = ps.map { case (name, _) =>
      s"round(abs(e.${name}_est - x.${name}_exact), 4) AS ${name}_err"
    }.mkString(",\n  ")
    val valCols = ps.map { case (name, _) =>
      s"x.${name}_exact, e.${name}_est"
    }.mkString(",\n  ")
    s"""WITH est_q AS (
       |$est),
       |exact_q AS (
       |$exact)
       |SELECT x.$groupCol, x.n, e.n AS n_sample,
       |  $valCols,
       |  $errCols
       |FROM exact_q x JOIN est_q e ON x.$groupCol = e.$groupCol""".stripMargin
  }

  // ------------------------------------------------------------------
  // Persisted quantile-sample rollup — the bottom-n twin of
  // hllRegisterTable/kmvSignatureTable: per-day/shard sample tables
  // merge WITHOUT rescanning raw data (bottom-n by a total order is
  // merge-associative: bottomN(A ∪ B) = bottomN(bottomN(A) ∪
  // bottomN(B))), completing the persisted tier for all three sketch
  // families. `qs_n` persists the sample width so a read/merge at a
  // WIDER n (which an n-sample cannot answer) fails fast.
  // ------------------------------------------------------------------

  /** Persisted per-group bottom-n (hash, id, value) sample: one row per
    * group, `sample` = the sorted struct array [[quantileSketch]] ranks
    * on (hash-ordered uniform row sample, value as final tie-break),
    * plus the `qs_n` provenance column. Write per day/shard; any subset
    * later merges ([[quantileMergeSamples]]) and estimates
    * ([[quantileEstimateFromSamples]]) without touching raw data.
    */
  def quantileSampleTable(df: DataFrame, groupCol: String, valCol: String,
      idCol: String, n: Int = 512): DataFrame = {
    require(n >= 8, s"sample size too small: $n")
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.filter(col(idCol).isNotNull)
      .select(col(groupCol),
        graft.text.TextFunctions.portableHash60(col(idCol).cast("string")).as("__h"),
        col(idCol).as("__id"),
        col(valCol).as("__v"))
      .groupBy(groupCol)
      .agg(expr(s"graft_bottom_k_struct(struct(__h, __id, __v), $n)").as("sample"))
      .withColumn("qs_n", lit(n))
  }

  /** Guard: every sample row must have been written at qs_n ≥ the
    * requested n (a narrower shard cannot answer a wider sample) —
    * the [[kmvCheckK]] contract for the quantile tier.
    */
  private def quantileCheckN(samples: DataFrame, n: Int): DataFrame =
    if (!samples.columns.contains("qs_n")) {
      System.err.println(s"[graft] quantileCheckN: sample table has no qs_n " +
        s"provenance column — cannot verify it was written at n >= $n; a " +
        s"narrower shard would bias the sample")
      samples
    } else {
      samples.withColumn("sample",
        when(col("qs_n") >= lit(n), col("sample"))
          .otherwise(raise_error(concat(
            lit("qs_n mismatch: sample written at n="),
            coalesce(col("qs_n").cast("string"),
              lit("NULL (legacy shard without provenance)")),
            lit(s", read at n=$n — rebuild or lower n")))))
    }

  /** Merge sample shards: bottom-n of the concatenated samples, per
    * group — equals sampling the union directly (merge-associativity
    * of bottom-k by the total (hash, id, value) order; spec-pinned
    * bit-equality incl. the parquet round-trip). Output schema matches
    * [[quantileSampleTable]].
    */
  def quantileMergeSamples(samples: DataFrame, groupCols: Seq[String],
      n: Int = 512): DataFrame = {
    require(n >= 8, s"sample size too small: $n")
    graft.functions.GraftFunctions.register(samples.sparkSession)
    quantileCheckN(samples, n)
      .select(groupCols.map(col) :+ explode(col("sample")).as("__s"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(expr(s"graft_bottom_k_struct(__s, $n)").as("sample"))
      .withColumn("qs_n", lit(n))
  }

  /** Per-group quantile estimates from a (possibly merged, possibly
    * reloaded) sample table — the read side of [[quantileSampleTable]]:
    * (groupCol, n_sample, <name>_est…). A wider-than-n sample answers
    * n by prefix (the array is sorted ascending by the ranking order,
    * so its first n entries ARE the n-sample). Estimates are exactly
    * [[quantileSketch]]'s `_est` columns when built at the same n
    * (spec-pinned).
    */
  def quantileEstimateFromSamples(samples: DataFrame, groupCol: String,
      n: Int = 512,
      ps: Seq[(String, Double)] = Seq("p50" -> 0.5, "p90" -> 0.9)): DataFrame = {
    require(n >= 8, s"sample size too small: $n")
    val vals = quantileCheckN(samples, n)
      .select(col(groupCol), explode(slice(col("sample"), 1, n)).as("__s"))
      .select(col(groupCol), col("__s.__v").as("__v"))
    Describe.groupQuantiles(vals, groupCol, "__v",
        ps.map { case (name, p) => s"${name}_est" -> p })
      .withColumnRenamed("n", "n_sample")
  }

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
    // native codegen probe (graft.functions.BloomContains) — no boxed
    // udf on the corpus-wide pre-filter path; the filter rides as a
    // foldable binary literal. Null keys probe to null (a null key can
    // never equi-join, so a filter on the probe drops it either way —
    // the same observable behavior the legacy udfs had post-filter).
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(expr).schema.head.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        graft.functions.BloomContains.probe(expr.cast("long"), bloom)
      case StringType =>
        graft.functions.BloomContains.probe(expr, bloom)
      case other => throw new IllegalArgumentException(
        s"Bloom membership supports integral and string keys (buildBloom's " +
          s"insertion types); got $other — cast the key explicitly on BOTH " +
          s"the build and probe sides")
    }
  }
}
