package graft.ops

import graft.text.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-stream ordering operators: deterministic global shuffle,
  * source-balanced interleaving, and fixed-length sequence packing.
  * These are the "last mile" of a 100 TB pretraining pipeline — after
  * dedup/filtering, examples must be (a) shuffled reproducibly,
  * (b) mixed evenly across sources, and (c) packed into fixed token
  * budgets — and none of them may rely on RNG state or a single-node
  * sort.
  *
  * The global order everywhere is the md5 hex of (key ++ salt) — the
  * same portable hash family as [[Sampling]], so a rerun (or the DuckDB
  * oracle) reproduces the exact stream, and changing the salt draws an
  * independent permutation.
  */
object TrainStream {

  /** Deterministic shuffle key: md5 hex of key ++ salt (lexical order
    * of the hex string = the stream order; NULL key ⇒ NULL ⇒ row sorts
    * via Spark/DuckDB null ordering — keep keys non-null).
    */
  def mixKey(key: org.apache.spark.sql.Column, salt: String): org.apache.spark.sql.Column =
    md5(concat(key.cast("string"), lit(salt)))

  /** Source-balanced interleave: `round` r holds the r-th example of
    * EACH source in hash order, so reading in (round, mix_key) order
    * cycles through sources evenly regardless of their sizes — the
    * standard mixing discipline for multi-corpus training. One window
    * per source partition; no global sort in the operator itself
    * (ordering is declared by the consumer's ORDER BY, which Spark
    * executes as a range-partitioned sort at any scale).
    */
  def interleave(df: DataFrame, idCol: String, srcCol: String, salt: String = ""): DataFrame =
    df.select(col(idCol), col(srcCol),
        mixKey(col(idCol), salt).as("mix_key"))
      .withColumn("round", row_number().over(
        Window.partitionBy(srcCol).orderBy(col("mix_key"), col(idCol))))

  /** DuckDB twin of [[interleave]]. */
  def interleaveDuckSql(table: String, idCol: String, srcCol: String, salt: String = ""): String = {
    val s = salt.replace("'", "''")
    val mk = s"md5(CAST($idCol AS VARCHAR) || '$s')"
    s"""SELECT $idCol, $srcCol, $mk AS mix_key,
       |  CAST(row_number() OVER (PARTITION BY $srcCol ORDER BY $mk, $idCol) AS INT) AS round
       |FROM $table""".stripMargin
  }

  /** GPT-style sequence packing: concatenate the whole corpus in
    * deterministic hash order and cut every `seqLen` tokens; each doc
    * gets its global token offset, sequence id, and position within the
    * sequence.
    *
    * The global running sum is a DISTRIBUTED prefix-sum — a
    * partition-less window would funnel 100 TB through one task, so
    * instead: (1) bucket each row by the first two hex chars of its
    * order key (hex prefix order == lexical order, so buckets are
    * contiguous ranges of the stream), (2) run the running sum per
    * bucket (window partitioned by bucket), (3) offset each bucket by
    * the total of all lower buckets via a 256x256 broadcast self-join —
    * no single-partition stage anywhere.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      seqLen: Int = 256, salt: String = "",
      scope: graft.api.CacheScope = graft.api.CacheScope.global): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1 (got $seqLen)")
    // Persisted: the plan references the projection from two branches
    // (the per-bucket window and the bucket-totals aggregate), and
    // Catalyst prunes them differently so no exchange is reusable —
    // without the cache the corpus would be scanned and tokenized
    // twice (three times with the triangular join's second reference).
    // The cache holds only the four NARROW derived columns (id, token
    // count, order key, bucket) — never the text — so its footprint is
    // O(|rows|), spillable, independent of document size.
    val base = scope.persist(df.select(col(idCol),
        size(TextFunctions.tokens(col(textCol))).as("n_toks"),
        mixKey(col(idCol), salt).as("__h"))
      .withColumn("__bucket", conv(substring(col("__h"), 1, 2), 16, 10).cast("int")))
    val w = Window.partitionBy("__bucket").orderBy(col("__h"), col(idCol))
    val inBucket = base.withColumn("__off_in_bucket",
      coalesce(sum("n_toks").over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    // per-bucket totals (<= 256 rows) and their exclusive prefix sums,
    // via a broadcast triangular self-join — not a global window
    val btot = base.groupBy("__bucket").agg(sum("n_toks").as("__btot"))
    val bucketOff = btot.as("a")
      .join(broadcast(btot.as("b")), col("b.__bucket") < col("a.__bucket"), "left")
      .groupBy(col("a.__bucket").as("__bucket"))
      .agg(coalesce(sum(col("b.__btot")), lit(0L)).as("__bucket_off"))
    inBucket.join(broadcast(bucketOff), "__bucket")
      .withColumn("start_off", col("__bucket_off") + col("__off_in_bucket"))
      .select(col(idCol), col("n_toks"), col("start_off"),
        expr(s"start_off div $seqLen").as("seq_id"),
        (col("start_off") % seqLen).as("pos_in_seq"))
  }

  /** Temperature-weighted corpus mixing: sample each source at the
    * rate that makes the mixture follow `p_s^alpha` (normalized) at a
    * total budget of ~`targetDocs` documents — the standard
    * multi-corpus reweighting for pretraining (alpha < 1 upweights
    * small/rare sources, alpha = 1 keeps natural proportions).
    *
    * Everything stays in the plan: source counts are a tiny groupBy,
    * the normalizer is a 1-row broadcast crossJoin, the per-source
    * CUTOFF (an integer, `floor(rate * 10^6)`) broadcasts back onto
    * the corpus, and membership reuses [[Sampling]]'s portable
    * hash-mod (`pmod(hash60(id ++ salt), 10^6) < cutoff`) — map-only
    * over the data, deterministic across reruns and engines. No RNG,
    * no driver loop, no corpus shuffle.
    *
    * The rate rounds to 9dp before the floor so the IEEE `pow`
    * 1-ulp divergence between engines cannot flip a cutoff.
    */
  def mixSample(df: DataFrame, idCol: String, srcCol: String,
                alpha: Double, targetDocs: Long, salt: String = ""): DataFrame = {
    val counts = df.groupBy(col(srcCol)).agg(count(lit(1)).as("__n"))
      .withColumn("__w", pow(col("__n").cast("double"), lit(alpha)))
    val norm = counts.agg(sum("__w").as("__wsum"))
    val cutoffs = counts.crossJoin(broadcast(norm))
      .withColumn("__rate",
        least(lit(1.0), lit(targetDocs.toDouble) * col("__w") / col("__wsum") / col("__n")))
      .withColumn("__cutoff", floor(round(col("__rate"), 9) * lit(1000000L)).cast("long"))
      .select(col(srcCol), col("__cutoff"))
    df.join(broadcast(cutoffs), srcCol)
      .filter(pmod(TextFunctions.portableHash60(
          concat(col(idCol).cast("string"), lit(salt))), lit(1000000L))
        < col("__cutoff"))
      .select(col(idCol), col(srcCol))
  }

  /** DuckDB twin of [[mixSample]] (same `||`-not-concat and UBIGINT
    * hash form as the Sampling twins).
    */
  def mixSampleDuckSql(table: String, idCol: String, srcCol: String,
                       alpha: Double, targetDocs: Long, salt: String = ""): String = {
    val s = salt.replace("'", "''")
    s"""WITH counts AS (
       |  SELECT $srcCol, count(*) AS n, pow(CAST(count(*) AS DOUBLE), $alpha) AS w
       |  FROM $table GROUP BY $srcCol),
       |cutoffs AS (
       |  SELECT $srcCol,
       |    CAST(floor(round(least(1.0, $targetDocs * w / (SELECT sum(w) FROM counts) / n), 9)
       |      * 1000000) AS BIGINT) AS cutoff
       |  FROM counts)
       |SELECT t.$idCol, t.$srcCol
       |FROM $table t JOIN cutoffs c ON t.$srcCol = c.$srcCol
       |WHERE CAST(concat('0x', substr(md5(CAST(t.$idCol AS VARCHAR) || '$s'), 1, 15)) AS UBIGINT) % 1000000 < c.cutoff""".stripMargin
  }

  /** Per-source token-budget subset: in deterministic hash order,
    * keep each source's documents until its cumulative token count
    * reaches `budgetPerSource` (a doc is kept iff it STARTS inside
    * the budget — the packing convention). Output carries the token
    * count and the exclusive running sum so downstream packing can
    * resume from the boundary.
    *
    * The running sum is the same distributed prefix-sum shape as
    * [[packSequences]], keyed per (source, hex-bucket): per-bucket
    * windows plus a broadcast triangular join over the ≤256 bucket
    * totals per source — no per-source single-task window, so a
    * source with 10^9 documents costs the same shuffle as the whole
    * corpus, never one executor.
    */
  def tokenBudget(df: DataFrame, idCol: String, srcCol: String, textCol: String,
      budgetPerSource: Long, salt: String = "",
      scope: graft.api.CacheScope = graft.api.CacheScope.global): DataFrame = {
    require(budgetPerSource >= 1, s"budget must be >= 1 (got $budgetPerSource)")
    val base = scope.persist(df.select(col(idCol), col(srcCol),
        size(TextFunctions.tokens(col(textCol))).as("n_toks"),
        mixKey(col(idCol), salt).as("__h"))
      .withColumn("__bucket", conv(substring(col("__h"), 1, 2), 16, 10).cast("int")))
    val w = Window.partitionBy(col(srcCol), col("__bucket")).orderBy(col("__h"), col(idCol))
    val inBucket = base.withColumn("__off_in_bucket",
      coalesce(sum("n_toks").over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val btot = base.groupBy(col(srcCol), col("__bucket")).agg(sum("n_toks").as("__btot"))
    val bucketOff = btot.as("a")
      .join(broadcast(btot.as("b")),
        col("a." + srcCol) === col("b." + srcCol) && col("b.__bucket") < col("a.__bucket"),
        "left")
      .groupBy(col("a." + srcCol).as(srcCol), col("a.__bucket").as("__bucket"))
      .agg(coalesce(sum(col("b.__btot")), lit(0L)).as("__bucket_off"))
    inBucket.join(broadcast(bucketOff), Seq(srcCol, "__bucket"))
      .withColumn("cum_before", col("__bucket_off") + col("__off_in_bucket"))
      .filter(col("cum_before") < budgetPerSource)
      .select(col(idCol), col(srcCol), col("n_toks"), col("cum_before"))
  }

  /** DuckDB twin of [[tokenBudget]]: one window per source (fine at
    * oracle scale) — identical membership and offsets by construction.
    */
  def tokenBudgetDuckSql(table: String, idCol: String, srcCol: String,
      textCol: String, budgetPerSource: Long, salt: String = ""): String = {
    val s = salt.replace("'", "''")
    s"""SELECT $idCol, $srcCol, CAST(n_toks AS INT) AS n_toks,
       |  CAST(cum_before AS BIGINT) AS cum_before
       |FROM (
       |  SELECT $idCol, $srcCol, n_toks,
       |    coalesce(sum(n_toks) OVER (
       |      PARTITION BY $srcCol ORDER BY h, $idCol
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
       |  FROM (
       |    SELECT $idCol, $srcCol, len(string_split($textCol, ' ')) AS n_toks,
       |      md5(CAST($idCol AS VARCHAR) || '$s') AS h
       |    FROM $table) t1) t2
       |WHERE cum_before < $budgetPerSource""".stripMargin
  }

  /** Length-bucketed batch assignment: documents are grouped into
    * power-of-two token-length buckets (floor(log2 n) via BINARY-STRING
    * length — integer-exact, no FP log at bucket boundaries) and each
    * bucket is cut into contiguous deterministic-hash-order batches of
    * `batchSize` — the standard padding-efficiency batching for
    * training (same-length docs together ⇒ minimal pad waste).
    *
    * The within-bucket sequence number is the [[packSequences]]
    * distributed prefix idiom keyed per (len_bucket, hex-bucket):
    * per-bucket row_numbers plus a ≤256-row triangular broadcast
    * offset join — a bucket with 10^9 documents costs the same
    * shuffle as the corpus, never one executor.
    */
  def lengthBatches(df: DataFrame, idCol: String, textCol: String,
      batchSize: Int, salt: String = "",
      scope: graft.api.CacheScope = graft.api.CacheScope.global): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1 (got $batchSize)")
    val base = scope.persist(df.select(col(idCol),
        TextFunctions.wsTokenCount(col(textCol)).cast("int").as("n_toks"),
        mixKey(col(idCol), salt).as("__h"))
      .withColumn("len_bucket", (length(bin(col("n_toks"))) - 1).cast("int"))
      .withColumn("__bucket", conv(substring(col("__h"), 1, 2), 16, 10).cast("int")))
    val w = Window.partitionBy(col("len_bucket"), col("__bucket"))
      .orderBy(col("__h"), col(idCol))
    val inBucket = base.withColumn("__rn", row_number().over(w))
    val btot = base.groupBy("len_bucket", "__bucket").agg(count(lit(1)).as("__btot"))
    val bucketOff = btot.as("a")
      .join(broadcast(btot.as("b")),
        col("a.len_bucket") === col("b.len_bucket") &&
          col("b.__bucket") < col("a.__bucket"), "left")
      .groupBy(col("a.len_bucket").as("len_bucket"), col("a.__bucket").as("__bucket"))
      .agg(coalesce(sum(col("b.__btot")), lit(0L)).as("__off"))
    inBucket.join(broadcast(bucketOff), Seq("len_bucket", "__bucket"))
      .withColumn("seq_in_bucket", col("__off") + col("__rn") - 1)
      .select(col(idCol), col("n_toks"), col("len_bucket"), col("seq_in_bucket"),
        expr(s"seq_in_bucket div $batchSize").as("batch_id"))
  }

  /** DuckDB twin of [[lengthBatches]]: one window per len_bucket (fine
    * at oracle scale) — identical bucket, order, and batch cuts.
    */
  def lengthBatchesDuckSql(table: String, idCol: String, textCol: String,
      batchSize: Int, salt: String = ""): String = {
    val s = salt.replace("'", "''")
    s"""SELECT $idCol, CAST(n_toks AS INT) AS n_toks,
       |  CAST(len_bucket AS INT) AS len_bucket,
       |  CAST(seq_in_bucket AS BIGINT) AS seq_in_bucket,
       |  CAST(seq_in_bucket // $batchSize AS BIGINT) AS batch_id
       |FROM (
       |  SELECT $idCol, n_toks, len_bucket,
       |    row_number() OVER (PARTITION BY len_bucket ORDER BY h, $idCol) - 1
       |      AS seq_in_bucket
       |  FROM (
       |    SELECT $idCol, len(string_split($textCol, ' ')) AS n_toks,
       |      length(printf('%b', len(string_split($textCol, ' ')))) - 1 AS len_bucket,
       |      md5(CAST($idCol AS VARCHAR) || '$s') AS h
       |    FROM $table) t1) t2""".stripMargin
  }

  /** Token-balanced output shard assignment — the "write the training
    * corpus as N shards of ~`shardTokens` tokens each" operator every
    * distributed trainer needs (shards feed data-loader workers, so
    * unequal shards straggle the epoch). Documents are laid out in
    * deterministic hash order and cut at running-token-count
    * boundaries: shard = cum_tokens_before DIV shardTokens — every
    * shard holds a contiguous hash-order run of documents within one
    * token budget of the target (one oversized doc can overhang, the
    * standard greedy bound).
    *
    * Scale shape: the global running sum is the [[packSequences]]
    * distributed prefix idiom — per-(hex-bucket) partial sums plus a
    * 256-row broadcast triangular offset join; NO partition-less
    * window, no sort of the corpus. A downstream writer partitions by
    * `shard` and writes each directory in one task. Rerun-identical
    * (md5 order), engine-identical (integer arithmetic only).
    */
  def shardAssign(df: DataFrame, idCol: String, textCol: String,
      shardTokens: Long, salt: String = "",
      scope: graft.api.CacheScope = graft.api.CacheScope.global): DataFrame = {
    require(shardTokens >= 1, s"shardTokens must be >= 1 (got $shardTokens)")
    val base = scope.persist(df.select(col(idCol),
        TextFunctions.wsTokenCount(col(textCol)).cast("int").as("n_toks"),
        mixKey(col(idCol), salt).as("__h"))
      .withColumn("__bucket", conv(substring(col("__h"), 1, 2), 16, 10).cast("int")))
    val w = Window.partitionBy(col("__bucket")).orderBy(col("__h"), col(idCol))
    val inBucket = base.withColumn("__off_in_bucket",
      coalesce(sum("n_toks").over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val btot = base.groupBy(col("__bucket")).agg(sum("n_toks").cast("long").as("__btot"))
    val bucketOff = btot.as("a")
      .join(broadcast(btot.as("b")), col("b.__bucket") < col("a.__bucket"), "left")
      .groupBy(col("a.__bucket").as("__bucket"))
      .agg(coalesce(sum(col("b.__btot")), lit(0L)).as("__bucket_off"))
    inBucket.join(broadcast(bucketOff), Seq("__bucket"))
      .withColumn("cum_before", col("__bucket_off") + col("__off_in_bucket"))
      .select(col(idCol), col("n_toks"), col("cum_before"),
        expr(s"CAST(cum_before div ${shardTokens}L AS INT)").as("shard"))
  }

  /** DuckDB twin of [[shardAssign]]: one global window (fine at oracle
    * scale) — identical order, offsets, and shard cuts.
    */
  def shardAssignDuckSql(table: String, idCol: String, textCol: String,
      shardTokens: Long, salt: String = ""): String = {
    val s = salt.replace("'", "''")
    s"""SELECT $idCol, CAST(n_toks AS INT) AS n_toks,
       |  CAST(cum_before AS BIGINT) AS cum_before,
       |  CAST(cum_before // $shardTokens AS INT) AS shard
       |FROM (
       |  SELECT $idCol, n_toks,
       |    coalesce(sum(n_toks) OVER (
       |      ORDER BY h, $idCol
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
       |  FROM (
       |    SELECT $idCol, len(string_split($textCol, ' ')) AS n_toks,
       |      md5(CAST($idCol AS VARCHAR) || '$s') AS h
       |    FROM $table) t1) t2""".stripMargin
  }

  /** Deterministic MLM example generation (BERT-style token masking):
    * position `i` of document `d` is masked iff
    * `hash60(d|i|salt) mod 1000 < rate‰` — no RNG, so examples are
    * reproducible across reruns, engines, and epochs (vary `salt` per
    * epoch for fresh masks). Emits the masked input and the ordered
    * mask targets per document.
    *
    * Map-only: two fixed-depth higher-order transforms per row inside
    * codegen — the augmentation tier of the pipeline costs one scan
    * at any corpus size.
    */
  def mlmMask(df: DataFrame, idCol: String, textCol: String,
      ratePerMille: Int = 150, salt: String = ""): DataFrame = {
    require(ratePerMille >= 0 && ratePerMille <= 1000, s"bad rate $ratePerMille")
    val toks = TextFunctions.tokens(col(textCol))
    val idx = sequence(lit(1), size(toks))
    def maskedAt(i: org.apache.spark.sql.Column) = pmod(TextFunctions.portableHash60(
      concat_ws("|", col(idCol).cast("string"), i.cast("string"), lit(salt))),
      lit(1000L)) < ratePerMille
    // one md5 per position: the boolean mask is computed ONCE and both
    // outputs derive from it via zip_with (HOF lambdas are interpreted,
    // so cross-lambda subexpressions would NOT be eliminated)
    val flags = transform(idx, i => maskedAt(i))
    val maskedToks = zip_with(toks, flags, (t, m) =>
      when(m, lit("[MASK]")).otherwise(t))
    val targets = filter(zip_with(toks, flags, (t, m) => when(m, t)),
      t => t.isNotNull)
    df.select(col(idCol),
      size(toks).as("n_toks"),
      size(targets).as("n_masked"),
      array_join(maskedToks, " ").as("masked_text"),
      array_join(targets, " ").as("target_text"))
  }

  /** DuckDB twin of [[mlmMask]]. */
  def mlmMaskDuckSql(table: String, idCol: String, textCol: String,
      ratePerMille: Int = 150, salt: String = ""): String = {
    val s = salt.replace("'", "''")
    val mask = s"CAST(concat('0x', substr(md5(CAST($idCol AS VARCHAR) || '|' || " +
      s"CAST(i AS VARCHAR) || '|' || '$s'), 1, 15)) AS UBIGINT) % 1000 < $ratePerMille"
    s"""SELECT $idCol,
       |  CAST(len(toks) AS INT) AS n_toks,
       |  CAST(len(list_filter(list_transform(range(1, len(toks) + 1),
       |    i -> CASE WHEN $mask THEN toks[i] END), t -> t IS NOT NULL)) AS INT) AS n_masked,
       |  array_to_string(list_transform(range(1, len(toks) + 1),
       |    i -> CASE WHEN $mask THEN '[MASK]' ELSE toks[i] END), ' ') AS masked_text,
       |  coalesce(array_to_string(list_filter(list_transform(range(1, len(toks) + 1),
       |    i -> CASE WHEN $mask THEN toks[i] END), t -> t IS NOT NULL), ' '), '') AS target_text
       |FROM (SELECT $idCol, string_split($textCol, ' ') AS toks FROM $table) t""".stripMargin
  }

  /** DuckDB twin of [[packSequences]]: single global window (fine at
    * oracle scale) — identical offsets by construction.
    */
  def packSequencesDuckSql(table: String, idCol: String, textCol: String,
      seqLen: Int = 256, salt: String = ""): String = {
    val s = salt.replace("'", "''")
    s"""SELECT $idCol, CAST(n_toks AS INT) AS n_toks,
       |  CAST(start_off AS BIGINT) AS start_off,
       |  CAST(start_off // $seqLen AS BIGINT) AS seq_id,
       |  CAST(start_off % $seqLen AS BIGINT) AS pos_in_seq
       |FROM (
       |  SELECT $idCol, n_toks,
       |    coalesce(sum(n_toks) OVER (
       |      ORDER BY h, $idCol
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off
       |  FROM (
       |    SELECT $idCol, len(string_split($textCol, ' ')) AS n_toks,
       |      md5(CAST($idCol AS VARCHAR) || '$s') AS h
       |    FROM $table) t1) t2""".stripMargin
  }
}
