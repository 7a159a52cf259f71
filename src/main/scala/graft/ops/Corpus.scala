package graft.ops

import graft.text.{Repetition, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level text statistics a training-data pipeline runs next to
  * the per-document quality gates (reference analog: the facet/describe
  * family in src/linkml_store/api/collection.py — these are the same
  * "what is in my corpus" questions asked of token n-grams instead of
  * columns).
  *
  * Scale notes (100 TB):
  *  - topNgrams is explode → partial-agg → one shuffle → TakeOrdered:
  *    the map-side combine collapses each partition's gram counts
  *    before anything moves, and the final top-k never global-sorts.
  *  - tfIdf joins the per-token document frequency back to the
  *    per-(doc,token) counts as a plain KEYED join — dfreq is an
  *    unbounded aggregate (a 100 TB corpus vocabulary is 10⁸-10⁹
  *    tokens, far past broadcast range), so the hint is left to AQE,
  *    which still broadcasts when the vocab is actually small; at
  *    scale the join re-shuffles tf on `token` (its groupBy hashed on
  *    the composite (doc, token) key), the honest cost of an exact
  *    corpus-wide idf. The top-k per doc windows on doc_id
  *    (max-cardinality key, no skew).
  *  - decontaminate is the standard train/eval n-gram overlap check:
  *    both sides reduce to DISTINCT (doc, gram-hash) postings, the
  *    eval side (bounded: an eval set, not a corpus) broadcasts, and
  *    contaminated docs fall out of one hash join + count — pairs
  *    only ever form on exact gram-hash matches, never all-pairs.
  *    Grams travel as 60-bit md5 hashes (collision odds at 100 TB:
  *    ~n²/2⁶¹ — negligible), not strings, to keep the shuffle narrow.
  */
object Corpus {

  /** Top-k most frequent token w-grams across the corpus. */
  def topNgrams(df: DataFrame, textCol: String, w: Int, k: Int): DataFrame =
    df.select(explode(Repetition.ngrams(col(textCol), w)).as("gram"))
      .groupBy("gram")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("gram").asc)
      .limit(k)

  /** DuckDB twin of [[topNgrams]]. */
  def topNgramsDuckSql(table: String, textCol: String, w: Int, k: Int): String =
    s"""SELECT gram, count(*) AS cnt
       |FROM (SELECT unnest(${Repetition.ngramsDuck(textCol, w)}) AS gram FROM $table)
       |GROUP BY gram
       |ORDER BY cnt DESC, gram ASC
       |LIMIT $k""".stripMargin

  /** Top-`topK` tokens per document by tf-idf
    * (idf = ln(N / df), score rounded to 4dp BEFORE ranking so the
    * rank is reproducible across engines whose ln() may differ in the
    * last ulp; ties break on token).
    */
  def tfIdf(
      df: DataFrame,
      idCol: String,
      textCol: String,
      topK: Int,
      scope: graft.api.CacheScope = graft.api.CacheScope.global): DataFrame = {
    // persisted: both the score join and the document-frequency agg
    // read the per-(doc, token) counts — without the pin, the corpus
    // explode+aggregate runs twice
    val tf = scope.persist(df
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf")))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val nDocs = df.groupBy().agg(count(lit(1)).as("n"))
    val scored = tf
      .join(dfreq, "token")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        round(col("tf") * log(col("n").cast("double") / col("df")), 4))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("token").asc)))
      .filter(col("rnk") <= topK)
      .select(col(idCol), col("token"), col("score"), col("rnk"))
      .orderBy(col(idCol), col("rnk"))
  }

  /** DuckDB twin of [[tfIdf]]. */
  def tfIdfDuckSql(table: String, idCol: String, textCol: String, topK: Int): String =
    s"""WITH tf AS (
       |  SELECT $idCol, unnest(string_split($textCol, ' ')) AS token FROM $table),
       |tfc AS (SELECT $idCol, token, count(*) AS tf FROM tf GROUP BY $idCol, token),
       |dfreq AS (SELECT token, count(*) AS df FROM tfc GROUP BY token),
       |n AS (SELECT count(*) AS n FROM $table),
       |scored AS (
       |  SELECT tfc.$idCol, tfc.token,
       |         round(tf * ln(CAST(n.n AS DOUBLE) / df), 4) AS score
       |  FROM tfc JOIN dfreq USING (token), n),
       |ranked AS (
       |  SELECT *, row_number() OVER (
       |      PARTITION BY $idCol ORDER BY score DESC, token ASC) AS rnk
       |  FROM scored)
       |SELECT $idCol, token, score, CAST(rnk AS INT) AS rnk
       |FROM ranked WHERE rnk <= $topK
       |ORDER BY $idCol, rnk""".stripMargin

  /** Train/eval decontamination: for every "train" row (NOT matching
    * `evalPred`), the number of DISTINCT token w-grams it shares with
    * ANY "eval" row — the membership test an LLM pipeline runs before
    * training to drop benchmark-contaminated documents. Only
    * contaminated docs (n_shared > 0) are returned.
    */
  def decontaminate(
      df: DataFrame,
      idCol: String,
      textCol: String,
      evalPred: Column,
      w: Int): DataFrame = {
    def grams(side: DataFrame): DataFrame = side
      .select(col(idCol), explode(Repetition.ngrams(col(textCol), w)).as("gram"))
      .select(col(idCol), TextFunctions.portableHash60(col("gram")).as("gh"))
    // coalesce the split predicate: a NULL-predicate row must land in
    // exactly one side (train), not vanish from both filters
    val isEval = coalesce(evalPred, lit(false))
    val evalGrams = grams(df.filter(isEval)).select("gh").distinct()
    val trainGrams = grams(df.filter(!isEval)).distinct()
    trainGrams
      .join(broadcast(evalGrams), "gh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy(col("n_shared").desc, col(idCol).asc)
  }

  /** Graded train/eval contamination score — [[decontaminate]]'s binary
    * "shares any gram" flag upgraded to the FRACTION of each train
    * document's distinct w-grams that appear in the eval set, the
    * thresholdable signal pipelines actually gate on (drop > 80%
    * overlap, down-weight 20-80%, keep the long doc that quotes one
    * benchmark question). Same scale shape as [[decontaminate]] — the
    * eval gram set is bounded (an eval suite, not a corpus) and
    * broadcasts; the train side is one distinct + one left join +
    * one keyed groupBy, grams travel as 60-bit hashes. Returns every
    * train doc with >= 1 gram (docs shorter than w tokens have no
    * gram set to score).
    */
  def contaminationFrac(
      df: DataFrame,
      idCol: String,
      textCol: String,
      evalPred: Column,
      w: Int): DataFrame = {
    def grams(side: DataFrame): DataFrame = side
      .select(col(idCol), explode(Repetition.ngrams(col(textCol), w)).as("gram"))
      .select(col(idCol), TextFunctions.portableHash60(col("gram")).as("gh"))
    val isEval = coalesce(evalPred, lit(false))
    val evalGrams = grams(df.filter(isEval)).select("gh").distinct()
      .withColumn("__hit", lit(1))
    val trainGrams = grams(df.filter(!isEval)).distinct()
    trainGrams
      .join(broadcast(evalGrams), Seq("gh"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0))).as("n_shared"))
      .select(col(idCol), col("n_grams"), col("n_shared"),
        // integer-exact rounding: n_shared/n_grams is a small-integer
        // rational, the class that flips round(double, 4) across
        // engines on decimal boundaries (PortableRound)
        PortableRound.intRound4(col("n_shared"), col("n_grams")).as("frac"))
      .orderBy(idCol)
  }

  /** DuckDB twin of [[contaminationFrac]]. */
  def contaminationFracDuckSql(
      table: String,
      idCol: String,
      textCol: String,
      evalPredSql: String,
      w: Int): String =
    s"""WITH g0 AS (
       |  SELECT $idCol, ($evalPredSql) AS is_eval,
       |         unnest(${Repetition.ngramsDuck(textCol, w)}) AS gram
       |  FROM $table),
       |g AS (
       |  SELECT $idCol, coalesce(is_eval, false) AS is_eval,
       |         CAST(concat('0x', substr(md5(gram), 1, 15)) AS BIGINT) AS gh
       |  FROM g0),
       |ev AS (SELECT DISTINCT gh, 1 AS hit FROM g WHERE is_eval),
       |tr AS (SELECT DISTINCT $idCol, gh FROM g WHERE NOT is_eval),
       |agg AS (
       |  SELECT $idCol, CAST(count(*) AS BIGINT) AS n_grams,
       |         CAST(sum(coalesce(hit, 0)) AS BIGINT) AS n_shared
       |  FROM tr LEFT JOIN ev USING (gh)
       |  GROUP BY $idCol)
       |SELECT $idCol, n_grams, n_shared,
       |  ${PortableRound.intRound4Duck("n_shared", "n_grams")} AS frac
       |FROM agg
       |ORDER BY $idCol""".stripMargin

  /** Top-k adjacent-token collocations by pointwise mutual information —
    * the corpus-level "which word pairs stick together" diagnostic
    * (tokenizer/vocab design, multi-word-expression mining, template
    * detection: boilerplate phrases spike PMI). pmi(x,y) =
    * ln( p(x,y) / (p(x)p(y)) ) with p(x,y) over the adjacent-bigram
    * stream and p(x) over the token stream; pairs below `minCount`
    * are noise (a 1-occurrence pair of two hapaxes maximizes raw PMI)
    * and drop before scoring.
    *
    * Scale shape: two explode → keyed partial-agg passes (unigram and
    * bigram tables, both vocabulary-bounded), the unigram table joins
    * back KEYED (unhinted — a 100 TB vocab is past broadcast range,
    * AQE still broadcasts a small one), the two totals are 1-row
    * broadcasts, and the top-k is TakeOrdered — no global sort. PMI
    * pre-rounds to 4dp before ranking so both engines rank identical
    * values; ties break on (x, y).
    */
  def pmiCollocations(
      df: DataFrame,
      textCol: String,
      minCount: Int,
      k: Int,
      scope: graft.api.CacheScope = graft.api.CacheScope.global): DataFrame = {
    // persisted: the unigram table feeds both the totals row and the
    // two keyed joins; the bigram table feeds its totals row and the
    // filtered scoring side
    val uni = scope.persist(df
      .select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c")))
    val nTok = uni.agg(sum("c").as("n"))
    val pairs = scope.persist(df
      .select(explode(Repetition.ngrams(col(textCol), 2)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cxy")))
    val nPair = pairs.agg(sum("cxy").as("np"))
    val split2 = split(col("gram"), " ")
    val scoredInput = pairs.filter(col("cxy") >= minCount)
      .select(element_at(split2, 1).as("x"), element_at(split2, 2).as("y"),
        col("cxy"))
    scoredInput
      .join(uni.select(col("tok").as("x"), col("c").as("cx")), "x")
      .join(uni.select(col("tok").as("y"), col("c").as("cy")), "y")
      .crossJoin(broadcast(nTok))
      .crossJoin(broadcast(nPair))
      .select(col("x"), col("y"), col("cxy"),
        round(log((col("cxy").cast("double") / col("np")) /
          ((col("cx").cast("double") / col("n")) *
           (col("cy").cast("double") / col("n")))), 4).as("pmi"))
      .orderBy(col("pmi").desc, col("x").asc, col("y").asc)
      .limit(k)
  }

  /** DuckDB twin of [[pmiCollocations]] — identical arithmetic order
    * (cxy/np ÷ (cx/n · cy/n), each operand cast to DOUBLE first).
    */
  def pmiCollocationsDuckSql(table: String, textCol: String,
                             minCount: Int, k: Int): String =
    s"""WITH uni AS (
       |  SELECT tok, CAST(count(*) AS BIGINT) AS c
       |  FROM (SELECT unnest(string_split($textCol, ' ')) AS tok FROM $table)
       |  GROUP BY tok),
       |ntok AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni),
       |pairs AS (
       |  SELECT gram, CAST(count(*) AS BIGINT) AS cxy
       |  FROM (SELECT unnest(${Repetition.ngramsDuck(textCol, 2)}) AS gram FROM $table)
       |  GROUP BY gram),
       |npair AS (SELECT CAST(sum(cxy) AS BIGINT) AS np FROM pairs),
       |f AS (
       |  SELECT string_split(gram, ' ')[1] AS x, string_split(gram, ' ')[2] AS y, cxy
       |  FROM pairs WHERE cxy >= $minCount)
       |SELECT f.x, f.y, f.cxy,
       |  round(ln((CAST(f.cxy AS DOUBLE) / np) /
       |    ((CAST(ux.c AS DOUBLE) / n) * (CAST(uy.c AS DOUBLE) / n))), 4) AS pmi
       |FROM f
       |JOIN uni ux ON ux.tok = f.x
       |JOIN uni uy ON uy.tok = f.y
       |CROSS JOIN ntok CROSS JOIN npair
       |ORDER BY pmi DESC, x ASC, y ASC
       |LIMIT $k""".stripMargin

  /** Scale variant of [[decontaminate]]: the eval-side gram set rides
    * a Bloom filter instead of a broadcast join — bounded bits
    * regardless of eval size (1e8 grams at 1% fpp ≈ 114 MB), and the
    * train side becomes a map-only filter, no join at all. Guarantee:
    * never misses a contaminated doc (no false negatives); a ~fpp
    * share of clean grams test positive, so `n_shared` is an upper
    * bound and marginal docs need the exact [[decontaminate]] verify.
    */
  def decontaminateBloom(
      df: DataFrame,
      idCol: String,
      textCol: String,
      evalPred: Column,
      w: Int,
      fpp: Double = 0.01,
      scope: graft.api.CacheScope = graft.api.CacheScope.global): DataFrame = {
    def grams(side: DataFrame): DataFrame = side
      .select(col(idCol), explode(Repetition.ngrams(col(textCol), w)).as("gram"))
      .select(col(idCol), TextFunctions.portableHash60(col("gram")).as("gh"))
    val isEval = coalesce(evalPred, lit(false))
    // persisted: count() (filter sizing) and bloomFilter() are two
    // actions over the same explode/distinct — one scan, not two
    val evalGrams = scope.persist(grams(df.filter(isEval)).select("gh").distinct())
    // expected-items from a real count: the distinct aggregation is the
    // same work the exact path does, and a right-sized filter beats a
    // guessed one at any scale
    val n = math.max(evalGrams.count(), 1L)
    val bloom = Sketches.buildBloom(evalGrams, col("gh"), n, fpp)
    val trainGrams = grams(df.filter(!isEval)).distinct()
    trainGrams
      .filter(Sketches.mightContain(trainGrams, bloom, col("gh")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy(col("n_shared").desc, col(idCol).asc)
  }

  /** DuckDB twin of [[decontaminate]] (`evalPredSql` mirrors evalPred). */
  def decontaminateDuckSql(
      table: String,
      idCol: String,
      textCol: String,
      evalPredSql: String,
      w: Int): String =
    s"""WITH g0 AS (
       |  SELECT $idCol, ($evalPredSql) AS is_eval,
       |         unnest(${Repetition.ngramsDuck(textCol, w)}) AS gram
       |  FROM $table),
       |g AS (
       |  SELECT $idCol, coalesce(is_eval, false) AS is_eval,
       |         CAST(concat('0x', substr(md5(gram), 1, 15)) AS BIGINT) AS gh
       |  FROM g0),
       |ev AS (SELECT DISTINCT gh FROM g WHERE is_eval),
       |tr AS (SELECT DISTINCT $idCol, gh FROM g WHERE NOT is_eval)
       |SELECT $idCol, count(*) AS n_shared
       |FROM tr JOIN ev USING (gh)
       |GROUP BY $idCol
       |ORDER BY n_shared DESC, $idCol ASC""".stripMargin

  // ------------------------------------------------- corpus distribution stats

  /** Per-group vocabulary statistics (corpus health dashboard):
    * token count, vocabulary size, hapax fraction (|count==1| /
    * vocab — Zipf-tail mass) and top-token share. Two-level keyed
    * aggregation — partial aggs on (group, token) then on group —
    * nothing corpus-wide on the driver.
    */
  def vocabStats(df: DataFrame, groupCol: String, textCol: String): DataFrame =
    df.select(col(groupCol), explode(graft.text.TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy(col(groupCol), col("tok"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(groupCol))
      .agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("vocab_size"),
        round(sum(when(col("c") === 1, 1).otherwise(0)) / count(lit(1)).cast("double"), 4)
          .as("hapax_frac"),
        round(max(col("c")) / sum(col("c")).cast("double"), 4).as("top_token_share"))
      .orderBy(groupCol)

  /** DuckDB twin of [[vocabStats]]. */
  def vocabStatsDuckSql(table: String, groupCol: String, textCol: String): String =
    s"""SELECT $groupCol,
       |  CAST(sum(c) AS BIGINT) AS n_tokens,
       |  count(*) AS vocab_size,
       |  round(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 4) AS hapax_frac,
       |  round(max(c) / CAST(sum(c) AS DOUBLE), 4) AS top_token_share
       |FROM (
       |  SELECT $groupCol, tok, count(*) AS c
       |  FROM (SELECT $groupCol, unnest(string_split($textCol, ' ')) AS tok FROM $table)
       |  GROUP BY $groupCol, tok)
       |GROUP BY $groupCol
       |ORDER BY $groupCol""".stripMargin

  /** Add-one-smoothed KL divergence between every ordered pair of
    * group corpora' unigram distributions (distribution-drift check,
    * e.g. train vs eval slice): P(t) = (c_a(t)+1)/(N_a+V) over the
    * GLOBAL vocabulary V.
    *
    * Scale shape: the naive sum ranges over V × L² (vocabulary ×
    * group pairs) — at a 10⁷ vocabulary that materializes nothing but
    * wastes a grid join. Tokens absent from BOTH groups contribute a
    * per-pair CONSTANT, so the sum splits into (1) tokens present in
    * a — one keyed left join, (2) tokens present only in b — one
    * keyed anti join, (3) a closed-form remainder (V − |vocab_a ∪
    * vocab_b|) · (1/(N_a+V)) · ln((N_b+V)/(N_a+V)). Only the tiny
    * (group, total) frame ever cross-joins.
    */
  def klDivergence(df: DataFrame, groupCol: String, textCol: String,
                   scope: graft.api.CacheScope = graft.api.CacheScope.global): DataFrame = {
    // persisted via the tracked scope (the bench/verify harness
    // releases it between queries): parts 1, 2 and the totals all
    // re-read the per-(group, token) counts
    val counts = scope.persist(df
      .select(col(groupCol).as("g"), explode(graft.text.TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy(col("g"), col("tok")).agg(count(lit(1)).cast("double").as("c")))
    // totals/vRow are group-count-sized 1-job aggregates referenced by
    // parts 1, 2 AND the final assembly — pinned so each reference
    // reads the tiny cached frame instead of re-aggregating counts
    val totals = scope.persist(counts.groupBy(col("g")).agg(sum(col("c")).as("n")))
    val vRow = scope.persist(counts.agg(countDistinct(col("tok")).cast("double").as("v")))
    val a = counts.select(col("g").as("la"), col("tok"), col("c").as("ca"))
    val b = counts.select(col("g").as("lb"), col("tok"), col("c").as("cb"))
    val ta = totals.select(col("g").as("la"), col("n").as("na"))
    val tb = totals.select(col("g").as("lb"), col("n").as("nb"))
    def term(ca: Column, cb: Column): Column = {
      val p = (ca + 1.0) / (col("na") + col("v"))
      val q = (cb + 1.0) / (col("nb") + col("v"))
      p * log(p / q)
    }
    // (1) tokens present in a, paired with every other group
    val part1 = a.crossJoin(broadcast(tb)).join(b, Seq("lb", "tok"), "left")
      .join(ta, "la").crossJoin(broadcast(vRow))
      .filter(col("la") =!= col("lb"))
      .withColumn("t", term(col("ca"), coalesce(col("cb"), lit(0.0))))
      .groupBy(col("la"), col("lb")).agg(sum(col("t")).as("s"), count(lit(1)).as("k"))
    // (2) tokens present ONLY in b (ca = 0)
    val part2 = b.crossJoin(broadcast(ta)).join(a, Seq("la", "tok"), "left_anti")
      .join(tb, "lb").crossJoin(broadcast(vRow))
      .filter(col("la") =!= col("lb"))
      .withColumn("t", term(lit(0.0), col("cb")))
      .groupBy(col("la"), col("lb")).agg(sum(col("t")).as("s"), count(lit(1)).as("k"))
    // (3) closed-form remainder for tokens in neither group
    part1.union(part2)
      .groupBy(col("la"), col("lb")).agg(sum(col("s")).as("s"), sum(col("k")).as("k"))
      .join(ta, "la").join(tb, "lb").crossJoin(broadcast(vRow))
      .select(col("la").as("lang_a"), col("lb").as("lang_b"),
        round(col("s") + (col("v") - col("k")) * (lit(1.0) / (col("na") + col("v")))
          * log((col("nb") + col("v")) / (col("na") + col("v"))), 4).as("kl"))
      .orderBy("lang_a", "lang_b")
  }

  /** DuckDB twin of [[klDivergence]] — the same three-part split. */
  def klDivergenceDuckSql(table: String, groupCol: String, textCol: String): String =
    s"""WITH counts AS (
       |  SELECT g, tok, CAST(count(*) AS DOUBLE) AS c
       |  FROM (SELECT $groupCol AS g, unnest(string_split($textCol, ' ')) AS tok FROM $table)
       |  GROUP BY g, tok),
       |totals AS (SELECT g, sum(c) AS n FROM counts GROUP BY g),
       |v AS (SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS v FROM counts),
       |part1 AS (
       |  SELECT a.g AS la, tb.g AS lb,
       |    sum(((a.c + 1.0) / (ta.n + v.v)) * ln(((a.c + 1.0) / (ta.n + v.v))
       |        / ((coalesce(b.c, 0.0) + 1.0) / (tb.n + v.v)))) AS s,
       |    count(*) AS k
       |  FROM counts a
       |  CROSS JOIN totals tb
       |  LEFT JOIN counts b ON b.g = tb.g AND b.tok = a.tok
       |  JOIN totals ta ON ta.g = a.g
       |  CROSS JOIN v
       |  WHERE a.g <> tb.g
       |  GROUP BY a.g, tb.g),
       |part2 AS (
       |  SELECT ta.g AS la, b.g AS lb,
       |    sum(((0.0 + 1.0) / (ta.n + v.v)) * ln(((0.0 + 1.0) / (ta.n + v.v))
       |        / ((b.c + 1.0) / (tb.n + v.v)))) AS s,
       |    count(*) AS k
       |  FROM counts b
       |  CROSS JOIN totals ta
       |  JOIN totals tb ON tb.g = b.g
       |  CROSS JOIN v
       |  WHERE ta.g <> b.g
       |    AND NOT EXISTS (SELECT 1 FROM counts a WHERE a.g = ta.g AND a.tok = b.tok)
       |  GROUP BY ta.g, b.g),
       |merged AS (
       |  SELECT la, lb, sum(s) AS s, sum(k) AS k
       |  FROM (SELECT * FROM part1 UNION ALL SELECT * FROM part2)
       |  GROUP BY la, lb)
       |SELECT m.la AS lang_a, m.lb AS lang_b,
       |  round(m.s + (v.v - m.k) * (1.0 / (ta.n + v.v)) * ln((tb.n + v.v) / (ta.n + v.v)), 4) AS kl
       |FROM merged m
       |JOIN totals ta ON ta.g = m.la
       |JOIN totals tb ON tb.g = m.lb
       |CROSS JOIN v
       |ORDER BY lang_a, lang_b""".stripMargin

  /** Jensen-Shannon divergence between every unordered pair of group
    * corpora's unigram distributions — the SYMMETRIC, bounded (≤ ln 2)
    * companion of [[klDivergence]], the number data-mixing reports
    * actually quote (KL explodes when a token is near-absent on one
    * side; JS saturates). Same add-one smoothing over the global
    * vocabulary, same three-part V×L² collapse: tokens absent from
    * BOTH groups contribute a per-pair constant h(0,0), so the grid
    * never materializes — (1) tokens present in a (left join b),
    * (2) tokens present only in b (anti join), (3) closed-form
    * remainder (V − |vocab_a ∪ vocab_b|)·h(0,0), with
    * h(ca,cb) = ½p·ln(p/m) + ½q·ln(q/m), m = (p+q)/2. Unordered
    * output (group_a < group_b) — JS is symmetric, so the ordered
    * grid would double the work for mirrored rows.
    */
  def jsDivergence(df: DataFrame, groupCol: String, textCol: String,
                   scope: graft.api.CacheScope = graft.api.CacheScope.global): DataFrame = {
    val counts = scope.persist(df
      .select(col(groupCol).as("g"), explode(graft.text.TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy(col("g"), col("tok")).agg(count(lit(1)).cast("double").as("c")))
    // totals/vRow are group-count-sized 1-job aggregates referenced by
    // parts 1, 2 AND the final assembly — pinned so each reference
    // reads the tiny cached frame instead of re-aggregating counts
    val totals = scope.persist(counts.groupBy(col("g")).agg(sum(col("c")).as("n")))
    val vRow = scope.persist(counts.agg(countDistinct(col("tok")).cast("double").as("v")))
    val a = counts.select(col("g").as("la"), col("tok"), col("c").as("ca"))
    val b = counts.select(col("g").as("lb"), col("tok"), col("c").as("cb"))
    val ta = totals.select(col("g").as("la"), col("n").as("na"))
    val tb = totals.select(col("g").as("lb"), col("n").as("nb"))
    def term(ca: Column, cb: Column): Column = {
      val p = (ca + 1.0) / (col("na") + col("v"))
      val q = (cb + 1.0) / (col("nb") + col("v"))
      val m = (p + q) / 2.0
      lit(0.5) * p * log(p / m) + lit(0.5) * q * log(q / m)
    }
    val part1 = a.crossJoin(broadcast(tb)).join(b, Seq("lb", "tok"), "left")
      .join(ta, "la").crossJoin(broadcast(vRow))
      .filter(col("la") < col("lb"))
      .withColumn("t", term(col("ca"), coalesce(col("cb"), lit(0.0))))
      .groupBy(col("la"), col("lb")).agg(sum(col("t")).as("s"), count(lit(1)).as("k"))
    val part2 = b.crossJoin(broadcast(ta)).join(a, Seq("la", "tok"), "left_anti")
      .join(tb, "lb").crossJoin(broadcast(vRow))
      .filter(col("la") < col("lb"))
      .withColumn("t", term(lit(0.0), col("cb")))
      .groupBy(col("la"), col("lb")).agg(sum(col("t")).as("s"), count(lit(1)).as("k"))
    part1.union(part2)
      .groupBy(col("la"), col("lb")).agg(sum(col("s")).as("s"), sum(col("k")).as("k"))
      .join(ta, "la").join(tb, "lb").crossJoin(broadcast(vRow))
      .select(col("la").as("group_a"), col("lb").as("group_b"),
        round(col("s") + (col("v") - col("k")) *
          (lit(0.5) * (lit(1.0) / (col("na") + col("v")))
            * log((lit(1.0) / (col("na") + col("v")))
              / ((lit(1.0) / (col("na") + col("v")) + lit(1.0) / (col("nb") + col("v"))) / 2.0))
          + lit(0.5) * (lit(1.0) / (col("nb") + col("v")))
            * log((lit(1.0) / (col("nb") + col("v")))
              / ((lit(1.0) / (col("na") + col("v")) + lit(1.0) / (col("nb") + col("v"))) / 2.0))),
          4).as("js"))
      .orderBy("group_a", "group_b")
  }

  /** DuckDB twin of [[jsDivergence]] — the same three-part split and
    * the same arithmetic shape per term.
    */
  def jsDivergenceDuckSql(table: String, groupCol: String, textCol: String): String = {
    val pa = "((a.c + 1.0) / (ta.n + v.v))"
    val qa = "((coalesce(b.c, 0.0) + 1.0) / (tb.n + v.v))"
    val p2 = "((0.0 + 1.0) / (ta.n + v.v))"
    val q2 = "((b.c + 1.0) / (tb.n + v.v))"
    val ua = "(1.0 / (ta.n + v.v))"
    val ub = "(1.0 / (tb.n + v.v))"
    s"""WITH counts AS (
       |  SELECT g, tok, CAST(count(*) AS DOUBLE) AS c
       |  FROM (SELECT $groupCol AS g, unnest(string_split($textCol, ' ')) AS tok FROM $table)
       |  GROUP BY g, tok),
       |totals AS (SELECT g, sum(c) AS n FROM counts GROUP BY g),
       |v AS (SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS v FROM counts),
       |part1 AS (
       |  SELECT a.g AS la, tb.g AS lb,
       |    sum(0.5 * $pa * ln($pa / (($pa + $qa) / 2.0))
       |      + 0.5 * $qa * ln($qa / (($pa + $qa) / 2.0))) AS s,
       |    count(*) AS k
       |  FROM counts a
       |  CROSS JOIN totals tb
       |  LEFT JOIN counts b ON b.g = tb.g AND b.tok = a.tok
       |  JOIN totals ta ON ta.g = a.g
       |  CROSS JOIN v
       |  WHERE a.g < tb.g
       |  GROUP BY a.g, tb.g),
       |part2 AS (
       |  SELECT ta.g AS la, b.g AS lb,
       |    sum(0.5 * $p2 * ln($p2 / (($p2 + $q2) / 2.0))
       |      + 0.5 * $q2 * ln($q2 / (($p2 + $q2) / 2.0))) AS s,
       |    count(*) AS k
       |  FROM counts b
       |  CROSS JOIN totals ta
       |  JOIN totals tb ON tb.g = b.g
       |  CROSS JOIN v
       |  WHERE ta.g < b.g
       |    AND NOT EXISTS (SELECT 1 FROM counts a WHERE a.g = ta.g AND a.tok = b.tok)
       |  GROUP BY ta.g, b.g),
       |merged AS (
       |  SELECT la, lb, sum(s) AS s, sum(k) AS k
       |  FROM (SELECT * FROM part1 UNION ALL SELECT * FROM part2)
       |  GROUP BY la, lb)
       |SELECT m.la AS group_a, m.lb AS group_b,
       |  round(m.s + (v.v - m.k) *
       |    (0.5 * $ua * ln($ua / (($ua + $ub) / 2.0))
       |     + 0.5 * $ub * ln($ub / (($ua + $ub) / 2.0))), 4) AS js
       |FROM merged m
       |JOIN totals ta ON ta.g = m.la
       |JOIN totals tb ON tb.g = m.lb
       |CROSS JOIN v
       |ORDER BY group_a, group_b""".stripMargin
  }

  /** Heaps-law fit V = K·N^β over per-unit (token count, vocab)
    * points — the vocabulary-growth companion of [[zipfFit]]: β well
    * below ~0.8 says more data re-treads the same vocabulary.
    * Log-log least squares in the same covar_pop/var_pop shape as the
    * Zipf fit, over the per-DOCUMENT (N, V) scatter — thousands of
    * well-spread points (a handful of near-identical per-source
    * totals degenerates the variance to the float-zero boundary,
    * where the two engines' guard comparisons disagree). Degenerate
    * inputs yield NULL, not a divide error; `+ 0` folds a rounded
    * −0.0 into +0.0 on both sides (the Pca twin convention).
    */
  def heapsFit(df: DataFrame, unitCol: String, textCol: String): DataFrame = {
    val st = df
      .select(col(unitCol).as("g"), explode(graft.text.TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy("g", "tok").agg(count(lit(1)).as("c"))
      .groupBy("g").agg(sum("c").as("n"), count(lit(1)).as("vcb"))
    val lx = log(col("n").cast("double"))
    val ly = log(col("vcb").cast("double"))
    st.agg(
        covar_pop(ly, lx).as("cxy"), var_pop(lx).as("vx"), var_pop(ly).as("vy"),
        avg(lx).as("mx"), avg(ly).as("my"), count(lit(1)).as("n_points"))
      .select(
        (round(when(col("vx") =!= 0, col("cxy") / col("vx")), 4) + lit(0.0)).as("beta"),
        (round(when(col("vx") =!= 0,
          col("my") - col("cxy") / col("vx") * col("mx")), 4) + lit(0.0)).as("ln_k"),
        (round(when(col("vx") * col("vy") =!= 0,
          col("cxy") * col("cxy") / (col("vx") * col("vy"))), 4) + lit(0.0)).as("r2"),
        col("n_points"))
  }

  /** DuckDB twin of [[heapsFit]]. */
  def heapsFitDuckSql(table: String, unitCol: String, textCol: String): String =
    s"""WITH st AS (
       |  SELECT g, CAST(sum(c) AS BIGINT) AS n, count(*) AS vcb
       |  FROM (
       |    SELECT g, tok, count(*) AS c
       |    FROM (SELECT $unitCol AS g, unnest(string_split($textCol, ' ')) AS tok FROM $table)
       |    GROUP BY g, tok)
       |  GROUP BY g)
       |SELECT
       |  round(CASE WHEN var_pop(ln(CAST(n AS DOUBLE))) <> 0
       |    THEN covar_pop(ln(CAST(vcb AS DOUBLE)), ln(CAST(n AS DOUBLE)))
       |       / var_pop(ln(CAST(n AS DOUBLE))) END, 4) + 0 AS beta,
       |  round(CASE WHEN var_pop(ln(CAST(n AS DOUBLE))) <> 0
       |    THEN avg(ln(CAST(vcb AS DOUBLE)))
       |       - covar_pop(ln(CAST(vcb AS DOUBLE)), ln(CAST(n AS DOUBLE)))
       |         / var_pop(ln(CAST(n AS DOUBLE))) * avg(ln(CAST(n AS DOUBLE))) END, 4) + 0 AS ln_k,
       |  round(CASE WHEN var_pop(ln(CAST(n AS DOUBLE))) * var_pop(ln(CAST(vcb AS DOUBLE))) <> 0
       |    THEN covar_pop(ln(CAST(vcb AS DOUBLE)), ln(CAST(n AS DOUBLE)))
       |       * covar_pop(ln(CAST(vcb AS DOUBLE)), ln(CAST(n AS DOUBLE)))
       |       / (var_pop(ln(CAST(n AS DOUBLE))) * var_pop(ln(CAST(vcb AS DOUBLE)))) END, 4) + 0 AS r2,
       |  count(*) AS n_points
       |FROM st""".stripMargin

  /** Per-source top-quantile quality gate (the FineWeb-style "keep the
    * best q of every dump" filter — RELATIVE to each source, where an
    * absolute threshold would empty low-resource sources): rank each
    * source's documents by quality score (rounded to 4dp BEFORE
    * ranking so both engines rank identical values; ties break on the
    * doc id) and keep the top floor(q * n_source). The window
    * partitions on the source — bounded by the training-mix contract
    * (dozens of sources, the q_mix_temperature argument) — and the
    * per-source count rides the same exchange. At extreme per-source
    * cardinality the sub-linear tier is an approx-quantile cutoff
    * (Sketches.approxQuantiles broadcast) in place of the exact rank.
    */
  def qualityTopQ(df: DataFrame, idCol: String, srcCol: String,
                  textCol: String, q: Double): DataFrame = {
    // integer-exact 4dp (PortableRound): the score feeds a rank +
    // quantile cutoff, where a cross-engine boundary flip moves docs
    // across the gate
    val score = TextFunctions.stopwordRatio4(split(col(textCol), " "))
    val scored = df.select(col(idCol), col(srcCol), score.as("score"))
    val bySrc = Window.partitionBy(col(srcCol))
    val rn = row_number().over(bySrc.orderBy(col("score").desc, col(idCol).asc))
    val n = count(lit(1)).over(bySrc)
    scored
      .withColumn("__rn", rn).withColumn("__n", n)
      .filter(col("__rn") <= floor(col("__n") * q))
      .select(col(idCol), col(srcCol), col("score"))
  }

  /** DuckDB twin of [[qualityTopQ]]. */
  def qualityTopQDuckSql(table: String, idCol: String, srcCol: String,
                         textCol: String, q: Double): String =
    s"""SELECT $idCol, $srcCol, score FROM (
       |  SELECT $idCol, $srcCol,
       |    ${TextFunctions.stopwordRatio4Duck(s"string_split($textCol, ' ')")} AS score
       |  FROM $table) t
       |QUALIFY row_number() OVER (PARTITION BY $srcCol ORDER BY score DESC, $idCol ASC)
       |  <= floor(count(*) OVER (PARTITION BY $srcCol) * $q)
       |ORDER BY $idCol""".stripMargin

  /** DSIR-style importance weights for domain-targeted data selection
    * (Xie et al. 2023, "Data Selection for Language Models via
    * Importance Resampling"): score every raw-corpus document by the
    * log-likelihood ratio of a hashed-unigram LM fit on the TARGET
    * slice vs one fit on the RAW corpus — the standing technique for
    * "give me more documents that look like this domain". Tokens hash
    * into `nBuckets` buckets (the paper's hashed feature trick: model
    * size is a LITERAL bound, independent of vocabulary), both bucket
    * LMs are Laplace-smoothed, and a document's weight is the sum of
    * its occurrences' per-bucket log ratios.
    *
    * Scale shape: one explode + two-sided conditional count per bucket
    * (partial agg), a 1-row totals frame, then the nBuckets-row model
    * broadcasts back onto the token stream — per-doc weights fall out
    * of one keyed groupBy on the doc id (max-cardinality key). Nothing
    * vocabulary- or corpus-sized ever reaches the driver.
    *
    * Returns (idCol, log_w) for every raw (non-target) document.
    */
  def importanceWeights(df: DataFrame, idCol: String, textCol: String,
                        targetPred: Column, nBuckets: Int = 1024): DataFrame = {
    val isT = coalesce(targetPred, lit(false))
    val buckets = df.select(col(idCol), isT.as("__t"),
      explode(expr(
        s"transform(${TextFunctions.tokenHashesSql(textCol)}, h -> h % $nBuckets)")).as("b"))
    val counts = buckets.groupBy("b").agg(
      sum(when(col("__t"), 1L).otherwise(0L)).as("ct"),
      sum(when(!col("__t"), 1L).otherwise(0L)).as("cr"))
    val tot = counts.agg(sum("ct").as("nt"), sum("cr").as("nr"))
    val model = counts.crossJoin(broadcast(tot))
      .select(col("b"),
        (log((col("ct") + 1).cast("double") / (col("nt") + nBuckets)) -
         log((col("cr") + 1).cast("double") / (col("nr") + nBuckets))).as("lw"))
    buckets.filter(!col("__t"))
      .join(broadcast(model), "b")
      .groupBy(idCol).agg(round(sum("lw"), 4).as("log_w"))
  }

  /** DuckDB twin of [[importanceWeights]]. */
  def importanceWeightsDuckSql(table: String, idCol: String, textCol: String,
                               targetPredSql: String, nBuckets: Int = 1024): String =
    s"""WITH bk AS (
       |  SELECT $idCol, coalesce($targetPredSql, false) AS t,
       |         unnest(list_transform(${TextFunctions.tokenHashesDuckSql(textCol)},
       |                h -> h % $nBuckets)) AS b
       |  FROM $table),
       |counts AS (
       |  SELECT b,
       |    CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS ct,
       |    CAST(sum(CASE WHEN t THEN 0 ELSE 1 END) AS BIGINT) AS cr
       |  FROM bk GROUP BY b),
       |tot AS (
       |  SELECT CAST(sum(ct) AS BIGINT) AS nt, CAST(sum(cr) AS BIGINT) AS nr
       |  FROM counts),
       |model AS (
       |  SELECT b,
       |    ln((ct + 1) / CAST(nt + $nBuckets AS DOUBLE)) -
       |    ln((cr + 1) / CAST(nr + $nBuckets AS DOUBLE)) AS lw
       |  FROM counts, tot)
       |SELECT $idCol, round(sum(lw), 4) AS log_w
       |FROM bk JOIN model USING (b)
       |WHERE NOT t
       |GROUP BY $idCol
       |ORDER BY $idCol""".stripMargin

  /** Pairwise vocabulary overlap between group corpora: Jaccard of the
    * DISTINCT token sets per unordered group pair — the coarse
    * corpus-similarity matrix next to [[klDivergence]]'s
    * distribution-sensitive one (overlap answers "do they share words
    * at all", KL answers "do they use them alike"). One distinct
    * (group, token) table, a self-join on the token — at most |groups|²
    * rows per token, and the group domain is bounded by the
    * training-mix contract — then bounded-key aggregates.
    */
  def vocabOverlap(df: DataFrame, groupCol: String, textCol: String,
                   scope: graft.api.CacheScope = graft.api.CacheScope.global): DataFrame = {
    val st = scope.persist(df
      .select(col(groupCol).as("g"), explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .distinct())
    val sizes = st.groupBy("g").agg(count(lit(1)).as("nv"))
    val inter = st.select(col("g").as("ga"), col("tok"))
      .join(st.select(col("g").as("gb"), col("tok")), "tok")
      .filter(col("ga") < col("gb"))
      .groupBy("ga", "gb").agg(count(lit(1)).as("n_shared"))
    inter
      .join(sizes.select(col("g").as("ga"), col("nv").as("na")), "ga")
      .join(sizes.select(col("g").as("gb"), col("nv").as("nb")), "gb")
      .select(col("ga").as("group_a"), col("gb").as("group_b"),
        col("n_shared"),
        round(col("n_shared") /
          (col("na") + col("nb") - col("n_shared")).cast("double"), 4).as("jaccard"))
      .orderBy("group_a", "group_b")
  }

  /** DuckDB twin of [[vocabOverlap]]. */
  def vocabOverlapDuckSql(table: String, groupCol: String, textCol: String): String =
    s"""WITH st AS (
       |  SELECT DISTINCT $groupCol AS g, tok
       |  FROM (SELECT $groupCol, unnest(string_split($textCol, ' ')) AS tok FROM $table)),
       |sizes AS (SELECT g, CAST(count(*) AS BIGINT) AS nv FROM st GROUP BY g),
       |inter AS (
       |  SELECT a.g AS ga, b.g AS gb, CAST(count(*) AS BIGINT) AS n_shared
       |  FROM st a JOIN st b ON a.tok = b.tok
       |  WHERE a.g < b.g
       |  GROUP BY a.g, b.g)
       |SELECT ga AS group_a, gb AS group_b, n_shared,
       |  round(n_shared / CAST(sa.nv + sb.nv - n_shared AS DOUBLE), 4) AS jaccard
       |FROM inter
       |JOIN sizes sa ON sa.g = ga
       |JOIN sizes sb ON sb.g = gb
       |ORDER BY group_a, group_b""".stripMargin

  /** DSIR importance RESAMPLING — the selection half of Xie et al.
    * 2023 that [[importanceWeights]]'s scoring half feeds: draw `n`
    * documents WITHOUT replacement with probability ∝ exp(log_w) via
    * the Gumbel-top-k trick — score = log_w + Gumbel(u), Gumbel(u) =
    * -ln(-ln(u)), take the top n. The Gumbel noise comes from the
    * shared deterministic membership hash ([[Sampling.unitHash]]), so
    * reruns and engines draw the IDENTICAL sample (the property the
    * paper's np.random resampling loses), and changing the salt draws
    * an independent one.
    *
    * Scale shape: weights are one keyed groupBy over the hashed-LM
    * broadcast (the importanceWeights plan), the Gumbel perturbation
    * is map-only arithmetic, and top-n is TakeOrderedAndProject — no
    * global sort. (At selection sizes past top-k range — "resample 5%
    * of 100 TB" — the same score compares against an approx-quantile
    * cutoff broadcast instead: one extra pass, still no sort; the
    * q_quality_topq scale note.) Scores pre-round to 4dp before
    * ranking; ties break on the id.
    */
  def importanceSample(df: DataFrame, idCol: String, textCol: String,
                       targetPred: Column, n: Int,
                       nBuckets: Int = 1024, salt: String = ""): DataFrame = {
    val gumbel = -log(-log(Sampling.unitHash(col(idCol), salt)))
    importanceWeights(df, idCol, textCol, targetPred, nBuckets)
      .withColumn("score", round(col("log_w") + gumbel, 4))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(n)
  }

  /** DuckDB twin of [[importanceSample]]. */
  def importanceSampleDuckSql(table: String, idCol: String, textCol: String,
                              targetPredSql: String, n: Int,
                              nBuckets: Int = 1024, salt: String = ""): String =
    s"""WITH iw AS (
       |${importanceWeightsDuckSql(table, idCol, textCol, targetPredSql, nBuckets)})
       |SELECT $idCol, log_w,
       |  round(log_w + (-ln(-ln(${Sampling.unitHashDuckSql(idCol, salt)}))), 4) AS score
       |FROM iw
       |ORDER BY score DESC, $idCol ASC
       |LIMIT $n""".stripMargin

  /** Zipf power-law fit of the token rank-frequency curve: least-squares
    * slope/intercept/r² of ln(freq) on ln(rank), plus vocab size and
    * total token count — the corpus-health diagnostic that catches
    * template spam (slope flattens) and boilerplate floods (head mass
    * inflates). The corpus collapses to its vocabulary-sized frequency
    * table in one partial-agg pass; the global frequency rank is a
    * distributed prefix-sum (range-partition on (freq DESC, token) +
    * per-partition row_number + broadcast partition offsets — the
    * Describe/pack_sequences idiom, NO partition-less window); the
    * regression moments are one final aggregation, 1 row out.
    */
  def zipfFit(df: DataFrame, textCol: String): DataFrame = {
    val tf = df.select(explode(split(col(textCol), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("tok").agg(count(lit(1)).as("f"))
      .repartitionByRange(col("f").desc, col("tok").asc)
      .withColumn("__pid", spark_partition_id())
      .persist()
    try {
      val cnts = tf.groupBy("__pid").agg(count(lit(1)).as("c"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
      val offsets = cnts.map(_._2).scanLeft(0L)(_ + _).init
      val offMap = map(cnts.map(_._1).zip(offsets).flatMap {
        case (pid, off) => Seq(lit(pid), lit(off))
      }.toSeq: _*)
      val w = Window.partitionBy("__pid").orderBy(col("f").desc, col("tok").asc)
      val ranked = tf.withColumn("r",
        row_number().over(w).cast("long") + element_at(offMap, col("__pid")))
      val lnr = log(col("r").cast("double"))
      val lnf = log(col("f").cast("double"))
      // degenerate corpora (single token -> var(ln r)=0; uniform
      // frequencies -> var(ln f)=0) yield NULL, not a divide error
      val agg = ranked.agg(
          covar_pop(lnf, lnr).as("cxy"), var_pop(lnr).as("vx"),
          var_pop(lnf).as("vy"), avg(lnr).as("mx"), avg(lnf).as("my"),
          count(lit(1)).as("vocab"), sum("f").as("n_tokens"))
        .select(
          round(when(col("vx") =!= 0, col("cxy") / col("vx")), 4).as("alpha"),
          round(when(col("vx") =!= 0,
            col("my") - col("cxy") / col("vx") * col("mx")), 4).as("intercept"),
          round(when(col("vx") * col("vy") =!= 0,
            col("cxy") * col("cxy") / (col("vx") * col("vy"))), 4).as("r2"),
          col("vocab"), col("n_tokens"))
      // materialize the 1-row result before unpersisting: the broadcast
      // offsets are only valid against THIS materialization of the
      // range partitioning — a post-unpersist recompute could re-sample
      // different partition boundaries
      df.sparkSession.createDataFrame(
        java.util.Arrays.asList(agg.collect(): _*), agg.schema)
    } finally tf.unpersist()
  }

  /** DuckDB twin of [[zipfFit]] (the oracle may rank with a plain
    * global window — it is the single-node referee, not the plan).
    */
  def zipfFitDuckSql(table: String, textCol: String): String =
    s"""WITH tf AS (
       |  SELECT tok, CAST(count(*) AS BIGINT) AS f
       |  FROM (SELECT unnest(string_split($textCol, ' ')) AS tok FROM $table) t
       |  WHERE length(tok) > 0
       |  GROUP BY tok),
       |ranked AS (
       |  SELECT f, CAST(row_number() OVER (ORDER BY f DESC, tok ASC) AS BIGINT) AS r
       |  FROM tf)
       |SELECT
       |  round(CASE WHEN var_pop(ln(r)) <> 0
       |    THEN covar_pop(ln(f), ln(r)) / var_pop(ln(r)) END, 4) AS alpha,
       |  round(CASE WHEN var_pop(ln(r)) <> 0
       |    THEN avg(ln(f)) - covar_pop(ln(f), ln(r)) / var_pop(ln(r)) * avg(ln(r)) END, 4) AS intercept,
       |  round(CASE WHEN var_pop(ln(r)) * var_pop(ln(f)) <> 0
       |    THEN covar_pop(ln(f), ln(r)) * covar_pop(ln(f), ln(r)) /
       |         (var_pop(ln(r)) * var_pop(ln(f))) END, 4) AS r2,
       |  CAST(count(*) AS BIGINT) AS vocab,
       |  CAST(sum(f) AS BIGINT) AS n_tokens
       |FROM ranked""".stripMargin

  /** RAKE keyword extraction (Rose et al. 2010), corpus-level:
    * candidate phrases are maximal stopword-free token runs (runs
    * longer than `maxWords` are DROPPED — the rake-nltk max_length
    * convention), word scores are deg(w)/freq(w) over all candidate
    * occurrences (deg sums the lengths of the phrases a word appears
    * in), a phrase scores the sum of its word scores. Each word score
    * is fixed-point-quantized to 4dp in EXACT integer arithmetic
    * (PortableRound.intScaled) BEFORE the sum, so the phrase score is
    * an exact integer sum in both engines — the float-addition-order
    * hazard of summing raw rationals never arises. Every stage is
    * vocabulary- or candidate-bounded: the only corpus-sized shuffles
    * are the per-doc phrase window (partitioned on the doc id) and
    * the word-stats aggregate; top-k is TakeOrdered.
    */
  def rakeKeywords(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxWords: Int = 4,
      k: Int = 20,
      scope: graft.api.CacheScope = graft.api.CacheScope.global): DataFrame = {
    val stop = TextFunctions.stopwords
    val marked = df.select(col(idCol).as("__id"),
        posexplode(split(lower(col(textCol)), " ")).as(Seq("__pos", "__w")))
      .withColumn("__is_stop",
        col("__w").isInCollection(stop) || col("__w") === "")
    // phrase id = running stopword count: every stopword closes the
    // current run and opens the next
    val pid = marked.withColumn("__pid",
      sum(when(col("__is_stop"), 1).otherwise(0)).over(
        Window.partitionBy("__id").orderBy("__pos")))
    // persisted: feeds both the word-stats aggregate and the scoring join
    val cand = scope.persist(pid.filter(!col("__is_stop"))
      .groupBy("__id", "__pid")
      .agg(transform(array_sort(collect_list(struct(col("__pos"), col("__w")))),
        x => x.getField("__w")).as("__ws"))
      .filter(size(col("__ws")) <= maxWords)
      .select(col("__id"), col("__pid"), col("__ws"),
        concat_ws(" ", col("__ws")).as("phrase")))
    val cw = cand.select(col("__id"), col("__pid"), col("phrase"),
      size(col("__ws")).cast("long").as("__len"), explode(col("__ws")).as("__w"))
    val fd = cw.groupBy("__w").agg(count(lit(1)).as("__freq"),
      sum("__len").as("__deg"))
    val scored = cw.join(fd, "__w")
      .groupBy("__id", "__pid", "phrase")
      .agg(sum(PortableRound.intScaled(col("__deg"), col("__freq"))).as("__sc"))
    scored.groupBy("phrase")
      // the score depends only on corpus-wide word stats, so every
      // occurrence of a phrase string carries the identical value —
      // max is "any"
      .agg(count(lit(1)).as("n_occ"), max(col("__sc")).as("__sc"))
      .select(col("phrase"), col("n_occ"),
        (col("__sc") / lit(10000.0)).as("score"))
      .orderBy(col("score").desc, col("phrase").asc)
      .limit(k)
  }

  /** DuckDB twin of [[rakeKeywords]]. */
  def rakeKeywordsDuckSql(table: String, idCol: String, textCol: String,
                          maxWords: Int = 4, k: Int = 20): String = {
    val stoplist = TextFunctions.stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH tk AS (
       |  SELECT $idCol AS id, string_split(lower($textCol), ' ') AS ws FROM $table),
       |t AS (SELECT id, unnest(ws) AS w,
       |        unnest(generate_series(1, len(ws))) AS pos FROM tk),
       |p AS (SELECT id, pos, w, (w IN ($stoplist) OR w = '') AS is_stop,
       |        sum(CASE WHEN (w IN ($stoplist) OR w = '') THEN 1 ELSE 0 END)
       |          OVER (PARTITION BY id ORDER BY pos) AS pid
       |      FROM t),
       |cand AS (SELECT id, pid, string_agg(w, ' ' ORDER BY pos) AS phrase,
       |           CAST(count(*) AS BIGINT) AS len
       |         FROM p WHERE NOT is_stop GROUP BY id, pid
       |         HAVING count(*) <= $maxWords),
       |cw AS (SELECT c.id, c.pid, c.phrase, c.len,
       |         unnest(string_split(c.phrase, ' ')) AS w FROM cand c),
       |fd AS (SELECT w, CAST(count(*) AS BIGINT) AS freq,
       |         CAST(sum(len) AS BIGINT) AS deg FROM cw GROUP BY w),
       |sc AS (SELECT cw.id, cw.pid, cw.phrase,
       |         sum(${PortableRound.intScaledDuck("fd.deg", "fd.freq")}) AS s
       |       FROM cw JOIN fd USING (w) GROUP BY 1, 2, 3),
       |outp AS (SELECT phrase, CAST(count(*) AS BIGINT) AS n_occ, max(s) AS s
       |         FROM sc GROUP BY phrase)
       |SELECT phrase, n_occ, (s / 10000.0) AS score FROM outp
       |ORDER BY score DESC, phrase LIMIT $k""".stripMargin
  }
}
