package graft.queries

import graft.Tables
import graft.ops.{Describe, Enrichment}
import org.apache.spark.sql.functions._

/** Statistics / reshaping operators (SURVEY §2 rows 16-19): describe,
  * group_by with agg-map, nested group_by, pivot. Mirrors the reference
  * CLI's describe/groupby/pivot commands (reference:
  * src/linkml_store/cli.py:656-700) as one-pass distributed plans.
  */
object StatsQueries extends QuerySet {

  def all: Seq[Q] = Seq(
    Q("q_describe",
      (s, d) => Describe.describe(Tables.df(s, d, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount")),
      Some(Describe.oracleSql("lineitem",
        Seq("l_quantity", "l_extendedprice", "l_discount")))),

    // Exact per-group quantiles (grouped describe): per-language
    // document-length p50/p90 with quantile_cont interpolation —
    // rank+count windows on the bounded group domain + one conditional
    // aggregate, no value->count maps, no driver passes.
    Q("q_group_quantiles",
      (s, d) => Describe.groupQuantiles(
        Tables.df(s, d, "documents"), "lang", "n_chars"),
      Some(Describe.groupQuantilesDuckSql("documents", "lang", "n_chars"))),

    // Linear-counting distinct-estimator audit (the sketch tier of row
    // 61 made oracle-checkable, like q_cms_topk did for Count-Min):
    // users hash into m=65536 buckets via the portable md5-60bit hash,
    // est = -m·ln((m - hit)/m) — one grouped-distinct aggregate, both
    // engines replay the identical hash and float pipeline, and the
    // exact count sits beside the estimate so the audit (rel_err) is
    // data. m is sized so the load factor stays well under saturation
    // through sf1 (15k users / 64k buckets); a saturated bitmap yields
    // NULL, never ±inf. At 100 TB the same shape runs per
    // partition-key slice; the bucket set is ≤m integers regardless of
    // corpus size.
    Q("q_lc_distinct",
      (s, d) => {
        val m = 65536L
        Tables.df(s, d, "events")
          .select(col("user_id"))
          .agg(
            countDistinct(col("user_id")).as("n_exact"),
            countDistinct(pmod(
              graft.text.TextFunctions.portableHash60(col("user_id").cast("string")),
              lit(m))).as("buckets_hit"))
          .select(col("n_exact"), col("buckets_hit"),
            when(col("buckets_hit") === m, lit(null).cast("double"))
              .otherwise(round(lit(-65536.0) * log(
                (lit(m) - col("buckets_hit")).cast("double") / lit(65536.0)), 4))
              .as("lc_est"))
          .select(col("n_exact"), col("buckets_hit"), col("lc_est"),
            round((col("lc_est") - col("n_exact").cast("double")) /
              col("n_exact").cast("double"), 4).as("rel_err"))
      },
      Some("""WITH b AS (
             |  SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
             |    CAST(count(DISTINCT
             |      (CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
             |        AS UBIGINT) % 65536)) AS BIGINT) AS buckets_hit
             |  FROM events),
             |e AS (
             |  SELECT n_exact, buckets_hit,
             |    CASE WHEN buckets_hit = 65536 THEN NULL
             |      ELSE round(-65536.0 * ln(CAST(65536 - buckets_hit AS DOUBLE) / 65536.0), 4)
             |    END AS lc_est
             |  FROM b)
             |SELECT n_exact, buckets_hit, lc_est,
             |  round((lc_est - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE), 4)
             |    AS rel_err
             |FROM e""".stripMargin)),

    // Per-type skewness + excess kurtosis of event values — the
    // distribution-SHAPE drift profile describe's mean/std can't see
    // (a heavy tail developing under a flat std is the classic fraud /
    // outage signature). One grouped aggregate of exact integer power
    // sums in DECIMAL(38)/HUGEINT (the CorrMatrix overflow rule),
    // central-moment algebra on doubles mirrored stage-for-stage.
    Q("q_moments",
      (s, d) => graft.ops.Moments.groupMoments(
        Tables.df(s, d, "events"), "event_type", "value"),
      Some(graft.ops.Moments.groupMomentsDuckSql(
        "events", "event_type", "value"))),

    // Winsorized mean per event type — the outlier-capping robust
    // aggregate a latency/revenue dashboard should quote: clip at the
    // p05/p95 caps (from the groupQuantiles contract, 4dp-agreed in
    // both engines) then average — assembled from exact integer cent
    // sums plus the two bounded cap terms, never a float sum over raw
    // doubles.
    Q("q_winsorized_mean",
      (s, d) => graft.ops.Describe.winsorizedMeans(
        Tables.df(s, d, "events"), "event_type", "value"),
      Some(graft.ops.Describe.winsorizedMeansDuckSql(
        "events", "event_type", "value"))),

    // Per-language MAD of document length — robust spread for the
    // mixing report (outlier docs dominate a stddev, barely move a
    // MAD). Two bounded-key grouped-quantile passes + one broadcast-
    // sized keyed join; integer inputs make every intermediate an
    // exact dyadic, so 4dp rounding is engine-portable.
    Q("q_mad",
      (s, d) => Describe.groupMad(
        Tables.df(s, d, "documents"), "lang", "n_chars"),
      Some(Describe.groupMadDuckSql("documents", "lang", "n_chars"))),

    // Equi-width histogram of a numeric column — the computation
    // behind the reference's distribution plots (renderers are §6
    // out of scope; the distributed binning is not): floor-bucketed
    // in identical double arithmetic on both engines (no rounding —
    // floor of the same quotient), bounded-key aggregate (24 buckets
    // regardless of corpus size).
    Q("q_histogram",
      (s, d) => Tables.coll(s, d, "orders")
        .histogram("o_totalprice", lo = 0.0, width = 25000.0, nBuckets = 24)
        .orderBy("bucket"),
      Some("""SELECT bucket, 0.0 + bucket * 25000.0 AS bucket_lo,
             |  CAST(count(*) AS BIGINT) AS n
             |FROM (SELECT CAST(least(greatest(floor((o_totalprice - 0.0) / 25000.0), 0), 23) AS INT) AS bucket
             |      FROM orders) t
             |GROUP BY bucket
             |ORDER BY bucket""".stripMargin)),

    // Revenue-concentration digest over customers (Lorenz curve in one
    // row: Gini + top-decile share). Global revenue rank via the zipf
    // range-partition prefix-sum idiom — no partition-less window, no
    // collect_list of a 150k-customer domain; the Gini numerator uses
    // 2·Σ(i·t) − (n+1)·Σt with DECIMAL(38) product sums.
    Q("q_revenue_gini",
      (s, d) => graft.ops.Stats.concentration(Tables.df(s, d, "orders"),
        "o_custkey", "o_totalprice", outKeyCnt = "n_customers"),
      Some(graft.ops.Stats.concentrationDuckSql("orders",
        "o_custkey", "o_totalprice", outKeyCnt = "n_customers"))),

    // Pearson correlation matrix over the lineitem numeric columns in
    // ONE aggregation pass — redundancy diagnostics for quality
    // signals before a learned gate (see ops/CorrMatrix for the
    // exact-integer-sum portability design; sums ride DECIMAL(38)/
    // HUGEINT so a 100 TB pair sum cannot silently wrap).
    Q("q_corr_matrix",
      (s, d) => graft.ops.CorrMatrix.corrMatrix(Tables.df(s, d, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")),
      Some(graft.ops.CorrMatrix.corrMatrixDuckSql("lineitem",
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")))),

    // group_by + agg_map {count, sum, list} — the reference's group_by
    // with deterministic (sorted) list aggregation. The list column is
    // serialized to a comma-joined string: the driver compare hashes
    // cell values with pandas, and raw arrays are unhashable there.
    Q("q_group_agg",
      (s, d) => Tables.df(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(
          count(lit(1)).as("num_orders"),
          round(sum("o_totalprice"), 4).as("total_price"),
          concat_ws(",", sort_array(collect_list(col("o_orderkey")))).as("order_keys"))
        .orderBy("o_custkey"),
      Some("""SELECT o_custkey, count(*) AS num_orders,
             |  round(sum(o_totalprice), 4) AS total_price,
             |  string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS order_keys
             |FROM orders
             |GROUP BY o_custkey
             |ORDER BY o_custkey""".stripMargin)),

    // group_by → nested objects (collect_list of structs), serialized to
    // a canonical JSON string per group: nested arrays/structs are not
    // hashable by the driver's pandas compare, JSON strings are. Price
    // rides as integer cents so both engines print exact integers (raw
    // double-to-string formatting differs between JVM and DuckDB). The
    // DuckDB twin builds the identical string with string_agg over
    // per-row json fragments (same inner order via ORDER BY).
    Q("q_group_nest",
      (s, d) => new graft.api.Collection("orders",
        Tables.df(s, d, "orders").withColumn(
          "o_price_cents", round(col("o_totalprice") * 100, 0).cast("long")))
        .groupByNested(
          groupFields = Seq("o_orderstatus"),
          inlinedField = "objects",
          listFields = Seq("o_orderkey", "o_price_cents"),
          sortList = true)
        .select(col("o_orderstatus"), size(col("objects")).as("n_objects"),
          to_json(col("objects")).as("objects_json"))
        .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus, count(*) AS n_objects,
             |  '[' || string_agg(
             |    '{"o_orderkey":' || o_orderkey ||
             |    ',"o_price_cents":' || CAST(round(o_totalprice * 100) AS BIGINT) || '}',
             |    ',' ORDER BY o_orderkey) || ']' AS objects_json
             |FROM orders
             |GROUP BY o_orderstatus
             |ORDER BY o_orderstatus""".stripMargin)),

    // Rule-based inference as a registered query: ordered rules where
    // a later precondition reads an EARLIER rule's assignment (the
    // reference engine's sequential-mutate semantics), plus a computed
    // assignment. The oracle replays the chain as sequential CTEs.
    Q("q_rule_infer",
      (s, d) => graft.ops.Rules.applyRules(Tables.df(s, d, "documents"), Seq(
        graft.ops.Rules.Rule(graft.query.Filter.eq("lang", "en"),
          Map("tier" -> lit("base"),
            "score" -> length(col("text")).cast("long"))),
        graft.ops.Rules.Rule(graft.query.Filter.gt("score", 500L),
          Map("tier" -> lit("long")))))
        .select("doc_id", "lang", "tier", "score")
        .orderBy("doc_id"),
      Some("""WITH r1 AS (
             |  SELECT doc_id, lang,
             |    CASE WHEN lang = 'en' THEN 'base' END AS tier,
             |    CASE WHEN lang = 'en' THEN CAST(length(text) AS BIGINT) END AS score
             |  FROM documents),
             |r2 AS (
             |  SELECT doc_id, lang,
             |    CASE WHEN score > 500 THEN 'long' ELSE tier END AS tier,
             |    score
             |  FROM r1)
             |SELECT doc_id, lang, tier, score FROM r2 ORDER BY doc_id""".stripMargin)),

    // Pairwise mutual information between categorical columns — the
    // Spark-first analog of the reference's stats_utils predictive
    // power (sklearn trees -> exact information-theoretic association).
    Q("q_mutual_info",
      (s, d) => graft.ops.Stats.mutualInfoPairs(
        Tables.df(s, d, "documents").withColumn("len_bucket", expr("n_chars div 200")),
        Seq("lang", "source", "len_bucket"))
        .orderBy("x", "y"),
      Some(graft.ops.Stats.mutualInfoPairsDuckSql(
        "(SELECT *, n_chars // 200 AS len_bucket FROM documents) db",
        Seq("lang", "source", "len_bucket")) + "\nORDER BY x, y")),

    // Per-feature k-fold CV predictive power (reference
    // stats_utils.py:5-53 `analyze_predictive_power`): majority-class
    // stump per feature, deterministic hash folds, exact integer
    // confusion counts — the direct CV-accuracy twin next to
    // q_mutual_info's information-theoretic association
    Q("q_predictive_power",
      (s, d) => graft.ops.PredictivePower.cvAccuracy(
        Tables.df(s, d, "documents"), "doc_id", "lang",
        Seq(
          "source" -> col("source"),
          "len_bucket" -> expr("n_chars div 200"),
          "first_char" -> substring(col("text"), 1, 1)),
        k = 3, salt = "pp9"),
      Some(graft.ops.PredictivePower.cvAccuracyDuckSql(
        "documents", "doc_id", "lang",
        Seq(
          "source" -> "source",
          "len_bucket" -> "n_chars // 200",
          "first_char" -> "substr(text, 1, 1)"),
        k = 3, salt = "pp9"))),

    Q("q_pivot",
      (s, d) => Tables.df(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(round(sum("o_totalprice"), 4))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
             |  round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 4) AS F,
             |  round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 4) AS O,
             |  round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 4) AS P
             |FROM orders
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // Per-source token enrichment with hypergeometric upper-tail p and
    // BH correction; the oracle runs the identical folds in DuckDB.
    Q("q_enrichment",
      (s, d) => Enrichment.enrich(Tables.df(s, d, "documents"), "source", "text"),
      Some(Enrichment.oracleSql("documents", "source", "text"))),

    // Benford first-significant-digit audit on order totals — the
    // fabricated-data / broken-ETL smell test: observed digit shares
    // vs log10(1+1/d) with per-digit chi-square contributions. The
    // digit comes from the INTEGER cents rendered as a string
    // (floor(x·100+0.5) is the identical IEEE op in both engines, and
    // integer→string is exact) — no floor(log10(x)) power-of-ten
    // boundary hazard. One scan, a 9-row aggregate, a 1-row total.
    Q("q_benford",
      (s, d) => {
        val cents = floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long")
        val counts = Tables.df(s, d, "orders")
          .select(substring(cents.cast("string"), 1, 1).cast("long").as("digit"))
          .groupBy("digit").agg(count(lit(1)).as("n_obs"))
        val tot = counts.agg(sum("n_obs").as("n"))
        val p = log10(lit(1.0) + lit(1.0) / col("digit").cast("double"))
        counts.crossJoin(broadcast(tot))
          .select(col("digit"), col("n_obs"),
            graft.ops.PortableRound.intRound4(col("n_obs"), col("n")).as("obs_frac"),
            graft.ops.PortableRound.floatRound4(p).as("benford_frac"),
            graft.ops.PortableRound.floatRound4(
              pow(col("n_obs").cast("double") - col("n").cast("double") * p, 2) /
                (col("n").cast("double") * p)).as("chi2_term"))
          .orderBy("digit")
      },
      Some(s"""WITH c AS (
             |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
             |  FROM orders),
             |g AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_obs FROM c GROUP BY digit),
             |t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM g)
             |SELECT digit, n_obs,
             |  ${graft.ops.PortableRound.intRound4Duck("n_obs", "n")} AS obs_frac,
             |  ${graft.ops.PortableRound.floatRound4Duck("log10(1.0 + 1.0 / digit)")} AS benford_frac,
             |  ${graft.ops.PortableRound.floatRound4Duck(
                  "power(n_obs - n * log10(1.0 + 1.0 / digit), 2) / (n * log10(1.0 + 1.0 / digit))")} AS chi2_term
             |FROM g, t ORDER BY digit""".stripMargin))
  )
}
