package graft.queries

import graft.Tables
import graft.text.{LangId, TextFunctions}
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents` (SURVEY §2 rows 44-47):
  * quality ratios, language ID, token counting, fingerprints. All pure
  * Catalyst expressions; each oracle computes the identical formula in
  * DuckDB (note: DuckDB regexp_replace needs the 'g' flag to match
  * Spark's replace-all default).
  */
object TextQueries extends QuerySet {

  def all: Seq[Q] = Seq(
    // the five ratios from ONE native byte scan (graft_text_stats) —
    // spec-asserted bit-identical to the regex/lambda formulations the
    // oracle mirrors
    // ratios pre-rounded by EXACT INTEGER arithmetic on the kernel's
    // count array (qualityStats4/PortableRound): int/int ratios are
    // the class where round(double, 4) flips across engines on exact
    // decimal boundaries — the q_repetition sf1 lesson, and this
    // query emits 4 such ratios per document
    Q("q_text_quality",
      (s, d) => {
        val qs = TextFunctions.qualityStats4(col("text"))
        Tables.df(s, d, "documents").select(
          col("doc_id"),
          qs.nTokens.as("n_tokens"),
          qs.meanTokLen.as("mean_tok_len"),
          qs.stopRatio.as("stop_ratio"),
          qs.punctRatio.as("punct_ratio"),
          qs.digitRatio.as("digit_ratio"))
          .orderBy("doc_id")
      },
      {
        import graft.ops.PortableRound.intRound4Duck
        Some(s"""SELECT doc_id,
                |  len(toks) AS n_tokens,
                |  ${intRound4Duck("list_sum(list_transform(toks, x -> length(x)))", "len(toks)")} AS mean_tok_len,
                |  ${intRound4Duck(s"len(list_filter(toks, x -> list_contains(${TextFunctions.stopwordArrayDuck}, x)))", "len(toks)")} AS stop_ratio,
                |  ${intRound4Duck("length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))", "length(text)")} AS punct_ratio,
                |  ${intRound4Duck("length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))", "length(text)")} AS digit_ratio
                |FROM (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents) t
                |ORDER BY doc_id""".stripMargin)
      }),

    // counts via the allocation-free forms (arithmetic span count +
    // native byte scan) — spec-asserted equal to the array-size
    // formulations the oracle mirrors
    Q("q_token_count",
      (s, d) => Tables.df(s, d, "documents").select(
        col("doc_id"),
        TextFunctions.wsTokenCount(col("text")).as("n_ws_tokens"),
        TextFunctions.regexTokenCount(col("text")).as("n_re_tokens"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  len(string_split(text, ' ')) AS n_ws_tokens,
             |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_re_tokens
             |FROM documents
             |ORDER BY doc_id""".stripMargin)),

    Q("q_fingerprint",
      (s, d) => Tables.df(s, d, "documents").select(
        col("doc_id"),
        TextFunctions.tokenSetFingerprint(col("text")).as("fp"),
        TextFunctions.portableHash60(col("text")).as("h60"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
              |  ${TextFunctions.tokenSetFingerprintDuck("text")} AS fp,
              |  CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) AS h60
              |FROM documents
              |ORDER BY doc_id""".stripMargin)),

    // Deterministic stratified sampling: reproducible per-language
    // rates (reruns and the oracle select the IDENTICAL rows — pure
    // hash of the key, no RNG state).
    Q("q_sample_stratified",
      (s, d) => graft.ops.Sampling.stratified(
        Tables.df(s, d, "documents"), "doc_id", "lang",
        Map("en" -> 0.25, "de" -> 0.5, "fr" -> 1.0), salt = "r3")
        .select("doc_id", "lang")
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, lang FROM (
              |${graft.ops.Sampling.stratifiedDuckSql("documents", "doc_id", "lang",
                  Map("en" -> 0.25, "de" -> 0.5, "fr" -> 1.0), salt = "r3")}) t
              |ORDER BY doc_id""".stripMargin)),

    // Deterministic train/val/test split: assignment is a pure
    // function of (key, salt) — reruns/engines agree, new rows never
    // reassign old ones, and the hash is uniform within any stratum
    // so the split is stratified by construction. Map-only.
    Q("q_split_assign",
      (s, d) => graft.ops.Sampling.splitAssign(
        Tables.df(s, d, "documents"), "doc_id", valPm = 100, testPm = 100, salt = "r8")
        .select("doc_id", "source", "split")
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, source, split FROM (
              |${graft.ops.Sampling.splitAssignDuckSql("documents", "doc_id",
                  valPm = 100, testPm = 100, salt = "r8")}) t
              |ORDER BY doc_id""".stripMargin)),

    // Unigram-LM cross-entropy (KenLM/CCNet-style quality signal): the
    // corpus trains its own unigram distribution, each doc is scored
    // -mean(ln p(tok)) under it.
    Q("q_unigram_xent",
      (s, d) => graft.text.UnigramLm.crossEntropy(
        Tables.df(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
      Some(graft.text.UnigramLm.crossEntropyDuckSql("documents", "doc_id", "text")
        + "\nORDER BY doc_id")),

    // Hashed-bigram interpolated LM cross-entropy — the next rung on
    // the CCNet perplexity ladder: hashing bounds the model to B^2
    // keys by construction (the DSIR trick), scoring is one keyed
    // join of the bigram stream against the composed model table.
    Q("q_bigram_xent",
      (s, d) => graft.text.BigramLm.crossEntropy(
        Tables.df(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
      Some(graft.text.BigramLm.crossEntropyDuckSql("documents", "doc_id", "text"))),

    // Gopher-style repetition gates — the whole operator is MAP-ONLY
    // (per-row HOF expressions, zero shuffle); the oracle recomputes the
    // stats via unnest + GROUP BY, a deliberately different formulation.
    Q("q_repetition",
      (s, d) => {
        // statsNative4, NOT round(statsNative, 4): the 4dp rounding
        // happens in exact integer arithmetic inside the kernel so
        // decimal-boundary ratios agree with the oracle's mirrored
        // integer formula (see Repetition.statsNative4)
        val st = graft.text.Repetition.statsNative4(col("text"))
        Tables.df(s, d, "documents").select(
          col("doc_id"),
          element_at(st, 1).as("dup_token_frac"),
          element_at(st, 2).as("dup_2gram_frac"),
          element_at(st, 3).as("dup_3gram_frac"),
          element_at(st, 4).as("top_2gram_frac"))
          .orderBy("doc_id")
      },
      Some(graft.text.Repetition.statsDuckSql("documents") + "\nORDER BY doc_id")),

    // PII redaction (training-data privacy pass): both engines build
    // the SAME deterministic PII-bearing suffix from doc_id, so the
    // oracle checks real positives (email + IP + phone per row) AND
    // pass-through of ordinary text, not just a no-op scrub.
    Q("q_redact_pii",
      (s, d) => {
        val pii = concat(col("text"),
          lit(" contact u"), col("doc_id"), lit("@mail.example.com at 10.0."),
          col("doc_id") % 256, lit(".7 or 555-867-5309"))
        Tables.df(s, d, "documents").select(
          col("doc_id"),
          TextFunctions.redactPii(pii).as("redacted"),
          size(regexp_extract_all(pii, lit(TextFunctions.emailRe), lit(0))).as("n_emails"),
          size(regexp_extract_all(pii, lit(TextFunctions.ipRe), lit(0))).as("n_ips"),
          size(regexp_extract_all(pii, lit(TextFunctions.phoneRe), lit(0))).as("n_phones"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id,
              |  regexp_replace(regexp_replace(regexp_replace(pii,
              |    '${TextFunctions.emailRe}', '[EMAIL]', 'g'),
              |    '${TextFunctions.ipRe}', '[IP]', 'g'),
              |    '${TextFunctions.phoneRe}', '[PHONE]', 'g') AS redacted,
              |  len(regexp_extract_all(pii, '${TextFunctions.emailRe}')) AS n_emails,
              |  len(regexp_extract_all(pii, '${TextFunctions.ipRe}')) AS n_ips,
              |  len(regexp_extract_all(pii, '${TextFunctions.phoneRe}')) AS n_phones
              |FROM (SELECT doc_id,
              |        text || ' contact u' || doc_id || '@mail.example.com at 10.0.' ||
              |        (doc_id % 256) || '.7 or 555-867-5309' AS pii
              |      FROM documents) t
              |ORDER BY doc_id""".stripMargin)),

    Q("q_lang_id",
      (s, d) => Tables.df(s, d, "documents").select(
        col("doc_id"),
        col("lang"),
        LangId.predict(TextFunctions.tokens(col("text"))).as("lang_pred"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, lang, ${LangId.predictDuckSql("toks")} AS lang_pred
              |FROM (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents) t
              |ORDER BY doc_id""".stripMargin)),

    // Language-ID confusion matrix: declared lang × heuristic
    // prediction — the classifier-quality report per language (which
    // languages confuse, how much mislabeled data a lang filter would
    // pass). Map-only predict + one bounded-key (lang domain squared)
    // aggregate.
    Q("q_lang_confusion",
      (s, d) => Tables.df(s, d, "documents").select(
        col("lang"),
        LangId.predict(TextFunctions.tokens(col("text"))).as("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "lang_pred"),
      Some(s"""SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n
              |FROM (SELECT lang, ${LangId.predictDuckSql("toks")} AS lang_pred
              |      FROM (SELECT lang, string_split(text, ' ') AS toks FROM documents) t) p
              |GROUP BY lang, lang_pred
              |ORDER BY lang, lang_pred""".stripMargin)),

    // Multinomial Naive Bayes fit + argmax scoring entirely in-plan
    // (the sklearn-engine analog): every 10th doc is the probe split,
    // the rest train a lang classifier on whitespace tokens.
    Q("q_nb_classify",
      (s, d) => graft.ops.NaiveBayes.classify(Tables.df(s, d, "documents"),
        "doc_id", "text", "lang",
        probePred = col("doc_id") % 10 === 0),
      Some(graft.ops.NaiveBayes.classifyDuckSql("documents",
        "doc_id", "text", "lang", probePredSql = "doc_id % 10 = 0"))),

    // Logistic-regression quality classifier trained IN-PLAN: each GD
    // step is one partial-avg aggregation (4 doubles to the driver),
    // scoring is a map-only literal-weight projection — the trainable
    // tier of the quality surface. Oracle unrolls the identical loop.
    Q("q_lr_classify",
      (s, d) => graft.ops.LogReg.classify(Tables.df(s, d, "documents"),
        "doc_id", "text", label = col("lang") === "en"),
      Some(graft.ops.LogReg.classifyDuckSql("documents",
        "doc_id", "text", labelSql = "lang = 'en'"))),

    // Calibration curve of the trained LR gate: predicted-probability
    // deciles vs observed positive rate — a well-calibrated classifier
    // tracks the diagonal; systematic over/under-confidence means the
    // probabilities can't be thresholded as-is. One bounded-key (10
    // buckets) aggregate over the q_lr_classify plan.
    Q("q_lr_calibration",
      (s, d) => {
        val preds = graft.ops.LogReg.classify(Tables.df(s, d, "documents"),
          "doc_id", "text", label = col("lang") === "en")
        preds.groupBy(least(floor(col("prob") * 10), lit(9L)).cast("int").as("bucket"))
          .agg(count(lit(1)).as("n"),
            round(avg(col("prob")), 4).as("mean_prob"),
            // y is 0/1 — pos_rate is an integer ratio, rounded
            // integer-exact (PortableRound); mean_prob stays float
            // round (probs are full-entropy doubles, boundary measure
            // ~zero)
            graft.ops.PortableRound.intRound4(
              sum(col("y").cast("long")), count(lit(1))).as("pos_rate"))
          .orderBy("bucket")
      },
      Some(s"""WITH preds AS (
              |${graft.ops.LogReg.classifyDuckSql("documents", "doc_id", "text",
                  labelSql = "lang = 'en'")})
              |SELECT CAST(least(floor(prob * 10), 9) AS INT) AS bucket,
              |  CAST(count(*) AS BIGINT) AS n,
              |  round(avg(prob), 4) AS mean_prob,
              |  ${graft.ops.PortableRound.intRound4Duck(
                   "CAST(sum(y) AS BIGINT)", "count(*)")} AS pos_rate
              |FROM preds
              |GROUP BY bucket
              |ORDER BY bucket""".stripMargin)),

    // Classifier quality roll-up over the trained LR gate: confusion
    // counts + accuracy/precision/recall/F1 at the 0.5 threshold —
    // the eval row a pipeline checks before trusting a learned filter.
    // One extra global aggregate over the q_lr_classify plan (ratios
    // derive from exact integer counts, so engines agree bit-for-bit);
    // degenerate classifiers (no predicted/true positives) yield NULL
    // ratios, not divide errors.
    Q("q_classifier_metrics",
      (s, d) => {
        val preds = graft.ops.LogReg.classify(Tables.df(s, d, "documents"),
          "doc_id", "text", label = col("lang") === "en")
        val isPos = col("prob") >= 0.5
        preds.agg(
          count(lit(1)).as("n"),
          sum(when(col("y") === 1.0 && isPos, 1L).otherwise(0L)).as("tp"),
          sum(when(col("y") === 0.0 && isPos, 1L).otherwise(0L)).as("fp"),
          sum(when(col("y") === 1.0 && !isPos, 1L).otherwise(0L)).as("fn"))
          .select(col("n"), col("tp"), col("fp"), col("fn"),
            // confusion-count ratios in integer-exact 4dp
            // (PortableRound); zero denominators stay NULL
            graft.ops.PortableRound.intRound4(
              col("n") - col("fp") - col("fn"), col("n")).as("accuracy"),
            when(col("tp") + col("fp") > 0, graft.ops.PortableRound.intRound4(
              col("tp"), col("tp") + col("fp"))).as("prec"),
            when(col("tp") + col("fn") > 0, graft.ops.PortableRound.intRound4(
              col("tp"), col("tp") + col("fn"))).as("recall"),
            when(lit(2) * col("tp") + col("fp") + col("fn") > 0,
              graft.ops.PortableRound.intRound4(lit(2) * col("tp"),
                lit(2) * col("tp") + col("fp") + col("fn"))).as("f1"))
      },
      Some(s"""WITH preds AS (
              |${graft.ops.LogReg.classifyDuckSql("documents", "doc_id", "text",
                  labelSql = "lang = 'en'")}),
              |c AS (
              |  SELECT CAST(count(*) AS BIGINT) AS n,
              |    CAST(sum(CASE WHEN y = 1 AND prob >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
              |    CAST(sum(CASE WHEN y = 0 AND prob >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
              |    CAST(sum(CASE WHEN y = 1 AND prob < 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS fn
              |  FROM preds)
              |SELECT n, tp, fp, fn,
              |  ${graft.ops.PortableRound.intRound4Duck("n - fp - fn", "n")} AS accuracy,
              |  CASE WHEN tp + fp > 0 THEN ${graft.ops.PortableRound.intRound4Duck("tp", "tp + fp")} END AS prec,
              |  CASE WHEN tp + fn > 0 THEN ${graft.ops.PortableRound.intRound4Duck("tp", "tp + fn")} END AS recall,
              |  CASE WHEN 2 * tp + fp + fn > 0
              |    THEN ${graft.ops.PortableRound.intRound4Duck("2 * tp", "2 * tp + fp + fn")} END AS f1
              |FROM c""".stripMargin)),

    // Lexical diversity per document — type-token ratio + Simpson
    // repeat probability Σc(c−1)/(n(n−1)): the "stuck-in-a-loop"
    // generation signal next to q_repetition's n-gram view (TTR
    // penalizes small vocabularies, Simpson penalizes skew toward a
    // few tokens). Exact integer arithmetic end-to-end
    // (PortableRound); one explode + two-level aggregation, the
    // q_vocab_stats shuffle shape — token-linear, no per-doc
    // quadratic work.
    Q("q_lexical_diversity",
      (s, d) => graft.text.Lexical.lexicalDiversity(
        Tables.df(s, d, "documents"), "doc_id", "text"),
      Some(s"""WITH tf AS (
              |  SELECT doc_id, tok, count(*) AS c
              |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              |        FROM documents)
              |  GROUP BY doc_id, tok),
              |agg AS (
              |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
              |    count(*) AS n_distinct,
              |    CAST(sum(c * (c - 1)) AS BIGINT) AS rep
              |  FROM tf GROUP BY doc_id)
              |SELECT doc_id, n_tokens, n_distinct,
              |  ${graft.ops.PortableRound.intRound4Duck("n_distinct", "n_tokens")} AS ttr,
              |  ${graft.ops.PortableRound.intRound4Duck("rep", "n_tokens * (n_tokens - 1)")} AS simpson
              |FROM agg WHERE n_tokens >= 2
              |ORDER BY doc_id""".stripMargin))
  )
}
