package graft.ops

import graft.text.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes over whitespace tokens, fit and applied as
  * pure DataFrame aggregations — the Spark-first analog of the
  * reference's sklearn inference engine for its most common text-
  * classification use (reference: src/linkml_store/inference/
  * implementations/sklearn_inference_engine.py; the reference fits an
  * sklearn estimator driver-side, graft fits with distributed partial
  * aggregations and never collects a feature matrix).
  *
  * Model (all derived in-plan, no driver state):
  *   prior(c)      = ln(docs_c / docs_total)
  *   logp(t | c)   = ln((cnt_{t,c} + 1) / (ct_c + V))   (Laplace)
  *   score(d, c)   = prior(c) + Σ_{tok ∈ d} logp(tok | c)
  * where an out-of-vocabulary token — or an in-vocabulary token the
  * class never saw — contributes the SAME smoothed ln(1/(ct_c + V)),
  * so the per-class default folds into one arithmetic term and the
  * probe side only joins tokens the class HAS seen:
  *   score = prior + Σ_matched lp + (n_tok - n_matched) · ln(1/(ct_c+V))
  *
  * Scale shape: the (token, class) model is a keyed aggregate that
  * joins the probe tokens BY KEY (AQE broadcasts it when small, keyed
  * shuffle when vocab-sized — never an unbounded driver collect);
  * classes/vocab/doc totals are 1-row-or-#classes broadcasts; argmax
  * is a per-doc window over #classes rows.
  */
object NaiveBayes {

  /** Rows NOT matching `probePred` (NULL → train, like classifyKnn)
    * with a non-null label train the model; matching rows are scored.
    * Output: (idCol, pred, score) — top class per probe doc, ties
    * broken by class name ascending.
    */
  def classify(
      df: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      probePred: Column,
      scope: graft.api.CacheScope = graft.api.CacheScope.global): DataFrame = {
    val isProbe = coalesce(probePred, lit(false))
    val train = df.filter(!isProbe).filter(col(labelCol).isNotNull)
    val probe = df.filter(isProbe)

    val trainTok = train.select(col(labelCol).as("cls"),
      explode(TextFunctions.tokens(col(textCol))).as("tok"))
    // persisted: the (token, class) counts feed class totals, vocab
    // size AND the probe join — one aggregation, three consumers
    val tokCls = scope.persist(
      trainTok.groupBy("tok", "cls").agg(count(lit(1)).as("cnt")))
    // clsTot/vocab are class-count-sized aggregates each consumed by
    // two branches (classes + logp) — pinned so the second reference
    // reads the tiny cache instead of re-aggregating tokCls
    val clsTot = scope.persist(tokCls.groupBy("cls").agg(sum("cnt").as("ct")))
    val vocab = scope.persist(tokCls.agg(count_distinct(col("tok")).as("v")))
    val classDocs = train.groupBy(col(labelCol).as("cls")).agg(count(lit(1)).as("docs"))
    val totDocs = train.agg(count(lit(1)).as("n"))

    // #classes rows: prior + smoothing denominator per class. LEFT
    // join + coalesce: a class whose docs carry no tokens (all-null
    // text) still exists with ct=0 — an inner join would silently
    // drop it from the model while its docs inflate every prior
    val classes = classDocs.join(clsTot, Seq("cls"), "left")
      .crossJoin(broadcast(vocab)).crossJoin(broadcast(totDocs))
      .select(col("cls"), (log(col("docs")) - log(col("n"))).as("prior"),
        coalesce(col("ct"), lit(0L)).as("ct"), col("v"))
    // seen-token log-probabilities, keyed by token
    val logp = tokCls.join(clsTot, "cls").crossJoin(broadcast(vocab))
      .select(col("tok"), col("cls"),
        (log(col("cnt") + lit(1.0)) - log(col("ct") + col("v"))).as("lp"))

    val probeTok = probe.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("tok"))
    // count = #spaces + 1 without materializing the array (equals
    // size(tokens(text)) for non-null text, null for null)
    val nTok = probe.select(col(idCol),
      TextFunctions.wsTokenCount(col(textCol)).as("n_tok"))

    val matched = probeTok.join(logp, "tok")
      .groupBy(col(idCol), col("cls"))
      .agg(sum("lp").as("s_lp"), count(lit(1)).as("n_match"))

    val scored = nTok.crossJoin(broadcast(classes))
      .join(matched, Seq(idCol, "cls"), "left")
      .select(col(idCol), col("cls"),
        (col("prior") + coalesce(col("s_lp"), lit(0.0)) +
          (col("n_tok") - coalesce(col("n_match"), lit(0L))) *
            (lit(0.0) - log(col("ct") + col("v")))).as("score"))

    val w = Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("cls").asc)
    scored.withColumn("__r", row_number().over(w)).filter(col("__r") === 1)
      .select(col(idCol), col("cls").as("pred"), round(col("score"), 4).as("score"))
      .orderBy(idCol)
  }

  /** DuckDB twin of [[classify]] (`probePredSql` mirrors probePred). */
  def classifyDuckSql(
      table: String,
      idCol: String,
      textCol: String,
      labelCol: String,
      probePredSql: String): String =
    s"""WITH base AS (
       |  SELECT $idCol, $textCol AS text, $labelCol AS lbl,
       |         coalesce(($probePredSql), false) AS is_probe
       |  FROM $table),
       |train AS (SELECT * FROM base WHERE NOT is_probe AND lbl IS NOT NULL),
       |probe AS (SELECT * FROM base WHERE is_probe),
       |ttok AS (SELECT lbl AS cls, unnest(str_split(text, ' ')) AS tok FROM train),
       |tokcls AS (SELECT tok, cls, count(*) AS cnt FROM ttok GROUP BY tok, cls),
       |clstot AS (SELECT cls, sum(cnt) AS ct FROM tokcls GROUP BY cls),
       |vocab AS (SELECT count(DISTINCT tok) AS v FROM tokcls),
       |classdocs AS (SELECT lbl AS cls, count(*) AS docs FROM train GROUP BY lbl),
       |tot AS (SELECT count(*) AS n FROM train),
       |classes AS (
       |  SELECT cls, ln(docs) - ln(n) AS prior, coalesce(ct, 0) AS ct, v
       |  FROM classdocs LEFT JOIN clstot USING (cls) CROSS JOIN vocab CROSS JOIN tot),
       |logp AS (
       |  SELECT tok, cls, ln(cnt + 1.0) - ln(ct + v) AS lp
       |  FROM tokcls JOIN clstot USING (cls) CROSS JOIN vocab),
       |ptok AS (SELECT $idCol, unnest(str_split(text, ' ')) AS tok FROM probe),
       |ntok AS (SELECT $idCol, len(str_split(text, ' ')) AS n_tok FROM probe),
       |matched AS (
       |  SELECT $idCol, cls, sum(lp) AS s_lp, count(*) AS n_match
       |  FROM ptok JOIN logp USING (tok) GROUP BY $idCol, cls),
       |scored AS (
       |  SELECT ntok.$idCol AS $idCol, classes.cls AS cls,
       |         prior + coalesce(s_lp, 0)
       |           + (n_tok - coalesce(n_match, 0)) * (0 - ln(ct + v)) AS score
       |  FROM ntok CROSS JOIN classes
       |  LEFT JOIN matched ON matched.$idCol = ntok.$idCol AND matched.cls = classes.cls),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY $idCol ORDER BY score DESC, cls ASC) AS r
       |  FROM scored)
       |SELECT $idCol, cls AS pred, round(score, 4) AS score
       |FROM ranked WHERE r = 1 ORDER BY $idCol""".stripMargin
}
