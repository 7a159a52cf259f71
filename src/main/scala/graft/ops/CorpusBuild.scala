package graft.ops

import graft.text.{QualityFilter, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The composed "corpus build" pass a pretraining pipeline actually
  * runs — quality gate → exact dedup (keep-first) → benchmark
  * decontamination → per-source token budget — as ONE declarative
  * plan built from the engine's own operators. The point of the
  * composition (and of `q_pipeline_e2e` checking it end-to-end against
  * a DuckDB CTE chain) is that the stages FUSE: the gate predicate and
  * the fingerprint are computed in the same scan, Catalyst prunes
  * `text` out of every post-tokenization stage, and nothing
  * materializes between stages.
  *
  * Stage scale shapes (each argued at its own operator):
  *   gate       — map-only native-stats predicate
  *   dedup      — one keyed agg on the content fingerprint + keep-first
  *                semi-join (no window over an unbounded key domain)
  *   decontam   — eval grams broadcast ([[Corpus.decontaminate]];
  *                swap in [[Corpus.decontaminateBloom]] when the eval
  *                suite outgrows a broadcast)
  *   budget     — distributed per-(source, hex-bucket) prefix sum
  *                ([[TrainStream.tokenBudget]], no per-source window)
  */
object CorpusBuild {

  /** (idCol, srcCol, n_toks, cum_before): the selected training subset.
    * `evalPred` rows are the held-out benchmark — never emitted, and
    * any train doc sharing a `w`-gram with them is dropped.
    */
  def trainingSubset(df: DataFrame, idCol: String, srcCol: String, textCol: String,
      evalPred: Column, w: Int, budgetPerSource: Long, salt: String = "",
      t: QualityFilter.Thresholds = QualityFilter.Thresholds(),
      scope: graft.api.CacheScope = graft.api.CacheScope.global): DataFrame = {
    val isEval = coalesce(evalPred, lit(false))
    val gated = df.filter(!isEval && QualityFilter.passes(col(textCol), t))
    // exact dedup, keep the lowest id per content fingerprint: keyed
    // agg + join back (both sides shuffle on __fp once; AQE broadcasts
    // the firsts side when it is small)
    val withFp = gated.withColumn("__fp", TextFunctions.tokenSetFingerprint(col(textCol)))
    val firsts = withFp.groupBy("__fp").agg(min(col(idCol)).as("__first"))
    // persisted: the decontamination branch (gram explode) and the
    // survivor anti-join both consume `deduped` — without the cache
    // the gate + fingerprint shuffle runs twice over the corpus. The
    // cache holds the GATED, DEDUPED subset (a strict shrink of the
    // input), spillable MEMORY_AND_DISK via CacheScope.
    val deduped = scope.persist(withFp.join(firsts, "__fp")
      .filter(col(idCol) === col("__first"))
      .drop("__fp", "__first"))
    // decontaminate the deduped survivors against the ORIGINAL eval
    // slice (benchmarks are not quality-gated or deduped)
    val contaminated = Corpus.decontaminate(
        deduped.unionByName(df.filter(isEval), allowMissingColumns = false),
        idCol, textCol, evalPred, w)
      .select(idCol)
    val clean = deduped.join(contaminated, Seq(idCol), "left_anti")
    TrainStream.tokenBudget(clean, idCol, srcCol, textCol, budgetPerSource, salt, scope)
  }

  /** DuckDB twin of [[trainingSubset]] — the same four stages as a CTE
    * chain over each operator's own oracle formulation. `evalPredSql`
    * may reference `idCol`/`srcCol`/`textCol` (the columns every CTE
    * stage carries); the Spark twin accepts any column of `df`.
    */
  def trainingSubsetDuckSql(table: String, idCol: String, srcCol: String,
      textCol: String, evalPredSql: String, w: Int, budgetPerSource: Long,
      salt: String = "",
      t: QualityFilter.Thresholds = QualityFilter.Thresholds()): String = {
    // inlined [[Corpus.decontaminateDuckSql]] stages (g0/g/ev/tr) over
    // the `u` union, re-shaped as a named CTE so the chain continues
    val decontam =
      s"""g0 AS (
         |  SELECT $idCol, ($evalPredSql) AS is_eval,
         |         unnest(${graft.text.Repetition.ngramsDuck(textCol, w)}) AS gram
         |  FROM u),
         |g AS (
         |  SELECT $idCol, coalesce(is_eval, false) AS is_eval,
         |         CAST(concat('0x', substr(md5(gram), 1, 15)) AS BIGINT) AS gh
         |  FROM g0),
         |ev AS (SELECT DISTINCT gh FROM g WHERE is_eval),
         |tr AS (SELECT DISTINCT $idCol, gh FROM g WHERE NOT is_eval),
         |contam AS (
         |  SELECT $idCol FROM tr JOIN ev USING (gh) GROUP BY $idCol)""".stripMargin
    s"""WITH gated AS (
       |  SELECT $idCol, $srcCol, $textCol FROM (
       |    SELECT *, string_split($textCol, ' ') AS toks FROM $table
       |    WHERE NOT coalesce($evalPredSql, false)) g
       |  WHERE ${QualityFilter.passesDuckPred(textCol, t)}),
       |fps AS (
       |  SELECT $idCol, $srcCol, $textCol,
       |         ${TextFunctions.tokenSetFingerprintDuck(textCol)} AS fp
       |  FROM gated),
       |firsts AS (SELECT fp, min($idCol) AS first_id FROM fps GROUP BY fp),
       |dedup AS (
       |  SELECT f.$idCol, f.$srcCol, f.$textCol
       |  FROM fps f JOIN firsts fi ON f.fp = fi.fp AND f.$idCol = fi.first_id),
       |u AS (
       |  SELECT $idCol, $srcCol, $textCol FROM dedup
       |  UNION ALL
       |  SELECT $idCol, $srcCol, $textCol FROM $table WHERE coalesce($evalPredSql, false)),
       |$decontam,
       |clean AS (
       |  SELECT * FROM dedup
       |  WHERE $idCol NOT IN (SELECT $idCol FROM contam))
       |${TrainStream.tokenBudgetDuckSql("clean", idCol, srcCol, textCol, budgetPerSource, salt)}""".stripMargin
  }
}
