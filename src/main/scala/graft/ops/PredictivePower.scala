package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-feature cross-validated predictive power (reference:
  * utils/stats_utils.py:5-53 — `predictive_power` /
  * `analyze_predictive_power`: per target column, a sklearn
  * DecisionTreeClassifier's k-fold cross-validated accuracy).
  *
  * Spark-first twin: the per-feature classifier is the MAJORITY-CLASS
  * STUMP — predict the training majority class of the feature's value,
  * which is exactly a decision tree fully split on one categorical
  * feature — and CV folds come from the deterministic hash assignment
  * ([[Sampling.foldAssign]]). That turns the whole report into grouped
  * integer counting: no RNG, no driver-side model, and every count
  * (and therefore every accuracy) replays bit-for-bit in any engine,
  * where sklearn's tree internals could not be oracle-checked.
  *
  * Scale shape: one pass builds a (feature, value, class, fold) count
  * table bounded by the declared feature domains; per-fold TRAINING
  * counts derive from it by subtraction (total minus the held-out
  * fold) — the corpus is never re-scanned per fold. Majority tables
  * are fold×domain-bounded, so the prediction pass is one keyed join
  * of the exploded corpus frame against them (AQE broadcasts). The
  * k per-fold accuracies pivot into literal-order columns so the
  * k-term mean has a FIXED addition order in both engines.
  */
object PredictivePower {

  /** (feature, n_eval, n_correct, power): per candidate feature, the
    * unweighted mean of the k held-out-fold accuracies of its
    * majority-class stump (each accuracy pre-rounded to 4dp; exact
    * integer confusion counts alongside). Unseen-in-training feature
    * values fall back to the fold's global majority class; ties break
    * to the lexicographically smallest class in both engines.
    */
  def cvAccuracy(df: DataFrame, keyCol: String, targetCol: String,
      features: Seq[(String, Column)], k: Int = 3,
      salt: String = ""): DataFrame = {
    require(k >= 2, s"need >= 2 folds, got $k")
    require(features.nonEmpty, "no feature columns")
    val featStructs = features.map { case (n, c) =>
      struct(lit(n).as("feature"), c.cast("string").as("v"))
    }
    // feats is read three times (count table, class table, prediction
    // pass) and cnts twice, but NEITHER is pinned — measured round 14:
    // feats pin 2.6 -> 3.1-3.3 s at sf1 at either storage level (the
    // corpus-sized cache build outweighs three map-only explode
    // rescans — the KMeans.fit finding), and even the bounded cnts pin
    // alone cost ~0.2 s (its materialization job serializes ahead of a
    // plan that otherwise overlaps those stages). Do not retry at
    // bench scale.
    val feats = df.select(
        col(targetCol).cast("string").as("y"),
        Sampling.foldAssign(col(keyCol), k, salt).as("fold"),
        explode(array(featStructs: _*)).as("f"))
      .select(col("y"), col("fold"),
        col("f.feature").as("feature"), col("f.v").as("v"))
    // (feature, v, y, fold) counts — bounded by the feature domains
    val cnts = feats.groupBy("feature", "v", "y", "fold")
      .agg(count(lit(1)).as("c"))
    val tot = cnts.groupBy("feature", "v", "y").agg(sum("c").as("ct"))
    // train counts for held-out fold f = total − fold f's count; the
    // fold axis materializes as a k-element sequence explode (map-side,
    // no join against a fold table)
    val trainVY = tot
      .withColumn("test_fold", explode(sequence(lit(0L), lit(k - 1L))))
      .join(cnts.select(col("feature"), col("v"), col("y"),
          col("fold").as("test_fold"), col("c")),
        Seq("feature", "v", "y", "test_fold"), "left")
      .select(col("feature"), col("test_fold"), col("v"), col("y"),
        (col("ct") - coalesce(col("c"), lit(0L))).as("tc"))
    val wMaj = Window.partitionBy("feature", "test_fold", "v")
      .orderBy(col("tc").desc, col("y").asc)
    val maj = trainVY.filter(col("tc") > 0)
      .withColumn("rk", row_number().over(wMaj)).filter(col("rk") === 1)
      .select(col("feature"), col("test_fold").as("fold"), col("v"),
        col("y").as("pred_v"))
    // per-(feature, fold) global majority — the unseen-value fallback.
    // Class counts are feature-independent, but keying by feature keeps
    // the joins uniform; the table is F×k×|classes| rows.
    val cls = feats.groupBy("feature", "y", "fold").agg(count(lit(1)).as("c"))
    val clsTot = cls.groupBy("feature", "y").agg(sum("c").as("ct"))
    val wG = Window.partitionBy("feature", "test_fold")
      .orderBy(col("tc").desc, col("y").asc)
    val gmaj = clsTot
      .withColumn("test_fold", explode(sequence(lit(0L), lit(k - 1L))))
      .join(cls.select(col("feature"), col("y"),
          col("fold").as("test_fold"), col("c")),
        Seq("feature", "y", "test_fold"), "left")
      .select(col("feature"), col("test_fold"), col("y"),
        (col("ct") - coalesce(col("c"), lit(0L))).as("tc"))
      .filter(col("tc") > 0)
      .withColumn("rk", row_number().over(wG)).filter(col("rk") === 1)
      .select(col("feature"), col("test_fold").as("fold"),
        col("y").as("pred_g"))
    // each row is a test row of its own fold: score against the
    // majority trained on the OTHER folds
    val pred = feats
      .join(maj, Seq("feature", "fold", "v"), "left")
      .join(gmaj, Seq("feature", "fold"), "left")
      .select(col("feature"), col("fold"), col("y"),
        coalesce(col("pred_v"), col("pred_g")).as("pred"))
    val perFold = pred.groupBy("feature", "fold")
      .agg(count(lit(1)).as("n"),
        sum(when(col("pred") === col("y"), 1L).otherwise(0L)).as("corr"))
      .withColumn("acc",
        round(col("corr").cast("double") / col("n").cast("double"), 4))
    val accCols = (0 until k).map(i =>
      max(when(col("fold") === i, col("acc"))).as(s"__acc$i"))
    val aggs = Seq(sum("n").as("n_eval"), sum("corr").as("n_correct")) ++ accCols
    val power = round(
      (0 until k).map(i => col(s"__acc$i")).reduce(_ + _) / lit(k.toDouble), 4)
    perFold.groupBy("feature").agg(aggs.head, aggs.tail: _*)
      .select(col("feature"), col("n_eval").cast("long").as("n_eval"),
        col("n_correct").cast("long").as("n_correct"), power.as("power"))
      .orderBy("feature")
  }

  /** DuckDB twin of [[cvAccuracy]]: identical fold hash, counting,
    * tie-breaks, and fixed-order mean. `features` are (name, SQL expr)
    * pairs; `keySql`/`targetSql` are raw column expressions.
    */
  def cvAccuracyDuckSql(table: String, keySql: String, targetSql: String,
      features: Seq[(String, String)], k: Int = 3,
      salt: String = ""): String = {
    require(k >= 2 && features.nonEmpty)
    val vCols = features.zipWithIndex.map { case ((_, e), i) =>
      s"CAST($e AS VARCHAR) AS v$i" }.mkString(",\n         ")
    val featArms = features.zipWithIndex.map { case ((n, _), i) =>
      val esc = n.replace("'", "''")
      s"SELECT y, fold, '$esc' AS feature, v$i AS v FROM base"
    }.mkString("\n  UNION ALL ")
    val accPivot = (0 until k).map(i =>
      s"max(CASE WHEN fold = $i THEN acc END)").mkString(" + ")
    s"""WITH base AS (
       |  SELECT CAST($targetSql AS VARCHAR) AS y,
       |         CAST(${Sampling.foldAssignDuckSql(keySql, k, salt)} AS BIGINT) AS fold,
       |         $vCols
       |  FROM $table),
       |feats AS (
       |  $featArms),
       |cnts AS (SELECT feature, v, y, fold, count(*) AS c
       |         FROM feats GROUP BY feature, v, y, fold),
       |tot AS (SELECT feature, v, y, sum(c) AS ct FROM cnts GROUP BY feature, v, y),
       |folds AS (SELECT CAST(range AS BIGINT) AS test_fold FROM range($k)),
       |trainvy AS (
       |  SELECT t.feature, f.test_fold, t.v, t.y, t.ct - coalesce(c.c, 0) AS tc
       |  FROM tot t CROSS JOIN folds f
       |  LEFT JOIN cnts c ON c.feature = t.feature AND c.v = t.v
       |    AND c.y = t.y AND c.fold = f.test_fold),
       |maj AS (
       |  SELECT feature, test_fold, v, y AS pred_v FROM (
       |    SELECT feature, test_fold, v, y,
       |      row_number() OVER (PARTITION BY feature, test_fold, v
       |                         ORDER BY tc DESC, y ASC) AS rk
       |    FROM trainvy WHERE tc > 0) r WHERE rk = 1),
       |cls AS (SELECT feature, y, fold, count(*) AS c
       |        FROM feats GROUP BY feature, y, fold),
       |clstot AS (SELECT feature, y, sum(c) AS ct FROM cls GROUP BY feature, y),
       |traincls AS (
       |  SELECT t.feature, f.test_fold, t.y, t.ct - coalesce(c.c, 0) AS tc
       |  FROM clstot t CROSS JOIN folds f
       |  LEFT JOIN cls c ON c.feature = t.feature AND c.y = t.y
       |    AND c.fold = f.test_fold),
       |gmaj AS (
       |  SELECT feature, test_fold, y AS pred_g FROM (
       |    SELECT feature, test_fold, y,
       |      row_number() OVER (PARTITION BY feature, test_fold
       |                         ORDER BY tc DESC, y ASC) AS rk
       |    FROM traincls WHERE tc > 0) r WHERE rk = 1),
       |pred AS (
       |  SELECT fe.feature, fe.fold, fe.y, coalesce(m.pred_v, g.pred_g) AS pred
       |  FROM feats fe
       |  LEFT JOIN maj m ON m.feature = fe.feature AND m.test_fold = fe.fold
       |    AND m.v = fe.v
       |  LEFT JOIN gmaj g ON g.feature = fe.feature AND g.test_fold = fe.fold),
       |perfold AS (
       |  SELECT feature, fold, count(*) AS n,
       |    sum(CASE WHEN pred = y THEN 1 ELSE 0 END) AS corr
       |  FROM pred GROUP BY feature, fold),
       |acc AS (
       |  SELECT feature, fold, n, corr,
       |    round(CAST(corr AS DOUBLE) / CAST(n AS DOUBLE), 4) AS acc
       |  FROM perfold)
       |SELECT feature, CAST(sum(n) AS BIGINT) AS n_eval,
       |  CAST(sum(corr) AS BIGINT) AS n_correct,
       |  round(($accPivot) / $k.0, 4) AS power
       |FROM acc GROUP BY feature
       |ORDER BY feature""".stripMargin
  }
}
