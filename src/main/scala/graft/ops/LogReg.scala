package graft.ops

import graft.text.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-plan logistic-regression text classifier — the trainable tier of
  * the quality-scoring surface (reference's sklearn inference engine
  * re-expressed Spark-first, like `q_knn_classify` / `q_nb_classify`).
  *
  * Features are cheap per-row text statistics (token count, stopword
  * ratio, mean token length — the same signals as `q_text_quality`),
  * so featurization is map-only. Training is full-batch gradient
  * descent where EACH STEP IS ONE AGGREGATION JOB: the per-feature
  * gradient means reduce map-side (partial avg) and only d+1 doubles
  * reach the driver per step — the Lloyd's-iteration state pattern
  * ([[graft.ann.KMeans]]), so the corpus is scanned `iters` times and
  * nothing corpus-sized ever shuffles or collects. Scoring inlines the
  * trained weights as literals: a map-only codegen projection, the
  * shape a 100 TB quality-filter pass needs.
  *
  * The DuckDB oracle unrolls the identical loop (same features, same
  * sigmoid, same averaged gradients, same step size) as one CTE pair
  * per iteration; probabilities are rounded to 4dp on both sides.
  */
object LogReg {

  /** Feature columns [x1, x2, x3] for `textCol` (bias is implicit). */
  private def feats(text: Column): Seq[Column] = {
    val toks = split(text, " ")
    Seq(
      (size(toks).cast("double") / 50.0).as("x1"),
      TextFunctions.stopwordRatio(toks).as("x2"),
      (TextFunctions.meanTokenLen(toks) / 5.0).as("x3"))
  }

  private def featsDuck(textSql: String): Seq[String] = Seq(
    s"len(string_split($textSql, ' ')) / 50.0",
    TextFunctions.stopwordRatioDuck(s"string_split($textSql, ' ')"),
    s"(CASE WHEN len(string_split($textSql, ' ')) = 0 THEN 0 ELSE list_sum(list_transform(string_split($textSql, ' '), x -> length(x))) / CAST(len(string_split($textSql, ' ')) AS DOUBLE) END) / 5.0")

  private def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  /** Full-batch GD fit; returns [bias, w1, w2, w3]. */
  def fit(df: DataFrame, textCol: String, label: Column,
          iters: Int, lr: Double): Array[Double] = {
    val f = df.select((label.cast("double").as("y") +: feats(col(textCol))): _*)
    val w = Array.fill(4)(0.0)
    for (_ <- 1 to iters) {
      val z = lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2") + lit(w(3)) * col("x3")
      val err = col("y") - sigmoid(z)
      val g = f.agg(
        avg(err).as("gb"), avg(err * col("x1")).as("g1"),
        avg(err * col("x2")).as("g2"), avg(err * col("x3")).as("g3"))
        .collect()(0)
      for (j <- 0 until 4) w(j) += lr * g.getDouble(j)
    }
    w
  }

  /** Train on the corpus, then score every row map-side with the
    * trained weights as literals. Returns (idCol, y, prob).
    */
  def classify(df: DataFrame, idCol: String, textCol: String, label: Column,
               iters: Int = 3, lr: Double = 1.0): DataFrame = {
    val w = fit(df, textCol, label, iters, lr)
    val f = df.select((col(idCol) +: label.cast("double").as("y") +: feats(col(textCol))): _*)
    val z = lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2") + lit(w(3)) * col("x3")
    f.select(col(idCol), col("y"), round(sigmoid(z), 4).as("prob"))
      .orderBy(idCol)
  }

  /** DuckDB twin of [[classify]]: the training loop unrolled as one
    * (gradient, weights) CTE pair per iteration.
    */
  def classifyDuckSql(table: String, idCol: String, textCol: String,
                      labelSql: String, iters: Int = 3, lr: Double = 1.0): String = {
    val Seq(f1, f2, f3) = featsDuck(textCol)
    val head =
      s"""WITH f AS (
         |  SELECT $idCol,
         |    CAST(CASE WHEN $labelSql THEN 1 ELSE 0 END AS DOUBLE) AS y,
         |    $f1 AS x1, $f2 AS x2, $f3 AS x3
         |  FROM $table),
         |wt0 AS (SELECT 0.0 AS b, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3)""".stripMargin
    def zExpr(w: String) = s"($w.b + $w.w1 * f.x1 + $w.w2 * f.x2 + $w.w3 * f.x3)"
    val steps = (1 to iters).map { i =>
      val prev = s"wt${i - 1}"
      s"""gr$i AS (
         |  SELECT avg(y - p) AS gb, avg((y - p) * x1) AS g1,
         |         avg((y - p) * x2) AS g2, avg((y - p) * x3) AS g3
         |  FROM (SELECT f.*, 1 / (1 + exp(-${zExpr(prev)})) AS p FROM f, $prev) s),
         |wt$i AS (
         |  SELECT b + $lr * gb AS b, w1 + $lr * g1 AS w1,
         |         w2 + $lr * g2 AS w2, w3 + $lr * g3 AS w3
         |  FROM $prev, gr$i)""".stripMargin
    }
    (head +: steps).mkString(",\n") +
      s"""
         |SELECT $idCol, y,
         |  round(1 / (1 + exp(-${zExpr(s"wt$iters")})), 4) AS prob
         |FROM f, wt$iters
         |ORDER BY $idCol""".stripMargin
  }
}
