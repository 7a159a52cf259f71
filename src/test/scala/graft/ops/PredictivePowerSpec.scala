package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PredictivePowerSpec extends SparkSpec {
  import spark.implicits._

  // y has 3 classes; f_perfect mirrors y exactly, f_const carries no
  // signal (every row the same value), f_noise is a high-cardinality
  // near-unique value (each value appears in one row, so every test
  // row falls back to the global majority)
  private def df = spark.range(0, 90).select(
    col("id"),
    concat(lit("c"), pmod(col("id"), lit(3))).as("y"),
    concat(lit("c"), pmod(col("id"), lit(3))).as("f_perfect"),
    lit("k").as("f_const"),
    concat(lit("u"), col("id")).as("f_noise"))

  test("a feature that mirrors the target scores power 1.0") {
    val out = PredictivePower.cvAccuracy(df, "id", "y",
      Seq("f_perfect" -> col("f_perfect")), k = 3, salt = "s")
      .collect()
    out.length shouldBe 1
    out.head.getAs[String]("feature") shouldBe "f_perfect"
    out.head.getAs[Long]("n_eval") shouldBe 90L
    out.head.getAs[Long]("n_correct") shouldBe 90L
    out.head.getAs[Double]("power") shouldBe 1.0
  }

  test("constant and near-unique features fall back to the fold majority") {
    val out = PredictivePower.cvAccuracy(df, "id", "y",
      Seq("f_const" -> col("f_const"), "f_noise" -> col("f_noise")),
      k = 3, salt = "s")
      .collect().map(r => r.getAs[String]("feature") ->
        (r.getAs[Long]("n_correct"), r.getAs[Double]("power"))).toMap
    // both predict each fold's training-majority class everywhere:
    // identical confusion counts, power well under the perfect 1.0
    out("f_const") shouldBe out("f_noise")
    val (corr, power) = out("f_const")
    corr should be < 90L
    power should (be >= 0.0 and be <= 1.0)
  }

  test("tie between classes breaks to the lexicographically smallest") {
    // one feature value, two classes with EQUAL training counts in
    // every fold cannot be guaranteed by construction under hash
    // folds; instead pin the rule on a single-fold-free layout: k=2,
    // and y alternates so each value v maps to classes {a, b} — the
    // winner must be 'a' whenever counts tie, so accuracy equals the
    // share of 'a' rows in the test fold. We only assert determinism:
    // two runs agree exactly.
    val d2 = spark.range(0, 40).select(col("id"),
      concat(lit("y"), pmod(col("id"), lit(2))).as("y"),
      lit("v").as("f"))
    val a = PredictivePower.cvAccuracy(d2, "id", "y", Seq("f" -> col("f")), k = 2, salt = "t").collect()
    val b = PredictivePower.cvAccuracy(d2, "id", "y", Seq("f" -> col("f")), k = 2, salt = "t").collect()
    a shouldBe b
  }

  test("duck twin renders with the same fold hash and pivot arity") {
    val sql = PredictivePower.cvAccuracyDuckSql("documents", "doc_id", "lang",
      Seq("source" -> "source"), k = 3, salt = "pp9")
    sql should include("% 3")
    sql should include("CASE WHEN fold = 2 THEN acc END")
    sql should include("/ 3.0")
  }
}
