package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  test("classify: clear-cut classes, OOV tokens, and null handling") {
    val df = Seq(
      (1L, "ham ham ham eggs", "food", false),
      (2L, "ham eggs toast ham", "food", false),
      (3L, "bolt nut wrench bolt", "tool", false),
      (4L, "wrench bolt nut nut", "tool", false),
      (5L, "spanner unseen words", null, false),     // null label: excluded from training
      (6L, "ham eggs breakfast", null, true),        // probe: foody + one OOV token
      (7L, "bolt wrench garage", null, true)         // probe: tooly + one OOV token
    ).toDF("id", "text", "label", "is_probe")
    val got = NaiveBayes.classify(df, "id", "text", "label", col("is_probe"))
      .select("id", "pred").as[(Long, String)].collect().toMap
    got shouldBe Map(6L -> "food", 7L -> "tool")
  }

  test("classify: probe doc of only unseen tokens falls back to the prior") {
    val df = Seq(
      (1L, "a a a", "big", false),
      (2L, "a a b", "big", false),
      (3L, "c c d", "small", false),
      (4L, "zz qq", null, true) // all OOV: default terms + prior decide
    ).toDF("id", "text", "label", "is_probe")
    val got = NaiveBayes.classify(df, "id", "text", "label", col("is_probe")).collect()
    got.length shouldBe 1
    // priors equal (1 doc... no: big=2 docs, small=1) -> 'big' wins on
    // prior; default token terms differ only via class totals (6 vs 3
    // tokens: ln(1/(3+V)) > ln(1/(6+V)) favors 'small') — with V=4,
    // scores: big = ln(2/3) + 2*ln(1/10); small = ln(1/3) + 2*ln(1/7).
    val big = math.log(2.0 / 3) + 2 * math.log(1.0 / 10)
    val small = math.log(1.0 / 3) + 2 * math.log(1.0 / 7)
    val expected = if (big >= small) "big" else "small"
    got.head.getAs[String]("pred") shouldBe expected
    got.head.getAs[Double]("score") shouldBe (math.max(big, small) +- 1e-4)
  }

  test("a class whose docs have null text stays in the model") {
    val df = Seq(
      (1L, None, Some("empty")),
      (2L, None, Some("empty")),
      (3L, None, Some("empty")),
      (4L, Some("a b"), Some("full")),
      (5L, Some("z"), None) // probe: OOV token
    ).toDF("id", "text", "label")
    val got = NaiveBayes.classify(df, "id", "text", "label", col("label").isNull).collect()
    got.length shouldBe 1
    // class 'empty' must survive with ct=0: prior ln(3/4) + 1·ln(1/(0+2))
    // beats 'full' prior ln(1/4) + 1·ln(1/(2+2))
    val e = math.log(3.0 / 4) + math.log(1.0 / 2)
    val f = math.log(1.0 / 4) + math.log(1.0 / 4)
    e should be > f
    got.head.getAs[String]("pred") shouldBe "empty"
  }

  test("null probe predicate rows train rather than vanish") {
    val df = Seq(
      (1L, "x x", "a", Some(false)),
      (2L, "y y", "b", None),      // NULL predicate -> train side
      (3L, "y y", null, Some(true))
    ).toDF("id", "text", "label", "is_probe")
    val got = NaiveBayes.classify(df, "id", "text", "label", col("is_probe")).collect()
    // doc 2 trained class b on token y, so probe doc 3 (all y) -> b
    got.head.getAs[String]("pred") shouldBe "b"
  }
}
