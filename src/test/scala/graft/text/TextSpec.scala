package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c.as("r")).collect().head.getAs[T]("r")

  test("shingles: w-token windows, distinct, empty when too short") {
    val c = TextFunctions.shingles(col("t"), 3)
    one[Seq[String]](c, "a b c d") shouldBe Seq("a b c", "b c d")
    one[Seq[String]](c, "a b") shouldBe Seq.empty
    one[Seq[String]](c, "x x x x") shouldBe Seq("x x x")
  }

  test("stopword ratio") {
    val c = TextFunctions.stopwordRatio(TextFunctions.tokens(col("t")))
    one[Double](c, "the cat is here") shouldBe 0.5
    one[Double](c, "cat dog") shouldBe 0.0
  }

  test("mean token length") {
    val c = TextFunctions.meanTokenLen(TextFunctions.tokens(col("t")))
    one[Double](c, "ab abcd") shouldBe 3.0
  }

  test("punct and digit ratios") {
    one[Double](TextFunctions.punctRatio(col("t")), "ab!?") shouldBe 0.5
    one[Double](TextFunctions.digitRatio(col("t")), "a1b2") shouldBe 0.5
    one[Double](TextFunctions.digitRatio(col("t")), "") shouldBe 0.0
  }

  test("token-set fingerprint is order-insensitive") {
    val c = TextFunctions.tokenSetFingerprint(col("t"))
    one[String](c, "b a c") shouldBe one[String](c, "c b a a")
  }

  test("regex tokens split words, numbers, punct") {
    val c = TextFunctions.regexTokens(col("t"))
    one[Seq[String]](c, "ab12cd!") shouldBe Seq("ab", "12", "cd", "!")
  }

  test("langId predicts by marker stopwords with deterministic tie-break") {
    val c = LangId.predict(TextFunctions.tokens(col("t")))
    one[String](c, "the cat and the dog") shouldBe "en"
    one[String](c, "le chat et la mer") shouldBe "fr"
    one[String](c, "der hund und die katze") shouldBe "de"
    one[String](c, "el perro y que gato") shouldBe "es"
    one[String](c, "xyz qqq") shouldBe "und"
    // tie: 'la' is french-only marker here, 'the' english; equal hits -> en wins (markers order)
    one[String](c, "the la") shouldBe "en"
  }

  test("portableHash60 fits in a signed long and is deterministic") {
    val h1 = one[Long](TextFunctions.portableHash60(col("t")), "hello")
    val h2 = one[Long](TextFunctions.portableHash60(col("t")), "hello")
    h1 shouldBe h2
    h1 should be >= 0L
    h1 should be < (1L << 60)
  }
}
