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

  test("native token counts equal the array-size formulations") {
    val cases = Seq(
      "ab12cd!", "", " ", "  ", "a  b", "hello world 42",
      "ünïcödé — naïve • 漢字テスト", "MIXED Case Text",
      "tabs\tand\nnewlines stay punct", "a" * 500,
      "😀 astral 🚀🚀 pair", "1,234.56 = x&y|z")
    val df = cases.toDF("t")
    val out = df.select(
      TextFunctions.wsTokenCount(col("t")).as("ws_fast"),
      org.apache.spark.sql.functions.size(TextFunctions.tokens(col("t"))).as("ws_ref"),
      TextFunctions.regexTokenCount(col("t")).as("re_fast"),
      org.apache.spark.sql.functions.size(TextFunctions.regexTokens(col("t"))).as("re_ref")).collect()
    out.foreach { r =>
      r.getAs[Int]("ws_fast") shouldBe r.getAs[Int]("ws_ref")
      r.getAs[Int]("re_fast") shouldBe r.getAs[Int]("re_ref")
    }
    // null propagates on both
    val n = Seq[Option[String]](None).toDF("t").select(
      TextFunctions.wsTokenCount(col("t")).as("a"),
      TextFunctions.regexTokenCount(col("t")).as("b")).collect().head
    n.isNullAt(0) shouldBe true
    n.isNullAt(1) shouldBe true
  }

  test("native qualityStats equals the regex/lambda formulations") {
    val cases = Seq(
      "the cat is here", "cat dog", "", " ", "a  b", "ab abcd",
      "Hello, World! 123", "ünïcödé — naïve • 漢字", "the the the",
      "1,234.56 = x&y|z", "it", "of a to in is", "😀 a 🚀", "  the  ")
    val df = cases.toDF("t")
    val toks = TextFunctions.tokens(col("t"))
    val qs = TextFunctions.qualityStats(col("t"))
    val out = df.select(
      qs.nTokens.as("nt_f"), org.apache.spark.sql.functions.size(toks).as("nt_r"),
      qs.meanTokLen.as("ml_f"), TextFunctions.meanTokenLen(toks).as("ml_r"),
      qs.stopRatio.as("sr_f"), TextFunctions.stopwordRatio(toks).as("sr_r"),
      qs.punctRatio.as("pr_f"), TextFunctions.punctRatio(col("t")).as("pr_r"),
      qs.digitRatio.as("dr_f"), TextFunctions.digitRatio(col("t")).as("dr_r")).collect()
    out.zip(cases).foreach { case (r, c) =>
      withClue(s"case '$c': ") {
        r.getAs[Int]("nt_f") shouldBe r.getAs[Int]("nt_r")
        r.getAs[Double]("ml_f") shouldBe r.getAs[Double]("ml_r")
        r.getAs[Double]("sr_f") shouldBe r.getAs[Double]("sr_r")
        r.getAs[Double]("pr_f") shouldBe r.getAs[Double]("pr_r")
        r.getAs[Double]("dr_f") shouldBe r.getAs[Double]("dr_r")
      }
    }
  }

  test("unigram cross-entropy matches hand-computed probabilities") {
    val df = Seq((1L, "a a a"), (2L, "b")).toDF("doc_id", "text")
    val out = UnigramLm.crossEntropy(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    graft.api.CacheScope.global.release()
    // corpus: a x3, b x1 -> p(a)=3/4, p(b)=1/4
    out(1L)._1 shouldBe 3L
    out(1L)._2 shouldBe (math.round(-math.log(0.75) * 1e4) / 1e4)
    out(2L)._2 shouldBe (math.round(-math.log(0.25) * 1e4) / 1e4)
  }

  test("portableHash60 fits in a signed long and is deterministic") {
    val h1 = one[Long](TextFunctions.portableHash60(col("t")), "hello")
    val h2 = one[Long](TextFunctions.portableHash60(col("t")), "hello")
    h1 shouldBe h2
    h1 should be >= 0L
    h1 should be < (1L << 60)
  }
}
