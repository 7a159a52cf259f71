package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mirrors the reference doctests (inference/evaluation.py) line for
  * line, then exercises the distributed evaluatePredictor tier.
  */
class EvaluationSpec extends SparkSpec {
  import spark.implicits._
  import Evaluation._

  private def r2(d: Double) = math.rint(d * 100) / 100

  test("scoreMatch scalar/null doctests") {
    scoreMatch("a", "a") shouldBe 1.0
    scoreMatch("a", "b") shouldBe 0.0
    scoreMatch("abcd", "abcde") shouldBe 0.0
    scoreMatch("a", null) shouldBe 0.0
    scoreMatch(null, "a") shouldBe 0.0
    scoreMatch(null, null) shouldBe 1.0
    scoreMatch(1, 1.0) shouldBe 1.0 // Python numeric equality
  }

  test("scoreMatch list doctests: bidirectional best-match average") {
    scoreMatch(List("a", "b"), List("a", "b")) shouldBe 1.0
    scoreMatch(List("a", "b"), List("b", "a")) shouldBe 1.0
    r2(scoreMatch(List("a"), List("b", "a"))) shouldBe 0.67
  }

  test("scoreMatch map doctests: key-union mean, absent == None") {
    scoreMatch(Map("a" -> 1), Map("a" -> 1)) shouldBe 1.0
    scoreMatch(Map("a" -> 1), Map("a" -> 2)) shouldBe 0.0
    scoreMatch(Map("a" -> 1, "b" -> null), Map("a" -> 1)) shouldBe 1.0
    scoreMatch(
      List(Map("a" -> 1, "b" -> 2), Map("a" -> 3, "b" -> 4)),
      List(Map("a" -> 1, "b" -> 2), Map("a" -> 3, "b" -> 4))) shouldBe 1.0
    scoreMatch(
      List(Map("a" -> 1, "b" -> 4), Map("a" -> 3, "b" -> 2)),
      List(Map("a" -> 1, "b" -> 2), Map("a" -> 3, "b" -> 4))) shouldBe 0.5
  }

  test("scoreMatch custom leaf matcher (char-set jaccard doctest)") {
    val charMatch: MatchFn = (x, y) => {
      val (a, b) = (x.toString.toSet, y.toString.toSet)
      a.intersect(b).size.toDouble / a.union(b).size
    }
    scoreMatch("abcd", "abc", Some(charMatch)) shouldBe 0.75
    scoreMatch(List("abcd", "efgh"), List("ac", "gh"), Some(charMatch)) shouldBe 0.5
    // integer leaves reach the matcher as str(12)="12", not "12.0"
    // (reference parity: score_text_overlap("12", "123") = 2/3)
    scoreMatch(12, 123, Some(textOverlapFn)) shouldBe (2.0 / 3) +- 1e-9
  }

  test("findLongestOverlap and scoreTextOverlap doctests") {
    findLongestOverlap("hello world", "world of programming") shouldBe ("world", 5)
    findLongestOverlap("abcdefg", "defghi") shouldBe ("defg", 4)
    findLongestOverlap("python", "java") shouldBe ("", 0)
    findLongestOverlap("", "test") shouldBe ("", 0)
    findLongestOverlap("aabbcc", "ddeeff") shouldBe ("", 0)
    findLongestOverlap("programming", "PROGRAMMING") shouldBe ("", 0)
    scoreTextOverlap("abc", "bcde") shouldBe 0.5
    scoreTextOverlap("same", "same") shouldBe 1.0
    scoreTextOverlap("", "x") shouldBe 0.0
  }

  test("evaluatePredictor aggregates graded scores over a frame") {
    // exact hit, full miss, and a half-credit struct
    val df = Seq(
      ("x", "x"),
      ("x", "y"),
      ("ab", "bc"))
      .toDF("predicted", "expected")
    val exact = evaluatePredictor(df, "predicted", "expected")
    exact.truePositive shouldBe 1.0
    exact.total shouldBe 3L
    val graded = evaluatePredictor(df, "predicted", "expected", Some(textOverlapFn))
    graded.truePositive shouldBe 1.5 // 1.0 + 0.0 + 0.5 ("b" / max(2,2))
    graded.accuracy shouldBe 0.5 +- 1e-9
  }

  test("evaluatePredictor scores struct columns structurally") {
    val df = Seq(
      ((1, "a"), (1, "a")), // 1.0
      ((1, "a"), (1, "b")), // fields: 1.0 + 0.0 -> 0.5
      ((2, "c"), (3, "d"))) // 0.0
      .toDF("predicted", "expected")
    val o = evaluatePredictor(df, "predicted", "expected")
    o.truePositive shouldBe 1.5
    o.total shouldBe 3L
    o.accuracy shouldBe 0.5
  }
}
