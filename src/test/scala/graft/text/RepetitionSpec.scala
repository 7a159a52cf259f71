package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  // exercises the NATIVE kernel (the corpus path); the HOF twins are
  // asserted bit-identical to it in NativeTextPropertySpec
  private def statsOf(texts: String*): Seq[(String, Double, Double, Double, Double)] = {
    val st = Repetition.statsNative(col("text"))
    texts.toDF("text").select(
      col("text"),
      org.apache.spark.sql.functions.element_at(st, 1).as("dt"),
      org.apache.spark.sql.functions.element_at(st, 2).as("d2"),
      org.apache.spark.sql.functions.element_at(st, 3).as("d3"),
      org.apache.spark.sql.functions.element_at(st, 4).as("t2"))
      .as[(String, Double, Double, Double, Double)].collect().toSeq
  }

  test("all-distinct doc has zero dup fractions") {
    val Seq((_, dt, d2, d3, _)) = statsOf("a b c d")
    dt shouldBe 0.0
    d2 shouldBe 0.0
    d3 shouldBe 0.0
  }

  test("fully repeated doc saturates the dup fractions") {
    // tokens: x x x x -> 4 tokens, 1 distinct -> dup_token = 3/4
    // 2-grams: "x x" x3, all 9 chars dup beyond first 3 -> 6/9
    val Seq((_, dt, d2, _, t2)) = statsOf("x x x x")
    dt shouldBe 0.75
    d2 shouldBe (6.0 / 9.0) +- 1e-12
    // top 2-gram "x x": count 3 * len 3 = 9 over 7 text chars
    t2 shouldBe (9.0 / 7.0) +- 1e-12
  }

  test("top-2gram picks the char-weight-max run") {
    // grams: "aa bb" x2 (len 5, weight 10), "bb aa" x1, "bb cccccc" (len 9)
    // weight 9 -> best is "aa bb" at 10
    val txt = "aa bb aa bb cccccc"
    val Seq((_, _, _, _, t2)) = statsOf(txt)
    t2 shouldBe (10.0 / txt.length) +- 1e-12
  }

  test("single-token and empty-ish docs are safe") {
    val rows = statsOf("solo", "")
    rows.foreach { case (_, dt, d2, d3, t2) =>
      dt shouldBe 0.0; d2 shouldBe 0.0; d3 shouldBe 0.0; t2 shouldBe 0.0
    }
  }

  test("matches a driver-side reference on random token soup") {
    val rng = new scala.util.Random(42)
    val vocab = Vector("a", "bb", "ccc", "dd", "e")
    val docs = Seq.fill(60)(
      Seq.fill(1 + rng.nextInt(12))(vocab(rng.nextInt(vocab.size))).mkString(" "))

    def refStats(text: String): (Double, Double, Double, Double) = {
      val toks = text.split(" ", -1).toSeq
      val dt = (toks.size - toks.distinct.size).toDouble / toks.size
      def gramStats(w: Int): (Double, Long) = {
        val grams = if (toks.size < w) Seq.empty
          else toks.sliding(w).map(_.mkString(" ")).toSeq
        val total = grams.map(_.length.toLong).sum
        val uniq = grams.distinct.map(_.length.toLong).sum
        val frac = if (total == 0) 0.0 else (total - uniq).toDouble / total
        val best = if (grams.isEmpty) 0L
          else grams.groupBy(identity).map { case (g, o) => o.size.toLong * g.length }.max
        (frac, best)
      }
      val (d2, best2) = gramStats(2)
      val (d3, _) = gramStats(3)
      val t2 = if (text.isEmpty) 0.0 else best2.toDouble / text.length
      (dt, d2, d3, t2)
    }

    val got = statsOf(docs: _*)
    got.foreach { case (text, dt, d2, d3, t2) =>
      val (rdt, rd2, rd3, rt2) = refStats(text)
      dt shouldBe rdt +- 1e-9
      d2 shouldBe rd2 +- 1e-9
      d3 shouldBe rd3 +- 1e-9
      t2 shouldBe rt2 +- 1e-9
    }
  }
}
