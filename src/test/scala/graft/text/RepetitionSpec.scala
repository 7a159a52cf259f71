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

  // ---- graft_repetition_stats4: exact integer half-up rounding ----

  private def stats4Of(texts: String*): Seq[(String, Double, Double, Double, Double)] = {
    val st = Repetition.statsNative4(col("text"))
    texts.toDF("text").select(
      col("text"),
      org.apache.spark.sql.functions.element_at(st, 1).as("dt"),
      org.apache.spark.sql.functions.element_at(st, 2).as("d2"),
      org.apache.spark.sql.functions.element_at(st, 3).as("d3"),
      org.apache.spark.sql.functions.element_at(st, 4).as("t2"))
      .as[(String, Double, Double, Double, Double)].collect().toSeq
  }

  test("rounded kernel resolves exact decimal-boundary ratios half-up") {
    // craft best2/textLen = 57/800 = 0.07125 EXACTLY — the sf1 doc
    // 600004885 case: as a double the ratio is 0.0712499…96 (just
    // below the boundary), so round(double, 4) gives 0.0712 under
    // binary-value rounding (DuckDB) but 0.0713 under Spark's
    // BigDecimal(Double.toString) HALF_UP. The integer formula rounds
    // the true rational: always 0.0713, in both engines.
    val a = "a" * 9
    val b = "b" * 9
    var toks = Vector(a, b, "p1", a, b, "p2", a, b) // best 2-gram "a…a b…b": 3 × 19 chars = 57
    var i = 0
    while ((toks.mkString(" ").length + 4) <= 798 ) {
      toks :+= f"q$i%03d" // distinct 4-char pads: 2-gram char weights stay < 57
      i += 1
    }
    toks :+= "z" * (800 - toks.mkString(" ").length - 1)
    val text = toks.mkString(" ")
    text.length shouldBe 800
    val Seq((_, _, _, _, t2)) = stats4Of(text)
    t2 shouldBe 0.0713
    // the raw kernel's unrounded double prints as "0.07125" but its
    // exact binary value sits just BELOW the decimal boundary — the
    // root of the engine disagreement
    val Seq((_, _, _, _, raw)) = statsOf(text)
    raw shouldBe 0.07125
    new java.math.BigDecimal(raw)
      .compareTo(new java.math.BigDecimal("0.07125")) should be < 0
  }

  test("rounded kernel equals integer half-up of the exact rationals") {
    def r4(p: Long, q: Long): Double =
      if (q == 0L) 0.0 else ((20000L * p + q) / (2L * q)) / 10000.0
    val rng = new scala.util.Random(99)
    val vocab = Vector("a", "bb", "ccc", "dd", "e")
    val docs = Seq.fill(80)(
      Seq.fill(1 + rng.nextInt(12))(vocab(rng.nextInt(vocab.size))).mkString(" ")) ++
      Seq("", "solo", "x x x x")
    def refCounts(text: String): (Double, Double, Double, Double) = {
      val toks = text.split(" ", -1).toSeq
      def gramCounts(w: Int): (Long, Long, Long) = {
        val grams = if (toks.size < w) Seq.empty
          else toks.sliding(w).map(_.mkString(" ")).toSeq
        val total = grams.map(_.length.toLong).sum
        val uniq = grams.distinct.map(_.length.toLong).sum
        val best = if (grams.isEmpty) 0L
          else grams.groupBy(identity).map { case (g, o) => o.size.toLong * g.length }.max
        (total, uniq, best)
      }
      val (t2tot, t2uniq, best2) = gramCounts(2)
      val (t3tot, t3uniq, _) = gramCounts(3)
      (r4(toks.size.toLong - toks.distinct.size, toks.size.toLong),
        r4(t2tot - t2uniq, t2tot),
        r4(t3tot - t3uniq, t3tot),
        if (toks.size < 2) 0.0 else r4(best2, text.length.toLong))
    }
    stats4Of(docs: _*).foreach { case (text, dt, d2, d3, t2) =>
      val (rdt, rd2, rd3, rt2) = refCounts(text)
      withClue(s"doc '$text': ") {
        dt shouldBe rdt
        d2 shouldBe rd2
        d3 shouldBe rd3
        t2 shouldBe rt2
      }
    }
  }
}
