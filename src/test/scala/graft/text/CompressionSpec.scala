package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompressionSpec extends SparkSpec {
  import spark.implicits._

  private def ratio(rows: Seq[(Long, String)]): Map[Long, Double] =
    rows.toDF("id", "text")
      .select(col("id"), TextFunctions.compressionRatio(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("template spam compresses far below natural prose; empty is 0") {
    val spam = (1 to 60).map(_ => "click here to win a prize now").mkString(" ")
    val prose = "the migration finished after the retry queue drained but two " +
      "shards reported checksum drift so the coordinator quarantined their " +
      "segments and scheduled a rebuild from the previous snapshot before " +
      "any reader could observe the torn write in production traffic today"
    val rnd = new scala.util.Random(7)
    val noise = (1 to 250).map(_ => (97 + rnd.nextInt(26)).toChar).mkString
    val m = ratio(Seq((1L, spam), (2L, prose), (3L, noise), (4L, "")))
    m(1L) should be < 0.2       // repetition collapses
    m(2L) should (be > 0.4 and be < 0.9) // prose band
    m(3L) should be > m(2L)     // random noise is least compressible
    m(4L) shouldBe 0.0
    m(1L) should be < m(2L)
  }

  test("deterministic across evaluations and row order") {
    val rows = (1L to 30L).map(i => (i, s"doc $i " + ("ab " * i.toInt)))
    ratio(rows) shouldBe ratio(rows.reverse)
  }

  test("plans map-only with the call inside the projection (no exchange)") {
    val df = Seq((1L, "some payload text")).toDF("id", "text")
    val plan = df.select(TextFunctions.compressionRatio(col("text")))
      .queryExecution.executedPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    flattenPlan(plan).collect { case e: ShuffleExchangeLike => e } shouldBe empty
  }

  test("kernel equals a FRESH per-string Deflater (thread cache leaks no state)") {
    // independent engine-side cross-check (there is no DuckDB zlib):
    // the kernel reuses one thread-cached Deflater with reset() between
    // rows — a reset bug would show as order-dependent lengths. A fresh
    // instance per string is the ground truth.
    def freshLen(s: String): Int = {
      val bytes = s.getBytes("UTF-8")
      if (bytes.isEmpty) return 0
      val d = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, /*nowrap=*/ true)
      try {
        d.setInput(bytes); d.finish()
        val buf = new Array[Byte](64 * 1024)
        var total = 0
        while (!d.finished()) total += d.deflate(buf)
        total
      } finally d.end()
    }
    val rnd = new scala.util.Random(11)
    // interleave tiny/huge/repetitive/random so cache reuse crosses
    // very different zlib internal states between rows
    val fixtures: Seq[(Long, String)] = (1L to 40L).map { i =>
      i -> (i % 4 match {
        case 0 => "short"
        case 1 => ("lorem ipsum dolor sit amet " * (i.toInt * 3)).trim
        case 2 => (1 to 500).map(_ => (97 + rnd.nextInt(26)).toChar).mkString
        case _ => s"doc $i " + ("ab" * i.toInt)
      })
    }
    graft.functions.GraftFunctions.register(spark)
    val got = fixtures.toDF("id", "text")
      .select(col("id"), call_function("graft_deflate_len", col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    fixtures.foreach { case (id, s) => got(id) shouldBe freshLen(s) }
  }

  test("a hand-rolled LZ77 parse ranks corpora the same way as deflate") {
    // second independent implementation of the SIGNAL: greedy LZ77
    // token count per char (window 4096, min match 3). Absolute values
    // differ from zlib, but the compressibility ORDER (template spam <
    // prose < random noise) must agree — if deflate and a from-scratch
    // match parser disagree on ordering, one of them is broken.
    def lz77TokensPerChar(s: String): Double = {
      if (s.isEmpty) return 0.0
      val n = s.length
      var i = 0
      var tokens = 0
      while (i < n) {
        var best = 0
        val lo = math.max(0, i - 4096)
        var j = lo
        while (j < i) {
          var l = 0
          while (i + l < n && l < 258 && s.charAt(j + l) == s.charAt(i + l)) l += 1
          if (l > best) best = l
          j += 1
        }
        if (best >= 3) i += best else i += 1
        tokens += 1
      }
      tokens.toDouble / n
    }
    val spam = (1 to 60).map(_ => "click here to win a prize now").mkString(" ")
    val prose = "the migration finished after the retry queue drained but two " +
      "shards reported checksum drift so the coordinator quarantined their " +
      "segments and scheduled a rebuild from the previous snapshot before " +
      "any reader could observe the torn write in production traffic today"
    val rnd = new scala.util.Random(7)
    val noise = (1 to 250).map(_ => (97 + rnd.nextInt(26)).toChar).mkString
    val deflateR = ratio(Seq((1L, spam), (2L, prose), (3L, noise)))
    val lzR = Map(1L -> lz77TokensPerChar(spam), 2L -> lz77TokensPerChar(prose),
      3L -> lz77TokensPerChar(noise))
    // both orderings: spam < prose < noise
    deflateR(1L) should be < deflateR(2L)
    deflateR(2L) should be < deflateR(3L)
    lzR(1L) should be < lzR(2L)
    lzR(2L) should be < lzR(3L)
  }

  test("composes as a quality gate") {
    val spam = (1 to 40).map(_ => "buy now").mkString(" ")
    val docs = Seq((1L, spam),
      (2L, "an ordinary paragraph about distributed query planning and shuffles today")
    ).toDF("doc_id", "text")
    val kept = docs.filter(TextFunctions.compressionRatio(col("text")) >= 0.2)
      .select("doc_id").as[Long].collect()
    kept.toSeq shouldBe Seq(2L)
  }
}
