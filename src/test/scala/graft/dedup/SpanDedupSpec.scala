package graft.dedup

import graft.SparkSpec

class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private def toks(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("a shared passage surfaces as one maximal span in each document") {
    // shared 12-token passage at offset 5 in doc 1 and offset 0 in doc 2
    val passage = toks("shared", 12)
    val df = Seq(
      (1L, s"${toks("a", 5)} $passage ${toks("b", 4)}"),
      (2L, s"$passage ${toks("c", 7)}")
    ).toDF("doc_id", "text")
    val out = SpanDedup.duplicatedSpans(df, "doc_id", "text", minLen = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    // doc 1: tokens 5..16 (12 tokens); doc 2: tokens 0..11
    out shouldBe Array((1L, 5, 16, 12), (2L, 0, 11, 12))
    graft.api.CacheScope.global.release(blocking = true)
  }

  test("unshared text yields no spans; two separated passages yield two spans") {
    val p1 = toks("alpha", 9)
    val p2 = toks("beta", 10)
    val df = Seq(
      (1L, s"$p1 ${toks("x", 20)} $p2"),   // p1 at 0..8, p2 at 29..38
      (2L, s"${toks("y", 3)} $p1"),
      (3L, s"$p2 ${toks("z", 6)}"),
      (4L, toks("unique", 30))
    ).toDF("doc_id", "text")
    val out = SpanDedup.duplicatedSpans(df, "doc_id", "text", minLen = 8)
      .orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    out shouldBe Array((1L, 0, 8), (1L, 29, 38), (2L, 3, 11), (3L, 0, 9))
    graft.api.CacheScope.global.release(blocking = true)
  }

  test("positions stay token offsets when a document REPEATS a shingle") {
    // doc 1 contains the shared passage TWICE — internal repetition
    // must not shift positions (the deduped shingle kernel would)
    val passage = toks("dup", 8)
    val df = Seq(
      (1L, s"$passage ${toks("mid", 10)} $passage"),
      (2L, s"${toks("pre", 2)} $passage")
    ).toDF("doc_id", "text")
    val out = SpanDedup.duplicatedSpans(df, "doc_id", "text", minLen = 8)
      .orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    // doc 1: first copy at 0..7, second at 18..25; doc 2: at 2..9
    out shouldBe Array((1L, 0, 7), (1L, 18, 25), (2L, 2, 9))
    graft.api.CacheScope.global.release(blocking = true)
  }

  test("removeDuplicatedSpans cuts exactly the flagged tokens; span-free docs pass byte-identical") {
    val passage = toks("shared", 12)
    val clean = "untouched  doc with  double spaces kept verbatim plus unique words"
    val df = Seq(
      (1L, s"${toks("a", 5)} $passage ${toks("b", 4)}"),
      (2L, s"$passage ${toks("c", 7)}"),
      (3L, clean)
    ).toDF("doc_id", "text")
    val out = SpanDedup.removeDuplicatedSpans(df, "doc_id", "text", minLen = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3)))
    out(0) shouldBe ((1L, s"${toks("a", 5)} ${toks("b", 4)}", 9, 12))
    out(1) shouldBe ((2L, toks("c", 7), 7, 12))
    // no spans -> byte-identical pass-through (double spaces intact)
    out(2) shouldBe ((3L, clean, clean.split(" ", -1).length, 0))
    graft.api.CacheScope.global.release(blocking = true)
  }

  test("plan: per-document window only, no cartesian") {
    val df = Seq((1L, toks("t", 20)), (2L, toks("t", 20))).toDF("doc_id", "text")
    val plan = SpanDedup.duplicatedSpans(df, "doc_id", "text")
      .queryExecution.sparkPlan
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    import org.apache.spark.sql.execution.window.WindowExec
    plan.collect { case c: CartesianProductExec => c } shouldBe empty
    plan.collect { case w: WindowExec if w.partitionSpec.isEmpty => w } shouldBe empty
    graft.api.CacheScope.global.release(blocking = true)
  }
}
