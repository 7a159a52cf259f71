package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)]) =
    LineDedup.dedupLines(rows.toDF("id", "text"), "id", "text", sep = "|")
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))

  test("keeps the global first occurrence, drops later repeats across docs") {
    val out = run(Seq(
      1L -> "alpha|shared footer",
      2L -> "beta|shared footer",
      3L -> "shared footer|gamma"))
    out shouldBe Seq(
      (1L, 2, 2L, "alpha|shared footer"), // first occurrence survives here
      (2L, 2, 1L, "beta"),
      (3L, 2, 1L, "gamma"))
  }

  test("within-doc repeats collapse to the earliest position") {
    val out = run(Seq(1L -> "x|x|y|x"))
    out shouldBe Seq((1L, 4, 2L, "x|y"))
  }

  test("a doc of only repeats survives with n_kept = 0 and empty text") {
    val out = run(Seq(1L -> "only line", 2L -> "only line"))
    out shouldBe Seq(
      (1L, 1, 1L, "only line"),
      (2L, 1, 0L, ""))
  }

  test("first occurrence is by (doc, position), not by arrival order") {
    // doc 1's line at position 1 beats doc 2's identical line at
    // position 0: doc id orders first
    val out = run(Seq(2L -> "dup|b", 1L -> "a|dup"))
    out shouldBe Seq(
      (1L, 2, 2L, "a|dup"),
      (2L, 2, 1L, "b"))
  }

  test("empty lines dedup like any other line") {
    val out = run(Seq(1L -> "a||b", 2L -> "|c"))
    // doc 1 keeps its empty line (global first); doc 2's leading empty
    // line is a repeat
    out shouldBe Seq(
      (1L, 3, 3L, "a||b"),
      (2L, 2, 1L, "c"))
  }

  test("a null document behaves as the empty string (duck-twin parity)") {
    // round-10 ADVICE: size(split(null)) = -1 diverged from the Duck
    // twin's len(NULL) = NULL; both sides now coalesce text to ''
    val out = run(Seq(1L -> "a", 2L -> null.asInstanceOf[String], 3L -> ""))
    // '' splits to one empty line; doc 2's (null → '') owns it first
    out shouldBe Seq(
      (1L, 1, 1L, "a"),
      (2L, 1, 1L, ""),
      (3L, 1, 0L, ""))
  }

  test("matches a brute-force reimplementation on a random corpus") {
    val rng = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d")
    val rows = (0L until 40L).map { i =>
      i -> Seq.fill(1 + rng.nextInt(6))(vocab(rng.nextInt(vocab.size))).mkString("|")
    }
    // brute force: scan docs in id order, keep a line on first sight
    val seen = scala.collection.mutable.Set[String]()
    val expected = rows.sortBy(_._1).map { case (id, text) =>
      val lines = text.split("\\|", -1)
      val kept = lines.filter(l => seen.add(l))
      (id, lines.length, kept.length.toLong, kept.mkString("|"))
    }
    run(rows) shouldBe expected
  }
}
