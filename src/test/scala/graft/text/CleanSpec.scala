package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CleanSpec extends SparkSpec {
  import spark.implicits._

  private def clean(rows: (Long, String)*) =
    Clean.c4Clean(rows.toSeq.toDF("id", "text"), "id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSeq

  test("keeps only terminally-punctuated lines with enough words") {
    val doc =
      "this line has plenty of words and ends well.\n" + // keep
        "too short.\n" + // 2 words < 5
        "this one has enough words but no terminal punct\n" + // no punct
        "is this a long enough question to survive the gate?" // keep
    clean((1L, doc)) shouldBe Seq((1L, 4, 2,
      "this line has plenty of words and ends well.\n" +
        "is this a long enough question to survive the gate?"))
  }

  test("banned substrings drop a line regardless of shape") {
    val doc =
      "enable JavaScript to view the full content here.\n" +
        "Lorem ipsum dolor sit amet consectetur adipiscing elit.\n" +
        "object literals look like { key: value } pairs today.\n" +
        "a perfectly ordinary sentence with enough words stays."
    val out = clean((1L, doc))
    out.head._3 shouldBe 1
    out.head._4 shouldBe "a perfectly ordinary sentence with enough words stays."
  }

  test("quote and bang terminals count; empty doc yields one empty dropped line") {
    val doc = "he said it was truly \"the best sale of the year!\"\n" +
      "what an absolutely remarkable and wonderful day this is!"
    clean((1L, doc)).head._3 shouldBe 2
    val empty = clean((2L, ""))
    empty.head shouldBe ((2L, 1, 0, ""))
  }

  test("custom separator splits literally, not as regex") {
    val out = Clean.c4Clean(
      Seq((1L, "five good words are kept here.|tail fragment")).toDF("id", "text"),
      "id", "text", sep = "|")
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getString(3))).head
    out shouldBe ((2, 1, "five good words are kept here."))
  }

  test("boilerplate: lines above the distinct-doc threshold drop everywhere") {
    val docs = (1L to 10L).map { i =>
      (i, s"unique content line of document number $i\nshared footer line")
    }
    val out = Clean.dropBoilerplate(docs.toDF("id", "text"), "id", "text",
      minDocs = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    out.foreach { case (i, nl, nk, txt) =>
      nl shouldBe 2
      nk shouldBe 1
      txt shouldBe s"unique content line of document number $i"
    }
  }

  test("boilerplate: within-document repeats count once toward the threshold") {
    // the repeated line appears in only 2 DISTINCT docs (threshold 2 not
    // crossed), even though it occurs 6 times in total
    val docs = Seq(
      (1L, "dup\ndup\ndup"), (2L, "dup\ndup\ndup"), (3L, "other"))
    val out = Clean.dropBoilerplate(docs.toDF("id", "text"), "id", "text",
      minDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    out shouldBe Map(1L -> 3, 2L -> 3, 3L -> 1) // nothing dropped
  }

  test("boilerplate: maxBoilerplate guards a degenerate threshold loudly") {
    val docs = (1L to 5L).map(i => (i, "same\nsame2")).toDF("id", "text")
    an[IllegalArgumentException] should be thrownBy
      Clean.dropBoilerplate(docs, "id", "text", minDocs = 1, maxBoilerplate = 1)
  }

  test("sorted binary-search membership equals the array_contains twin") {
    // graft_sorted_contains is dropBoilerplate's membership kernel —
    // O(log n) per line vs array_contains's O(n) literal scan; this
    // pins bit-equality on a set spanning negatives, zero, dupes, and
    // Long extremes, plus null-input semantics
    graft.functions.GraftFunctions.register(spark)
    val set = Seq(-9001L, 0L, 3L, 3L, 42L, Long.MaxValue, Long.MinValue).sorted
    val lit = typedLit(set)
    val probes = (Seq(-9001L, -9000L, 0L, 1L, 3L, 41L, 42L, 43L,
      Long.MaxValue, Long.MinValue) ++ (0L to 200L)).map(java.lang.Long.valueOf)
    val df = probes.map(v => Tuple1(v: java.lang.Long)).toDF("v")
      .union(Seq(Tuple1(null: java.lang.Long)).toDF("v"))
    val rows = df.select(
      call_function("graft_sorted_contains", col("v"), lit).as("fast"),
      array_contains(lit, col("v")).as("ref")).collect()
    rows.foreach { r => r.isNullAt(0) shouldBe r.isNullAt(1)
      if (!r.isNullAt(0)) r.getBoolean(0) shouldBe r.getBoolean(1) }
  }

  test("plan is map-only: no exchange anywhere") {
    val plan = Clean.c4Clean(Seq((1L, "x")).toDF("id", "text"), "id", "text")
      .queryExecution.executedPlan.toString
    (plan should not).include("Exchange")
  }
}
