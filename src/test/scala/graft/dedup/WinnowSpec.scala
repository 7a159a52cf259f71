package graft.dedup

import graft.SparkSpec
import graft.text.TextFunctions
import org.apache.spark.sql.functions._

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def toks(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("fingerprints are a subset of the document's shingle hashes, sorted distinct") {
    val df = Seq((1L, toks("w", 30))).toDF("doc_id", "text")
    val fp = Winnow.fingerprintSets(df, "doc_id", "text", w = 3, window = 4)
      .select(col("fp")).as[Seq[Long]].head()
    val shingles = df.select(
      expr(TextFunctions.positionalShinglesSql("text", 3)).as("hs"))
      .as[Seq[Long]].head()
    fp shouldBe fp.sorted
    fp.distinct should have size fp.size.toLong
    fp.toSet.subsetOf(shingles.toSet) shouldBe true
    // winnowing density: one selection per window position, so at most
    // n-window+1 and (guarantee) at least ceil(n / window) fingerprints
    fp.size should be <= (shingles.size - 4 + 1)
    fp.size should be >= (shingles.size + 3) / 4
  }

  test("matches the brute-force window-min reference on arbitrary docs") {
    val docs = Seq(
      (1L, toks("a", 17)),
      (2L, s"${toks("a", 5)} ${toks("b", 9)}"),
      (3L, toks("c", 7)),   // shorter than one window of shingles + w
      (4L, "x y"),          // fewer tokens than w -> no shingles
      (5L, toks("d", 4)))   // exactly 2 shingles at w=3 < window
    val df = docs.toDF("doc_id", "text")
    val got = Winnow.fingerprintSets(df, "doc_id", "text", w = 3, window = 4)
      .orderBy("doc_id").select("fp").as[Seq[Long]].collect()
    val hs = df.orderBy("doc_id").select(
      expr(TextFunctions.positionalShinglesSql("text", 3)).as("hs"))
      .as[Seq[Long]].collect()
    val want = hs.map { h =>
      if (h.isEmpty) Seq.empty[Long]
      else if (h.size < 4) Seq(h.min)
      else h.sliding(4).map(_.min).toSeq.distinct.sorted
    }
    got.toSeq shouldBe want.toSeq
  }

  test("guarantee: a shared passage of >= w+window-1 tokens yields a shared fingerprint") {
    val passage = toks("shared", 6) // 6 tokens >= 3+4-1
    val df = Seq(
      (1L, s"${toks("x", 10)} $passage ${toks("y", 3)}"),
      (2L, s"$passage ${toks("z", 12)}"),
      (3L, toks("other", 25))
    ).toDF("doc_id", "text")
    val pairs = Winnow.sharedFingerprintPairs(df, "doc_id", "text",
      w = 3, window = 4, minShared = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    pairs should contain((1L, 2L))
    pairs.map(p => Set(p._1, p._2)) should not contain Set(1L, 3L)
  }

  test("hot-fingerprint buckets above maxBucket are dropped (boilerplate cap)") {
    // 5 identical docs: every fingerprint bucket has 5 members
    val df = (1L to 5L).map(i => (i, toks("same", 20))).toDF("doc_id", "text")
    val capped = Winnow.sharedFingerprintPairs(df, "doc_id", "text",
      minShared = 1, maxBucket = 4).count()
    val uncapped = Winnow.sharedFingerprintPairs(df, "doc_id", "text",
      minShared = 1, maxBucket = 10).count()
    capped shouldBe 0L
    uncapped shouldBe 10L // C(5,2) pairs
  }

  test("plan: fingerprint selection is map-only (no exchange, no explode)") {
    val df = Seq((1L, toks("p", 12))).toDF("doc_id", "text")
    val plan = Winnow.fingerprints(df, "doc_id", "text").queryExecution.executedPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    flattenPlan(plan).collect { case e: ShuffleExchangeLike => e } shouldBe empty
    flattenPlan(plan).collect {
      case g: org.apache.spark.sql.execution.GenerateExec => g } shouldBe empty
  }
}
