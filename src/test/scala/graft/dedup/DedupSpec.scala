package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  // doc 1 and 2 are near-identical (one token changed); doc 4 is an
  // exact bag-of-words duplicate of doc 1; doc 3 is unrelated.
  private lazy val docs = Seq(
    (1, "spark runs fast on big data clusters every day"),
    (2, "spark runs fast on big data clusters every night"),
    (3, "completely different content about cooking pasta recipes now"),
    (4, "spark runs fast on big data clusters every day")
  ).toDF("doc_id", "text")

  test("minhash signatures are deterministic and k-wide") {
    val sig = MinHash.signatures(docs, "doc_id", "text", k = 8, w = 3)
    sig.columns.toSeq shouldBe ("doc_id" +: (0 until 8).map(i => s"mh_$i"))
    val s1 = sig.filter($"doc_id" === 1).drop("doc_id").collect().head.toSeq
    val s4 = sig.filter($"doc_id" === 4).drop("doc_id").collect().head.toSeq
    s1 shouldBe s4 // identical text -> identical signature
  }

  test("minhash LSH pairs find near and exact duplicates with verified jaccard") {
    val pairs = MinHash.nearDupPairs(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    pairs.map(p => (p._1, p._2)) should contain(1, 4)
    pairs.find(p => p._1 == 1 && p._2 == 4).get._3 shouldBe 1.0
    // unrelated doc 3 pairs with nothing
    pairs.exists(p => p._1 == 3 || p._2 == 3) shouldBe false
  }

  test("estVsExactPairs: exact duplicate calibrates to est=exact=1, candidates cover verified pairs") {
    val cal = MinHash.estVsExactPairs(docs, "doc_id", "text")
      .collect().map(r => ((r.getInt(0), r.getInt(1)), (r.getDouble(2), r.getDouble(3)))).toMap
    graft.api.CacheScope.global.release()
    // identical docs: every signature component equal, exact jaccard 1
    cal((1, 4)) shouldBe ((1.0, 1.0))
    // every estimate is a multiple of 1/k in [0, 1]
    cal.values.foreach { case (est, exact) =>
      est should (be >= 0.0 and be <= 1.0)
      (est * 8 % 1.0) shouldBe 0.0 +- 1e-9
      exact should (be >= 0.0 and be <= 1.0)
    }
    // calibration is a SUPERSET of the thresholded pair finder
    val verified = MinHash.nearDupPairs(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    graft.api.CacheScope.global.release()
    verified.foreach(p => cal.keySet should contain(p))
  }

  test("native hashed shingles are bit-identical to the SQL lambda form") {
    val tricky = Seq(
      (1, "spark runs fast on big data clusters every day"),
      (2, ""), (3, "one two"), (4, "a  b c d"), // double space -> empty token
      (5, "héllo wörld ünïcode tokens here"),
      (6, "x y z x y z x y z") // repeated shingles -> dedup
    ).toDF("doc_id", "text")
    graft.functions.GraftFunctions.register(spark)
    val sql = tricky.select(col("doc_id"),
      expr(graft.text.TextFunctions.hashedShinglesSql("text", 3)).as("hs"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val native = tricky.select(col("doc_id"),
      call_function("graft_hashed_shingles", col("text"), lit(3)).as("hs"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    native shouldBe sql
  }

  test("native simhash fingerprint is bit-identical to the SQL per-bit tally form") {
    val withHs = docs.select(col("doc_id"),
      expr(SimHash.tokenHashesExpr("text")).as("__hs"))
    val sqlFp = withHs.select(col("doc_id"),
      expr(SimHash.fingerprintFromHashes("__hs")).as("simhash"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val nativeFp = SimHash.fingerprints(docs, "doc_id", "text")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    nativeFp shouldBe sqlFp
  }

  test("native minhash signatures are bit-identical to the k lambda folds") {
    val tricky = Seq(
      (1, "spark runs fast on big data clusters every day"),
      (2, "one two three four"), (3, "a  b c d e"),
      (4, "héllo wörld ünïcode tokens here now"),
      (5, "x y z x y z x y z")
    ).toDF("doc_id", "text")
    graft.functions.GraftFunctions.register(spark)
    val k = 8
    val base = tricky.select(col("doc_id"),
      expr(graft.text.TextFunctions.hashedShinglesSql("text", 3)).as("__hs"))
      .filter(org.apache.spark.sql.functions.size(col("__hs")) > 0)
    val sqlSigs = base.select(col("doc_id") +:
        (0 until k).map(i => expr(MinHash.minhashExpr("__hs", i)).as(s"mh_$i")): _*)
      .collect().map(r => r.getInt(0) -> (1 to k).map(r.getLong)).toMap
    val nativeSigs = MinHash.signatures(tricky, "doc_id", "text", k = k, w = 3)
      .collect().map(r => r.getInt(0) -> (1 to k).map(r.getLong)).toMap
    nativeSigs shouldBe sqlSigs
  }

  test("native 60-bit token hashes are bit-identical to the SQL lambda form") {
    val tricky = Seq(
      (1, "spark runs fast"), (2, ""), (3, "a  b a"), (4, "héllo wörld héllo")
    ).toDF("doc_id", "text")
    graft.functions.GraftFunctions.register(spark)
    val sql = tricky.select(col("doc_id"),
      expr(SimHash.tokenHashesExpr("text")).as("hs"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val native = tricky.select(col("doc_id"),
      call_function("graft_token_hashes60", col("text")).as("hs"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    native shouldBe sql
  }

  test("bucket cap skips degenerate buckets but leaves normal corpora intact") {
    // 6 identical docs: every band bucket holds all 6 -> cap of 5 skips
    // them all (no quadratic blowup), a generous cap keeps all pairs
    val clones = (1 to 6).map(i => (i, "all these documents are the very same text"))
      .toDF("doc_id", "text")
    MinHash.nearDupPairs(clones, "doc_id", "text", threshold = 0.5, maxBucket = 5)
      .count() shouldBe 0
    MinHash.nearDupPairs(clones, "doc_id", "text", threshold = 0.5, maxBucket = 100)
      .count() shouldBe 15 // C(6,2)
    // the default cap leaves the regular corpus's pairs unchanged
    val pairs = MinHash.nearDupPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Int, Int)].collect().toSet
    val uncapped = MinHash.nearDupPairs(docs, "doc_id", "text", threshold = 0.5,
      maxBucket = Int.MaxValue)
      .select("id_a", "id_b").as[(Int, Int)].collect().toSet
    pairs shouldBe uncapped
  }

  test("simhash banding finds exactly the brute-force hamming pairs") {
    val fps = SimHash.fingerprints(docs, "doc_id", "text")
    val banded = SimHash.nearDupPairsFromFingerprints(fps, "doc_id", maxDist = 10)
      .select("id_a", "id_b").as[(Int, Int)].collect().toSet
    // brute force over the 4 fingerprints
    val raw = fps.collect().map(r => (r.getInt(0), r.getLong(1)))
    val brute = (for {
      (ia, sa) <- raw; (ib, sb) <- raw if ia < ib
      if java.lang.Long.bitCount(sa ^ sb) <= 10
    } yield (ia, ib)).toSet
    banded shouldBe brute
    banded should contain(1 -> 4) // identical docs: distance 0
  }

  test("simhash banded plan contains no cartesian product") {
    val plan = SimHash.nearDupPairs(docs, "doc_id", "text", maxDist = 3)
      .queryExecution.executedPlan.toString
    plan.toLowerCase should not include "cartesian"
  }

  test("ngram jaccard pairs: exact duplicate scores 1.0, near-dup in (0,1)") {
    val pairs = NgramJaccard.jaccardPairs(docs, "doc_id", "text", w = 3, threshold = 0.1)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).toSeq
    pairs.find(p => p._1 == 1 && p._2 == 4).get._3 shouldBe 1.0
    val near = pairs.find(p => p._1 == 1 && p._2 == 2).get._3
    near should be > 0.1
    near should be < 1.0
  }

  test("overlap pairs flag a short doc embedded in a long one that jaccard misses") {
    val short0 = "alpha beta gamma delta epsilon zeta"
    val long0 = s"$short0 " + (1 to 40).map(i => s"filler$i").mkString(" ")
    val corpus = Seq(
      (1, short0), (2, long0), (3, "totally different content here entirely")
    ).toDF("doc_id", "text")
    val ovl = NgramJaccard.overlapPairs(corpus, "doc_id", "text", threshold = 0.8)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).toSeq
    // every shingle of doc 1 appears in doc 2 -> overlap 1.0
    ovl shouldBe Seq((1, 2, 1.0))
    // jaccard at the same cutoff sees nothing (union is the long doc)
    NgramJaccard.jaccardPairs(corpus, "doc_id", "text", threshold = 0.8)
      .count() shouldBe 0L
    graft.api.CacheScope.global.release(blocking = true)
  }

  test("ppjoin prefix filtering is EXACT: equals brute-force all-pairs set jaccard") {
    // a corpus with a deliberately hot shingle ("the the the" appears
    // everywhere) — the DF-capped variant would drop it; PPJoin must
    // still produce exactly the brute-force answer
    val corpus = Seq(
      (1, "the the the spark runs fast on data every day"),
      (2, "the the the spark runs fast on data every night"),
      (3, "the the the cooking pasta recipes with more sauce"),
      (4, "the the the spark runs fast on data every day"),
      (5, "the the the cooking pasta recipes with less sauce"),
      (6, "unrelated words entirely here nothing shared at all")
    ).toDF("doc_id", "text")
    val t = 0.4
    // brute force: distinct shingle sets per doc, all C(n,2) pairs
    graft.functions.GraftFunctions.register(spark)
    val sets = corpus.select($"doc_id",
      array_distinct(call_function("graft_hashed_shingles", $"text", lit(3))).as("hs"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toSet).toMap
    val brute = (for {
      a <- sets.keys.toSeq; b <- sets.keys.toSeq if a < b
      inter = (sets(a) & sets(b)).size.toDouble
      j = inter / (sets(a).size + sets(b).size - inter)
      if j >= t
    } yield (a, b, math.rint(j * 10000) / 10000)).sortBy(p => (p._1, p._2))
    val ppjoin = NgramJaccard.jaccardPairsExact(corpus, "doc_id", "text", w = 3, threshold = t)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).toSeq
      .sortBy(p => (p._1, p._2)) // library path is sort-free; order here for the compare
    ppjoin shouldBe brute
    // the exact-duplicate pair is present at 1.0
    ppjoin.find(p => p._1 == 1 && p._2 == 4).get._3 shouldBe 1.0
  }
}
