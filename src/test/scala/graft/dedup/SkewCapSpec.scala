package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The skew contract the 100 TB dedup story depends on: ONE hot key
  * (a boilerplate shingle / template band bucket / shared-passage
  * fingerprint) must not make a pair-finder quadratic. Each test
  * builds a corpus where every document shares the hot key, and pins
  * BOTH sides of the contract: with the cap the hot key contributes
  * zero pairs (join output bounded), and without it the same corpus
  * explodes to all n·(n−1)/2 pairs — proof the cap is load-bearing,
  * not decorative.
  */
class SkewCapSpec extends SparkSpec {
  import spark.implicits._

  private val n = 60
  private val allPairs = n * (n - 1) / 2

  test("ngram jaccard: a corpus-wide hot shingle is dropped by the df cap") {
    // unique 10-token body per doc + a shared 30-token phrase: every
    // pair's shared shingles come only from the phrase
    val phrase = (1 to 30).map(i => s"common$i").mkString(" ")
    val docs = (1 to n).map { d =>
      (d.toLong, (1 to 10).map(i => s"u${d}x$i").mkString(" ") + " " + phrase)
    }.toDF("doc_id", "text")
    val scope = new graft.api.CacheScope
    try {
      // uncapped: every pair crosses the threshold via the hot phrase
      NgramJaccard.jaccardPairs(docs, "doc_id", "text",
        threshold = 0.5, maxDf = 1000000, scope = scope)
        .count() shouldBe allPairs
      // capped far below n: the hot postings vanish, zero pairs form
      NgramJaccard.jaccardPairs(docs, "doc_id", "text",
        threshold = 0.5, maxDf = 10, scope = scope)
        .count() shouldBe 0
    } finally scope.release()
  }

  test("minhash lsh: a template-spam band bucket beyond the cap is dropped") {
    // n exact copies of one template: all bands collide for all docs
    val docs = (1 to n).map(d =>
      (d.toLong, "the same template text repeated verbatim for every row"))
      .toDF("doc_id", "text")
    MinHash.nearDupPairs(docs, "doc_id", "text", maxBucket = 1000000)
      .count() shouldBe allPairs
    MinHash.nearDupPairs(docs, "doc_id", "text", maxBucket = 10)
      .count() shouldBe 0
  }

  test("winnow: a shared-passage fingerprint bucket beyond the cap is dropped") {
    // unique body + a 20-token shared passage (well past the
    // w+window-1 guarantee, so every doc shares >= minShared
    // fingerprints with every other)
    val passage = (1 to 20).map(i => s"shared$i").mkString(" ")
    val docs = (1 to n).map { d =>
      (d.toLong, (1 to 8).map(i => s"u${d}y$i").mkString(" ") + " " + passage)
    }.toDF("doc_id", "text")
    Winnow.sharedFingerprintPairs(docs, "doc_id", "text", maxBucket = 1000000)
      .count() shouldBe allPairs
    Winnow.sharedFingerprintPairs(docs, "doc_id", "text", maxBucket = 10)
      .count() shouldBe 0
  }
}
