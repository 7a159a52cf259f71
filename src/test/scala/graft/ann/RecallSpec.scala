package graft.ann

import graft.SparkSpec
import graft.ann.Matcher.MatchConfig
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Measured recall of every approximate ANN tier against exact brute
  * force, on the real sf0.01 embeddings table (500 × 64-dim). These
  * are the numbers a user tunes nBits/bands/nProbe against — the spec
  * pins a floor so a regression in the banding or probing logic shows
  * up as a recall drop, not just as "tests still pass".
  */
class RecallSpec extends SparkSpec {

  private lazy val emb: DataFrame =
    spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))

  // every 10th vector as the query sample: 50 sources, 500 targets
  private lazy val srcSample: DataFrame = emb.filter(col("vec_id") % 10 === 0)

  test("matcher LSH tier recall@10 vs brute truth on real embeddings") {
    // These embeddings have weakly-similar neighbors (top-10 cosine is
    // far from 1), so sign-LSH recall is chunk-width-sensitive:
    // measured recall@10 is 0.07 at 8-bit chunks (nBits=32, bands=4)
    // but 0.68 at 4-bit chunks (bands=8). That trade-off is the point
    // of recallAtK — tune bands against a brute-truth sample before
    // trusting the approximate tier on a new corpus.
    val cfg = MatchConfig(metric = "cosine", topN = 10)
    val truth = Matcher.findMatchesTopN(srcSample, emb, "vec_id", "embedding", cfg)
    val approx = Matcher.findMatchesLshTopN(srcSample, emb, "vec_id", "embedding", cfg,
      nBits = 32, bands = 8)
    val r = Matcher.recallAtK(truth, approx, 10)
    info(f"matcher LSH recall@10 = $r%.3f (nBits=32, bands=8)")
    r should be >= 0.5
  }

  test("more bands monotonically buy recall in the matcher LSH tier") {
    val cfg = MatchConfig(metric = "cosine", topN = 10)
    val truth = Matcher.findMatchesTopN(srcSample, emb, "vec_id", "embedding", cfg)
    val narrow = Matcher.recallAtK(truth,
      Matcher.findMatchesLshTopN(srcSample, emb, "vec_id", "embedding", cfg,
        nBits = 32, bands = 2), 10)
    val wide = Matcher.recallAtK(truth,
      Matcher.findMatchesLshTopN(srcSample, emb, "vec_id", "embedding", cfg,
        nBits = 32, bands = 8), 10)
    info(f"recall@10: 2 bands = $narrow%.3f, 8 bands = $wide%.3f")
    wide should be >= narrow
  }

  test("single-query tiers: multi-probe >= plain LSH, IVF finds most of top-10") {
    val qid = 0L
    def ids(df: DataFrame): Set[Long] = df.collect().map(_.getLong(0)).toSet
    val truth = ids(Knn.bruteForceTopK(emb, "vec_id", "embedding", qid, k = 10))
    val lsh = ids(Knn.lshTopK(emb, "vec_id", "embedding", qid, k = 10,
      nBits = 32, bands = 4))
    val multi = ids(Knn.lshTopKMultiProbe(emb, "vec_id", "embedding", qid, k = 10,
      nBits = 32, bands = 4))
    val ivf = ids(Knn.ivfTopK(emb, "vec_id", "embedding", qid, k = 10,
      nCells = 16, nProbe = 4))
    val rLsh = (truth & lsh).size / 10.0
    val rMulti = (truth & multi).size / 10.0
    val rIvf = (truth & ivf).size / 10.0
    info(f"single-query recall@10: lsh=$rLsh%.2f multiprobe=$rMulti%.2f ivf=$rIvf%.2f")
    rMulti should be >= rLsh
    rIvf should be >= 0.5
  }

  // ---- the same floors at sf1 (10x corpus density) ----------------
  // Recall of a fixed banding/probing config DRIFTS with corpus
  // density: more vectors per bucket means the verified candidate set
  // holds more near-ties, and a floor pinned only at 500 rows says
  // nothing about the 20k-row regime. sf1 is generated
  // (graft.GenScale) and gitignored, so these cancel (assume) rather
  // than fail when it hasn't been generated in this checkout.
  private val sf1Dir = "/root/repo/testdata/sf1/embeddings.parquet"
  private def sf1Present = java.nio.file.Files.exists(java.nio.file.Paths.get(sf1Dir))
  private lazy val emb1: DataFrame =
    spark.read.parquet(sf1Dir).select(col("vec_id"), col("embedding"))
  // every 100th vector: 200 sources against 20k targets keeps the
  // brute-force truth sample test-sized at 10x data
  private lazy val srcSample1: DataFrame = emb1.filter(col("vec_id") % 100 === 0)

  test("sf1: matcher LSH tier holds its recall@10 floor at 10x density") {
    assume(sf1Present, s"$sf1Dir not generated (run graft.GenScale)")
    val cfg = MatchConfig(metric = "cosine", topN = 10)
    val truth = Matcher.findMatchesTopN(srcSample1, emb1, "vec_id", "embedding", cfg)
    val approx = Matcher.findMatchesLshTopN(srcSample1, emb1, "vec_id", "embedding", cfg,
      nBits = 32, bands = 8)
    val r = Matcher.recallAtK(truth, approx, 10)
    info(f"sf1 matcher LSH recall@10 = $r%.3f (nBits=32, bands=8)")
    r should be >= 0.5
  }

  test("sf1: single-query tiers hold their floors at 10x density") {
    assume(sf1Present, s"$sf1Dir not generated (run graft.GenScale)")
    val qid = 0L
    def ids(df: DataFrame): Set[Long] = df.collect().map(_.getLong(0)).toSet
    val truth = ids(Knn.bruteForceTopK(emb1, "vec_id", "embedding", qid, k = 10))
    val multi = ids(Knn.lshTopKMultiProbe(emb1, "vec_id", "embedding", qid, k = 10,
      nBits = 32, bands = 4))
    val ivf = ids(Knn.ivfTopK(emb1, "vec_id", "embedding", qid, k = 10,
      nCells = 16, nProbe = 4))
    val rMulti = (truth & multi).size / 10.0
    val rIvf = (truth & ivf).size / 10.0
    info(f"sf1 single-query recall@10: multiprobe=$rMulti%.2f ivf=$rIvf%.2f")
    rIvf should be >= 0.5
  }

  test("sf1: embedding near-dup banding holds recall vs exact pairs at 10x density") {
    assume(sf1Present, s"$sf1Dir not generated (run graft.GenScale)")
    // the q_embed_dedup_recall shape, inlined at spec scale: a bounded
    // slice + exact copy; banded pairs must recover ~all exact-dup
    // pairs even though widthForCount picks a wider chunk here
    val slice = emb1.filter(col("vec_id") < 500)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val dup = slice.select((col("vec_id") + lit(100000L)).as("vec_id"), col("embedding"))
    val corpus = slice.unionByName(dup)
    val pairs = Knn.nearDupPairs(corpus, "vec_id", "embedding", threshold = 0.9999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = slice.select("vec_id").collect().map(_.getLong(0))
      .map(i => (i, i + 100000L)).toSet
    (expected -- pairs) shouldBe empty
  }

  test("recallAtK is 1.0 against itself and handles empty approx") {
    val cfg = MatchConfig(metric = "cosine", topN = 5)
    val truth = Matcher.findMatchesTopN(srcSample, emb, "vec_id", "embedding", cfg)
    Matcher.recallAtK(truth, truth, 5) shouldBe 1.0
    Matcher.recallAtK(truth, truth.filter(lit(false)), 5) shouldBe 0.0
  }
}
