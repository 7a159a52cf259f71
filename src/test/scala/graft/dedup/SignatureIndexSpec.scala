package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Persisted MinHash signature index: the incremental-ingest dedup
  * path. Parity with the inline cross-pairs form (which the oracle
  * checks), the append lifecycle, and the no-corpus-shuffle plan
  * property that makes it viable against a 100 TB standing corpus.
  */
class SignatureIndexSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    .select(col("doc_id"), col("text"))
  private lazy val corpus = docs.filter(col("doc_id") % 10 =!= 0)
  private lazy val delta = docs.filter(col("doc_id") % 10 === 0)

  private def buildIndex(): String = {
    val dir = java.nio.file.Files.createTempDirectory("sigidx").toString
    SignatureIndex.build(corpus, "doc_id", "text", dir)
    dir
  }

  test("deltaPairs against the persisted index equals the inline form") {
    val dir = buildIndex()
    val persisted = SignatureIndex.deltaPairs(spark, dir, delta, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    val inline = SignatureIndex.crossPairsInline(corpus, delta, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    persisted should not be empty // sf0.01 documents contain near-dups by construction
    persisted shouldBe inline
  }

  test("append folds the delta in; a re-run of the same delta then self-excludes") {
    val dir = buildIndex()
    val before = SignatureIndex.deltaPairs(spark, dir, delta, "doc_id", "text").count()
    SignatureIndex.append(delta, "doc_id", "text", dir)
    // after append the delta docs are corpus members: the same delta
    // re-run must not pair a doc with itself...
    val rerun = SignatureIndex.deltaPairs(spark, dir, delta, "doc_id", "text")
    rerun.filter(col("new_id") === col("corpus_id")).count() shouldBe 0L
    // ...but delta-internal near-dups (doc vs ANOTHER appended doc)
    // may now legitimately appear on top of the originals
    rerun.count() should be >= before
    // and a genuinely new near-dup of an appended doc is found
    val probe = delta.limit(1).select(col("doc_id") + lit(1000000L), col("text"))
      .toDF("doc_id", "text")
    val hits = SignatureIndex.deltaPairs(spark, dir, probe, "doc_id", "text")
    hits.filter(col("jaccard") === 1.0).count() should be >= 1L
  }

  test("corpus index rows pass a delta-bounded broadcast filter before any shuffle") {
    val dir = buildIndex()
    // exchanges exist only after EnsureRequirements (executedPlan) —
    // sparkPlan has none and an assertion there is vacuous; flattenPlan
    // descends through the AQE wrapper and cached subplans.
    val all = flattenPlan(SignatureIndex.deltaPairs(spark, dir, delta, "doc_id", "text")
      .queryExecution.executedPlan)
    def scansIndex(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      flattenPlan(p).exists {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.relation.location.rootPaths.exists(_.toString.contains("sigidx"))
        case _ => false
      }
    def hasBroadcastBelow(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      flattenPlan(p).exists {
        case _: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => true
        case _ => false
      }
    // raw corpus rows must never be shuffle input: any exchange whose
    // subtree reaches an index scan must ALSO contain a broadcast join
    // beneath it (i.e. the rows were already cut to delta-bounded
    // volume — band-key semi-join or candidate join — before moving)
    val exchanges = all.collect {
      case e: ShuffleExchangeExec if scansIndex(e.child) => e
    }
    exchanges should not be empty // the assertion must not be vacuous
    exchanges.filterNot(e => hasBroadcastBelow(e.child)) shouldBe empty
  }

  test("meta round-trips and a mismatched delta cannot silently mis-hash") {
    val dir = java.nio.file.Files.createTempDirectory("sigidx2").toString
    SignatureIndex.build(corpus, "doc_id", "text", dir, k = 16, w = 2, bands = 8)
    SignatureIndex.meta(dir) shouldBe SignatureIndex.Meta(16, 2, 8)
    // deltaPairs reads k/w/bands from _META — the delta hashes with the
    // index's geometry by construction, so parity holds even for
    // non-default build parameters
    val persisted = SignatureIndex.deltaPairs(spark, dir, delta, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    val inline = SignatureIndex.crossPairsInline(corpus, delta, "doc_id", "text",
      k = 16, w = 2, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    persisted shouldBe inline
  }
}
