package graft.index

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark is fast and spark is distributed"),
    (2L, "duck walks slowly"),
    (3L, "fast spark"),
    (4L, "nothing relevant here at all whatsoever today")
  ).toDF("doc_id", "text")

  test("hand-computed BM25 on a tiny corpus") {
    // query "spark": df=2, N=4, idf = ln(1 + (4-2+0.5)/(2+0.5)) = ln(2)
    // avgdl = (7+3+2+7)/4 = 4.75
    // doc1: tf=2, dl=7 -> ln2 * 2*2.2/(2 + 1.2*(0.25+0.75*7/4.75))
    val out = Bm25.search(docs, "doc_id", "text", "spark", k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    def score(tf: Double, dl: Double, dfT: Double, n: Double = 4.0, avg: Double = 4.75) = {
      val idf = math.log(1 + (n - dfT + 0.5) / (dfT + 0.5))
      BigDecimal(idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avg)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    out.toMap shouldBe Map(1L -> score(2, 7, 2), 3L -> score(1, 2, 2))
    // the length normalization out-ranks doc 3 (tf=1, dl=2) over
    // doc 1 (tf=2, dl=7): BM25's point vs raw tf
    out.head._1 shouldBe 3L
  }

  test("hybridRrf fuses lexical and trigram rankings with 1/(c+rank)") {
    val out = Search.hybridRrf(spark, docs, "doc_id", "text", "fast spark", k = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    graft.api.CacheScope.global.release()
    out.length should be >= 2
    // every fused row matches sum of its reciprocal-rank terms
    out.foreach { case (_, rb, rc, rrf) =>
      val expect = (if (rb > 0) 1.0 / (60 + rb) else 0.0) +
        (if (rc > 0) 1.0 / (60 + rc) else 0.0)
      rrf shouldBe BigDecimal.decimal(expect)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble +- 1e-9
      (rb > 0 || rc > 0) shouldBe true
    }
    // a doc ranked top by BOTH retrievers must out-score single-list docs
    val both = out.filter(r => r._2 > 0 && r._3 > 0)
    val single = out.filter(r => r._2 == 0 || r._3 == 0)
    if (both.nonEmpty && single.nonEmpty)
      both.map(_._4).max should be > single.map(_._4).max
  }

  test("docs matching no query term are dropped; k caps the result") {
    val out = Bm25.search(docs, "doc_id", "text", "spark fast", k = 2)
      .select("doc_id").as[Long].collect().toSeq
    out should have size 2
    out should not contain 4L
  }

  test("rarer terms out-rank common terms via idf") {
    val corpus = (Seq((10L, "common rare"), (11L, "common other")) ++
      (12L to 20L).map(i => (i, "common filler"))).toDF("doc_id", "text")
    val out = Bm25.search(corpus, "doc_id", "text", "common rare", k = 3)
      .select("doc_id").as[Long].collect().toSeq
    // doc 10 matches both terms, and 'rare' (df=1) dominates
    out.head shouldBe 10L
  }

  test("plan shape: one broadcast of the 1-row stats, top-k without global sort") {
    // parquet-backed input (a LocalRelation constant-folds the whole
    // query away at optimization time, hiding the plan under test)
    val dir = java.nio.file.Files.createTempDirectory("bm25").toString
    docs.write.mode("overwrite").parquet(dir)
    // caller-owned scope keeps the LAZY plan observable (the no-scope
    // path materializes the top-k eagerly and returns a LocalRelation
    // so its short-lived cache can release before returning)
    val scope = new graft.api.CacheScope
    val df = Bm25.search(spark.read.parquet(dir), "doc_id", "text",
      "spark fast", k = 5, scope = scope)
    try df.collect()
    finally {}
    val nodes = flattenPlan(df.queryExecution.executedPlan).map(_.nodeName)
    nodes should contain("TakeOrderedAndProject")
    nodes should contain("BroadcastNestedLoopJoin")
    // the only shuffle is the single-partition 1-row stats aggregate,
    // never the corpus
    val shuffles = flattenPlan(df.queryExecution.executedPlan).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    shuffles.map(_.outputPartitioning.numPartitions) shouldBe Seq(1)
    scope.release()
  }

  test("no-scope search leaves nothing cached behind (no session cache leak)") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Bm25.search(docs, "doc_id", "text", "spark", k = 3).collect()
    val after = spark.sparkContext.getPersistentRDDs.keySet
    (after -- before) shouldBe empty
  }
}
