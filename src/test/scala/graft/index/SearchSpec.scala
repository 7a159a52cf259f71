package graft.index

import graft.SparkSpec

class SearchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1, "spark is fast"),
    (2, "spark is very fast"),
    (3, "ducks swim in ponds"),
    (4, "spark is fast") // exact dup of 1
  ).toDF("doc_id", "text")

  test("trigram index counts match a hand computation") {
    val idx = TrigramIndexer.index(docs, "doc_id", "text")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // 'spark is fast' has 11 trigrams, all distinct -> 11 buckets of cnt 1
    // (unless two trigrams collide in 512 buckets)
    val d1 = idx.filter(_._1 == 1)
    d1.map(_._3).sum shouldBe 11
    // identical text -> identical sparse rows
    idx.filter(_._1 == 4).map(t => (t._2, t._3)).sorted shouldBe
      d1.map(t => (t._2, t._3)).sorted
  }

  test("native trigram buckets are bit-identical to the SQL substr+md5 chain") {
    val tricky = Seq((1, "Spark IS Fast"), (2, ""), (3, "ab"),
      (4, "héllo wörld"), (5, "  double  spaces  ")).toDF("doc_id", "text")
    graft.functions.GraftFunctions.register(spark)
    import org.apache.spark.sql.functions.{call_function, explode, expr, lit, lower, sequence, substr, when, col => c}
    import org.apache.spark.sql.functions.{length => slen}
    val t = c("__t")
    val sql = tricky.select(c("doc_id"), lower(c("text")).as("__t"))
      .select(c("doc_id"), t,
        explode(when(slen(t) < 3, expr("array()").cast("array<int>"))
          .otherwise(sequence(lit(1), slen(t) - 2))).as("__i"))
      .select(c("doc_id"), TrigramIndexer.bucketOf(substr(t, c("__i"), lit(3))).as("b"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq
    val native = tricky.select(c("doc_id"),
        explode(call_function("graft_trigram_buckets", c("text"), lit(512))).as("b"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq
    native shouldBe sql
  }

  test("queryVector matches the distributed hash pipeline") {
    val qv = TrigramIndexer.queryVector("spark is fast")
    qv.values.sum shouldBe 11
    val idx = TrigramIndexer.index(docs.filter($"doc_id" === 1), "doc_id", "text")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    qv shouldBe idx
  }

  test("searchTrigram ranks exact duplicates of the query at score 1.0") {
    val idx = TrigramIndexer.index(docs, "doc_id", "text")
    val r = Search.searchTrigram(spark, idx, "doc_id", "spark is fast", k = 4)
      .collect().map(r => (r.getInt(0), r.getDouble(1)))
    r.take(2).map(_._1).sorted shouldBe Array(1, 4)
    r.take(2).map(_._2) shouldBe Array(1.0, 1.0)
    // unrelated doc scores lowest or is absent (no shared trigram buckets)
    r.map(_._1) should not contain 3
  }

  test("searchTrigramMmr keeps the id column's original type and survives null text") {
    val withNull = docs.unionByName(
      Seq((5, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val r = Search.searchTrigramMmr(spark, withNull, "doc_id", "text",
      "spark is fast", k = 3, fetchK = 4)
    r.schema("doc_id").dataType.typeName shouldBe "integer"
    val rows = r.collect()
    rows.length shouldBe 3
    Seq(1, 4) should contain(rows.head.getInt(0)) // top pick is an exact dup

    rows.map(_.getAs[Int]("mmr_rank")).toSeq shouldBe Seq(1, 2, 3)
  }

  test("objectText renders reference indexer semantics") {
    import org.apache.spark.sql.functions.col
    val objs = Seq(
      (1, "John", Some(30), Some("likes spark")),
      (2, "Ann", None, Some("likes ducks")),
      (3, "Bo", Some(7), None)
    ).toDF("id", "name", "age", "bio")
    // single attribute, no template → raw value (str(obj[attr]))
    objs.select(Indexer.objectText(Seq("age")).as("t"))
      .as[Option[String]].collect().toSet shouldBe Set(Some("30"), None, Some("7"))
    // several attributes → joined segments, null-valued attrs dropped
    objs.filter(col("id") === 2)
      .select(Indexer.objectText(Seq("name", "age", "bio")).as("t"))
      .as[String].collect().head shouldBe "name: Ann; bio: likes ducks"
    // template → f-string substitution; null renders as Python's "None"
    objs.filter(col("id") === 3)
      .select(Indexer.objectText(Nil, Some("{name} says: {bio}")).as("t"))
      .as[String].collect().head shouldBe "Bo says: None"
  }

  test("multi-attribute search matches on any rendered attribute") {
    val coll = new graft.api.Collection("docs", Seq(
      (1, "alpha", "spark is fast"),
      (2, "spark", "ducks swim in ponds"),
      (3, "gamma", "wholly unrelated words")
    ).toDF("doc_id", "title", "body"))
    // the query hits doc 1 via body and doc 2 via TITLE — a
    // single-column index over body alone would miss doc 2
    val ids = coll.searchObjects("spark", Seq("title", "body"), k = 3)
      .collect().map(_.getInt(0)).toSet
    ids should contain allOf (1, 2)
    val bodyOnly = coll.searchObjects("spark", Seq("body"), k = 3)
      .collect().map(_.getInt(0)).toSet
    bodyOnly should not contain 2
  }

  test("mmr: first pick is most relevant, then diversity kicks in") {
    val q = Array(1.0, 0.0)
    val docsV = IndexedSeq(
      Array(0.9, 0.1),   // 0: most relevant
      Array(0.89, 0.12), // 1: nearly identical to 0 (redundant)
      Array(0.6, 0.8)    // 2: less relevant but diverse
    )
    Search.mmrRerank(q, docsV, relevanceFactor = 0.3).head shouldBe 0
    // diversity-weighted: the diverse doc 2 beats the redundant doc 1
    Search.mmrRerank(q, docsV, relevanceFactor = 0.3) shouldBe Seq(0, 2, 1)
    // pure relevance keeps similarity order
    Search.mmrRerank(q, docsV, relevanceFactor = 1.0) shouldBe Seq(0, 1, 2)
    // topN truncates
    Search.mmrRerank(q, docsV, 0.3, topN = 1) shouldBe Seq(0)
    Search.mmrRerank(q, IndexedSeq.empty, 0.5) shouldBe Nil
  }
}
