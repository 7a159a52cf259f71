package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  test("fit learns the hand-computed merges on a tiny corpus") {
    // words: ab x3, ac x1 -> pair (a,b)=3 wins rank 1; then (a,c)=1
    val docs = Seq("ab ab ab ac").toDF("text")
    val m = BpeTrain.fit(docs, "text", nMerges = 2)
    m.map(x => (x.rank, x.lhs, x.rhs, x.count)) shouldBe
      Seq((1, "a", "b", 3L), (2, "a", "c", 1L))
  }

  test("ties break toward the lexicographically smallest pair") {
    // (a,b) and (c,d) both occur twice -> (a,b) first
    val docs = Seq("ab cd ab cd").toDF("text")
    val m = BpeTrain.fit(docs, "text", nMerges = 1)
    (m.head.lhs, m.head.rhs) shouldBe ("a", "b")
  }

  test("merge application is greedy left-to-right non-overlapping") {
    // 'aaa' with merge (a,a): leftmost pair merges, tail survives
    val enc = BpeTrain.encode(Seq((1L, "aaa")).toDF("id", "text"), "text",
      Seq(BpeTrain.Merge(1, "a", "a", 0L)))
    enc.select("tokens").as[Seq[String]].head() shouldBe Seq("aa", "a")
  }

  test("a later merge can consume an earlier merged token") {
    val merges = Seq(
      BpeTrain.Merge(1, "a", "b", 0L),
      BpeTrain.Merge(2, "ab", "c", 0L))
    val enc = BpeTrain.encode(Seq((1L, "abc abd")).toDF("id", "text"), "text", merges)
    enc.orderBy("id").select("tokens").as[Seq[String]].head() shouldBe
      Seq("abc", "ab", "d")
  }

  test("encode round-trips: concatenated tokens reproduce the words") {
    val docs = Tables("documents").limit(50)
    val merges = BpeTrain.fit(docs, "text", nMerges = 5)
    merges should have size 5
    val r = BpeTrain.encode(docs, "text", merges)
      .select(
        concat_ws("", col("tokens")).as("joined"),
        concat_ws("", filter(split(lower(col("text")), "\\s+"),
          w => w.rlike("^[a-z]+$"))).as("expected"))
      .filter(col("joined") =!= col("expected"))
    r.count() shouldBe 0L
  }

  test("native encode is bit-identical to the chained-replace lambda twin") {
    // real corpus + adversarial rows: repeated pairs, cascading
    // merges, non-letter words, mixed whitespace, empty text
    val tricky = Seq(
      (9001L, "aaa aaaa ab ab abc"),
      (9002L, "ABC MiXeD caSe"),
      (9003L, "num3ric and-hyphen under_score"),
      (9004L, "  leading  double  spaces\tand\ttabs "),
      (9005L, "")).toDF("doc_id", "text")
    val docs = Tables("documents").select("doc_id", "text")
      .unionByName(tricky)
    val merges = BpeTrain.fit(Tables("documents"), "text", nMerges = 10)
    val native = BpeTrain.encode(docs, "text", merges)
      .select(col("doc_id"), array_join(col("tokens"), " ").as("t"))
    val lambda = BpeTrain.encodeLambda(docs, "text", merges)
      .select(col("doc_id"), array_join(col("tokens"), " ").as("t"))
    native.exceptAll(lambda).count() shouldBe 0L
    lambda.exceptAll(native).count() shouldBe 0L
  }

  test("fertilityStats: fully-merged words reach fertility 1") {
    import org.apache.spark.sql.functions.col
    // one word 'ab' everywhere; merge (a,b) makes every word ONE token
    val df = Seq((1L, "g1", "ab ab ab"), (2L, "g1", "ab")).toDF("id", "g", "text")
    val m = Seq(BpeTrain.Merge(1, "a", "b", 0L))
    val r = BpeTrain.fertilityStats(df, "g", "text", m).collect()(0)
    r.getAs[Long]("n_docs") shouldBe 2L
    r.getAs[Double]("fertility") shouldBe 1.0    // 4 tokens / 4 words
    r.getAs[Double]("chars_per_token") shouldBe 2.0
  }

  test("fertilityStats: untrained tokenizer fertility = mean word length") {
    val df = Seq((1L, "g1", "abc de")).toDF("id", "g", "text")
    val r = BpeTrain.fertilityStats(df, "g", "text", Seq.empty).collect()(0)
    r.getAs[Double]("fertility") shouldBe 2.5    // 5 char tokens / 2 words
    r.getAs[Double]("chars_per_token") shouldBe 1.0
  }

  test("training is deterministic across runs") {
    val docs = Tables("documents").limit(80)
    BpeTrain.fit(docs, "text", 4) shouldBe BpeTrain.fit(docs, "text", 4)
  }

  private def Tables(name: String) =
    spark.read.parquet(s"/root/testdata/sf0.001/$name.parquet")
}
