package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("topNgrams counts and orders corpus 2-grams") {
    val df = Seq("a b a b c", "a b x", "z").toDF("text")
    val got = Corpus.topNgrams(df, "text", w = 2, k = 3)
      .as[(String, Long)].collect().toSeq
    // "a b": 3 (twice in doc0, once in doc1); then ties break on gram asc
    got.head shouldBe ("a b", 3L)
    got should contain ("b a", 1L)
    got.size shouldBe 3
  }

  test("tfIdf ranks rare tokens above common ones") {
    val df = Seq(
      (1L, "common common rare"),
      (2L, "common other"),
      (3L, "common thing")).toDF("doc_id", "text")
    val got = Corpus.tfIdf(df, "doc_id", "text", topK = 2)
      .as[(Long, String, Double, Int)].collect().toSeq
    val doc1 = got.filter(_._1 == 1L)
    // 'common' has df=3 -> idf=ln(1)=0 -> score 0; 'rare' df=1 -> tf*ln(3)
    doc1.head._2 shouldBe "rare"
    doc1.head._3 shouldBe math.rint(math.log(3.0) * 10000) / 10000 +- 1e-9
    // every doc gets at most topK rows, ranks start at 1
    got.groupBy(_._1).values.foreach { rows =>
      rows.map(_._4).sorted shouldBe (1 to rows.size)
    }
  }

  test("decontaminate flags only train docs sharing a w-gram with eval") {
    val df = Seq(
      (1L, "the quick brown fox jumps", "eval"),
      (2L, "the quick brown fox sleeps", "train"), // shares 4-gram "the quick brown fox"
      (3L, "a completely different doc here", "train"),
      (4L, "quick brown fox jumps high", "train")  // shares "quick brown fox jumps"
    ).toDF("doc_id", "text", "split")
    val got = Corpus.decontaminate(df, "doc_id", "text",
      evalPred = col("split") === "eval", w = 4)
      .as[(Long, Long)].collect().toSeq
    got.map(_._1).toSet shouldBe Set(2L, 4L)
    got.foreach { case (_, n) => n shouldBe 1L }
  }

  test("decontaminate matches the DuckDB-twin formulation semantics") {
    // driver-side replay of the same definition on random token soup
    val rng = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d")
    val docs = (0L until 40L).map { i =>
      (i, Seq.fill(6 + rng.nextInt(6))(vocab(rng.nextInt(vocab.size))).mkString(" "),
        if (i < 8) "eval" else "train")
    }
    val df = docs.toDF("doc_id", "text", "split")
    def grams(t: String): Set[String] =
      t.split(" ", -1).toSeq.sliding(4).filter(_.size == 4).map(_.mkString(" ")).toSet
    val evalGrams = docs.filter(_._3 == "eval").flatMap(d => grams(d._2)).toSet
    val expected = docs.filter(_._3 == "train")
      .map(d => d._1 -> grams(d._2).count(evalGrams))
      .filter(_._2 > 0).toMap
    val got = Corpus.decontaminate(df, "doc_id", "text",
      evalPred = col("split") === "eval", w = 4)
      .as[(Long, Long)].collect().toMap
    got.map { case (k, v) => k -> v.toInt } shouldBe expected
  }

  test("contaminationFrac grades overlap per train doc, covers gram-bearing docs") {
    val df = Seq(
      (1L, "the quick brown fox jumps", "eval"),
      (2L, "the quick brown fox sleeps", "train"), // 2 grams, 1 shared -> 0.5
      (3L, "a completely different doc here", "train"), // 2 grams, 0 shared
      (4L, "the quick brown fox jumps", "train"), // exact copy: 2/2 shared
      (5L, "too short", "train") // < w tokens: no gram set, absent
    ).toDF("doc_id", "text", "split")
    val got = Corpus.contaminationFrac(df, "doc_id", "text",
      evalPred = col("split") === "eval", w = 4)
      .as[(Long, Long, Long, Double)].collect()
      .map { case (id, g, s, f) => id -> ((g, s, f)) }.toMap
    got.keySet shouldBe Set(2L, 3L, 4L)
    got(2L) shouldBe ((2L, 1L, 0.5))
    got(3L) shouldBe ((2L, 0L, 0.0))
    got(4L) shouldBe ((2L, 2L, 1.0))
  }

  test("pmiCollocations: a glued pair outranks independent fillers") {
    // "new york" always co-occurs (8 of 8 bigram chances for 'new');
    // 'the'/'a' pair with everything — PMI must rank the glued pair
    // first, and drop sub-minCount pairs entirely
    val docs = Seq.fill(8)("the new york a") ++ Seq.fill(8)("the a rare pair")
    val got = Corpus.pmiCollocations(docs.toDF("text"), "text", minCount = 3, k = 10)
      .as[(String, String, Long, Double)].collect().toSeq
    got.head._1 shouldBe "new"
    got.head._2 shouldBe "york"
    // hand check: c(new york)=8, np=48, c(new)=c(york)=8, n=64
    val expect = math.log((8.0 / 48) / ((8.0 / 64) * (8.0 / 64)))
    got.head._4 shouldBe math.rint(expect * 10000) / 10000 +- 1e-9
    // every returned pair meets the count floor
    got.foreach(_._3 should be >= 3L)
  }

  test("decontaminateBloom: superset of exact, counts upper-bound, no false negatives") {
    val rng = new scala.util.Random(11)
    val vocab = Vector("a", "b", "c", "d", "e")
    val docs = (0L until 60L).map { i =>
      (i, Seq.fill(6 + rng.nextInt(6))(vocab(rng.nextInt(vocab.size))).mkString(" "),
        if (i < 10) "eval" else "train")
    }
    val df = docs.toDF("doc_id", "text", "split")
    val exact = Corpus.decontaminate(df, "doc_id", "text",
      evalPred = col("split") === "eval", w = 4).as[(Long, Long)].collect().toMap
    val bloomed = Corpus.decontaminateBloom(df, "doc_id", "text",
      evalPred = col("split") === "eval", w = 4, fpp = 0.01).as[(Long, Long)].collect().toMap
    // every truly contaminated doc is present with at least its exact count
    exact.foreach { case (id, n) =>
      bloomed.keySet should contain(id)
      bloomed(id) should be >= n
    }
    // at 1% fpp on this tiny gram universe, spurious extras stay rare
    (bloomed.keySet -- exact.keySet).size should be <= 3
  }

  test("importanceSample: deterministic, size-bounded, weight-biased") {
    // target speaks {aa bb}; half the raw docs mimic it, half don't —
    // a Gumbel-top-k draw of 10 must strongly favor the mimics
    val df = ((0L until 5L).map(i => (i, "aa bb aa bb aa bb", "t")) ++
      (100L until 120L).map(i => (i, "aa bb aa bb aa bb", "r")) ++
      (200L until 220L).map(i => (i, "zz yy xx ww vv uu", "r"))).toDF("doc_id", "text", "split")
    def draw(salt: String) = Corpus.importanceSample(df, "doc_id", "text",
      targetPred = col("split") === "t", n = 10, salt = salt)
      .collect().map(_.getLong(0)).toSeq
    val s1 = draw("a")
    s1 shouldBe draw("a") // rerun-identical
    s1.size shouldBe 10
    // scores descend with doc-id tie-break, so membership is top-n exact;
    // across 3 independent salts the mimics dominate the draw
    val picks = Seq("a", "b", "c").flatMap(draw)
    picks.count(_ < 200L) should be > (picks.size * 2 / 3)
    // a different salt draws a different sample (Gumbel actually moves)
    draw("b") should not be s1
  }

  test("importanceWeights ranks target-like raw docs above off-domain ones") {
    import spark.implicits._
    // target speaks {aa,bb}; raw doc 10 mimics it, raw doc 11 doesn't
    val df = Seq(
      (1L, "aa bb aa bb aa", "t"),
      (2L, "bb aa bb aa", "t"),
      (10L, "aa bb aa", "r"),
      (11L, "zz qq zz qq", "r")
    ).toDF("doc_id", "text", "split")
    val w = Corpus.importanceWeights(df, "doc_id", "text",
      targetPred = col("split") === "t", nBuckets = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    w.keySet shouldBe Set(10L, 11L)
    w(10L) should be > w(11L)
    w(10L) should be > 0.0 // in-domain tokens are likelier under target
    w(11L) should be < 0.0 // unseen-in-target tokens are penalized
  }

  test("importanceWeights covers every raw doc exactly once") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val w = Corpus.importanceWeights(docs, "doc_id", "text",
      targetPred = col("lang") === "en")
    val rawCount = docs.filter(col("lang") =!= "en").count()
    w.count() shouldBe rawCount
    w.select("doc_id").distinct().count() shouldBe rawCount
  }

  test("qualityTopQ keeps floor(q*n) per source, best scores first") {
    import spark.implicits._
    // src a: 4 docs with distinct stopword ratios; src b: 2 docs
    val df = Seq(
      (1L, "a", "the and of is"),       // ratio 1.0
      (2L, "a", "the and xx yy"),       // ratio 0.5
      (3L, "a", "the xx yy zz"),        // ratio 0.25
      (4L, "a", "xx yy zz ww"),         // ratio 0.0
      (10L, "b", "the of aa bb"),       // ratio 0.5
      (11L, "b", "aa bb cc dd")         // ratio 0.0
    ).toDF("doc_id", "source", "text")
    val kept = Corpus.qualityTopQ(df, "doc_id", "source", "text", q = 0.5)
      .select("doc_id").as[Long].collect().sorted
    // floor(4*0.5)=2 from a (the two best), floor(2*0.5)=1 from b
    kept shouldBe Array(1L, 2L, 10L)
  }

  test("qualityTopQ ties break on doc id, keeps every source populated") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val kept = Corpus.qualityTopQ(docs, "doc_id", "source", "text", q = 0.4)
    val perSrc = kept.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    full.foreach { case (src, n) =>
      perSrc.getOrElse(src, 0L) shouldBe math.floor(n * 0.4).toLong
    }
    // deterministic across runs (tie-break is total)
    kept.collect().map(_.getLong(0)).sorted shouldBe
      Corpus.qualityTopQ(docs, "doc_id", "source", "text", q = 0.4)
        .collect().map(_.getLong(0)).sorted
  }

  test("zipfFit recovers the slope of an exact power-law corpus") {
    import spark.implicits._
    // token t_r appears round(64 / r) times -> ln f = ln 64 - 1 * ln r
    val words = (1 to 16).flatMap { r =>
      Seq.fill(math.round(64.0 / r).toInt)(f"t$r%02d")
    }
    val df = Seq(words.mkString(" ")).toDF("text")
    val fit = Corpus.zipfFit(df, "text").collect()(0)
    fit.getAs[Double]("alpha") shouldBe -1.0 +- 0.05
    fit.getAs[Double]("r2") should be > 0.99
    fit.getAs[Long]("vocab") shouldBe 16L
    fit.getAs[Long]("n_tokens") shouldBe words.size.toLong
  }

  test("zipfFit rank is exact: a uniform corpus has slope 0") {
    import spark.implicits._
    val df = Seq(((1 to 10).map(i => s"w$i w$i w$i").mkString(" "))).toDF("text")
    val fit = Corpus.zipfFit(df, "text").collect()(0)
    fit.getAs[Double]("alpha") shouldBe 0.0
    fit.getAs[Long]("vocab") shouldBe 10L
  }
}
