package graft.functions

import graft.SparkSpec
import graft.text.TextFunctions
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

/** Property test: every native text/hash expression must agree
  * BIT-FOR-BIT with its SQL formulation twin on randomly generated
  * strings — including multi-byte and astral code points, consecutive
  * spaces, and empty tokens. All cases are checked in ONE Spark job
  * (fast twin and reference twin as parallel projection columns).
  */
class NativeTextPropertySpec extends SparkSpec {
  import spark.implicits._

  // deterministic ScalaCheck sampling (no Date.now in CI)
  private val seed = rng.Seed(20260812L)

  private val tokenGen: Gen[String] = Gen.oneOf(
    Gen.stringOfN(3, Gen.alphaLowerChar),
    Gen.stringOfN(2, Gen.numChar),
    Gen.oneOf("the", "a", "of", "and", "to", "in", "is", "it"),
    Gen.oneOf("MIX", "x&y", "héllo", "漢字", "a😀b", "", "..", "7seven"))

  private val textGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 12)
    toks <- Gen.listOfN(n, tokenGen)
    sep <- Gen.oneOf(" ", "  ") // double space -> empty tokens
  } yield toks.mkString(sep)

  private val cases: Seq[String] = {
    val params = Gen.Parameters.default
    (0 until 120).flatMap(i => textGen.apply(params, seed.reseed(i.toLong)))
  }

  test("native expressions equal their SQL twins on random strings") {
    graft.functions.GraftFunctions.register(spark)
    val df = cases.toDF("t")
    val toks = TextFunctions.tokens(col("t"))
    val qs = TextFunctions.qualityStats(col("t"))
    val sz = org.apache.spark.sql.functions.size _
    val out = df.select(
      // regex token count
      TextFunctions.regexTokenCount(col("t")).as("re_f"),
      sz(TextFunctions.regexTokens(col("t"))).as("re_r"),
      // whitespace token count
      TextFunctions.wsTokenCount(col("t")).as("ws_f"),
      sz(toks).as("ws_r"),
      // quality stats
      qs.nTokens.as("nt_f"), sz(toks).as("nt_r"),
      qs.meanTokLen.as("ml_f"), TextFunctions.meanTokenLen(toks).as("ml_r"),
      qs.stopRatio.as("sr_f"), TextFunctions.stopwordRatio(toks).as("sr_r"),
      qs.punctRatio.as("pr_f"), TextFunctions.punctRatio(col("t")).as("pr_r"),
      qs.digitRatio.as("dr_f"), TextFunctions.digitRatio(col("t")).as("dr_r"),
      // 60-bit token hashes (SimHash input)
      call_function("graft_token_hashes60", col("t")).as("h_f"),
      expr(graft.dedup.SimHash.tokenHashesExpr("t")).as("h_r"),
      // hashed shingles (MinHash input)
      call_function("graft_hashed_shingles", col("t"), lit(3)).as("s_f"),
      expr(TextFunctions.hashedShinglesSql("t", 3)).as("s_r"),
      // repetition stats (native one-pass vs interpreted HOF twins)
      call_function("graft_repetition_stats", col("t")).as("rep_f"),
      array(
        graft.text.Repetition.dupTokenFrac(col("t")),
        graft.text.Repetition.dupNgramCharFrac(col("t"), 2),
        graft.text.Repetition.dupNgramCharFrac(col("t"), 3),
        graft.text.Repetition.top2gramCharFrac(col("t"))).as("rep_r")).collect()
    out.zip(cases).foreach { case (r, c) =>
      withClue(s"case '$c': ") {
        r.getAs[Int]("re_f") shouldBe r.getAs[Int]("re_r")
        r.getAs[Int]("ws_f") shouldBe r.getAs[Int]("ws_r")
        r.getAs[Int]("nt_f") shouldBe r.getAs[Int]("nt_r")
        r.getAs[Double]("ml_f") shouldBe r.getAs[Double]("ml_r")
        r.getAs[Double]("sr_f") shouldBe r.getAs[Double]("sr_r")
        r.getAs[Double]("pr_f") shouldBe r.getAs[Double]("pr_r")
        r.getAs[Double]("dr_f") shouldBe r.getAs[Double]("dr_r")
        r.getSeq[Long](r.fieldIndex("h_f")) shouldBe r.getSeq[Long](r.fieldIndex("h_r"))
        r.getSeq[Long](r.fieldIndex("s_f")) shouldBe r.getSeq[Long](r.fieldIndex("s_r"))
        r.getSeq[Double](r.fieldIndex("rep_f")) shouldBe r.getSeq[Double](r.fieldIndex("rep_r"))
      }
    }
    cases.count(_.nonEmpty) should be > 50
  }

  test("native contained count equals the SQL filter twin, duplicates included") {
    graft.functions.GraftFunctions.register(spark)
    // shingle arrays from random texts — duplicates arise naturally
    // from repeated tokens in the generator; add explicit dup-heavy
    // pairs to pin the multiset-left semantics
    val pairs = cases.zip(cases.reverse).toDF("ta", "tb")
    val out = pairs.select(
      call_function("graft_contained_count",
        expr(TextFunctions.hashedShinglesSql("ta", 3)),
        expr(TextFunctions.hashedShinglesSql("tb", 3))).as("f"),
      org.apache.spark.sql.functions.size(expr(
        s"filter(${TextFunctions.hashedShinglesSql("ta", 3)}, x -> array_contains(${TextFunctions.hashedShinglesSql("tb", 3)}, x))")).as("r")).collect()
    out.foreach(r => r.getAs[Int]("f") shouldBe r.getAs[Int]("r"))
    val dup = Seq((Seq(1L, 1L, 2L, 3L), Seq(1L, 3L, 9L))).toDF("a", "b")
      .select(call_function("graft_contained_count", col("a"), col("b")).as("n"))
      .collect().head.getInt(0)
    dup shouldBe 3 // 1 (twice, multiset) + 3 — NOT the distinct count 2
    // null slots are skipped (SQL twin's filter drops null predicates);
    // in particular a null slot must not phantom-match a real 0L
    val withNulls = Seq((Seq[java.lang.Long](null, 1L, 0L), Seq[java.lang.Long](0L, 1L, null)))
      .toDF("a", "b")
      .select(call_function("graft_contained_count", col("a"), col("b")).as("n"),
        org.apache.spark.sql.functions.size(
          expr("filter(a, x -> array_contains(b, x))")).as("twin"))
      .collect().head
    withNulls.getInt(0) shouldBe 2 // 1L and 0L, never the null
    withNulls.getInt(0) shouldBe withNulls.getInt(1)
  }

  test("native minhash signatures equal the lambda folds on random strings") {
    graft.functions.GraftFunctions.register(spark)
    val k = 8
    val base = cases.toDF("t")
      .select(expr(TextFunctions.hashedShinglesSql("t", 3)).as("__hs"))
      .filter(org.apache.spark.sql.functions.size(col("__hs")) > 0)
    val sigArr = call_function("graft_minhash_sigs", col("__hs"), lit(k))
    val out = base.select(
      (0 until k).map(i => element_at(sigArr, i + 1).as(s"f_$i")) ++
      (0 until k).map(i =>
        expr(graft.dedup.MinHash.minhashExpr("__hs", i)).as(s"r_$i")): _*).collect()
    out.foreach { r =>
      (0 until k).foreach { i =>
        r.getAs[Long](s"f_$i") shouldBe r.getAs[Long](s"r_$i")
      }
    }
    out.length should be > 30
  }
}
