package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val nums = spark.range(0, 10000)
    .select(col("id"), (col("id") % 100).as("m"), (col("id") % 7).as("s"))

  test("approxDistinct: one aggregation, within HLL rsd of the exact counts") {
    val r = Sketches.approxDistinct(nums, Seq("id", "m", "s"), rsd = 0.02).collect().head
    r.getAs[Long]("id_distinct").toDouble shouldBe 10000.0 +- 10000 * 0.05
    r.getAs[Long]("m_distinct").toDouble shouldBe 100.0 +- 8
    r.getAs[Long]("s_distinct") shouldBe 7
  }

  test("approxQuantiles: one row per column, values near exact quantiles") {
    val rows = Sketches.approxQuantiles(nums, Seq("id", "m"), Seq(0.1, 0.5, 0.9))
      .collect().map(r => r.getAs[String]("column") ->
        r.getAs[scala.collection.Seq[Double]]("quantiles")).toMap
    rows.keySet shouldBe Set("id", "m")
    val idQ = rows("id")
    idQ(0) shouldBe 1000.0 +- 50
    idQ(1) shouldBe 5000.0 +- 50
    idQ(2) shouldBe 9000.0 +- 50
    an[IllegalArgumentException] should be thrownBy Sketches.approxQuantiles(nums, Nil)
  }

  test("frequentItems surfaces the heavy hitter") {
    val skewed = spark.range(0, 1000)
      .select(when(col("id") < 600, lit("hot")).otherwise(concat(lit("v"), col("id"))).as("k"))
    val items = Sketches.frequentItems(skewed, Seq("k"), support = 0.3)
      .collect().head.getAs[scala.collection.Seq[String]]("k_freqItems")
    items should contain("hot")
  }

  test("cmsTopK: estimates dominate exact counts; exact at generous width") {
    import spark.implicits._
    val docs = Seq(
      "hot hot hot hot warm warm cold",
      "hot hot warm tepid",
      "hot cold").toDF("text")
    val out = Sketches.cmsTopK(docs, "text", k = 3, depth = 4, width = 4096)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    graft.api.CacheScope.global.release()
    // exact top-3 by count, ties lexicographic
    out.map(t => (t._1, t._2)).toSeq shouldBe Seq(("hot", 7L), ("warm", 3L), ("cold", 2L))
    // CMS guarantee: est >= exact; at width 4096 over 5 tokens, exact
    out.foreach { case (_, exact, est) => est shouldBe exact }
  }

  test("cmsTopK: narrow width over-estimates but never under-estimates") {
    import spark.implicits._
    val docs = (1 to 50).map(i => s"tok$i common common").toDF("text")
    val out = Sketches.cmsTopK(docs, "text", k = 5, depth = 2, width = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    graft.api.CacheScope.global.release()
    out.foreach { case (_, exact, est) => est should be >= exact }
    // 150 tokens into 2x4 cells: collisions are certain somewhere
    out.head._1 shouldBe "common"
    out.head._2 shouldBe 100L
  }

  private lazy val manyKeys = spark.range(0, 12000)
    .select(col("id"), (col("id") % 3).cast("string").as("g"))

  test("hllDistinct: per-group estimate within the m=256 error envelope") {
    val rows = Sketches.hllDistinct(manyKeys, "id", "g", p = 8)
      .collect().map(r => r.getAs[String]("g") ->
        (r.getAs[Long]("exact_distinct"), r.getAs[Double]("rel_err"))).toMap
    rows.keySet shouldBe Set("0", "1", "2")
    rows.values.foreach { case (exact, relErr) =>
      exact shouldBe 4000L
      // stderr 1.04/sqrt(256) = 6.5%; 4 sigma = 26%
      relErr should be < 0.26
    }
  }

  test("hllDistinct: invariant under repartitioning (order-free integer registers)") {
    val a = Sketches.hllDistinct(manyKeys, "id", "g", p = 8).collect().toSet
    val b = Sketches.hllDistinct(manyKeys.repartition(7), "id", "g", p = 8).collect().toSet
    a shouldBe b
  }

  test("hllUnionMerge: merged per-group registers estimate the union BIT-identically") {
    val r = Sketches.hllUnionMerge(manyKeys, "id", "g", p = 8).collect().head
    r.getAs[Long]("exact_distinct") shouldBe 12000L
    r.getAs[Int]("merge_exact") shouldBe 1
    r.getAs[Double]("merged_est") shouldBe r.getAs[Double]("direct_est")
    math.abs(r.getAs[Double]("direct_est") - 12000.0) / 12000.0 should be < 0.26
  }

  test("kmvDistinct: exact below k, tail-estimates above k within 4 sigma") {
    // small group (n < k) reports exactly
    val small = spark.range(0, 30).select(col("id"), lit("s").as("g"))
    val sr = Sketches.kmvDistinct(small, "id", "g", k = 64).collect().head
    sr.getAs[Long]("exact_distinct") shouldBe 30L
    sr.getAs[Double]("kmv_est") shouldBe 30.0
    sr.getAs[Double]("rel_err") shouldBe 0.0
    // large groups engage (k-1)/U(k); stderr ~ 1/sqrt(k-2) = 12.7%
    val rows = Sketches.kmvDistinct(manyKeys, "id", "g", k = 64)
      .collect().map(r => r.getAs[String]("g") -> r.getAs[Double]("rel_err")).toMap
    rows.keySet shouldBe Set("0", "1", "2")
    rows.values.foreach(_ should be < 0.51)
  }

  test("kmvDistinct / quantileSketch: NULL keys are dropped, not ranked (engine null-order hazard)") {
    import spark.implicits._
    val withNulls = spark.range(0, 40).select(
      lit("g").as("g"),
      when(col("id") % 4 === 0, lit(null)).otherwise(col("id")).cast("string").as("k"),
      col("id").cast("double").as("v"),
      when(col("id") % 4 === 0, lit(null)).otherwise(col("id")).as("id2"))
    val kd = Sketches.kmvDistinct(withNulls, "k", "g", k = 64).collect().head
    kd.getAs[Long]("exact_distinct") shouldBe 30L // 10 null keys excluded
    val qs = Sketches.quantileSketch(withNulls, "g", "v", "id2", n = 256).collect().head
    qs.getAs[Long]("n_sample") shouldBe 30L // sample keyed on non-null ids only
    qs.getAs[Long]("n") shouldBe 40L // exact audit still covers every value
  }

  test("kmvDistinct: invariant under repartitioning") {
    val a = Sketches.kmvDistinct(manyKeys, "id", "g", k = 64).collect().toSet
    val b = Sketches.kmvDistinct(manyKeys.repartition(5), "id", "g", k = 64).collect().toSet
    a shouldBe b
  }

  test("kmvJaccard: exact extremes and a sane mid-range estimate") {
    import spark.implicits._
    // two identical corpora, one disjoint
    val base = (1 to 40).map(i => s"w${i} w${i + 1} w${i + 2} w${i + 3} w${i + 4}")
    val docs = (base.map(("ga", _)) ++ base.map(("gb", _)) ++
      (1 to 40).map(i => ("gc", s"z${i} z${i + 1} z${i + 2} z${i + 3} z${i + 4}")))
      .toDF("source", "text")
    val rows = Sketches.kmvJaccard(docs, "source", "text", w = 3, k = 16)
      .collect().map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        (r.getAs[Double]("exact_j"), r.getAs[Double]("kmv_j"))).toMap
    rows.keySet shouldBe Set(("ga", "gb"), ("ga", "gc"), ("gb", "gc"))
    rows(("ga", "gb")) shouldBe ((1.0, 1.0)) // identical sets: both exact
    rows(("ga", "gc"))._1 shouldBe 0.0
    rows(("ga", "gc"))._2 shouldBe 0.0 // disjoint: no shared hash can enter K
    // half-overlapping corpora: estimate lands within the k=16 noise of exact
    val half = (1 to 40).map(i => ("gx", s"w${i} w${i + 1} w${i + 2}")) ++
      (21 to 60).map(i => ("gy", s"w${i} w${i + 1} w${i + 2}"))
    val hr = Sketches.kmvJaccard(half.toDF("source", "text"), "source", "text", w = 3, k = 16)
      .collect().head
    math.abs(hr.getAs[Double]("exact_j") - hr.getAs[Double]("kmv_j")) should be < 0.35
    hr.getAs[Double]("abs_err") shouldBe
      BigDecimal(math.abs(hr.getAs[Double]("exact_j") - hr.getAs[Double]("kmv_j")).toString)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("hllRegisterTable: parquet round-trip + max-merge of day shards equals direct sketching") {
    import spark.implicits._
    // two "days" with overlapping users
    val day1 = (0 until 5000).map(i => ("d", s"u${i % 1500}")).toDF("g", "u")
    val day2 = (0 until 5000).map(i => ("d", s"u${i % 2300 + 700}")).toDF("g", "u")
    val dir = java.nio.file.Files.createTempDirectory("hllregs").toString
    Sketches.hllRegisterTable(day1, "u", Seq("g")).write.parquet(s"$dir/day=1")
    Sketches.hllRegisterTable(day2, "u", Seq("g")).write.parquet(s"$dir/day=2")
    // reload BOTH shards, merge by max(r), estimate — no raw rescan
    val merged = spark.read.parquet(s"$dir/day=1").unionByName(spark.read.parquet(s"$dir/day=2"))
      .groupBy("g", "idx").agg(max("r").as("r"))
    val rollup = Sketches.hllEstimateTable(merged, Seq("g"))
      .collect().head.getAs[Double]("est")
    val direct = Sketches.hllEstimateTable(
      Sketches.hllRegisterTable(day1.unionByName(day2), "u", Seq("g")), Seq("g"))
      .collect().head.getAs[Double]("est")
    rollup shouldBe direct // bit-exact: max-merge == direct registers
    // true union distinct = u0..u2999 = 3000
    math.abs(rollup - 3000.0) / 3000.0 should be < 0.26
  }

  test("hllMergeRegisterTables: provenance-preserving merge — re-stamps hll_p, fails fast on a p mismatch") {
    import spark.implicits._
    val day1 = (0 until 4000).map(i => ("d", s"u${i % 1200}")).toDF("g", "u")
    val day2 = (0 until 4000).map(i => ("d", s"u${i % 1900 + 600}")).toDF("g", "u")
    val shards = Sketches.hllRegisterTable(day1, "u", Seq("g"))
      .unionByName(Sketches.hllRegisterTable(day2, "u", Seq("g")))
    val merged = Sketches.hllMergeRegisterTables(shards, Seq("g"))
    // the merge KEEPS provenance (the round-12 ADVICE asymmetry: an
    // ad-hoc max-merge drops hll_p and disarms the read-path guard)
    merged.columns should contain("hll_p")
    merged.select("hll_p").distinct().collect().map(_.getInt(0)) shouldBe Array(8)
    // merged estimate == direct sketching of the union, through the
    // GUARDED read path (hll_p present and validated end to end)
    val rollup = Sketches.hllEstimateTable(merged, Seq("g"))
      .collect().head.getAs[Double]("est")
    val direct = Sketches.hllEstimateTable(
      Sketches.hllRegisterTable(day1.unionByName(day2), "u", Seq("g")), Seq("g"))
      .collect().head.getAs[Double]("est")
    rollup shouldBe direct
    // a shard written at a different p fails the MERGE, not just the read
    val wrongP = Sketches.hllRegisterTable(day2, "u", Seq("g"), p = 10)
    val ex = intercept[Exception] {
      Sketches.hllMergeRegisterTables(
        Sketches.hllRegisterTable(day1, "u", Seq("g")).unionByName(wrongP),
        Seq("g")).collect()
    }
    ex.getMessage should include("hll_p mismatch")
  }

  test("sketchTuning: an empty/all-null-key corpus fails fast (engines would disagree on the degenerate input)") {
    import spark.implicits._
    val empty = Seq.empty[(String, String)].toDF("g", "k")
    val ex = intercept[IllegalArgumentException] {
      Sketches.sketchTuning(empty, "k")
    }
    ex.getMessage should include("empty corpus")
    val allNull = Seq(("a", null: String), ("b", null: String)).toDF("g", "k")
    intercept[IllegalArgumentException] {
      Sketches.sketchTuning(allNull, "k")
    }
  }

  test("quantileSketch: bottom-n hash sample tracks exact quantiles; small groups are exact") {
    import spark.implicits._
    // uniform [0, 10000): sample-p50 error ~ 1/(2 sqrt(256)) of the range
    val vals = (0 until 8000).map(i => ((i % 2).toString, ((i * 37) % 10000).toDouble, i.toLong))
      .toDF("g", "v", "id")
    val rows = Sketches.quantileSketch(vals, "g", "v", "id", n = 256)
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    rows.keySet shouldBe Set("0", "1")
    rows.values.foreach { r =>
      r.getAs[Long]("n") shouldBe 4000L
      r.getAs[Long]("n_sample") shouldBe 256L
      r.getAs[Double]("p50_err") should be < 1000.0 // 4 sigma on the value scale
      r.getAs[Double]("p90_err") should be < 1000.0
    }
    // a group smaller than n: the "sample" is the whole group -> exact
    val tiny = (0 until 50).map(i => ("t", i.toDouble, i.toLong)).toDF("g", "v", "id")
    val t = Sketches.quantileSketch(tiny, "g", "v", "id", n = 256).collect().head
    t.getAs[Long]("n_sample") shouldBe 50L
    t.getAs[Double]("p50_err") shouldBe 0.0
    t.getAs[Double]("p90_err") shouldBe 0.0
  }

  test("quantileSketch: invariant under repartitioning (hash sample, not RNG)") {
    import spark.implicits._
    val vals = (0 until 3000).map(i => ("a", (i * 7 % 977).toDouble, i.toLong))
      .toDF("g", "v", "id")
    val a = Sketches.quantileSketch(vals, "g", "v", "id", n = 128).collect().toSet
    val b = Sketches.quantileSketch(vals.repartition(9), "g", "v", "id", n = 128).collect().toSet
    a shouldBe b
  }

  test("scala hash twins equal their md5-hex-parse definitions (byte-math regression pin)") {
    val md = java.security.MessageDigest.getInstance("MD5")
    for (s <- Seq("hello", "a", "", "token42", "日本語", "u1234567")) {
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      graft.index.TrigramIndexer.hash60(s) shouldBe
        java.lang.Long.parseLong(hex.substring(0, 15), 16)
      Sketches.cmsBaseHash(s) shouldBe
        java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
  }

  test("kmvSignatureTable: parquet round-trip + bottom-k merge of day shards equals direct sketching") {
    import spark.implicits._
    val day1 = (0 until 5000).map(i => ("d", s"u${i % 1500}")).toDF("g", "u")
    val day2 = (0 until 5000).map(i => ("d", s"u${i % 2300 + 700}")).toDF("g", "u")
    val dir = java.nio.file.Files.createTempDirectory("kmvsigs").toString
    Sketches.kmvSignatureTable(day1, "u", Seq("g"), k = 64).write.parquet(s"$dir/day=1")
    Sketches.kmvSignatureTable(day2, "u", Seq("g"), k = 64).write.parquet(s"$dir/day=2")
    // reload BOTH shards, merge by bottom-k of the concatenation — no raw rescan
    val shards = spark.read.parquet(s"$dir/day=1").unionByName(spark.read.parquet(s"$dir/day=2"))
    val merged = Sketches.kmvMergeSignatures(shards, Seq("g"), k = 64)
    val direct = Sketches.kmvSignatureTable(day1.unionByName(day2), "u", Seq("g"), k = 64)
    val mSig = merged.collect().head.getAs[scala.collection.Seq[Long]]("sig").toSeq
    val dSig = direct.collect().head.getAs[scala.collection.Seq[Long]]("sig").toSeq
    mSig shouldBe dSig // bit-exact: bottomK(bottomK(A) ∪ bottomK(B)) == bottomK(A ∪ B)
    // estimate from the merged rollup equals kmvDistinct's kmv_est on the union
    val rollupEst = Sketches.kmvEstimateTable(merged, Seq("g"), k = 64)
      .collect().head.getAs[Double]("kmv_est")
    val live = Sketches.kmvDistinct(day1.unionByName(day2), "u", "g", k = 64)
      .collect().head.getAs[Double]("kmv_est")
    rollupEst shouldBe live
    // true union distinct = u0..u2999 = 3000; k=64 → stderr ~1/√62
    math.abs(rollupEst - 3000.0) / 3000.0 should be < 0.55
  }

  test("quantileSampleTable: parquet round-trip + bottom-n merge of day shards equals direct sampling") {
    import spark.implicits._
    // two "days" of (group, value, id) rows — ids disjoint across days
    val day1 = (0 until 4000).map(i => ("d", ((i * 37) % 10000).toDouble, i.toLong))
      .toDF("g", "v", "id")
    val day2 = (0 until 4000).map(i => ("d", ((i * 53) % 10000).toDouble, (i + 100000).toLong))
      .toDF("g", "v", "id")
    val dir = java.nio.file.Files.createTempDirectory("qsamples").toString
    Sketches.quantileSampleTable(day1, "g", "v", "id", n = 256).write.parquet(s"$dir/day=1")
    Sketches.quantileSampleTable(day2, "g", "v", "id", n = 256).write.parquet(s"$dir/day=2")
    val shards = spark.read.parquet(s"$dir/day=1").unionByName(spark.read.parquet(s"$dir/day=2"))
    val merged = Sketches.quantileMergeSamples(shards, Seq("g"), n = 256)
    // provenance survives the merge
    merged.columns should contain("qs_n")
    val direct = Sketches.quantileSampleTable(day1.unionByName(day2), "g", "v", "id", n = 256)
    val mS = merged.collect().head.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("sample").toSeq
    val dS = direct.collect().head.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("sample").toSeq
    mS shouldBe dS // bit-exact: bottomN(bottomN(A) ∪ bottomN(B)) == bottomN(A ∪ B)
    // estimates from the merged rollup equal quantileSketch's est columns on the union
    val est = Sketches.quantileEstimateFromSamples(merged, "g", n = 256)
      .collect().head
    val live = Sketches.quantileSketch(day1.unionByName(day2), "g", "v", "id", n = 256)
      .collect().head
    est.getAs[Long]("n_sample") shouldBe live.getAs[Long]("n_sample")
    est.getAs[Double]("p50_est") shouldBe live.getAs[Double]("p50_est")
    est.getAs[Double]("p90_est") shouldBe live.getAs[Double]("p90_est")
    // a WIDER sample answers a narrower n by prefix, bit-exactly
    val wide = Sketches.quantileSampleTable(day1.unionByName(day2), "g", "v", "id", n = 512)
    val narrowFromWide = Sketches.quantileEstimateFromSamples(wide, "g", n = 256)
      .collect().head
    narrowFromWide.getAs[Double]("p50_est") shouldBe live.getAs[Double]("p50_est")
    // reading WIDER than written fails fast on provenance
    val ex = intercept[Exception] {
      Sketches.quantileEstimateFromSamples(
        Sketches.quantileSampleTable(day1, "g", "v", "id", n = 64), "g", n = 256).collect()
    }
    ex.getMessage should include("qs_n mismatch")
  }

  test("kmvEstimateTable: a wider signature answers a narrower k (prefix cut); below-k groups are exact") {
    import spark.implicits._
    val df = (0 until 4000).map(i => ("big", s"k${i % 800}")).toDF("g", "u")
      .unionByName((0 until 20).map(i => ("tiny", s"k$i")).toDF("g", "u"))
    val wide = Sketches.kmvSignatureTable(df, "u", Seq("g"), k = 256)
    val atNarrow = Sketches.kmvEstimateTable(wide, Seq("g"), k = 64)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("kmv_est")).toMap
    val direct = Sketches.kmvDistinct(df, "u", "g", k = 64)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("kmv_est")).toMap
    atNarrow shouldBe direct
    atNarrow("tiny") shouldBe 20.0 // below k: exact
  }

  test("kmv_k / hll_p provenance guards fail fast on a width mismatch") {
    import spark.implicits._
    val df = (0 until 1000).map(i => ("g", s"u$i")).toDF("g", "u")
    // KMV: a k=32 shard cannot answer a k=64 read
    val narrow = Sketches.kmvSignatureTable(df, "u", Seq("g"), k = 32)
    an[Exception] should be thrownBy
      Sketches.kmvMergeSignatures(narrow, Seq("g"), k = 64).collect()
    an[Exception] should be thrownBy
      Sketches.kmvEstimateTable(narrow, Seq("g"), k = 64).collect()
    // but re-reading at the written width (or narrower) is fine
    Sketches.kmvEstimateTable(narrow, Seq("g"), k = 32).collect().length shouldBe 1
    // HLL: registers written at p=8 refuse a p=10 estimate
    val regs = Sketches.hllRegisterTable(df, "u", Seq("g"), p = 8)
    an[Exception] should be thrownBy
      Sketches.hllEstimateTable(regs, Seq("g"), p = 10).collect()
    Sketches.hllEstimateTable(regs, Seq("g"), p = 8).collect().length shouldBe 1
    // hllFold enforces the same contract on the streaming state array
    an[IllegalArgumentException] should be thrownBy
      Sketches.hllFold(new Array[Byte](128), "k", p = 8)
  }

  test("kmvJaccardFromSignatures over a persisted shingle-signature table reproduces the live kmv_j") {
    import spark.implicits._
    val docs = (0 until 60).map { i =>
      val src = s"s${i % 3}"
      val shared = "the quick brown fox jumps over the lazy dog near the river bank"
      val own = s"unique token run $src ${i / 3} " * 3
      (src, if (i % 3 == 2) own else s"$shared $own")
    }.toDF("source", "text")
    val dir = java.nio.file.Files.createTempDirectory("kmvshingle").toString + "/sigs"
    Sketches.kmvShingleSignatureTable(docs, "source", "text", w = 3, k = 64)
      .write.parquet(dir)
    val fromSigs = Sketches.kmvJaccardFromSignatures(
        spark.read.parquet(dir), "source", k = 64)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("kmv_j")).toMap
    val live = Sketches.kmvJaccard(docs, "source", "text", w = 3, k = 64)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("kmv_j")).toMap
    fromSigs shouldBe live
    fromSigs.keySet shouldBe Set(("s0", "s1"), ("s0", "s2"), ("s1", "s2"))
  }

  test("kmvSetOps: exact at the extremes; union/intersection estimates track exact counts mid-range") {
    import spark.implicits._
    // identical pair, disjoint pair, half-overlap pair
    val shared = (1 to 40).map(i => s"w$i").mkString(" ")
    val other = (1 to 40).map(i => s"v$i").mkString(" ")
    val docs = Seq(
      ("a", shared), ("b", shared), ("c", other),
      ("d", shared + " " + other)).toDF("source", "text")
    val r = Sketches.kmvSetOps(docs, "source", "text", w = 3, k = 256)
      .collect().map(x => (x.getString(0), x.getString(1)) -> x).toMap
    // k=256 exceeds every union here -> the sketch is EXACT end to end
    for (((_, _), row) <- r) {
      row.getAs[Double]("union_est") shouldBe row.getAs[Long]("exact_union").toDouble
      row.getAs[Double]("inter_est") shouldBe row.getAs[Long]("exact_inter").toDouble
      row.getAs[Double]("union_rel_err") shouldBe 0.0
      row.getAs[Double]("inter_err") shouldBe 0.0
    }
    r(("a", "b")).getAs[Long]("exact_inter") shouldBe r(("a", "b")).getAs[Long]("exact_union")
    r(("a", "c")).getAs[Long]("exact_inter") shouldBe 0L
    // genuinely-estimating regime: unions far above k
    val big = (0 until 60).map { i =>
      val src = s"s${i % 2}"
      (src, (0 until 80).map(j => s"tok${(i * 80 + j) % 3000} shared${j % 40}").mkString(" "))
    }.toDF("source", "text")
    val est = Sketches.kmvSetOps(big, "source", "text", w = 3, k = 128)
      .collect().head
    est.getAs[Double]("union_rel_err") should be < 0.3 // ~4 sigma at k=128
    est.getAs[Double]("inter_err") should be < 0.3
  }

  test("bloom filter: never a false negative; fpp in range") {
    val members = spark.range(0, 5000).toDF("v")
    val bloom = Sketches.buildBloom(members, col("v"), 5000, fpp = 0.01)
    // all members test positive
    val misses = members.filter(!Sketches.mightContain(members, bloom, col("v"))).count()
    misses shouldBe 0
    // non-members: ~1% false positives
    val non = spark.range(1000000, 1050000).toDF("v")
    val fp = non.filter(Sketches.mightContain(non, bloom, col("v"))).count()
    fp.toDouble should be < 50000 * 0.05
  }
}
