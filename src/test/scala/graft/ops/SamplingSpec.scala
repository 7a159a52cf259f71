package graft.ops

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = (1L to 2000L).map(i =>
    (i, if (i % 2 == 0) "en" else "de")).toDF("id", "lang")

  test("sampleByKey is deterministic, near the requested fraction, and nested") {
    val s20 = Sampling.sampleByKey(rows, "id", 0.2).select("id").as[Long].collect().toSet
    val again = Sampling.sampleByKey(rows, "id", 0.2).select("id").as[Long].collect().toSet
    again shouldBe s20 // rerun selects the identical rows
    s20.size.toDouble shouldBe (400.0 +- 80.0)
    // monotone threshold => smaller samples are SUBSETS of larger ones
    val s50 = Sampling.sampleByKey(rows, "id", 0.5).select("id").as[Long].collect().toSet
    s20.subsetOf(s50) shouldBe true
    // a different salt draws an independent sample
    val salted = Sampling.sampleByKey(rows, "id", 0.2, salt = "x")
      .select("id").as[Long].collect().toSet
    salted should not be s20
  }

  test("samples are nested across many random fractions") {
    val rnd = new scala.util.Random(7)
    val fracs = Seq.fill(5)(rnd.nextDouble()).sorted
    val sets = fracs.map(f =>
      Sampling.sampleByKey(rows, "id", f).select("id").as[Long].collect().toSet)
    sets.zip(sets.tail).foreach { case (small, large) =>
      small.subsetOf(large) shouldBe true
    }
    // stratified with a single stratum agrees with the uniform keep()
    val uni = Sampling.sampleByKey(rows.filter($"lang" === "en"), "id", 0.3)
      .select("id").as[Long].collect().toSet
    val strat = Sampling.stratified(rows, "id", "lang", Map("en" -> 0.3))
      .select("id").as[Long].collect().toSet
    strat shouldBe uni
  }

  test("stratified applies per-stratum fractions and drops unknown strata") {
    val s = Sampling.stratified(rows, "id", "lang",
      Map("en" -> 0.5, "de" -> 0.1)).collect()
    val byLang = s.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    byLang("en").toDouble shouldBe (500.0 +- 100.0)
    byLang("de").toDouble shouldBe (100.0 +- 50.0)
    val dropped = Sampling.stratified(rows, "id", "lang", Map("en" -> 0.5)).collect()
    dropped.map(_.getString(1)).toSet shouldBe Set("en")
  }

  test("diverseSample takes an exact per-cluster quota, deterministically; salt redraws") {
    import org.apache.spark.sql.functions._
    // three well-separated blobs of very different sizes: a uniform
    // sample would mirror the 10/100/400 skew; the diverse sample
    // must flatten it to min(quota, |cluster|)
    val vecs = ((1L to 10L).map(i => (i, Seq(10.0, 0.0))) ++
        (101L to 200L).map(i => (i, Seq(0.0, 10.0))) ++
        (1001L to 1400L).map(i => (i, Seq(-10.0, -10.0))))
      .toDF("id", "vec").select(col("id"), col("vec").cast("array<double>").as("vec"))
    val model = graft.ann.KMeans.fit(vecs, "id", "vec", k = 3, maxIters = 5)
    val kept = Sampling.diverseSample(vecs, "id", "vec", model, quota = 25)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // per-cluster counts: min(quota, cluster size)
    val byCluster = kept.groupBy(_._2).view.mapValues(_.length).toMap
    byCluster.values.toSeq.sorted shouldBe Seq(10, 25, 25)
    kept.map(_._1).distinct.length shouldBe kept.length
    // deterministic rerun
    val again = Sampling.diverseSample(vecs, "id", "vec", model, quota = 25)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    again.sorted shouldBe kept.sorted
    // a different salt draws a different (but same-shape) subset
    val salted = Sampling.diverseSample(vecs, "id", "vec", model, quota = 25, salt = "v2")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    salted.groupBy(_._2).view.mapValues(_.length).toMap.values.toSeq.sorted shouldBe
      Seq(10, 25, 25)
    (salted.map(_._1).toSet == kept.map(_._1).toSet) shouldBe false
  }

  test("splitAssign is exhaustive, near the target shares, and stable under growth") {
    val out = Sampling.splitAssign(rows, "id", valPm = 100, testPm = 200, salt = "s")
      .select("id", "split").as[(Long, String)].collect()
    out should have length 2000
    val shares = out.groupBy(_._2).view.mapValues(_.length).toMap
    shares.keySet shouldBe Set("train", "val", "test")
    shares("val").toDouble shouldBe (200.0 +- 60.0)
    shares("test").toDouble shouldBe (400.0 +- 90.0)
    shares("train").toDouble shouldBe (1400.0 +- 120.0)
    // adding rows never reassigns existing ones
    val grown = Sampling.splitAssign(
      rows.unionByName(Seq((9999L, "xx")).toDF("id", "lang")),
      "id", valPm = 100, testPm = 200, salt = "s")
      .select("id", "split").as[(Long, String)].collect()
    grown.filter(_._1 != 9999L).sortBy(_._1).toSeq shouldBe out.sortBy(_._1).toSeq
    // a different salt draws an independent assignment
    val other = Sampling.splitAssign(rows, "id", valPm = 100, testPm = 200, salt = "t")
      .select("id", "split").as[(Long, String)].collect()
    other.sortBy(_._1).toSeq should not be out.sortBy(_._1).toSeq
    an[IllegalArgumentException] should be thrownBy
      Sampling.splitAssign(rows, "id", valPm = 600, testPm = 500)
  }
}
