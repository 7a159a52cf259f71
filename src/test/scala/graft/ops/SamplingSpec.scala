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
