package graft.ops

import graft.SparkSpec

class MomentsSpec extends SparkSpec {
  import spark.implicits._

  test("symmetric data has ~zero skew and uniform's negative excess kurtosis") {
    val df = (1 to 1000).map(i => ("u", i.toDouble)).toDF("g", "v")
    val r = Moments.groupMoments(df, "g", "v").collect().head
    r.getDouble(r.fieldIndex("skew")) shouldBe 0.0 +- 1e-9
    // discrete uniform: excess kurtosis → -1.2 as n grows
    r.getDouble(r.fieldIndex("ex_kurtosis")) shouldBe -1.2 +- 0.01
    r.getDouble(r.fieldIndex("mean")) shouldBe 500.5 +- 1e-9
  }

  test("right-heavy tail yields positive skew; constant group yields NULLs") {
    val vals = Seq.fill(99)(1.0) ++ Seq(101.0)
    val df = (vals.map(("t", _)) ++ Seq.fill(5)(("c", 42.0))).toDF("g", "v")
    val out = Moments.groupMoments(df, "g", "v").collect()
      .map(r => r.getString(0) -> r).toMap
    out("t").getDouble(out("t").fieldIndex("skew")) should be > 5.0
    out("c").isNullAt(out("c").fieldIndex("skew")) shouldBe true
    out("c").isNullAt(out("c").fieldIndex("ex_kurtosis")) shouldBe true
  }

  test("fourth-power sums survive values whose q^4 overflows a long") {
    // value 600 → q = 60000 → q^4 ≈ 1.3e19 > Long.MaxValue
    val df = (1 to 100).map(i => ("g", 600.0 + (i % 7))).toDF("g", "v")
    noException should be thrownBy Moments.groupMoments(df, "g", "v").collect()
  }
}
