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

  test("NULL values are excluded from n, not counted as zeros") {
    // before the fix, n counted NULL rows while the power sums skipped
    // them — mean/skew/kurtosis came out wrong for null-bearing columns
    val df = ((1 to 1000).map(i => ("u", Some(i.toDouble))) ++
      Seq.fill(250)(("u", Option.empty[Double]))).toDF("g", "v")
    val r = Moments.groupMoments(df, "g", "v").collect().head
    r.getLong(r.fieldIndex("n")) shouldBe 1000L
    r.getDouble(r.fieldIndex("mean")) shouldBe 500.5 +- 1e-9
    r.getDouble(r.fieldIndex("skew")) shouldBe 0.0 +- 1e-9
  }

  test("negative values quantize portably (half-toward-+inf in both engines)") {
    // floor(x*100 + 0.5): -1.005 * 100 = -100.5 → -100 (half up toward
    // +inf), mirrored verbatim in the DuckDB twin — the sign regime the
    // old round() quantizer left engine-dependent
    val df = Seq(("n", -1.005), ("n", -2.0), ("n", 3.0)).toDF("g", "v")
    val r = Moments.groupMoments(df, "g", "v").collect().head
    // q values: -100, -200, 300 → mean = 0/3 = 0.0
    r.getDouble(r.fieldIndex("mean")) shouldBe 0.0 +- 1e-9
  }

  test("fourth-power sums survive values whose q^4 overflows a long") {
    // value 600 → q = 60000 → q^4 ≈ 1.3e19 > Long.MaxValue
    val df = (1 to 100).map(i => ("g", 600.0 + (i % 7))).toDF("g", "v")
    noException should be thrownBy Moments.groupMoments(df, "g", "v").collect()
  }
}
