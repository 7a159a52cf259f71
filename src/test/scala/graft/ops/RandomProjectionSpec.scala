package graft.ops

import graft.SparkSpec

class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  test("sign derivation is deterministic and balanced-ish") {
    RandomProjection.sign("0", 3, 17) shouldBe RandomProjection.sign("0", 3, 17)
    val signs = for (j <- 0 until 8; i <- 0 until 64)
      yield RandomProjection.sign("0", j, i)
    signs.foreach(s => math.abs(s) shouldBe 1.0)
    // md5 parity: roughly half positive (a degenerate all-one matrix
    // would mean the derivation is broken)
    val pos = signs.count(_ > 0)
    pos should be > 150
    pos should be < 362
  }

  test("projection preserves squared norm in expectation (JL property)") {
    val d = 64
    val rng = new scala.util.Random(11)
    val rows = (1L to 200L).map(id =>
      (id, Seq.fill(d)(rng.nextGaussian())))
    val df = rows.toDF("id", "v")
    val out = RandomProjection.project(df, "id", "v", k = 16, d = d, seed = "s")
      .collect().map(r => r.getLong(0) ->
        (1 until 17).map(j => r.getDouble(j)).map(x => x * x).sum).toMap
    val orig = rows.map { case (id, v) => id -> v.map(x => x * x).sum }.toMap
    // per-vector ratios concentrate around 1; the MEAN ratio is tight
    val ratios = rows.map { case (id, _) => out(id) / orig(id) }
    val mean = ratios.sum / ratios.size
    mean shouldBe 1.0 +- 0.15
  }

  test("matrix scale is 1/sqrt(k)") {
    val m = RandomProjection.matrix("x", 4, 10)
    m.flatten.foreach(v => math.abs(v) shouldBe (0.5 +- 1e-15))
  }
}
