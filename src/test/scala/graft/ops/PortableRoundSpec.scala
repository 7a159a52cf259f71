package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class PortableRoundSpec extends SparkSpec {
  import spark.implicits._

  private def r4(cases: (Long, Long)*): Seq[Double] =
    cases.toDF("p", "q")
      .select(PortableRound.intRound4(col("p"), col("q")))
      .as[Double].collect().toSeq

  private def scaled(cases: (Long, Long)*): Seq[Long] =
    cases.toDF("p", "q")
      .select(PortableRound.intScaled(col("p"), col("q")))
      .as[Long].collect().toSeq

  test("exact decimal boundaries round half-up") {
    // 57/800 = 0.07125 — the ratio that flipped q_repetition at sf1
    r4((57L, 800L)) shouldBe Seq(0.0713)
    // 1/32 = 0.03125, dyadic boundary
    r4((1L, 32L)) shouldBe Seq(0.0313)
    // 7/20000 = 0.00035
    r4((7L, 20000L)) shouldBe Seq(0.0004)
  }

  test("plain ratios, endpoints, and the q=0 guard") {
    r4((0L, 5L), (5L, 5L), (1L, 3L), (2L, 3L), (3L, 0L)) shouldBe
      Seq(0.0, 1.0, 0.3333, 0.6667, 0.0)
  }

  test("stays exact at large counts (no double floor drift)") {
    r4((999999999L, 1000000000L)) shouldBe Seq(1.0)
    r4((333333333L, 1000000000L)) shouldBe Seq(0.3333)
  }

  test("negative ratios floor-divide (half-toward-+inf), matching the Duck twin") {
    // -57/800 = -0.07125 → -0.0712 (half toward +inf); -7/2 = -3.5
    // exactly; -1/20000 = -0.00005 → 0.0. The DuckDB twin's explicit
    // positive-mod floor was verified to agree on these cases — its
    // bare `//` truncates toward zero and would NOT
    r4((-57L, 800L), (-7L, 2L), (-1L, 20000L), (-2L, 3L)) shouldBe
      Seq(-0.0712, -3.5, 0.0, -0.6667)
  }

  test("intScaled quantizes on the same exact-boundary rule") {
    scaled((57L, 800L), (1L, 3L), (0L, 7L), (3L, 0L)) shouldBe
      Seq(713L, 3333L, 0L, 0L)
  }
}
