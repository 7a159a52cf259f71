package graft.ops

import graft.SparkSpec

/** Pins the hypergeometric p-value math — in particular the
  * choose-the-shorter-tail branch (upper sum vs 1 - lower sum via the
  * downward pmf recurrence) — against a direct Scala computation of
  * P(X >= k) from exact log-binomials.
  */
class EnrichmentSpec extends SparkSpec {
  import spark.implicits._

  /** Exact P(X >= kS) for hypergeometric(nG, kG, nS) via BigDecimal-free
    * log-space summation (small inputs, so plain double lgamma-by-table
    * is exact enough for 6 decimals).
    */
  private def pUpperRef(nG: Int, kG: Int, nS: Int, kS: Int): Double = {
    val lf = new Array[Double](nG + 1) // lf(i) = ln(i!)
    for (i <- 1 to nG) lf(i) = lf(i - 1) + math.log(i)
    def lnC(n: Int, k: Int) = lf(n) - lf(k) - lf(n - k)
    val hi = math.min(kG, nS)
    (kS to hi).map(k => math.exp(lnC(kG, k) + lnC(nG - kG, nS - k) - lnC(nG, nS))).sum
  }

  test("p-values match the direct hypergeometric sum on both tail branches") {
    // sample A: category 'x' enriched (small k_s -> upper branch short);
    // category 'z' is globally frequent but sparse in A (lower branch).
    val docs = Seq(
      ("A", "x x x y z"),
      ("A", "x x y z z"),
      ("B", "z z z z z"),
      ("B", "z z z z z"),
      ("C", "z z z z y")
    ).toDF("sample", "text")
    val r = Enrichment.enrich(docs, "sample", "text", minOccurrences = 2)
      .collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(2), x.getLong(3), x.getDouble(5)))
      .toMap
    val nG = 25 // total tokens
    // sample A: n_s = 10; x: k_s=5, k_g=5; z: k_s=3, k_g=17; y: k_s=2, k_g=3
    for ((cat, kS, kG) <- Seq(("x", 5, 5), ("z", 3, 17), ("y", 2, 3))) {
      val (gotKs, gotKg, gotP) = r(("A", cat))
      gotKs shouldBe kS
      gotKg shouldBe kG
      gotP shouldBe (math.rint(pUpperRef(nG, kG, 10, kS) * 1e4) / 1e4 +- 1e-4)
    }
    // lower-tail branch explicitly: B has z k_s=10 of k_g=17, n_s=10;
    // upper terms = min(17,10)-10 = 0 -> upper branch, p = pmf alone.
    val (_, _, pBz) = r(("B", "z"))
    pBz shouldBe (math.rint(pUpperRef(nG, 17, 10, 10) * 1e4) / 1e4 +- 1e-4)
  }

  test("native graft_hypergeom_tail matches the direct sum across a parameter grid") {
    for {
      nG <- Seq(20, 60, 200)
      kG <- Seq(2, 7, nG / 2)
      nS <- Seq(5, nG / 3)
      kS <- 0 to math.min(kG, nS)
    } {
      // ln pmf(kS) from exact log-factorials
      val lf = new Array[Double](nG + 1)
      for (i <- 1 to nG) lf(i) = lf(i - 1) + math.log(i)
      def lnC(n: Int, k: Int) = lf(n) - lf(k) - lf(n - k)
      val lnPmf = lnC(kG, kS) + lnC(nG - kG, nS - kS) - lnC(nG, nS)
      val got = graft.functions.HypergeomTail.compute(kS, kG, nS, nG, lnPmf)
      val want = pUpperRef(nG, kG, nS, kS)
      withClue(s"nG=$nG kG=$kG nS=$nS kS=$kS: ") {
        got shouldBe (want +- math.max(1e-12, want * 1e-10))
      }
    }
  }

  test("p_adj is BH-monotone and capped at 1") {
    val docs = Seq(
      ("A", "x x x y z"), ("A", "x y z w v"), ("B", "z z w w v")
    ).toDF("sample", "text")
    val rows = Enrichment.enrich(docs, "sample", "text", minOccurrences = 1)
      .collect().map(x => (x.getString(0), x.getDouble(5), x.getDouble(6)))
    rows.foreach { case (_, _, adj) => adj should be <= 1.0 }
    // within a sample, p_adj ordered by p_raw is non-decreasing
    rows.groupBy(_._1).values.foreach { g =>
      val byP = g.sortBy(_._2).map(_._3)
      byP.zip(byP.tail).foreach { case (a, b) => a should be <= b }
    }
  }
}
