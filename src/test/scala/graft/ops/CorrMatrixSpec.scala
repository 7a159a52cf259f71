package graft.ops

import graft.SparkSpec

class CorrMatrixSpec extends SparkSpec {
  import spark.implicits._

  private def corrOf(rows: Seq[(Double, Double, Double)]): Map[(String, String), Option[Double]] =
    CorrMatrix.corrMatrix(rows.toDF("a", "b", "c"), Seq("a", "b", "c"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap

  test("perfect linear relations hit ±1, constants go NULL") {
    // b = 2a (corr 1), c constant (zero variance -> NULL den)
    val m = corrOf(Seq((1.0, 2.0, 5.0), (2.0, 4.0, 5.0), (3.0, 6.0, 5.0), (4.0, 8.0, 5.0)))
    m(("a", "b")) shouldBe Some(1.0)
    m(("a", "c")) shouldBe None
    m(("b", "c")) shouldBe None
  }

  test("anti-correlation and a hand-computed mid case") {
    val m = corrOf(Seq((1.0, 9.0, 1.0), (2.0, 8.0, 2.0), (3.0, 7.0, 1.0), (4.0, 6.0, 2.0)))
    m(("a", "b")) shouldBe Some(-1.0)
    // a = 1,2,3,4 vs c = 1,2,1,2, quantized ×100 exact: n=4, sa=1000,
    // sc=600, sac=160000, saa=300000, scc=100000 ->
    // corr = (4·160000−1000·600) / sqrt((4·3e5−1e6)(4·1e5−36e4))
    //      = 40000 / sqrt(200000·40000) = 1/sqrt(5) -> 0.4472 at 4dp
    m(("a", "c")) shouldBe Some(0.4472)
  }

  test("matrix shape: k columns emit k(k-1)/2 upper-triangle rows") {
    val out = CorrMatrix.corrMatrix(
      Seq((1.0, 2.0, 3.0), (2.0, 3.0, 4.0)).toDF("a", "b", "c"),
      Seq("a", "b", "c")).collect()
    out.map(r => (r.getString(0), r.getString(1))).toSeq shouldBe
      Seq(("a", "b"), ("a", "c"), ("b", "c"))
  }
}
