package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompressionSpec extends SparkSpec {
  import spark.implicits._

  private def ratio(rows: Seq[(Long, String)]): Map[Long, Double] =
    rows.toDF("id", "text")
      .select(col("id"), TextFunctions.compressionRatio(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("template spam compresses far below natural prose; empty is 0") {
    val spam = (1 to 60).map(_ => "click here to win a prize now").mkString(" ")
    val prose = "the migration finished after the retry queue drained but two " +
      "shards reported checksum drift so the coordinator quarantined their " +
      "segments and scheduled a rebuild from the previous snapshot before " +
      "any reader could observe the torn write in production traffic today"
    val rnd = new scala.util.Random(7)
    val noise = (1 to 250).map(_ => (97 + rnd.nextInt(26)).toChar).mkString
    val m = ratio(Seq((1L, spam), (2L, prose), (3L, noise), (4L, "")))
    m(1L) should be < 0.2       // repetition collapses
    m(2L) should (be > 0.4 and be < 0.9) // prose band
    m(3L) should be > m(2L)     // random noise is least compressible
    m(4L) shouldBe 0.0
    m(1L) should be < m(2L)
  }

  test("deterministic across evaluations and row order") {
    val rows = (1L to 30L).map(i => (i, s"doc $i " + ("ab " * i.toInt)))
    ratio(rows) shouldBe ratio(rows.reverse)
  }

  test("plans map-only with the call inside the projection (no exchange)") {
    val df = Seq((1L, "some payload text")).toDF("id", "text")
    val plan = df.select(TextFunctions.compressionRatio(col("text")))
      .queryExecution.executedPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    flattenPlan(plan).collect { case e: ShuffleExchangeLike => e } shouldBe empty
  }

  test("composes as a quality gate") {
    val spam = (1 to 40).map(_ => "buy now").mkString(" ")
    val docs = Seq((1L, spam),
      (2L, "an ordinary paragraph about distributed query planning and shuffles today")
    ).toDF("doc_id", "text")
    val kept = docs.filter(TextFunctions.compressionRatio(col("text")) >= 0.2)
      .select("doc_id").as[Long].collect()
    kept.toSeq shouldBe Seq(2L)
  }
}
