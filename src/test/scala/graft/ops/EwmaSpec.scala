package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

class EwmaSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private def run(rows: Seq[(Long, Long, Timestamp, Double)]): Map[Long, Double] =
    Ewma.ewma(rows.toDF("event_id", "user_id", "ts", "value"),
      keyCol = "user_id", tsCol = "ts", tieCol = "event_id", valueCol = "value")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap

  test("hand-computed truncated EWMA over a short stream") {
    val rows = Seq(
      (1L, 7L, ts(10), 1.0),
      (2L, 7L, ts(20), 2.0),
      (3L, 7L, ts(30), 4.0))
    val got = run(rows)
    got(1L) shouldBe 1.0 // first event: only w0
    // (2 + 1*0.75) / (1 + 0.75) = 2.75 / 1.75
    got(2L) shouldBe BigDecimal(2.75 / 1.75)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // (4 + 2*0.75 + 1*0.5625) / (1 + 0.75 + 0.5625) = 6.0625 / 2.3125
    got(3L) shouldBe BigDecimal(6.0625 / 2.3125)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("keys smooth independently; constant stream is its own EWMA") {
    val rows =
      (1L to 12L).map(i => (i, 1L, ts(i), 5.0)) ++
        (21L to 32L).map(i => (i, 2L, ts(i), i.toDouble))
    val got = run(rows)
    (1L to 12L).foreach(i => got(i) shouldBe 5.0)
    // a growing stream's EWMA lags beneath the latest value
    got(32L) should be < 32.0
    got(32L) should be > 28.0 // but tracks the recent window, not the mean
  }

  test("ties in ts break on the tie column deterministically") {
    val rows = Seq(
      (2L, 9L, ts(10), 10.0), // same ts: event 1 precedes event 2
      (1L, 9L, ts(10), 2.0))
    val got = run(rows)
    got(1L) shouldBe 2.0
    got(2L) shouldBe BigDecimal((10.0 + 2.0 * 0.75) / 1.75)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }
}
