package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val events = Seq(
    // user 1: two sessions split by a 31-minute gap
    (1L, ts("2026-01-01 10:00:00"), 1L, 1.0),
    (2L, ts("2026-01-01 10:10:00"), 1L, 2.0),
    (3L, ts("2026-01-01 10:41:00"), 1L, 4.0),
    // user 2: gap EXACTLY 30 minutes -> same session (strict >)
    (4L, ts("2026-01-01 09:00:00"), 2L, 1.0),
    (5L, ts("2026-01-01 09:30:00"), 2L, 1.0),
    // user 3: single event
    (6L, ts("2026-01-01 08:00:00"), 3L, 9.5)
  ).toDF("event_id", "ts", "user_id", "value")

  test("sessions split on gaps strictly greater than the threshold") {
    val r = Sessionize.sessionize(events, "user_id", "ts", "value", "event_id",
      gapSeconds = 1800)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(4), x.getDouble(5)))
    r shouldBe Array(
      (1L, 1L, 2L, 3.0),  // user 1 session 1: events 1,2
      (1L, 2L, 1L, 4.0),  // user 1 session 2: event 3 (31 min gap)
      (2L, 1L, 2L, 2.0),  // user 2: exactly 30 min stays one session
      (3L, 1L, 1L, 9.5))  // user 3: singleton session
  }

  test("session bounds are the min/max event times") {
    val r = Sessionize.sessionize(events, "user_id", "ts", "value", "event_id")
      .filter($"user_id" === 1 && $"session_id" === 1).collect().head
    r.getString(2) should startWith("2026-01-01 10:00:00")
    r.getString(3) should startWith("2026-01-01 10:10:00")
  }
}
