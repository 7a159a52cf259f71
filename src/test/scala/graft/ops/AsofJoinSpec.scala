package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def mkLeft(rows: (Long, String, Long)*) =
    rows.toDF("ts_n", "k", "lid").withColumn("ts", timestamp_micros(col("ts_n"))).drop("ts_n")
  private def mkRight(rows: (Long, String, Long, Double)*) =
    rows.toDF("ts_n", "k", "rid", "v").withColumn("ts", timestamp_micros(col("ts_n"))).drop("ts_n")

  test("asof: latest right at or before each left row, per key") {
    val l = mkLeft((100L, "a", 1L), (250L, "a", 2L), (50L, "a", 3L), (100L, "b", 4L))
    val r = mkRight((90L, "a", 10L, 1.0), (200L, "a", 11L, 2.0), (300L, "a", 12L, 3.0),
      (100L, "b", 13L, 4.0))
    val out = AsofJoin.asofJoin(l, r, Seq("k"), "ts", "rid", Seq("rid", "v"))
      .select("lid", "asof_rid", "asof_v").collect()
      .map(x => x.getLong(0) -> (Option(x.get(1)), Option(x.get(2)))).toMap
    out(1L) shouldBe ((Some(10L), Some(1.0)))
    out(2L) shouldBe ((Some(11L), Some(2.0)))
    out(3L) shouldBe ((None, None)) // no right row at or before ts=50
    out(4L) shouldBe ((Some(13L), Some(4.0))) // same-instant inclusive match
  }

  test("asof semantics vs a naive driver computation on random data") {
    val rnd = new scala.util.Random(7)
    val lRows = (1L to 200L).map(i => (rnd.nextInt(1000).toLong, s"k${rnd.nextInt(5)}", i))
    val rRows = (1L to 300L).map(i => (rnd.nextInt(1000).toLong, s"k${rnd.nextInt(5)}", 1000L + i, rnd.nextInt(100).toDouble))
    val out = AsofJoin.asofJoin(mkLeft(lRows: _*), mkRight(rRows: _*),
        Seq("k"), "ts", "rid", Seq("rid"))
      .select("lid", "asof_rid").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
    val naive = lRows.map { case (ts, k, lid) =>
      val cands = rRows.filter(r => r._2 == k && r._1 <= ts)
      // latest ts, tie-break max rid
      lid -> (if (cands.isEmpty) None
              else Some(cands.maxBy(r => (r._1, r._3))._3))
    }.toMap
    out shouldBe naive
    out.size shouldBe 200
  }

  test("asof ties: same-instant right row matches when inclusive, not when strict") {
    val l = mkLeft((100L, "a", 1L))
    val r = mkRight((100L, "a", 10L, 1.0), (100L, "a", 11L, 2.0), (40L, "a", 9L, 0.5))
    val inc = AsofJoin.asofJoin(l, r, Seq("k"), "ts", "rid", Seq("rid")).collect().head
    inc.getAs[Long]("asof_rid") shouldBe 11L // max rid among same-ts ties
    val strict = AsofJoin.asofJoin(l, r, Seq("k"), "ts", "rid", Seq("rid"),
      inclusive = false).collect().head
    strict.getAs[Long]("asof_rid") shouldBe 9L
  }

  test("asof: all payload columns come from the SAME matched row even when null") {
    // newest right row has v = NULL: asof_v must be NULL (from that
    // row), not the older row's non-null value
    val l = mkLeft((300L, "a", 1L))
    val r = Seq((90L, "a", 10L, Some(5.0)), (200L, "a", 11L, None))
      .toDF("ts_n", "k", "rid", "v")
      .withColumn("ts", timestamp_micros(col("ts_n"))).drop("ts_n")
    val out = AsofJoin.asofJoin(l, r, Seq("k"), "ts", "rid", Seq("rid", "v")).collect().head
    out.getAs[Long]("asof_rid") shouldBe 11L
    out.isNullAt(out.fieldIndex("asof_v")) shouldBe true
  }

  test("asof: left rows with no prior right get nulls; all left columns survive") {
    val l = mkLeft((10L, "a", 1L)).withColumn("extra", lit("keep"))
    val r = mkRight((50L, "a", 10L, 1.0))
    val out = AsofJoin.asofJoin(l, r, Seq("k"), "ts", "rid", Seq("rid", "v")).collect().head
    out.isNullAt(out.fieldIndex("asof_rid")) shouldBe true
    out.getAs[String]("extra") shouldBe "keep"
  }
}
