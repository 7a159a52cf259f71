package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe windowed top-k. A plain
  * `row_number over (partition by key order by ...)` sends EVERY row of
  * a key to one task and fully sorts it — with few distinct keys that
  * is a handful of tasks sorting the whole table (the round-1 plan for
  * q_window_topn: 5 keys, 11.6 s, OOM at 100 TB).
  *
  * [[topKPerGroup]] runs two bounded phases instead:
  *   1. salt the key into `salt` sub-partitions (hash of a salt column
  *      expression), take the local top-k of each (key, salt) — the big
  *      sort spreads over keys x salt tasks;
  *   2. take the global top-k of the <= k * salt survivors per key —
  *      a trivially small second window.
  * Output (including tie-breaks) is identical to the single-window
  * form as long as the order is total.
  */
object WindowOps {

  def topKPerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      orderCols: Seq[Column],
      k: Int,
      rankCol: String = "rn",
      salt: Int = 64,
      saltOn: Column = null): DataFrame = {
    val saltSrc = if (saltOn == null) rand(seed = 7) * salt else saltOn
    val salted = df.withColumn("__salt", pmod(saltSrc.cast("long"), lit(salt)))
    val w1 = Window.partitionBy((groupCols :+ "__salt").map(col): _*).orderBy(orderCols: _*)
    val local = salted
      .withColumn("__rn1", row_number().over(w1))
      .filter(col("__rn1") <= k)
      .drop("__salt", "__rn1")
    val w2 = Window.partitionBy(groupCols.map(col): _*).orderBy(orderCols: _*)
    local
      .withColumn(rankCol, row_number().over(w2))
      .filter(col(rankCol) <= k)
  }
}
