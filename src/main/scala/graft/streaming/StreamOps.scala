package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Structured Streaming operators (SURVEY §2 row 55). Each transform is
  * written against the unified DataFrame API so the SAME function works
  * on a batch frame and a `readStream` frame — batch runs are the
  * correctness oracle for the streaming path (spec-checked parity).
  *
  * Scale/semantics notes: watermarks bound state for late data;
  * windowed aggregation state is per (window, key) and expires past the
  * watermark; dedup uses dropDuplicatesWithinWatermark so the seen-set
  * is bounded; custom state (running totals) uses mapGroupsWithState
  * with explicit per-key state.
  */
object StreamOps {

  /** Windowed count/sum per (time window, key). On a streaming input a
    * watermark must be set for append-mode sinks and state expiry.
    */
  def windowedAgg(
      df: DataFrame,
      tsCol: String,
      keyCol: String,
      valueCol: String,
      windowDuration: String,
      watermark: Option[String] = None): DataFrame = {
    val base =
      if (df.isStreaming && watermark.isDefined) df.withWatermark(tsCol, watermark.get)
      else df
    base.groupBy(window(col(tsCol), windowDuration).as("w"), col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("sum_value"))
      .select(col("w.start").as("window_start"), col(keyCol),
        col("n_events"), col("sum_value"))
  }

  /** Streaming dedup with bounded state: duplicates of `keyCols` are
    * dropped while their event time is within the watermark.
    */
  def dedupe(df: DataFrame, keyCols: Seq[String], tsCol: String, watermark: String): DataFrame =
    if (df.isStreaming)
      df.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark(keyCols)
    else df.dropDuplicates(keyCols)

  /** Custom keyed state via mapGroupsWithState: cumulative (count, sum)
    * per key, emitted on every update.
    */
  def runningTotals(ds: Dataset[(String, Double)]): Dataset[(String, Long, Double)] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Double)], state: GroupState[(Long, Double)]) =>
          val (c0, s0) = state.getOption.getOrElse((0L, 0.0))
          var c = c0
          var s = s0
          rows.foreach { r => c += 1; s += r._2 }
          state.update((c, s))
          (key, c, s)
      }
  }
}
