package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range-containment) join — left POINT rows matched to
  * right INTERVAL rows with equal keys and lo <= point <= hi, with
  * EVERY containing interval matched (the multi-match sibling of
  * [[AsofJoin]]).
  *
  * Catalyst plans a raw `l.pt BETWEEN r.lo AND r.hi` join as a
  * broadcast-nested-loop (or worse, a cartesian) — O(|L|·|R|) per key.
  * Spark-first shape instead: decompose each interval into the
  * fixed-width BUCKETS it overlaps (explode — an interval spanning b
  * buckets emits b rows), bucket each point once, hash-join on
  * (keys, bucket), then apply the exact containment filter. Candidate
  * cost is |L| + Σ span/bucketWidth — a plain hash join at any scale;
  * pick `bucketWidth` near the typical interval span so most intervals
  * emit 1-2 rows.
  */
object RangeJoin {

  /** Join `left` (point column `ptCol`, a LONG, e.g. epoch micros)
    * against `right` ([`loCol`, `hiCol`] longs, inclusive bounds) on
    * equal `keys` + containment. Returns all left columns plus right
    * columns prefixed `r_` (right keys are dropped — they equal the
    * left ones).
    */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      ptCol: String,
      loCol: String,
      hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(keys.nonEmpty, "rangeJoin needs at least one key column")
    require(bucketWidth > 0, s"bucketWidth must be positive (got $bucketWidth)")
    val l = left.withColumn("__bucket", bucketOf(col(ptCol), bucketWidth))
    val r = right.select(right.columns.map(c => col(c).as(s"r_$c")).toSeq: _*)
      .withColumn("__bucket", explode(sequence(
        bucketOf(col(s"r_$loCol"), bucketWidth),
        bucketOf(col(s"r_$hiCol"), bucketWidth))))
    val cond = (keys.map(k => l(k) === r(s"r_$k")) :+ (l("__bucket") === r("__bucket")))
      .reduce(_ && _)
    l.join(r, cond)
      .filter(col(ptCol) >= col(s"r_$loCol") && col(ptCol) <= col(s"r_$hiCol"))
      .drop("__bucket")
      .drop(keys.map(k => s"r_$k"): _*)
  }

  /** Exact floor division for longs: subtract the non-negative
    * remainder first, so the double division is of an exact multiple
    * (negative points bucket correctly too).
    */
  private def bucketOf(c: Column, w: Long): Column =
    ((c - pmod(c, lit(w))) / lit(w)).cast("long")
}
