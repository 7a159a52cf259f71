package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation tiers for fact-fact equi-joins.
  *
  * At 100 TB a single hot join key (the bot user, the empty-string
  * document, the null-ish sentinel id) lands every matching row in one
  * shuffle task and the stage runs at the speed of that task. AQE's
  * skew-join split handles MOST of this at runtime (and stays on); the
  * explicit salted tier below is for the case AQE can't fix — a single
  * key too hot for any post-hoc partition split of the OTHER side, or
  * a deterministic-layout requirement. Semantics are proven by spec:
  * the salted join returns row-identical output to the plain join.
  */
object SkewJoin {

  /** Salted inner equi-join. The (potentially skewed) left side gets a
    * deterministic salt in [0, s) derived from `saltOn` (any
    * high-cardinality left column — NOT the join key, whose whole
    * problem is that it repeats); the right side is replicated s times
    * so every (key, salt) bucket finds its match. A hot left key now
    * spreads over s shuffle tasks instead of one.
    *
    * Cost model: right side shuffles s×. Use when |right| ≪ |left|
    * but too big to broadcast — exactly the regime where one hot left
    * key otherwise serializes the stage. Deterministic (hash salt, no
    * rand()) so retried tasks and both engines of an oracle agree.
    */
  def saltedInner(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      saltOn: Column, s: Int): DataFrame = {
    require(s > 1, s"salt fan-out must be > 1, got $s")
    val l = left.withColumn("__salt", pmod(xxhash64(saltOn), lit(s.toLong)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(s.toLong - 1))))
    l.join(r, l(leftKey) === r(rightKey) && l("__salt") === r("__salt"))
      .drop("__salt")
  }

  /** Bloom-prefiltered inner equi-join: build a Bloom filter over the
    * (small, filtered) right side's keys, drop left rows that cannot
    * match BEFORE the shuffle, then run the exact join (which removes
    * the Bloom's false positives). With a selective right side this
    * cuts the shuffled fact bytes by the filter's selectivity — the
    * manual twin of Catalyst's runtime row-group filter, usable where
    * that doesn't fire (non-parquet sources, pre-shuffled frames).
    * Output is row-identical to the plain join (spec-pinned).
    *
    * Key types: integral and string keys are supported — the probe
    * hashes the same representation the build inserted
    * ([[Sketches.mightContain]] dispatches on the resolved type and
    * fails fast on anything else), so the never-false-negative
    * contract holds for both.
    */
  def bloomInner(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      expectedRightKeys: Long, fpp: Double = 0.01): DataFrame = {
    val bloom = Sketches.buildBloom(right, col(rightKey), expectedRightKeys, fpp)
    val pre = left.filter(Sketches.mightContain(left, bloom, col(leftKey)))
    pre.join(right, pre(leftKey) === right(rightKey))
  }
}
