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

  /** Join-key skew diagnostic — the measurement BEHIND the tier choice
    * the operators above implement. One row per profiled key:
    *
    *  - `n_rows` / `n_keys` / `max_cnt`: corpus size, key cardinality,
    *    hottest key's row count — the raw shuffle-task load facts.
    *  - `imbalance`: max_cnt / (n_rows / n_keys), the hot key's load
    *    relative to the average key. ~1 means uniform; a join on this
    *    key skews exactly this factor past the ideal task.
    *  - `top_share_ppm`: hottest key's share of all rows, in parts per
    *    million (integer — portable across engines without float ties).
    *  - `n_hot_keys`: keys above 2× the average count (the census AQE's
    *    skew-split would have to handle).
    *  - `salt_reco`: ceil(max_cnt · partitions / n_rows) — the minimum
    *    salt fan-out `s` for [[saltedInner]] that spreads the hottest
    *    key down to one ideal partition's load. 1 = don't salt.
    *
    * Shape: one map-side-combined groupBy(key).count() (the canonical
    * skew probe — combiner output is ≤ |keys| per task regardless of
    * row count), then two bounded aggregates over the persisted count
    * frame. At 100 TB run it on a sampled slice or per partition-key
    * day: the per-key counts scale with key cardinality, not rows, and
    * relative skew is what the salt decision needs. All derived columns
    * are integer-exact ([[PortableRound]]) so the DuckDB twin matches
    * bit-for-bit; the intermediate products (max_cnt·n_keys,
    * 2·10^6·max_cnt) stay far under Long range at any per-slice
    * cardinality a diagnostic would profile.
    */
  def keySkew(df: DataFrame, keyCol: String, label: String,
      partitions: Int = 32,
      scope: graft.api.CacheScope = graft.api.CacheScope.global): DataFrame = {
    require(partitions > 0, s"partitions must be > 0, got $partitions")
    val cnts = scope.persist(
      df.groupBy(col(keyCol).as("__k")).agg(count(lit(1)).as("cnt")))
    val tot = cnts.agg(
      sum(col("cnt")).as("n_rows"),
      count(lit(1)).as("n_keys"),
      max(col("cnt")).as("max_cnt"))
    // single-row totals broadcast over the per-key counts: the hot-key
    // census compares cnt·n_keys > 2·n_rows (⇔ cnt > 2·avg) in exact
    // integer arithmetic, no float threshold
    val row = cnts.crossJoin(broadcast(tot)).agg(
      max(col("n_rows")).as("n_rows"),
      max(col("n_keys")).as("n_keys"),
      max(col("max_cnt")).as("max_cnt"),
      sum(when(col("cnt") * col("n_keys") > lit(2L) * col("n_rows"), lit(1L))
        .otherwise(lit(0L))).as("n_hot_keys"))
    // ceil(max_cnt·P / n_rows) via the positive-int floor identity
    // ceil(a/b) = (a + b − 1 − mod) / b — same in both engines
    val saltNum = col("max_cnt") * lit(partitions.toLong) + col("n_rows") - lit(1L)
    row.select(
      lit(label).as("tbl_key"),
      col("n_rows"), col("n_keys"), col("max_cnt"), col("n_hot_keys"),
      PortableRound.intRound4(col("max_cnt") * col("n_keys"), col("n_rows"))
        .as("imbalance"),
      PortableRound.intScaled(col("max_cnt"), col("n_rows"), 1000000L)
        .as("top_share_ppm"),
      ((saltNum - pmod(saltNum, col("n_rows"))) / col("n_rows")).cast("long")
        .as("salt_reco"))
  }

  /** DuckDB twin of [[keySkew]] — a self-contained SELECT (derived
    * tables, no top-level WITH) so callers can UNION ALL several
    * profiles into one oracle statement.
    */
  def keySkewDuckSql(table: String, keyCol: String, label: String,
      partitions: Int = 32): String = {
    val saltNum = s"(max_cnt * $partitions + n_rows - 1)"
    s"""SELECT '$label' AS tbl_key, n_rows, n_keys, max_cnt,
       |  (SELECT count(*) FROM
       |     (SELECT count(*) AS cnt FROM $table GROUP BY $keyCol) h
       |   WHERE h.cnt * t.n_keys > 2 * t.n_rows) AS n_hot_keys,
       |  ${PortableRound.intRound4Duck("max_cnt * n_keys", "n_rows")} AS imbalance,
       |  ${PortableRound.intScaledDuck("max_cnt", "n_rows", 1000000L)} AS top_share_ppm,
       |  ($saltNum - ((($saltNum % n_rows) + n_rows) % n_rows)) // n_rows AS salt_reco
       |FROM (SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
       |        count(*) AS n_keys, max(cnt) AS max_cnt
       |      FROM (SELECT count(*) AS cnt FROM $table GROUP BY $keyCol) c) t""".stripMargin
  }
}
