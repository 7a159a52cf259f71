package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream feature engineering (reference: the derived-view /
  * groupby surface of store's analytics API, re-expressed as the
  * feature tables a churn / segmentation / drift model consumes).
  * Every ratio output rounds the true rational in integer arithmetic
  * ([[PortableRound]]) so results are engine-portable at any scale.
  */
object EventFeatures {

  /** Per-key behavioral feature vector: volume, breadth (distinct
    * types + Shannon entropy of the type mix), cent-quantized exact
    * mean value, active span in whole days. Entropy uses the
    * H = ln n − (Σ c·ln c)/n identity — one positive-term float sum,
    * no per-term ratios. Two aggregates over the SAME key join back;
    * both sides arrive hash-partitioned on the key, so the join
    * reuses the exchange instead of adding one.
    */
  def userFeatures(df: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, valueCol: String): DataFrame = {
    val mix = df.groupBy(keyCol, typeCol)
      .agg(count(lit(1)).as("c"))
      .groupBy(keyCol).agg(
        sum("c").as("n_events"),
        count(lit(1)).as("n_types"),
        round(log(sum("c")) - sum(col("c") * log(col("c"))) / sum("c"), 4)
          .as("type_entropy"))
    // mean over CENT-quantized values (q = ⌊100·v + ½⌋, exact on the
    // identical input doubles in both engines), then the exact-integer
    // round4(Σq / 100n) — avg() of raw doubles sums in
    // engine-dependent order and flips the 4th decimal at scale
    val base = df
      .withColumn("q", floor(col(valueCol) * 100 + 0.5).cast("long"))
      .groupBy(keyCol).agg(
        PortableRound.intRound4(sum("q"), lit(100L) * count(lit(1)))
          .as("mean_value"),
        expr(s"(max(unix_micros($tsCol)) - min(unix_micros($tsCol))) div 86400000000")
          .as("span_days"))
    mix.join(base, keyCol)
      .select(col(keyCol), col("n_events"), col("n_types"),
        col("type_entropy"), col("mean_value"), col("span_days"))
      .orderBy(keyCol)
  }

  /** First-half vs second-half mean shift per group (deterministic
    * integer split at n div 2 over the unique (ts, tie) order) — the
    * cheap distribution-drift check between the early and late halves
    * of a stream. Cent-quantized exact-integer half-means; drift is a
    * difference of exact 4dp grid points (re-round-safe: it never
    * lands on a true .00005 midpoint).
    */
  def valueDrift(df: DataFrame, groupCol: String, tsCol: String,
      tieCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(groupCol)
      .orderBy(col("__us").asc, col(tieCol).asc)
    val wAll = Window.partitionBy(groupCol)
    df.select(col(groupCol), col(valueCol), col(tieCol),
        unix_micros(col(tsCol)).as("__us"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("qv", floor(col(valueCol) * 100 + 0.5).cast("long"))
      .groupBy(groupCol)
      .agg(
        max("n").as("n_events"),
        PortableRound.intRound4(
          sum(when(expr("rn <= n div 2"), col("qv"))),
          lit(100L) * count(when(expr("rn <= n div 2"), lit(1)))).as("mean_h1"),
        PortableRound.intRound4(
          sum(when(expr("rn > n div 2"), col("qv"))),
          lit(100L) * count(when(expr("rn > n div 2"), lit(1)))).as("mean_h2"))
      .withColumn("drift", round(col("mean_h2") - col("mean_h1"), 4))
      .select(col(groupCol), col("n_events"), col("mean_h1"),
        col("mean_h2"), col("drift"))
      .orderBy(groupCol)
  }

  /** One-row session-health digest (bounce rate, events and
    * integer-second duration per session, max duration). Sessions via
    * [[Sessionize]]'s lag + running-sum windows partitioned on the
    * max-cardinality key; everything after is ONE global partial
    * aggregate.
    */
  def sessionStats(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, gapSeconds: Long = 1800): DataFrame = {
    val byTime = Window.partitionBy(keyCol)
      .orderBy(col("__us").asc, col(tieCol).asc)
    val gapUs = gapSeconds * 1000000L
    val sess = df
      .select(col(keyCol), col(tieCol), unix_micros(col(tsCol)).as("__us"))
      .withColumn("__prev", lag(col("__us"), 1).over(byTime))
      .withColumn("__brk",
        when(col("__prev").isNull || col("__us") - col("__prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("__brk")).over(
        byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("session_id"))
      .agg(count(lit(1)).as("n_ev"),
        ((max(col("__us")) - min(col("__us"))) / lit(1000000L)).cast("long")
          .as("dur_s"))
    sess.agg(
      count(lit(1)).as("n_sessions"),
      countDistinct(col(keyCol)).as("n_users"),
      PortableRound.intRound4(
        count(when(col("n_ev") === 1, lit(1))), count(lit(1))).as("bounce_rate"),
      PortableRound.intRound4(sum("n_ev"), count(lit(1))).as("avg_events"),
      PortableRound.intRound4(sum("dur_s"), count(lit(1))).as("avg_dur_s"),
      max("dur_s").as("max_dur_s"))
  }

  /** Two-sample Kolmogorov–Smirnov drift statistic per group: the
    * first half vs second half of the stream (same deterministic
    * integer split as [[valueDrift]]), but comparing the WHOLE value
    * distribution, not just the mean — a variance or tail shift with
    * an unmoved mean is invisible to valueDrift and lights up here.
    * Exact at any scale: the two empirical CDFs are evaluated at
    * every observed cent value via running-sum windows over the
    * COMPRESSED (group, cent) histogram (the sup of |F1−F2| is
    * attained at a jump point, and the histogram carries every jump
    * of either half), and the statistic is maximized as the INTEGER
    * cross-multiplication |cum1·n2 − cum2·n1| before the single
    * final [[PortableRound]] division — no float comparison ever
    * decides the max. Denominator n1·n2 must stay under ~4.6e11 for
    * the exact rounding (≈ 1.3M rows per group per half); beyond
    * that, pre-aggregate or sample.
    */
  def ksDrift(df: DataFrame, groupCol: String, tsCol: String,
      tieCol: String, valueCol: String): DataFrame = {
    val byTime = Window.partitionBy(groupCol)
      .orderBy(col("__us").asc, col(tieCol).asc)
    val wAll = Window.partitionBy(groupCol)
    val halves = df.select(col(groupCol), col(valueCol), col(tieCol),
        unix_micros(col(tsCol)).as("__us"))
      .withColumn("rn", row_number().over(byTime))
      .withColumn("n", count(lit(1)).over(wAll))
      .select(col(groupCol),
        floor(col(valueCol) * 100 + 0.5).cast("long").as("qv"),
        when(expr("rn <= n div 2"), 1L).otherwise(0L).as("h1"))
    val byQv = Window.partitionBy(groupCol).orderBy(col("qv").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = halves.groupBy(col(groupCol), col("qv"))
      .agg(sum("h1").as("c1"), sum(lit(1L) - col("h1")).as("c2"))
      .withColumn("cum1", sum("c1").over(byQv))
      .withColumn("cum2", sum("c2").over(byQv))
      .withColumn("n1", sum("c1").over(wAll))
      .withColumn("n2", sum("c2").over(wAll))
    cum.groupBy(groupCol)
      .agg(max("n1").as("n_h1"), max("n2").as("n_h2"),
        max(abs(col("cum1") * col("n2") - col("cum2") * col("n1"))).as("__d"))
      .select(col(groupCol), col("n_h1"), col("n_h2"),
        PortableRound.intRound4(col("__d"), col("n_h1") * col("n_h2")).as("ks"))
      .orderBy(groupCol)
  }

  /** Per-state next-step entropy of the first-order event chain —
    * "given the current event type, how predictable is the next?"
    * (≈0 = deterministic funnel; ln(branching) = uniform noise).
    * The behavioral companion of the transition matrix: same lead()
    * window on the max-cardinality key, then entropy over the
    * type² -bounded transition counts via the H = ln n − (Σ c·ln c)/n
    * identity (one positive-term float sum, no per-term ratios).
    */
  def transitionEntropy(df: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val byTime = Window.partitionBy(keyCol)
      .orderBy(col("__us").asc, col(tieCol).asc)
    df.select(col(keyCol), col(typeCol), col(tieCol),
        unix_micros(col(tsCol)).as("__us"))
      .withColumn("__next", lead(col(typeCol), 1).over(byTime))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("c"))
      .groupBy("from_type")
      .agg(sum("c").as("n_trans"), count(lit(1)).as("branching"),
        round(log(sum("c")) - sum(col("c") * log(col("c"))) / sum("c"), 4)
          .as("h_next"))
      .orderBy("from_type")
  }

  /** Tukey-fence (1.5·IQR) outlier summary per group — the robust
    * companion of the per-user z-score flags: quartiles don't move
    * for a fat tail, so the fences stay meaningful on skewed value
    * distributions where mean±2σ is dragged by the outliers
    * themselves. Quartiles via [[Describe.groupQuantiles]]'s
    * rank-window idiom on the cent-quantized values (quarter-cent
    * interpolation points are dyadic-exact, and ×1.5 keeps the
    * fences exact eighths of a cent — every qv<lo comparison decides
    * identically in both engines); the |groups|-row fence table
    * broadcasts back onto the stream for one counting pass.
    */
  def iqrOutliers(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val ev = df.select(col(groupCol),
      floor(col(valueCol) * 100 + 0.5).cast("long").as("__qv"))
    val fences = Describe.groupQuantiles(ev, groupCol, "__qv",
        Seq("q1c" -> 0.25, "q3c" -> 0.75))
      .select(col(groupCol), col("q1c"), col("q3c"),
        (col("q1c") - lit(1.5) * (col("q3c") - col("q1c"))).as("__lo"),
        (col("q3c") + lit(1.5) * (col("q3c") - col("q1c"))).as("__hi"))
    ev.join(broadcast(fences), Seq(groupCol))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"),
        round(max("q1c") / 100.0, 4).as("q1"),
        round(max("q3c") / 100.0, 4).as("q3"),
        count(when(col("__qv") < col("__lo"), lit(1))).as("n_low"),
        count(when(col("__qv") > col("__hi"), lit(1))).as("n_high"))
      .withColumn("outlier_rate",
        PortableRound.intRound4(col("n_low") + col("n_high"), col("n")))
      .orderBy(groupCol)
  }

  /** Market-basket co-occurrence of event types within a session —
    * "which actions happen together" (support + lift per unordered
    * type pair), the association-mining primitive under
    * recommendation and funnel-design reports. Sessions via the
    * [[sessionStats]] lag + running-sum windows on the
    * max-cardinality key; the basket self-join is KEYED on
    * (key, session) with ≤|types| rows per side per key, and
    * support/lift are single [[PortableRound]] divisions of exact
    * integer count products (lift = n_ab·n_sess / (n_a·n_b)) — no
    * float ratio chain. Output bounded by the type domain squared.
    */
  def basketPairs(df: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, tieCol: String, gapSeconds: Long = 1800,
      scope: graft.api.CacheScope = graft.api.CacheScope.global): DataFrame = {
    val byTime = Window.partitionBy(keyCol)
      .orderBy(col("__us").asc, col(tieCol).asc)
    val gapUs = gapSeconds * 1000000L
    val st = df
      .select(col(keyCol), col(typeCol), col(tieCol),
        unix_micros(col(tsCol)).as("__us"))
      .withColumn("__prev", lag(col("__us"), 1).over(byTime))
      .withColumn("__brk",
        when(col("__prev").isNull || col("__us") - col("__prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("__brk")).over(
        byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col(keyCol), col("sid"), col(typeCol).as("t"))
      .distinct()
    // st is read FOUR times (session count, type counts, both pair
    // sides) — pinned so the sessionization windows + distinct run once
    val stP = scope.persist(st)
    val nSess = stP.select(col(keyCol), col("sid")).distinct()
      .agg(count(lit(1)).as("n_sess"))
    val typeCounts = stP.groupBy("t").agg(count(lit(1)).as("na"))
    val pairs = stP.select(col(keyCol), col("sid"), col("t").as("type_a"))
      .join(stP.select(col(keyCol), col("sid"), col("t").as("type_b")),
        Seq(keyCol, "sid"))
      .filter(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b").agg(count(lit(1)).as("n_ab"))
    pairs
      .join(typeCounts.select(col("t").as("type_a"), col("na").as("n_a")), "type_a")
      .join(typeCounts.select(col("t").as("type_b"), col("na").as("n_b")), "type_b")
      .crossJoin(broadcast(nSess))
      .select(col("type_a"), col("type_b"), col("n_ab"), col("n_a"), col("n_b"),
        PortableRound.intRound4(col("n_ab"), col("n_sess")).as("support"),
        PortableRound.intRound4(col("n_ab") * col("n_sess"),
          col("n_a") * col("n_b")).as("lift"))
      .orderBy("type_a", "type_b")
  }

  /** Per-row quantile normalization of a value within its group —
    * the rank-based feature transform (maps any distribution onto
    * uniform [0,1], outlier-robust where z-scores are not).
    * Scale-correct formulation: the rank window runs over the
    * COMPRESSED (group, cent-value) histogram — bounded by the value
    * domain — never the raw log; per-row values arrive by a keyed
    * join back on (group, cent). Average-rank tie handling in exact
    * integers: qn = (2·cum_below + cnt + 1) / (2·(n + 1)).
    */
  def quantileNormalize(df: DataFrame, groupCol: String, idCol: String,
      valueCol: String): DataFrame = {
    val ev = df.select(col(idCol), col(groupCol),
      floor(col(valueCol) * 100 + 0.5).cast("long").as("qv"))
    val byGroup = Window.partitionBy(groupCol)
    val h = ev.groupBy(groupCol, "qv").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(
        byGroup.orderBy(col("qv").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("cnt")).over(byGroup))
      .select(col(groupCol), col("qv"),
        PortableRound.intRound4(
          lit(2L) * (col("cum") - col("cnt")) + col("cnt") + 1,
          lit(2L) * (col("n") + 1)).as("qn"))
    ev.join(h, Seq(groupCol, "qv"))
      .select(col(idCol), col(groupCol), col("qn"))
      .orderBy(idCol)
  }

  /** Top-k within-session event-type 3-grams — the path-mining table
    * behind "what do users actually do" flow reports (q_event_transitions
    * is the first-order digest; this surfaces the concrete multi-step
    * paths funnel design starts from). ONE window pass on the
    * max-cardinality key computes sessionization AND both leads (all
    * specs share partition+order, so Catalyst fuses them into a single
    * Window operator — no second sort, no (key, session) reshuffle);
    * triples crossing a session boundary are dropped by comparing the
    * led session ids. Output is bounded by |types|³ before the top-k.
    */
  def eventPaths(df: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, tieCol: String, gapSeconds: Long = 1800,
      k: Int = 20): DataFrame = {
    val byTime = Window.partitionBy(keyCol)
      .orderBy(col("__us").asc, col(tieCol).asc)
    val gapUs = gapSeconds * 1000000L
    val triples = df
      .select(col(keyCol), col(typeCol).as("t1"), col(tieCol),
        unix_micros(col(tsCol)).as("__us"))
      .withColumn("__prev", lag(col("__us"), 1).over(byTime))
      .withColumn("__brk",
        when(col("__prev").isNull || col("__us") - col("__prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("__brk")).over(
        byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("t2", lead(col("t1"), 1).over(byTime))
      .withColumn("t3", lead(col("t1"), 2).over(byTime))
      .withColumn("sid2", lead(col("sid"), 1).over(byTime))
      .withColumn("sid3", lead(col("sid"), 2).over(byTime))
      .filter(col("t3").isNotNull &&
        col("sid2") === col("sid") && col("sid3") === col("sid"))
      .groupBy("t1", "t2", "t3").agg(count(lit(1)).as("n"))
    val total = triples.agg(sum("n").as("n_total"))
    triples.crossJoin(broadcast(total))
      .select(col("t1"), col("t2"), col("t3"), col("n"),
        PortableRound.intRound4(col("n"), col("n_total")).as("share"))
      .orderBy(col("n").desc, col("t1").asc, col("t2").asc, col("t3").asc)
      .limit(k)
  }

  /** Hourly session-concurrency profile — peak simultaneous sessions,
    * the capacity-planning number (licenses, connection pools,
    * autoscaler floors). A session [s, e] overlaps hour h iff
    * start_hour ≤ h AND end_hour ≥ h, so
    * n_active(h) = cumStarts(≤h) − cumEnds(<h): both cumulatives run
    * over the CALENDAR-BOUNDED hourly table (hours of the observed
    * span — model-state-sized at any corpus scale), never the event
    * log. The cumulative is a broadcast triangular join on that tiny
    * table (the pack_sequences idiom) because a global running-sum
    * window would drag its rows into one task-partition; sessions come
    * from the same lag+running-sum windows on the max-cardinality user
    * id every sessionized op uses. Hours with no boundary events still
    * appear (sequence over the span) — sessions spanning them count.
    */
  def concurrency(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, gapSeconds: Long = 1800): DataFrame = {
    val byTime = Window.partitionBy(keyCol)
      .orderBy(col("__us").asc, col(tieCol).asc)
    val gapUs = gapSeconds * 1000000L
    val hourUs = 3600000000L
    val sess = df
      .select(col(keyCol), col(tieCol), unix_micros(col(tsCol)).as("__us"))
      .withColumn("__prev", lag(col("__us"), 1).over(byTime))
      .withColumn("__brk",
        when(col("__prev").isNull || col("__us") - col("__prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("__brk")).over(
        byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("sid"))
      .agg(expr(s"min(__us) div $hourUs").as("sh"),
        expr(s"max(__us) div $hourUs").as("eh"))
    val hourly = sess.select(col("sh").as("h"), lit(1L).as("st"), lit(0L).as("en"))
      .unionAll(sess.select(col("eh").as("h"), lit(0L).as("st"), lit(1L).as("en")))
      .groupBy("h").agg(sum("st").as("n_started"), sum("en").as("n_ended"))
    val hours = hourly.agg(min("h").as("mn"), max("h").as("mx"))
      .select(explode(sequence(col("mn"), col("mx"))).as("hour"))
    val hc = hours.join(hourly, col("hour") === col("h"), "left")
      .select(col("hour"),
        coalesce(col("n_started"), lit(0L)).as("n_started"),
        coalesce(col("n_ended"), lit(0L)).as("n_ended"))
    hc.as("a").join(broadcast(hc.as("b")), col("b.hour") <= col("a.hour"))
      .groupBy(col("a.hour").as("hour"))
      .agg(max(col("a.n_started")).as("n_started"),
        max(col("a.n_ended")).as("n_ended"),
        (sum(col("b.n_started")) -
          sum(when(col("b.hour") < col("a.hour"), col("b.n_ended"))
            .otherwise(0L))).as("n_active"))
      .orderBy("hour")
  }

  /** Two-proportion A/B test over a deterministic hash split: users
    * hash into arm A iff unitHash(key, salt) < 0.5 (rerun- and
    * engine-stable — the q_split_assign contract, so the SAME users
    * land in the same arm in every table of the warehouse), converted
    * iff they ever emitted `convType`. One row: per-arm counts, exact
    * integer-rounded rates, and the pooled two-proportion z statistic.
    * Two keyed aggregates (per-user, then global) — no window, no
    * join; the z arithmetic is division/sqrt on exact-integer-derived
    * doubles in an operation order the oracle mirrors token-for-token.
    */
  def abTest(df: DataFrame, keyCol: String, convPred: Column,
      salt: String = "ab"): DataFrame = {
    val perUser = df.groupBy(keyCol)
      .agg(max(when(convPred, 1L).otherwise(0L)).as("conv"))
      .withColumn("__a", Sampling.unitHash(col(keyCol), salt) < 0.5)
    val g = perUser.agg(
      sum(when(col("__a"), 1L).otherwise(0L)).as("n_a"),
      sum(when(col("__a"), col("conv")).otherwise(0L)).as("conv_a"),
      sum(when(!col("__a"), 1L).otherwise(0L)).as("n_b"),
      sum(when(!col("__a"), col("conv")).otherwise(0L)).as("conv_b"))
    val pa = col("conv_a").cast("double") / col("n_a").cast("double")
    val pb = col("conv_b").cast("double") / col("n_b").cast("double")
    val pp = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    val se = sqrt(pp * (lit(1.0) - pp) *
      (lit(1.0) / col("n_a").cast("double") + lit(1.0) / col("n_b").cast("double")))
    // z undefined (and an ANSI divide-by-zero) when either arm is
    // empty or pooled conversion is 0 or 1 — CaseWhen keeps the
    // division unevaluated on that row
    g.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      PortableRound.intRound4(col("conv_a"), col("n_a")).as("rate_a"),
      PortableRound.intRound4(col("conv_b"), col("n_b")).as("rate_b"),
      when(col("n_a") === 0 || col("n_b") === 0 ||
          col("conv_a") + col("conv_b") === 0 ||
          col("conv_a") + col("conv_b") === col("n_a") + col("n_b"),
        lit(null).cast("double"))
        .otherwise(round((pa - pb) / se, 4)).as("z"))
  }
}
