package graft.queries

import graft.Tables
import graft.ops.{AsofJoin, RangeJoin, Sessionize}
import org.apache.spark.sql.functions._

/** Event-stream analytics beyond the windowed agg (SURVEY §2 row 54):
  * gap-based sessionization and semi-structured JSON extraction over
  * the `events` table.
  */
object EventQueries extends QuerySet {

  def all: Seq[Q] = Seq(
    Q("q_sessionize",
      (s, d) => Sessionize.sessionize(Tables.df(s, d, "events"),
        userCol = "user_id", tsCol = "ts", valueCol = "value",
        orderTieBreak = "event_id", gapSeconds = 1800),
      Some(Sessionize.oracleSql("events",
        userCol = "user_id", tsCol = "ts", valueCol = "value",
        orderTieBreak = "event_id", gapSeconds = 1800))),

    // Ordered-sequence conversion funnel (view → click → purchase,
    // strictly increasing ts): three sequential keyed aggregations —
    // each stage's table shrinks to per-user minima BEFORE the next
    // join, so the corpus streams once per step and every join is
    // keyed on the max-cardinality user id (broadcastable under AQE,
    // no skew). No window over the whole event log.
    Q("q_funnel",
      (s, d) => {
        val e = Tables.df(s, d, "events").select("user_id", "event_type", "ts")
        val t1 = e.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts").as("t1"))
        val t2 = e.filter(col("event_type") === "click").join(t1, "user_id")
          .filter(col("ts") > col("t1"))
          .groupBy("user_id").agg(min("ts").as("t2"))
        val t3 = e.filter(col("event_type") === "purchase").join(t2, "user_id")
          .filter(col("ts") > col("t2"))
          .groupBy("user_id").agg(min("ts").as("t3"))
        t1.agg(lit(1).as("step"), lit("view").as("event_type"), count(lit(1)).as("n_users"))
          .unionByName(t2.agg(lit(2).as("step"), lit("click").as("event_type"), count(lit(1)).as("n_users")))
          .unionByName(t3.agg(lit(3).as("step"), lit("purchase").as("event_type"), count(lit(1)).as("n_users")))
          .orderBy("step")
      },
      Some("""WITH t1 AS (
             |  SELECT user_id, min(ts) AS t1 FROM events
             |  WHERE event_type = 'view' GROUP BY user_id),
             |t2 AS (
             |  SELECT e.user_id, min(ts) AS t2 FROM events e
             |  JOIN t1 ON e.user_id = t1.user_id
             |  WHERE event_type = 'click' AND ts > t1.t1 GROUP BY e.user_id),
             |t3 AS (
             |  SELECT e.user_id, min(ts) AS t3 FROM events e
             |  JOIN t2 ON e.user_id = t2.user_id
             |  WHERE event_type = 'purchase' AND ts > t2.t2 GROUP BY e.user_id)
             |SELECT 1 AS step, 'view' AS event_type, count(*) AS n_users FROM t1
             |UNION ALL
             |SELECT 2, 'click', count(*) FROM t2
             |UNION ALL
             |SELECT 3, 'purchase', count(*) FROM t3
             |ORDER BY step""".stripMargin)),

    // Hourly session-concurrency profile: peak simultaneous sessions —
    // the capacity-planning number. n_active(h) = cumStarts(≤h) −
    // cumEnds(<h) over the CALENDAR-BOUNDED hourly table; the
    // cumulative is a broadcast triangular join on that tiny table (a
    // global running-sum window would collapse to one task), sessions
    // from the standard lag+running-sum windows on the max-cardinality
    // user id. Hours with no boundary events still appear.
    Q("q_concurrency",
      (s, d) => graft.ops.EventFeatures.concurrency(
        Tables.df(s, d, "events"), "user_id", "ts", "event_id",
        gapSeconds = 1800),
      Some("""WITH e AS (
             |  SELECT user_id, event_id,
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
             |  FROM events),
             |l AS (
             |  SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
             |  FROM e),
             |m AS (
             |  SELECT *, CASE WHEN prev IS NULL OR us - prev > 1800000000
             |    THEN 1 ELSE 0 END AS brk
             |  FROM l),
             |s AS (
             |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |  FROM m),
             |sess AS (
             |  SELECT user_id, sid,
             |    min(us) // 3600000000 AS sh, max(us) // 3600000000 AS eh
             |  FROM s GROUP BY user_id, sid),
             |hourly AS (
             |  SELECT h, CAST(sum(st) AS BIGINT) AS n_started,
             |    CAST(sum(en) AS BIGINT) AS n_ended
             |  FROM (SELECT sh AS h, 1 AS st, 0 AS en FROM sess
             |        UNION ALL SELECT eh, 0, 1 FROM sess) u
             |  GROUP BY h),
             |hours AS (
             |  SELECT unnest(generate_series(min(h), max(h))) AS hour FROM hourly),
             |hc AS (
             |  SELECT hour, coalesce(n_started, 0) AS n_started,
             |    coalesce(n_ended, 0) AS n_ended
             |  FROM hours LEFT JOIN hourly ON hour = h)
             |SELECT a.hour AS hour,
             |  max(a.n_started) AS n_started,
             |  max(a.n_ended) AS n_ended,
             |  CAST(sum(b.n_started)
             |    - sum(CASE WHEN b.hour < a.hour THEN b.n_ended ELSE 0 END)
             |    AS BIGINT) AS n_active
             |FROM hc a JOIN hc b ON b.hour <= a.hour
             |GROUP BY a.hour
             |ORDER BY hour""".stripMargin)),

    // Attribution-windowed funnel: q_funnel's shape but each step must
    // fire within 900 s of the previous one — the industry-standard
    // "conversion window" semantics (an unbounded funnel credits a
    // purchase weeks after the view). Same scale plan: every stage
    // shrinks to per-user minima BEFORE the next keyed join on the
    // max-cardinality user id; integer-micros bounds decide identically
    // in both engines.
    Q("q_funnel_timebound",
      (s, d) => {
        val winUs = 900L * 1000000L
        val e = Tables.df(s, d, "events")
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("__us"))
        val t1 = e.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("__us").as("t1"))
        val t2 = e.filter(col("event_type") === "click").join(t1, "user_id")
          .filter(col("__us") > col("t1") && col("__us") - col("t1") <= winUs)
          .groupBy("user_id").agg(min("__us").as("t2"))
        val t3 = e.filter(col("event_type") === "purchase").join(t2, "user_id")
          .filter(col("__us") > col("t2") && col("__us") - col("t2") <= winUs)
          .groupBy("user_id").agg(min("__us").as("t3"))
        t1.agg(lit(1).as("step"), lit("view").as("event_type"), count(lit(1)).as("n_users"))
          .unionByName(t2.agg(lit(2).as("step"), lit("click").as("event_type"), count(lit(1)).as("n_users")))
          .unionByName(t3.agg(lit(3).as("step"), lit("purchase").as("event_type"), count(lit(1)).as("n_users")))
          .orderBy("step")
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_type,
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
             |  FROM events),
             |t1 AS (
             |  SELECT user_id, min(us) AS t1 FROM e
             |  WHERE event_type = 'view' GROUP BY user_id),
             |t2 AS (
             |  SELECT e.user_id, min(us) AS t2 FROM e
             |  JOIN t1 ON e.user_id = t1.user_id
             |  WHERE event_type = 'click' AND us > t1.t1
             |    AND us - t1.t1 <= 900000000 GROUP BY e.user_id),
             |t3 AS (
             |  SELECT e.user_id, min(us) AS t3 FROM e
             |  JOIN t2 ON e.user_id = t2.user_id
             |  WHERE event_type = 'purchase' AND us > t2.t2
             |    AND us - t2.t2 <= 900000000 GROUP BY e.user_id)
             |SELECT 1 AS step, 'view' AS event_type, count(*) AS n_users FROM t1
             |UNION ALL
             |SELECT 2, 'click', count(*) FROM t2
             |UNION ALL
             |SELECT 3, 'purchase', count(*) FROM t3
             |ORDER BY step""".stripMargin)),

    // Top-20 within-session event-type 3-grams (path mining): the
    // concrete multi-step flows funnel design starts from, where
    // q_event_transitions gives only the first-order digest. ONE
    // window pass on the max-cardinality user id computes the session
    // break, the running session id, and both leads (shared
    // partition+order fuses them into a single Window operator);
    // output bounded by |types|^3 before the top-k.
    Q("q_event_paths",
      (s, d) => graft.ops.EventFeatures.eventPaths(
        Tables.df(s, d, "events"), "user_id", "event_type", "ts", "event_id",
        gapSeconds = 1800, k = 20),
      Some(s"""WITH e AS (
             |  SELECT user_id, event_type, event_id,
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
             |  FROM events),
             |l AS (
             |  SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
             |  FROM e),
             |m AS (
             |  SELECT *, CASE WHEN prev IS NULL OR us - prev > 1800000000
             |    THEN 1 ELSE 0 END AS brk
             |  FROM l),
             |s AS (
             |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |  FROM m),
             |t AS (
             |  SELECT event_type AS t1,
             |    lead(event_type, 1) OVER w AS t2,
             |    lead(event_type, 2) OVER w AS t3,
             |    sid,
             |    lead(sid, 1) OVER w AS sid2,
             |    lead(sid, 2) OVER w AS sid3
             |  FROM s
             |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
             |tr AS (
             |  SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n FROM t
             |  WHERE t3 IS NOT NULL AND sid2 = sid AND sid3 = sid
             |  GROUP BY t1, t2, t3),
             |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM tr)
             |SELECT t1, t2, t3, n,
             |  ${graft.ops.PortableRound.intRound4Duck("n", "n_total")} AS share
             |FROM tr CROSS JOIN tot
             |ORDER BY n DESC, t1 ASC, t2 ASC, t3 ASC
             |LIMIT 20""".stripMargin)),

    // Two-proportion A/B test on a deterministic hash split: the
    // experimentation primitive (arm = unitHash(user) < 0.5, converted
    // = ever made a >120-value purchase) — z decides whether the arms'
    // conversion rates differ beyond chance (they shouldn't: the split
    // is random-equivalent, so |z| ≲ 2 is itself an A/A sanity check
    // of the assignment hash). The split is the q_split_assign
    // contract, so both engines (and any other table of the warehouse)
    // assign identical arms; rates round in exact integer arithmetic
    // and the z float pipeline is mirrored token-for-token, with the
    // degenerate all/none-converted and empty-arm cases yielding NULL.
    Q("q_ab_test",
      (s, d) => graft.ops.EventFeatures.abTest(
        Tables.df(s, d, "events"), "user_id",
        convPred = col("event_type") === "purchase" && col("value") > 120,
        salt = "ab"),
      Some(s"""WITH u AS (
             |  SELECT user_id,
             |    max(CASE WHEN event_type = 'purchase' AND value > 120
             |        THEN 1 ELSE 0 END) AS conv
             |  FROM events GROUP BY user_id),
             |a AS (
             |  SELECT conv,
             |    (${graft.ops.Sampling.unitHashDuckSql("user_id", "ab")}) < 0.5 AS in_a
             |  FROM u),
             |g AS (
             |  SELECT
             |    CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             |    CAST(sum(CASE WHEN in_a THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
             |    CAST(sum(CASE WHEN NOT in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             |    CAST(sum(CASE WHEN NOT in_a THEN conv ELSE 0 END) AS BIGINT) AS conv_b
             |  FROM a)
             |SELECT n_a, conv_a, n_b, conv_b,
             |  ${graft.ops.PortableRound.intRound4Duck("conv_a", "n_a")} AS rate_a,
             |  ${graft.ops.PortableRound.intRound4Duck("conv_b", "n_b")} AS rate_b,
             |  CASE WHEN n_a = 0 OR n_b = 0 OR conv_a + conv_b = 0
             |         OR conv_a + conv_b = n_a + n_b THEN NULL
             |    ELSE round((CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
             |         - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
             |    / sqrt((CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
             |           * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
             |           * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))), 4)
             |  END AS z
             |FROM g""".stripMargin)),

    // Market-basket co-occurrence of event types within a session —
    // support + lift per unordered type pair, the association-mining
    // primitive under recommendation / funnel-design reports (lift>1:
    // the pair co-occurs more than independent sessions would). The
    // basket self-join is KEYED on (user, session) with ≤|types| rows
    // per side per key; lift = n_ab·n_sess/(n_a·n_b) decides as one
    // PortableRound division of exact integer products.
    Q("q_basket_pairs",
      (s, d) => graft.ops.EventFeatures.basketPairs(
        Tables.df(s, d, "events"), "user_id", "event_type", "ts", "event_id",
        gapSeconds = 1800),
      Some(s"""WITH e AS (
             |  SELECT user_id, event_type, event_id,
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
             |  FROM events),
             |l AS (
             |  SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
             |  FROM e),
             |m AS (
             |  SELECT *, CASE WHEN prev IS NULL OR us - prev > 1800000000
             |    THEN 1 ELSE 0 END AS brk
             |  FROM l),
             |s AS (
             |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |  FROM m),
             |st AS (SELECT DISTINCT user_id, sid, event_type AS t FROM s),
             |ns AS (SELECT CAST(count(*) AS BIGINT) AS n_sess
             |       FROM (SELECT DISTINCT user_id, sid FROM st)),
             |tc AS (SELECT t, CAST(count(*) AS BIGINT) AS na FROM st GROUP BY t),
             |p AS (
             |  SELECT a.t AS type_a, b.t AS type_b, CAST(count(*) AS BIGINT) AS n_ab
             |  FROM st a JOIN st b ON a.user_id = b.user_id AND a.sid = b.sid
             |    AND a.t < b.t
             |  GROUP BY a.t, b.t)
             |SELECT type_a, type_b, n_ab, ta.na AS n_a, tb.na AS n_b,
             |  ${graft.ops.PortableRound.intRound4Duck("n_ab", "n_sess")} AS support,
             |  ${graft.ops.PortableRound.intRound4Duck(
                  "n_ab * n_sess", "ta.na * tb.na")} AS lift
             |FROM p
             |JOIN tc ta ON ta.t = p.type_a
             |JOIN tc tb ON tb.t = p.type_b
             |CROSS JOIN ns
             |ORDER BY type_a, type_b""".stripMargin)),

    // Per-user conversion lag: first 'view' → first LATER 'purchase',
    // in integer seconds — the time-to-convert table an attribution /
    // campaign report aggregates. The q_funnel shape (each stage
    // shrinks to per-user minima BEFORE the next keyed join on the
    // max-cardinality user id); floor-div micros keeps the lag exact.
    Q("q_conversion_lag",
      (s, d) => {
        val e = Tables.df(s, d, "events")
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("__us"))
        val v = e.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("__us").as("t_view"))
        e.filter(col("event_type") === "purchase")
          .join(v, "user_id")
          .filter(col("__us") > col("t_view"))
          .groupBy("user_id", "t_view").agg(min("__us").as("t_purchase"))
          .select(col("user_id"),
            expr("(t_purchase - t_view) div 1000000").as("lag_s"))
          .orderBy("user_id")
      },
      Some("""WITH v AS (
             |  SELECT user_id, min(epoch_us(CAST(ts AS TIMESTAMP))) AS t_view
             |  FROM events WHERE event_type = 'view' GROUP BY user_id),
             |p AS (
             |  SELECT e.user_id, v.t_view,
             |    min(epoch_us(CAST(ts AS TIMESTAMP))) AS t_purchase
             |  FROM events e JOIN v ON e.user_id = v.user_id
             |  WHERE e.event_type = 'purchase'
             |    AND epoch_us(CAST(ts AS TIMESTAMP)) > v.t_view
             |  GROUP BY e.user_id, v.t_view)
             |SELECT user_id, (t_purchase - t_view) // 1000000 AS lag_s
             |FROM p ORDER BY user_id""".stripMargin)),

    // Weekly churn: of the users active in epoch-week w, the fraction
    // NOT seen in week w+1 — the retention dashboard's inverse, one
    // number per calendar week. (user, week) distinct activity,
    // retained = left self-join shifted one week on the
    // max-cardinality user id; the final (data-max) week is excluded
    // — its churn is undefined, not 100%. Integer week arithmetic
    // (micros div week) and a PortableRound rate.
    Q("q_churn_weekly",
      (s, d) => {
        val wk = Tables.df(s, d, "events")
          .select(col("user_id"),
            expr("unix_micros(ts) div 604800000000").as("wk"))
          .distinct()
        val nxt = wk.select(col("user_id"), (col("wk") - 1).as("wk"))
          .withColumn("__ret", lit(1L))
        val maxWk = wk.agg(max("wk").as("max_wk"))
        wk.join(nxt, Seq("user_id", "wk"), "left")
          .crossJoin(broadcast(maxWk))
          .filter(col("wk") < col("max_wk"))
          .groupBy("wk")
          .agg(count(lit(1)).as("n_active"), count(col("__ret")).as("n_retained"))
          .withColumn("churn_rate", graft.ops.PortableRound.intRound4(
            col("n_active") - col("n_retained"), col("n_active")))
          .orderBy("wk")
      },
      Some(s"""WITH wk AS (
             |  SELECT DISTINCT user_id,
             |    epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS wk
             |  FROM events),
             |mx AS (SELECT max(wk) AS max_wk FROM wk)
             |SELECT w.wk, CAST(count(*) AS BIGINT) AS n_active,
             |  CAST(count(n.user_id) AS BIGINT) AS n_retained,
             |  ${graft.ops.PortableRound.intRound4Duck(
                  "count(*) - count(n.user_id)", "count(*)")} AS churn_rate
             |FROM wk w
             |LEFT JOIN wk n ON n.user_id = w.user_id AND n.wk = w.wk + 1
             |CROSS JOIN mx
             |WHERE w.wk < mx.max_wk
             |GROUP BY w.wk ORDER BY w.wk""".stripMargin)),

    // Semi-structured access: JSON property extraction + typed cast,
    // aggregated — the engine analog of querying nested object fields.
    Q("q_json_extract",
      (s, d) => Tables.df(s, d, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          // avg of a BIGINT is an integer ratio — integer-exact 4dp
          graft.ops.PortableRound.intRound4(sum("k"), count(col("k"))).as("avg_k"),
          max("k").as("max_k"))
        .orderBy("event_type"),
      Some(s"""SELECT event_type, count(*) AS n,
             |  ${graft.ops.PortableRound.intRound4Duck("sum(k)", "count(k)")} AS avg_k,
             |  max(k) AS max_k
             |FROM (SELECT event_type,
             |        CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k
             |      FROM events) t
             |GROUP BY event_type
             |ORDER BY event_type""".stripMargin)),

    // As-of join: each purchase matched to the user's LATEST prior (or
    // same-instant) click — last-touch attribution. The oracle replays
    // the identical union-window formulation (DuckDB's native ASOF JOIN
    // picks an unspecified row on exact-ts ties; the window form pins
    // the tie-break to max event_id on both engines).
    Q("q_asof_join",
      (s, d) => {
        val ev = Tables.df(s, d, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"),
            unix_micros(col("ts")).as("ts_us"))
        AsofJoin.asofJoin(purchases, clicks, keys = Seq("user_id"), tsCol = "ts",
            rightIdCol = "event_id", rightCols = Seq("event_id", "value", "ts_us"))
          .select(col("event_id"), col("user_id"),
            col("asof_event_id"), col("asof_value"),
            (unix_micros(col("ts")) - col("asof_ts_us")).as("gap_us"))
          .orderBy("event_id")
      },
      Some("""WITH u AS (
             |  SELECT user_id, CAST(ts AS TIMESTAMP) AS uts, 1 AS side,
             |         CAST(NULL AS BIGINT) AS rid, event_id AS l_event_id,
             |         CAST(NULL AS STRUCT(event_id BIGINT, "value" DOUBLE, ts_us BIGINT)) AS r
             |  FROM events WHERE event_type = 'purchase'
             |  UNION ALL
             |  SELECT user_id, CAST(ts AS TIMESTAMP), 0, event_id, NULL,
             |         struct_pack(event_id := event_id, "value" := "value",
             |                     ts_us := epoch_us(CAST(ts AS TIMESTAMP)))
             |  FROM events WHERE event_type = 'click'),
             |w AS (
             |  SELECT *,
             |    last_value(r IGNORE NULLS) OVER (
             |      PARTITION BY user_id ORDER BY uts, side, rid
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
             |  FROM u)
             |SELECT l_event_id AS event_id, user_id,
             |  struct_extract(m, 'event_id') AS asof_event_id,
             |  struct_extract(m, 'value') AS asof_value,
             |  epoch_us(uts) - struct_extract(m, 'ts_us') AS gap_us
             |FROM w WHERE side = 1
             |ORDER BY event_id""".stripMargin)),

    // Range join: ALL clicks within the 30 minutes before each purchase
    // (multi-match attribution window). Bucketized hash join — no
    // nested-loop anywhere; the oracle states the containment directly.
    Q("q_range_join",
      (s, d) => {
        val ev = Tables.df(s, d, "events")
        val halfHourUs = 1800L * 1000000L
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"),
            (unix_micros(col("ts")) - halfHourUs).as("lo_us"),
            unix_micros(col("ts")).as("hi_us"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"),
            unix_micros(col("ts")).as("c_us"))
        RangeJoin.rangeJoin(clicks, purchases, keys = Seq("user_id"),
            ptCol = "c_us", loCol = "lo_us", hiCol = "hi_us", bucketWidth = halfHourUs)
          .select(col("r_purchase_id").as("purchase_id"), col("click_id"),
            (col("r_hi_us") - col("c_us")).as("gap_us"))
          .orderBy("purchase_id", "click_id")
      },
      Some("""SELECT p.event_id AS purchase_id, c.event_id AS click_id,
             |  epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(c.ts AS TIMESTAMP)) AS gap_us
             |FROM events p JOIN events c ON p.user_id = c.user_id
             |WHERE p.event_type = 'purchase' AND c.event_type = 'click'
             |  AND epoch_us(CAST(c.ts AS TIMESTAMP))
             |      BETWEEN epoch_us(CAST(p.ts AS TIMESTAMP)) - 1800000000
             |          AND epoch_us(CAST(p.ts AS TIMESTAMP))
             |ORDER BY purchase_id, click_id""".stripMargin)),

    // Hour-of-day seasonality profile: event counts per (UTC hour ×
    // type) with the share within each type — the load/seasonality
    // report behind capacity planning and bot detection (a type with a
    // flat profile is automation). Integer epoch-hour arithmetic
    // (micros div hour, mod 24 — exact in both engines); one
    // bounded-key (24 × types) aggregate, count rides a second
    // bounded-key window.
    Q("q_hour_profile",
      (s, d) => Tables.df(s, d, "events")
        .select(col("event_type"),
          expr("(unix_micros(ts) div 3600000000) % 24").cast("int").as("hour"))
        .groupBy("event_type", "hour")
        .agg(count(lit(1)).as("n"))
        .withColumn("share", graft.ops.PortableRound.intRound4(col("n"),
          sum("n").over(org.apache.spark.sql.expressions.Window
            .partitionBy("event_type"))))
        .orderBy("event_type", "hour"),
      Some(s"""WITH h AS (
             |  SELECT event_type,
             |    CAST((epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) % 24 AS INT) AS hour
             |  FROM events),
             |c AS (
             |  SELECT event_type, hour, CAST(count(*) AS BIGINT) AS n
             |  FROM h GROUP BY event_type, hour)
             |SELECT event_type, hour, n,
             |  ${graft.ops.PortableRound.intRound4Duck("n", "sum(n) OVER (PARTITION BY event_type)")} AS share
             |FROM c
             |ORDER BY event_type, hour""".stripMargin)),

    // Day-of-week × type seasonality profile — q_hour_profile's weekly
    // companion (weekday/weekend shape drives staffing + anomaly
    // baselines; a flat weekly profile is the same bot signal as a
    // flat hourly one). Pure integer bucketing: dow = (epoch_day + 4)
    // mod 7 with 0 = Sunday (1970-01-01 was a Thursday) — identical
    // floor-div/mod arithmetic in both engines; bounded 7 × |types|
    // aggregate.
    Q("q_dow_profile",
      (s, d) => Tables.df(s, d, "events")
        .select(col("event_type"),
          expr("((unix_micros(ts) div 86400000000) + 4) % 7").cast("int").as("dow"))
        .groupBy("event_type", "dow")
        .agg(count(lit(1)).as("n"))
        .withColumn("share", graft.ops.PortableRound.intRound4(col("n"),
          sum("n").over(org.apache.spark.sql.expressions.Window
            .partitionBy("event_type"))))
        .orderBy("event_type", "dow"),
      Some(s"""WITH h AS (
             |  SELECT event_type,
             |    CAST(((epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000) + 4) % 7 AS INT) AS dow
             |  FROM events),
             |c AS (
             |  SELECT event_type, dow, CAST(count(*) AS BIGINT) AS n
             |  FROM h GROUP BY event_type, dow)
             |SELECT event_type, dow, n,
             |  ${graft.ops.PortableRound.intRound4Duck("n", "sum(n) OVER (PARTITION BY event_type)")} AS share
             |FROM c
             |ORDER BY event_type, dow""".stripMargin)),

    // Event-type transition matrix (first-order Markov counts + rates):
    // what users do NEXT after each event type — the funnel-discovery /
    // navigation-analysis query. lead() windows partition on the
    // max-cardinality user id; the (from, to) output and the rate
    // normalizer are bounded by the event-type domain squared. The
    // oracle orders by the micros-cast timestamp (the Sessionize
    // convention) so both engines see identical event sequences.
    Q("q_event_transitions",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
        Tables.df(s, d, "events")
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("__next", lead("event_type", 1).over(w))
          .filter(col("__next").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("__next").as("to_type"))
          .agg(count(lit(1)).as("n"))
          .withColumn("rate", graft.ops.PortableRound.intRound4(col("n"),
            sum("n").over(org.apache.spark.sql.expressions.Window
              .partitionBy("from_type"))))
          .orderBy("from_type", "to_type")
      },
      Some(s"""WITH p AS (
             |  SELECT event_type AS from_type,
             |    lead(event_type) OVER (PARTITION BY user_id
             |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS to_type
             |  FROM events),
             |c AS (
             |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
             |  FROM p WHERE to_type IS NOT NULL
             |  GROUP BY from_type, to_type)
             |SELECT from_type, to_type, n,
             |  ${graft.ops.PortableRound.intRound4Duck("n", "sum(n) OVER (PARTITION BY from_type)")} AS rate
             |FROM c
             |ORDER BY from_type, to_type""".stripMargin)),

    // Per-user z-score anomaly flags on the event value stream — the
    // monitoring query an event pipeline runs continuously (fraud /
    // sensor-drift / spam-burst detection): |z| >= 2 vs the user's own
    // mean/std, users with < 5 events or zero variance skipped. All
    // windows partition on the max-cardinality user id (no skew, no
    // global pass); z pre-rounds to 4dp so both engines apply the
    // identical threshold.
    Q("q_anomaly",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
        Tables.df(s, d, "events")
          .select(col("event_id"), col("user_id"), col("value"))
          .withColumn("__mu", avg("value").over(w))
          .withColumn("__sd", stddev_pop("value").over(w))
          .withColumn("__n", count(lit(1)).over(w))
          .withColumn("z", round((col("value") - col("__mu")) / col("__sd"), 4))
          .filter(col("__n") >= 5 && col("__sd") > 0 && abs(col("z")) >= 2.0)
          .select(col("event_id"), col("user_id"), col("z"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, z FROM (
             |  SELECT event_id, user_id,
             |    round((value - avg(value) OVER w) / (stddev_pop(value) OVER w), 4) AS z,
             |    count(*) OVER w AS n, stddev_pop(value) OVER w AS sd
             |  FROM events WINDOW w AS (PARTITION BY user_id)) t
             |WHERE n >= 5 AND sd > 0 AND abs(z) >= 2.0
             |ORDER BY event_id""".stripMargin)),

    // Per-user exponentially-weighted moving average of the event
    // value stream — the smoothing primitive under drift dashboards
    // and alert hysteresis. Truncated 8-lag form (decay 0.75^i,
    // 0.75^8 < 0.1 of a step weight) rather than the recursion:
    // ewma_t = Σ w_i·x_{t-i} / Σ w_i over the lags that exist — ONE
    // window pass partitioned on the max-cardinality user id. The
    // weights are dyadic rationals (0.75 = 3/4), so every product and
    // the left-assoc sums evaluate bit-identically in both engines;
    // the oracle repeats the identical lag/arithmetic shape.
    Q("q_ewma",
      (s, d) => graft.ops.Ewma.ewma(Tables.df(s, d, "events"),
        keyCol = "user_id", tsCol = "ts", tieCol = "event_id",
        valueCol = "value")
        .orderBy("event_id"),
      Some(graft.ops.Ewma.ewmaDuckSql("events",
        keyCol = "user_id", tsSql = "CAST(ts AS TIMESTAMP)",
        tieCol = "event_id", valueCol = "value") + "\nORDER BY event_id")),

    // Weekly retention-cohort matrix — the standing product-analytics
    // report: users grouped by first-seen epoch week, distinct-user
    // counts at each week offset, rate vs the cohort size. Integer
    // epoch-week arithmetic (micros div week — exact in both engines;
    // a double division at 1e15 magnitudes would not be). Shuffles:
    // first-seen groupBy + (user, week) distinct + one keyed join on
    // the max-cardinality user id; the cohort×offset output and the
    // cohort-size side are calendar-bounded.
    Q("q_retention",
      (s, d) => {
        val e = Tables.df(s, d, "events")
          .select(col("user_id"),
            expr("unix_micros(ts) div 604800000000").as("wk"))
        val firstWk = e.groupBy("user_id").agg(min("wk").as("cohort"))
        val act = e.distinct()
        val byCohort = act.join(firstWk, "user_id")
          .select(col("cohort"), (col("wk") - col("cohort")).as("offset_wk"))
          .groupBy("cohort", "offset_wk").agg(count(lit(1)).as("n_users"))
        val sizes = firstWk.groupBy("cohort").agg(count(lit(1)).as("n0"))
        byCohort.join(sizes, "cohort")
          .select(col("cohort"), col("offset_wk"), col("n_users"),
            graft.ops.PortableRound.intRound4(col("n_users"), col("n0")).as("rate"))
          .orderBy("cohort", "offset_wk")
      },
      Some(s"""WITH e AS (
             |  SELECT user_id,
             |    epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS wk
             |  FROM events),
             |fw AS (SELECT user_id, min(wk) AS cohort FROM e GROUP BY user_id),
             |act AS (SELECT DISTINCT user_id, wk FROM e),
             |ro AS (
             |  SELECT cohort, wk - cohort AS offset_wk,
             |    CAST(count(*) AS BIGINT) AS n_users
             |  FROM act JOIN fw USING (user_id)
             |  GROUP BY cohort, wk - cohort),
             |cs AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n0 FROM fw GROUP BY cohort)
             |SELECT ro.cohort, ro.offset_wk, ro.n_users,
             |  ${graft.ops.PortableRound.intRound4Duck("ro.n_users", "cs.n0")} AS rate
             |FROM ro JOIN cs USING (cohort)
             |ORDER BY cohort, offset_wk""".stripMargin)),

    // Inter-arrival gap profile per event type — the engagement /
    // rate-limit calibration table (median + p90 seconds between a
    // user's consecutive events of each type; a median collapsing
    // toward zero is a bot signature the hour-profile can miss).
    // Gaps derive from INTEGER micros via a lag window on the
    // max-cardinality user id; the exact per-type quantiles ride the
    // bounded event-type domain (groupQuantiles), and integer inputs
    // keep the interpolation dyadic-exact in both engines.
    Q("q_interarrival",
      (s, d) => {
        // INTEGER-second gaps (floor-div — `div`//`//` agree on the
        // non-negative diffs), so the quantile interpolation inputs
        // are integers and every interpolated value is dyadic-exact
        val gaps = Tables.df(s, d, "events")
          .select(col("user_id"), col("event_type"), col("event_id"),
            unix_micros(col("ts")).as("__us"))
          .withColumn("__gap_s",
            expr("(__us - lag(__us, 1) OVER (PARTITION BY user_id, event_type " +
              "ORDER BY __us ASC, event_id ASC)) div 1000000").cast("double"))
          .filter(col("__gap_s").isNotNull)
        graft.ops.Describe.groupQuantiles(gaps, "event_type", "__gap_s",
          Seq("p50_s" -> 0.5, "p90_s" -> 0.9))
      },
      Some("""WITH g AS (
             |  SELECT event_type,
             |    (epoch_us(CAST(ts AS TIMESTAMP)) -
             |     lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
             |       PARTITION BY user_id, event_type
             |       ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
             |    ) // 1000000 AS gap_s
             |  FROM events)
             |SELECT event_type, CAST(count(gap_s) AS BIGINT) AS n,
             |  round(quantile_cont(gap_s, 0.5), 4) AS p50_s,
             |  round(quantile_cont(gap_s, 0.9), 4) AS p90_s
             |FROM g
             |WHERE gap_s IS NOT NULL
             |GROUP BY event_type
             |ORDER BY event_type""".stripMargin)),

    // Per-user behavioral feature vector — the feature-engineering
    // table a churn/segmentation model trains on: volume, breadth
    // (distinct types + Shannon entropy over the type mix), value
    // level, and active span. Entropy via the H = ln n − (Σ c·ln c)/n
    // identity: one positive-term float sum, no per-term ratios — the
    // cross-engine-stable formulation (same class as q_corpus_kl).
    // Two aggregates over the same user_id shuffle key joined back;
    // both sides arrive hash-partitioned on user_id, so the join
    // reuses the exchange instead of adding one.
    Q("q_user_features",
      (s, d) => graft.ops.EventFeatures.userFeatures(
        Tables.df(s, d, "events"), "user_id", "event_type", "ts", "value"),
      Some("""WITH bt AS (
             |  SELECT user_id, event_type, count(*) AS c
             |  FROM events GROUP BY user_id, event_type),
             |mix AS (
             |  SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
             |    count(*) AS n_types,
             |    round(ln(CAST(sum(c) AS DOUBLE)) -
             |          sum(c * ln(c)) / CAST(sum(c) AS DOUBLE), 4) AS type_entropy
             |  FROM bt GROUP BY user_id),
             |base AS (
             |  SELECT user_id,
             |    """.stripMargin + graft.ops.PortableRound.intRound4Duck(
               "CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)",
               "100 * count(*)") + """ AS mean_value,
             |    (max(epoch_us(CAST(ts AS TIMESTAMP))) -
             |     min(epoch_us(CAST(ts AS TIMESTAMP)))) // 86400000000 AS span_days
             |  FROM events GROUP BY user_id)
             |SELECT user_id, n_events, n_types, type_entropy, mean_value, span_days
             |FROM mix JOIN base USING (user_id)
             |ORDER BY user_id""".stripMargin)),

    // First-half vs second-half mean shift per event type (time-
    // ordered row_number split at n div 2) — the cheap distribution-
    // drift check between the early and late halves of the stream;
    // |drift| far from zero says the metric moved mid-corpus.
    // Deterministic INTEGER split (row_number over the unique
    // (ts, event_id) order); the windows partition on event_type —
    // no partition-less window, one shuffle serves both specs.
    Q("q_value_drift",
      (s, d) => graft.ops.EventFeatures.valueDrift(
        Tables.df(s, d, "events"), "event_type", "ts", "event_id", "value"),
      Some("""WITH r AS (
             |  SELECT event_type,
             |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS qv,
             |    row_number() OVER (PARTITION BY event_type
             |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn,
             |    count(*) OVER (PARTITION BY event_type) AS n
             |  FROM events),
             |h AS (
             |  SELECT event_type, CAST(max(n) AS BIGINT) AS n_events,
             |    """.stripMargin
        + graft.ops.PortableRound.intRound4Duck(
            "CAST(sum(CASE WHEN rn <= n // 2 THEN qv END) AS BIGINT)",
            "100 * count(CASE WHEN rn <= n // 2 THEN 1 END)") + " AS mean_h1,\n    "
        + graft.ops.PortableRound.intRound4Duck(
            "CAST(sum(CASE WHEN rn > n // 2 THEN qv END) AS BIGINT)",
            "100 * count(CASE WHEN rn > n // 2 THEN 1 END)") + """ AS mean_h2
             |  FROM r GROUP BY event_type)
             |SELECT event_type, n_events, mean_h1, mean_h2,
             |  round(mean_h2 - mean_h1, 4) AS drift
             |FROM h ORDER BY event_type""".stripMargin)),

    // Population Stability Index per event type (first half vs second
    // half, q_value_drift's split) — the model-monitoring drift
    // standard (PSI < 0.1 stable / 0.1–0.25 watch / > 0.25 shift),
    // complementing the KS sup-statistic with a per-bucket
    // decomposition that says WHERE the mass moved. Buckets are the
    // DECILES OF THE FIRST HALF on cent-quantized integers: ntile(10)
    // ordered by (cent, stream-position) — a deterministic total
    // order, so both engines cut identical boundaries — then ONE rule
    // (bucket = #boundaries < x) buckets BOTH halves, so ties straddle
    // identically. Shares divide exact integers; the ε=1e-4 clamp
    // (standard PSI practice) keeps empty buckets finite; ln rides
    // floatRound4 on identical doubles.
    Q("q_psi",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("event_type")
        // pinned (the q_acf discipline): h1's two readers, h2, and the
        // totals aggregate all read r — unpersisted, the events scan +
        // BOTH windows re-ran four times (22 Window nodes in the
        // before plan). Four narrow columns per event row.
        val r = graft.api.CacheScope.global.persist(
          Tables.df(s, d, "events")
            .select(col("event_type"),
              floor(col("value") * 100 + lit(0.5)).cast("long").as("qv"),
              unix_micros(col("ts")).as("__us"), col("event_id"))
            .withColumn("rn", row_number().over(
              w.orderBy(col("__us").asc, col("event_id").asc)))
            .withColumn("n", count(lit(1)).over(w))
            .drop("__us", "event_id"))
        val h1 = r.filter(col("rn") <= expr("n div 2"))
        val h2 = r.filter(col("rn") > expr("n div 2"))
        val deciled = h1.withColumn("dec", ntile(10).over(
          w.orderBy(col("qv").asc, col("rn").asc)))
        val bcols = (1 to 9).map(i =>
          max(when(col("dec") === i, col("qv"))).as(s"b$i"))
        // bounds is broadcast into BOTH bucketed halves — pinned so the
        // ntile window runs once (types-bounded frame)
        val bounds = graft.api.CacheScope.global.persist(
          deciled.groupBy("event_type")
            .agg(bcols.head, bcols.tail: _*))
        def bucketed(h: org.apache.spark.sql.DataFrame) = h
          .join(broadcast(bounds), "event_type")
          .withColumn("bucket", (1 to 9).map(i =>
            (col("qv") > col(s"b$i")).cast("long")).reduce(_ + _))
          .groupBy("event_type", "bucket").agg(count(lit(1)).as("c"))
        val exp = bucketed(h1).select(col("event_type"), col("bucket"),
          col("c").as("n_expected"))
        val act = bucketed(h2).select(col("event_type"), col("bucket"),
          col("c").as("n_actual"))
        val tot = r.groupBy("event_type").agg(
          expr("max(n div 2)").as("n1"), (max("n") - expr("max(n div 2)")).as("n2"))
        // full (type × bucket 0..9) grid so empty buckets appear on
        // both sides (types-bounded crossJoin)
        val grid = tot.select(col("event_type"), col("n1"), col("n2"))
          .crossJoin(broadcast(
            s.range(0, 10).select(col("id").as("bucket"))))
        val pe = col("n_expected").cast("double") / col("n1").cast("double")
        val pa = col("n_actual").cast("double") / col("n2").cast("double")
        val pec = greatest(pe, lit(1e-4))
        val pac = greatest(pa, lit(1e-4))
        grid.join(exp, Seq("event_type", "bucket"), "left")
          .join(act, Seq("event_type", "bucket"), "left")
          .na.fill(0L, Seq("n_expected", "n_actual"))
          .select(col("event_type"), col("bucket"),
            col("n_expected"), col("n_actual"),
            graft.ops.PortableRound.intRound4(col("n_expected"), col("n1")).as("expected_share"),
            graft.ops.PortableRound.intRound4(col("n_actual"), col("n2")).as("actual_share"),
            graft.ops.PortableRound.floatRound4(
              (pac - pec) * log(pac / pec)).as("psi_term"))
          .orderBy("event_type", "bucket")
      },
      Some(s"""WITH r AS (
             |  SELECT event_type,
             |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS qv,
             |    row_number() OVER (PARTITION BY event_type
             |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn,
             |    count(*) OVER (PARTITION BY event_type) AS n
             |  FROM events),
             |h1 AS (SELECT * FROM r WHERE rn <= n // 2),
             |h2 AS (SELECT * FROM r WHERE rn > n // 2),
             |dec AS (SELECT event_type, qv,
             |          ntile(10) OVER (PARTITION BY event_type ORDER BY qv, rn) AS dec
             |        FROM h1),
             |bounds AS (SELECT event_type,
             |    ${(1 to 9).map(i => s"max(CASE WHEN dec = $i THEN qv END) AS b$i").mkString(",\n             |    ")}
             |  FROM dec GROUP BY event_type),
             |be AS (SELECT h.event_type,
             |         ${(1 to 9).map(i => s"CASE WHEN h.qv > b.b$i THEN 1 ELSE 0 END").mkString(" + ")} AS bucket
             |       FROM h1 h JOIN bounds b ON b.event_type = h.event_type),
             |ba AS (SELECT h.event_type,
             |         ${(1 to 9).map(i => s"CASE WHEN h.qv > b.b$i THEN 1 ELSE 0 END").mkString(" + ")} AS bucket
             |       FROM h2 h JOIN bounds b ON b.event_type = h.event_type),
             |ce AS (SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS n_expected
             |       FROM be GROUP BY 1, 2),
             |ca AS (SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS n_actual
             |       FROM ba GROUP BY 1, 2),
             |tot AS (SELECT event_type, CAST(max(n) // 2 AS BIGINT) AS n1,
             |          CAST(max(n) - max(n) // 2 AS BIGINT) AS n2
             |        FROM r GROUP BY event_type),
             |grid AS (SELECT t.event_type, t.n1, t.n2, g.bucket
             |         FROM tot t CROSS JOIN
             |           (SELECT unnest(range(0, 10)) AS bucket) g),
             |f AS (
             |  SELECT g.event_type, CAST(g.bucket AS BIGINT) AS bucket,
             |    coalesce(ce.n_expected, 0) AS n_expected,
             |    coalesce(ca.n_actual, 0) AS n_actual, g.n1, g.n2,
             |    greatest(CAST(coalesce(ce.n_expected, 0) AS DOUBLE) / g.n1, 0.0001) AS pec,
             |    greatest(CAST(coalesce(ca.n_actual, 0) AS DOUBLE) / g.n2, 0.0001) AS pac
             |  FROM grid g
             |  LEFT JOIN ce ON ce.event_type = g.event_type AND ce.bucket = g.bucket
             |  LEFT JOIN ca ON ca.event_type = g.event_type AND ca.bucket = g.bucket)
             |SELECT event_type, bucket, n_expected, n_actual,
             |  ${graft.ops.PortableRound.intRound4Duck("n_expected", "n1")} AS expected_share,
             |  ${graft.ops.PortableRound.intRound4Duck("n_actual", "n2")} AS actual_share,
             |  ${graft.ops.PortableRound.floatRound4Duck("(pac - pec) * ln(pac / pec)")} AS psi_term
             |FROM f ORDER BY event_type, bucket""".stripMargin)),

    // Two-sample Kolmogorov–Smirnov drift per event type (first half
    // vs second half of the stream, q_value_drift's split) — the
    // whole-distribution drift test: a variance or tail shift with an
    // unmoved mean is invisible to the mean-shift check and lights up
    // here. CDFs ride running-sum windows over the COMPRESSED
    // (type, cent) histogram; the sup decides as the exact INTEGER
    // cross-multiplication |cum1·n2 − cum2·n1|, divided once at the
    // end (PortableRound) — no float comparison picks the max.
    Q("q_ks_drift",
      (s, d) => graft.ops.EventFeatures.ksDrift(
        Tables.df(s, d, "events"), "event_type", "ts", "event_id", "value"),
      Some(s"""WITH r AS (
             |  SELECT event_type,
             |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS qv,
             |    row_number() OVER (PARTITION BY event_type
             |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn,
             |    count(*) OVER (PARTITION BY event_type) AS n
             |  FROM events),
             |c AS (
             |  SELECT event_type, qv,
             |    CAST(count(CASE WHEN rn <= n // 2 THEN 1 END) AS BIGINT) AS c1,
             |    CAST(count(CASE WHEN rn > n // 2 THEN 1 END) AS BIGINT) AS c2
             |  FROM r GROUP BY event_type, qv),
             |k AS (
             |  SELECT event_type,
             |    sum(c1) OVER (PARTITION BY event_type ORDER BY qv
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
             |    sum(c2) OVER (PARTITION BY event_type ORDER BY qv
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2,
             |    sum(c1) OVER (PARTITION BY event_type) AS n1,
             |    sum(c2) OVER (PARTITION BY event_type) AS n2
             |  FROM c)
             |SELECT event_type, CAST(max(n1) AS BIGINT) AS n_h1,
             |  CAST(max(n2) AS BIGINT) AS n_h2,
             |  ${graft.ops.PortableRound.intRound4Duck(
                  "max(abs(cum1 * n2 - cum2 * n1))", "max(n1) * max(n2)")} AS ks
             |FROM k GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Per-state next-step entropy of the first-order event chain —
    // "given the current event type, how predictable is the next?"
    // (≈0 = deterministic funnel, ln(branching) = uniform noise); the
    // behavioral digest of q_event_transitions' matrix. Same lead()
    // window on the max-cardinality user id; entropy over the
    // type²-bounded counts via the one-float-sum H identity.
    Q("q_transition_entropy",
      (s, d) => graft.ops.EventFeatures.transitionEntropy(
        Tables.df(s, d, "events"), "user_id", "event_type", "ts", "event_id"),
      Some("""WITH p AS (
             |  SELECT event_type AS from_type,
             |    lead(event_type) OVER (PARTITION BY user_id
             |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS to_type
             |  FROM events),
             |c AS (
             |  SELECT from_type, to_type, count(*) AS c
             |  FROM p WHERE to_type IS NOT NULL GROUP BY from_type, to_type)
             |SELECT from_type, CAST(sum(c) AS BIGINT) AS n_trans,
             |  CAST(count(*) AS BIGINT) AS branching,
             |  round(ln(CAST(sum(c) AS DOUBLE))
             |    - sum(c * ln(c)) / CAST(sum(c) AS DOUBLE), 4) AS h_next
             |FROM c GROUP BY from_type ORDER BY from_type""".stripMargin)),

    // Tukey-fence (1.5·IQR) outlier summary per event type — the
    // robust companion of q_anomaly's z-scores: quartiles don't move
    // for a fat tail, so the fences stay meaningful on skewed value
    // distributions where mean±2σ is dragged by the outliers
    // themselves. Quartiles via the groupQuantiles rank-window idiom
    // on cent-quantized values (quarter-cent interpolation points are
    // dyadic-exact; ×1.5 keeps fences exact eighths of a cent), fence
    // table broadcast back for one counting pass.
    Q("q_iqr_outliers",
      (s, d) => graft.ops.EventFeatures.iqrOutliers(
        Tables.df(s, d, "events"), "event_type", "value"),
      Some(s"""WITH ev AS (
             |  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS qv
             |  FROM events),
             |f AS (
             |  SELECT event_type,
             |    round(quantile_cont(qv, 0.25), 4) AS q1c,
             |    round(quantile_cont(qv, 0.75), 4) AS q3c
             |  FROM ev GROUP BY event_type)
             |SELECT ev.event_type, CAST(count(*) AS BIGINT) AS n,
             |  round(max(q1c) / 100.0, 4) AS q1,
             |  round(max(q3c) / 100.0, 4) AS q3,
             |  CAST(count(CASE WHEN qv < q1c - 1.5 * (q3c - q1c) THEN 1 END) AS BIGINT) AS n_low,
             |  CAST(count(CASE WHEN qv > q3c + 1.5 * (q3c - q1c) THEN 1 END) AS BIGINT) AS n_high,
             |  ${graft.ops.PortableRound.intRound4Duck(
                  "count(CASE WHEN qv < q1c - 1.5 * (q3c - q1c) THEN 1 END) " +
                  "+ count(CASE WHEN qv > q3c + 1.5 * (q3c - q1c) THEN 1 END)",
                  "count(*)")} AS outlier_rate
             |FROM ev JOIN f USING (event_type)
             |GROUP BY ev.event_type
             |ORDER BY event_type""".stripMargin)),

    // Trailing-7-day rolling daily volume per event type — the
    // smoothed traffic curve under every ops dashboard. Integer epoch-
    // day bucketing (micros div — exact both engines); the rolling sum
    // is a RANGE window (true calendar days, not observed rows) over
    // the COMPRESSED (type, day) daily table — bounded by the calendar
    // × type domain, never the raw event log.
    Q("q_rolling_daily",
      (s, d) => {
        val daily = Tables.df(s, d, "events")
          .select(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("event_type").orderBy(col("day").asc)
          .rangeBetween(-6, 0)
        daily.withColumn("n_7d", sum("n").over(w))
          .orderBy("event_type", "day")
      },
      Some("""WITH daily AS (
             |  SELECT event_type,
             |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
             |    count(*) AS n
             |  FROM events GROUP BY 1, 2)
             |SELECT event_type, day, n,
             |  CAST(sum(n) OVER (PARTITION BY event_type ORDER BY day
             |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_7d
             |FROM daily ORDER BY event_type, day""".stripMargin)),

    // Sample autocorrelation of the daily event-volume series, lags
    // 1..7 — the seasonality detector behind the dow/hour profiles
    // (a weekly cycle shows as an acf peak at lag 7). Standard ACF
    // estimator r_k = Σ(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)² over the DENSE
    // calendar series (missing days are true zeros, not gaps). Exact
    // integer arithmetic to the last step: deviations are scaled by n
    // (u_t = n·x_t − Σx, an exact BIGINT — the n² factors cancel in
    // the ratio), so both engines divide the SAME two integers and
    // floatRound4 is bit-identical by construction. Overflow bound:
    // n_days³·max_daily² < 2⁶³ — a year of 15M-events/day fits.
    // Shuffles are bounded by the CALENDAR (≤ n_days rows after the
    // first compression), never the raw event log.
    Q("q_acf",
      (s, d) => {
        val daily = Tables.df(s, d, "events")
          .select(expr("unix_micros(ts) div 86400000000").as("day"))
          .groupBy("day").agg(count(lit(1)).as("x"))
        val bounds = daily.agg(min("day").as("d0"), max("day").as("d1"))
        val full = bounds.select(explode(sequence(col("d0"), col("d1"))).as("day"))
          .join(daily, Seq("day"), "left")
          .select(col("day"), coalesce(col("x"), lit(0L)).as("x"))
        val tot = full.agg(count(lit(1)).as("n"), sum("x").as("s"))
        // pinned: den reads u once and the lag join reads it twice —
        // unpersisted, each reference re-ran the whole upstream (events
        // scan + daily groupBy + bounds agg + dense-calendar join; 70
        // Exchanges in the before plan). u is calendar-bounded
        // (≤ n_days rows) — the r13 pin discipline.
        val u = graft.api.CacheScope.global.persist(
          full.crossJoin(broadcast(tot))
            .select(col("day"), (col("n") * col("x") - col("s")).as("u")))
        val den = u.agg(sum(col("u") * col("u")).as("den"))
        val lagged = u.select(col("day"), col("u").as("ua"),
            explode(sequence(lit(1), lit(7))).as("lag"))
          .join(u.select(col("day").as("day2"), col("u").as("ub")),
            col("day2") === col("day") + col("lag"))
          .groupBy("lag").agg(sum(col("ua") * col("ub")).as("num"),
            count(lit(1)).as("n_pairs"))
        lagged.crossJoin(broadcast(den))
          .select(col("lag").cast("long").as("lag"), col("n_pairs"),
            graft.ops.PortableRound.floatRound4(
              col("num").cast("double") / col("den").cast("double")).as("acf"))
          .orderBy("lag")
      },
      Some(s"""WITH daily AS (
             |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
             |         count(*) AS x
             |  FROM events GROUP BY 1),
             |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
             |dense AS (
             |  SELECT f.day, coalesce(daily.x, 0) AS x
             |  FROM (SELECT unnest(range(d0, d1 + 1)) AS day FROM b) f
             |  LEFT JOIN daily USING (day)),
             |tot AS (SELECT count(*) AS n, sum(x) AS s FROM dense),
             |u AS (SELECT day, (n * x - s) AS u FROM dense, tot),
             |den AS (SELECT sum(u * u) AS den FROM u),
             |lagged AS (
             |  SELECT l.lag, sum(a.u * bb.u) AS num,
             |         CAST(count(*) AS BIGINT) AS n_pairs
             |  FROM u a
             |  CROSS JOIN (SELECT unnest(range(1, 8)) AS lag) l
             |  JOIN u bb ON bb.day = a.day + l.lag
             |  GROUP BY 1)
             |SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
             |  ${graft.ops.PortableRound.floatRound4Duck("CAST(num AS DOUBLE) / CAST(den AS DOUBLE)")} AS acf
             |FROM lagged, den ORDER BY lag""".stripMargin)),

    // CUSUM level-shift detection on the daily volume series: S_t =
    // Σ_{i<=t}(x_i − x̄), the classic changepoint statistic (a regime
    // change shows as the |S| peak at the shift day). Same exact
    // n-scaled integer deviations as q_acf; the cumulative sum rides a
    // CALENDAR-bounded triangular join (≤ n_days² rows — 365 days =
    // 133k, at ANY corpus SF) instead of a partition-less window,
    // so no all-rows-to-one-task collapse exists in the plan. Output
    // is the full curve (cusum = S_t/n at 4dp via the exact integer
    // rounder) with the argmax-|S| day(s) flagged.
    Q("q_cusum",
      (s, d) => {
        val daily = Tables.df(s, d, "events")
          .select(expr("unix_micros(ts) div 86400000000").as("day"))
          .groupBy("day").agg(count(lit(1)).as("x"))
        val bounds = daily.agg(min("day").as("d0"), max("day").as("d1"))
        val full = bounds.select(explode(sequence(col("d0"), col("d1"))).as("day"))
          .join(daily, Seq("day"), "left")
          .select(col("day"), coalesce(col("x"), lit(0L)).as("x"))
        val tot = full.agg(count(lit(1)).as("n"), sum("x").as("s"))
        // pinned (the q_acf discipline): u feeds both sides of the
        // triangular join, cum feeds the max aggregate AND the final
        // projection — unpersisted, the events scan + daily groupBy
        // re-ran per reference. Both frames are calendar-bounded.
        val u = graft.api.CacheScope.global.persist(
          full.crossJoin(broadcast(tot))
            .select(col("day"), col("x"), col("n"),
              (col("n") * col("x") - col("s")).as("u")))
        val cum = graft.api.CacheScope.global.persist(
          u.select(col("day"), col("x"), col("n"))
            .join(u.select(col("day").as("day2"), col("u")),
              col("day2") <= col("day"))
            .groupBy("day", "x", "n").agg(sum("u").as("sraw")))
        val mx = cum.agg(max(abs(col("sraw"))).as("m"))
        cum.crossJoin(broadcast(mx))
          .select(col("day"), col("x"),
            graft.ops.PortableRound.intRound4(col("sraw"), col("n")).as("cusum"),
            (abs(col("sraw")) === col("m")).as("is_change"))
          .orderBy("day")
      },
      Some(s"""WITH daily AS (
             |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
             |         count(*) AS x
             |  FROM events GROUP BY 1),
             |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
             |dense AS (
             |  SELECT f.day, coalesce(daily.x, 0) AS x
             |  FROM (SELECT unnest(range(d0, d1 + 1)) AS day FROM b) f
             |  LEFT JOIN daily USING (day)),
             |tot AS (SELECT count(*) AS n, sum(x) AS s FROM dense),
             |u AS (SELECT day, x, n, (n * x - s) AS u FROM dense, tot),
             |cum AS (SELECT a.day, a.x, a.n, sum(bb.u) AS sraw
             |        FROM u a JOIN u bb ON bb.day <= a.day
             |        GROUP BY 1, 2, 3),
             |mx AS (SELECT max(abs(sraw)) AS m FROM cum)
             |SELECT day, x,
             |  ${graft.ops.PortableRound.intRound4Duck("sraw", "n")} AS cusum,
             |  (abs(sraw) = m) AS is_change
             |FROM cum, mx ORDER BY day""".stripMargin)),

    // Per-type OLS trend of daily volume — the third leg of the
    // time-series diagnostic triad (q_acf seasonality, q_cusum level
    // shift, this one monotone drift): slope/intercept/r² of x_t vs
    // rebased day index over the DENSE per-type calendar (missing days
    // are true zeros). Every OLS sum (Σt, Σx, Σtx, Σt², Σx²) is an
    // exact integer; numerators/denominators are assembled in integer
    // space, cast to double ONCE, then divided — both engines round
    // the same values. The intercept uses the UNROUNDED slope
    // (mirrored in the twin). Overflow bound: n·Σtx ≤ n_days³·max_x,
    // fine for a decade of 10M-events/day.
    Q("q_trend",
      (s, d) => {
        // pinned (the q_acf discipline): bounds, the type domain, and
        // the dense-calendar join all read daily — unpersisted, the
        // events scan + groupBy re-ran per reference. (type x day)-bounded.
        val daily = graft.api.CacheScope.global.persist(
          Tables.df(s, d, "events")
            .select(col("event_type"),
              expr("unix_micros(ts) div 86400000000").as("day"))
            .groupBy("event_type", "day").agg(count(lit(1)).as("x")))
        val bounds = daily.agg(min("day").as("d0"), max("day").as("d1"))
        val cal = bounds.select(explode(sequence(col("d0"), col("d1"))).as("day"),
          col("d0"))
        val types = daily.select("event_type").distinct()
        val dense = types.crossJoin(broadcast(cal))
          .join(daily, Seq("event_type", "day"), "left")
          .select(col("event_type"), (col("day") - col("d0")).as("t"),
            coalesce(col("x"), lit(0L)).as("x"))
        val agg = dense.groupBy("event_type").agg(
          count(lit(1)).as("n"), sum("t").as("st"), sum("x").as("sx"),
          sum(col("t") * col("x")).as("stx"),
          sum(col("t") * col("t")).as("stt"),
          sum(col("x") * col("x")).as("sxx"))
        val num = (col("n") * col("stx") - col("st") * col("sx")).cast("double")
        val dent = (col("n") * col("stt") - col("st") * col("st")).cast("double")
        val denx = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
        val slope = num / dent
        agg.select(col("event_type"), col("n").as("n_days"),
            graft.ops.PortableRound.floatRound4(slope).as("slope"),
            graft.ops.PortableRound.floatRound4(
              (col("sx").cast("double") - slope * col("st").cast("double")) /
                col("n").cast("double")).as("intercept"),
            when(denx =!= 0.0,
              graft.ops.PortableRound.floatRound4(num * num / (dent * denx)))
              .as("r2"))
          .orderBy("event_type")
      },
      Some(s"""WITH daily AS (
             |  SELECT event_type,
             |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
             |    count(*) AS x
             |  FROM events GROUP BY 1, 2),
             |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
             |cal AS (SELECT unnest(range(d0, d1 + 1)) AS day, d0 FROM b),
             |ty AS (SELECT DISTINCT event_type FROM daily),
             |dense AS (
             |  SELECT ty.event_type, cal.day - cal.d0 AS t,
             |    coalesce(daily.x, 0) AS x
             |  FROM ty CROSS JOIN cal
             |  LEFT JOIN daily ON daily.event_type = ty.event_type
             |    AND daily.day = cal.day),
             |agg AS (
             |  SELECT event_type, count(*) AS n, sum(t) AS st, sum(x) AS sx,
             |    sum(t * x) AS stx, sum(t * t) AS stt, sum(x * x) AS sxx
             |  FROM dense GROUP BY event_type),
             |f AS (
             |  SELECT event_type, n,
             |    CAST(n * stx - st * sx AS DOUBLE) AS num,
             |    CAST(n * stt - st * st AS DOUBLE) AS dent,
             |    CAST(n * sxx - sx * sx AS DOUBLE) AS denx,
             |    CAST(sx AS DOUBLE) AS sxd, CAST(st AS DOUBLE) AS std,
             |    CAST(n AS DOUBLE) AS nd
             |  FROM agg)
             |SELECT event_type, CAST(n AS BIGINT) AS n_days,
             |  ${graft.ops.PortableRound.floatRound4Duck("num / dent")} AS slope,
             |  ${graft.ops.PortableRound.floatRound4Duck(
                  "(sxd - (num / dent) * std) / nd")} AS intercept,
             |  CASE WHEN denx <> 0 THEN
             |    ${graft.ops.PortableRound.floatRound4Duck("num * num / (dent * denx)")}
             |  END AS r2
             |FROM f ORDER BY event_type""".stripMargin)),

    // Theil–Sen slope per event type — the ROBUST trend estimator
    // (median of all pairwise slopes, ~29% breakdown point): an
    // outage day or a logging spike that drags q_trend's OLS slope
    // barely moves this one. Pairwise slopes ride the same
    // calendar-bounded triangular join as q_cusum (≤ n_days² rows per
    // type); each slope is one division of exact integers, so both
    // engines order identical doubles, and the LOWER median (rank
    // ceil(n/2) under the total order (slope, day_i, day_j)) picks
    // the identical element — no float averaging of middles.
    Q("q_theilsen",
      (s, d) => {
        val daily = Tables.df(s, d, "events")
          .select(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .groupBy("event_type", "day").agg(count(lit(1)).as("x"))
        val bounds = daily.agg(min("day").as("d0"), max("day").as("d1"))
        val cal = bounds.select(explode(sequence(col("d0"), col("d1"))).as("day"),
          col("d0"))
        val types = daily.select("event_type").distinct()
        // dense feeds both sides of the slope self-join but is NOT
        // pinned: with daily pinned its recompute is two broadcast
        // joins over calendar-bounded rows, cheaper than a cache
        // materialization job (measured: pinning it held q_theilsen at
        // ~1.4 s vs ~1.1 s with the daily pin alone)
        val dense = types.crossJoin(broadcast(cal))
          .join(daily, Seq("event_type", "day"), "left")
          .select(col("event_type"), (col("day") - col("d0")).as("t"),
            coalesce(col("x"), lit(0L)).as("x"))
        val slopes = dense.as("a")
          .join(dense.as("b"),
            col("a.event_type") === col("b.event_type") && col("a.t") < col("b.t"))
          .select(col("a.event_type").as("event_type"),
            col("a.t").as("ti"), col("b.t").as("tj"),
            ((col("b.x") - col("a.x")).cast("double") /
              (col("b.t") - col("a.t")).cast("double")).as("slope"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("event_type")
        slopes
          .withColumn("rn", row_number().over(
            w.orderBy(col("slope").asc, col("ti").asc, col("tj").asc)))
          .withColumn("n", count(lit(1)).over(w))
          .filter(col("rn") === ceil(col("n").cast("double") / 2).cast("long"))
          .select(col("event_type"), col("n").as("n_pairs"),
            graft.ops.PortableRound.floatRound4(col("slope")).as("theilsen_slope"))
          .orderBy("event_type")
      },
      Some(s"""WITH daily AS (
             |  SELECT event_type,
             |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
             |    count(*) AS x
             |  FROM events GROUP BY 1, 2),
             |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
             |cal AS (SELECT unnest(range(d0, d1 + 1)) AS day, d0 FROM b),
             |ty AS (SELECT DISTINCT event_type FROM daily),
             |dense AS (
             |  SELECT ty.event_type, cal.day - cal.d0 AS t,
             |    coalesce(daily.x, 0) AS x
             |  FROM ty CROSS JOIN cal
             |  LEFT JOIN daily ON daily.event_type = ty.event_type
             |    AND daily.day = cal.day),
             |slopes AS (
             |  SELECT a.event_type, a.t AS ti, bb.t AS tj,
             |    CAST(bb.x - a.x AS DOUBLE) / CAST(bb.t - a.t AS DOUBLE) AS slope
             |  FROM dense a JOIN dense bb
             |    ON bb.event_type = a.event_type AND a.t < bb.t),
             |ranked AS (
             |  SELECT event_type, slope,
             |    row_number() OVER (PARTITION BY event_type
             |      ORDER BY slope, ti, tj) AS rn,
             |    count(*) OVER (PARTITION BY event_type) AS n
             |  FROM slopes)
             |SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
             |  ${graft.ops.PortableRound.floatRound4Duck("slope")} AS theilsen_slope
             |FROM ranked
             |WHERE rn = CAST(ceil(n / 2.0) AS BIGINT)
             |ORDER BY event_type""".stripMargin)),

    // DAU / trailing-WAU stickiness — the engagement ratio product
    // dashboards lead with (stickiness near 1 = users return daily;
    // near 1/7 = weekly visitors). Exact trailing distinct counts
    // WITHOUT a distinct-over-window (which Spark can't do): each
    // (user, active-day) row covers days d..d+6 via a 7-element
    // sequence explode over the COMPRESSED activity table, then one
    // distinct + keyed count per covered day — bounded by 7 × |users
    // × days|, never the raw event log. Only days with same-day
    // activity are emitted (inner join).
    Q("q_stickiness",
      (s, d) => {
        val act = Tables.df(s, d, "events")
          .select(col("user_id"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .distinct()
        val dau = act.groupBy("day").agg(count(lit(1)).as("n_dau"))
        val wau = act
          .select(col("user_id"),
            explode(sequence(col("day"), col("day") + 6)).as("day"))
          .distinct()
          .groupBy("day").agg(count(lit(1)).as("n_wau"))
        dau.join(wau, "day")
          .select(col("day"), col("n_dau"), col("n_wau"),
            graft.ops.PortableRound.intRound4(col("n_dau"), col("n_wau"))
              .as("stickiness"))
          .orderBy("day")
      },
      Some(s"""WITH act AS (
             |  SELECT DISTINCT user_id,
             |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
             |  FROM events),
             |dau AS (SELECT day, CAST(count(*) AS BIGINT) AS n_dau
             |        FROM act GROUP BY day),
             |cov AS (
             |  SELECT DISTINCT user_id, day
             |  FROM (SELECT user_id, unnest(range(day, day + 7)) AS day FROM act)),
             |wau AS (SELECT day, CAST(count(*) AS BIGINT) AS n_wau
             |        FROM cov GROUP BY day)
             |SELECT dau.day, n_dau, n_wau,
             |  ${graft.ops.PortableRound.intRound4Duck("n_dau", "n_wau")} AS stickiness
             |FROM dau JOIN wau USING (day)
             |ORDER BY day""".stripMargin)),

    // New vs returning users per day — the acquisition/retention split
    // on every growth dashboard. First-seen day per user (one grouped
    // min on the max-cardinality key) joined back onto the COMPRESSED
    // (user, day) activity table; same-day = new. Exact integers
    // throughout; the join reuses the activity table's user_id
    // exchange.
    Q("q_new_users",
      (s, d) => {
        val act = Tables.df(s, d, "events")
          .select(col("user_id"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .distinct()
        val first = act.groupBy("user_id").agg(min("day").as("first_day"))
        act.join(first, "user_id")
          .groupBy("day")
          .agg(count(when(col("day") === col("first_day"), lit(1))).as("n_new"),
            count(when(col("day") =!= col("first_day"), lit(1))).as("n_returning"))
          .withColumn("new_frac", graft.ops.PortableRound.intRound4(
            col("n_new"), col("n_new") + col("n_returning")))
          .orderBy("day")
      },
      Some(s"""WITH act AS (
             |  SELECT DISTINCT user_id,
             |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
             |  FROM events),
             |f AS (SELECT user_id, min(day) AS first_day FROM act GROUP BY user_id)
             |SELECT day,
             |  CAST(count(CASE WHEN day = first_day THEN 1 END) AS BIGINT) AS n_new,
             |  CAST(count(CASE WHEN day <> first_day THEN 1 END) AS BIGINT) AS n_returning,
             |  ${graft.ops.PortableRound.intRound4Duck(
                  "count(CASE WHEN day = first_day THEN 1 END)", "count(*)")} AS new_frac
             |FROM act JOIN f USING (user_id)
             |GROUP BY day ORDER BY day""".stripMargin)),

    // Corpus-level session-health summary — the one-row digest of
    // q_sessionize's per-session table (bounce rate, events and
    // duration per session): the engagement dashboard number, and the
    // sanity check run after changing the gap parameter. Sessions are
    // built with the same lag+running-sum windows partitioned on the
    // max-cardinality user id; everything after is ONE global partial
    // aggregate — counts and integer-second duration sums, so every
    // ratio is PortableRound-exact.
    Q("q_session_stats",
      (s, d) => graft.ops.EventFeatures.sessionStats(
        Tables.df(s, d, "events"), "user_id", "ts", "event_id", gapSeconds = 1800),
      Some("""WITH e AS (
             |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
             |  FROM events),
             |l AS (
             |  SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
             |  FROM e),
             |m AS (
             |  SELECT *, CASE WHEN prev IS NULL OR us - prev > 1800000000
             |    THEN 1 ELSE 0 END AS brk
             |  FROM l),
             |s AS (
             |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
             |  FROM m),
             |sess AS (
             |  SELECT user_id, session_id, count(*) AS n_ev,
             |    (max(us) - min(us)) // 1000000 AS dur_s
             |  FROM s GROUP BY user_id, session_id)
             |SELECT CAST(count(*) AS BIGINT) AS n_sessions,
             |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
             |  """.stripMargin
        + graft.ops.PortableRound.intRound4Duck(
            "count(CASE WHEN n_ev = 1 THEN 1 END)", "count(*)") + " AS bounce_rate,\n  "
        + graft.ops.PortableRound.intRound4Duck(
            "CAST(sum(n_ev) AS BIGINT)", "count(*)") + " AS avg_events,\n  "
        + graft.ops.PortableRound.intRound4Duck(
            "CAST(sum(dur_s) AS BIGINT)", "count(*)") + """ AS avg_dur_s,
             |  CAST(max(dur_s) AS BIGINT) AS max_dur_s
             |FROM sess""".stripMargin)),

    // Per-event quantile normalization of `value` within its event
    // type — the rank-based feature transform (maps any distribution
    // onto uniform [0,1], robust to outliers where z-scores are not).
    // Scale-correct formulation: the rank window runs over the
    // COMPRESSED (type, cent-value) histogram — bounded by the value
    // domain, thousands of rows — never over the raw event log; the
    // per-event normalized value then arrives by a keyed join back on
    // (type, cent). Average-rank tie handling in exact integers:
    // qn = (2·cum_below + cnt + 1) / (2·(n + 1)).
    Q("q_quantile_normalize",
      (s, d) => graft.ops.EventFeatures.quantileNormalize(
        Tables.df(s, d, "events"), "event_type", "event_id", "value"),
      Some("""WITH ev AS (
             |  SELECT event_id, event_type,
             |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS qv
             |  FROM events),
             |h AS (
             |  SELECT event_type, qv, count(*) AS cnt,
             |    sum(count(*)) OVER (PARTITION BY event_type ORDER BY qv
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             |    sum(count(*)) OVER (PARTITION BY event_type) AS n
             |  FROM ev GROUP BY event_type, qv)
             |SELECT ev.event_id, ev.event_type,
             |  """.stripMargin
        + graft.ops.PortableRound.intRound4Duck(
            "CAST(2 * (h.cum - h.cnt) + h.cnt + 1 AS BIGINT)",
            "CAST(2 * (h.n + 1) AS BIGINT)") + """ AS qn
             |FROM ev JOIN h USING (event_type, qv)
             |ORDER BY ev.event_id""".stripMargin)),

    // Nested-path find (reference: dotted a.b.c where paths on nested
    // objects): parse props into a struct, filter with a Mongo-style
    // nested map, project the nested field.
    Q("q_find_nested",
      (s, d) => {
        val withMeta = Tables.df(s, d, "events")
          .withColumn("meta", from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")))
        new graft.api.Collection("events", withMeta)
          .find(Map("meta" -> Map("k" -> Map("$gte" -> 90)), "event_type" -> "click"))
          .select(col("event_id"), col("meta.k").as("k"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
             |FROM events
             |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 90
             |  AND event_type = 'click'
             |ORDER BY event_id""".stripMargin))
  )
}
