package graft.queries

import graft.Tables
import graft.query.Filter
import graft.api.SortKey
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core find/query surface (SURVEY §2 rows 1-15, 21-25): Mongo-style
  * where → Catalyst predicates, projections, sort/limit/offset, counts,
  * facets, aggregations, joins, windows.
  */
object CoreQueries extends QuerySet {

  def all: Seq[Q] = Seq(
    Q("q_find_eq",
      (s, d) => Tables.coll(s, d, "lineitem").find(
        where = Filter.eq("l_returnflag", "R"),
        selectCols = Seq("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"),
        sortBy = Seq(SortKey("l_orderkey"), SortKey("l_linenumber")),
        limit = 500),
      Some("""SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
             |FROM lineitem WHERE l_returnflag = 'R'
             |ORDER BY l_orderkey, l_linenumber LIMIT 500""".stripMargin)),

    Q("q_find_range",
      (s, d) => Tables.coll(s, d, "orders").find(
        where = Filter.parse(Map(
          "o_totalprice" -> Map("$gt" -> 100000.0, "$lt" -> 200000.0),
          "o_orderstatus" -> Map("$ne" -> "F"))),
        selectCols = Seq("o_orderkey", "o_totalprice", "o_orderstatus"),
        sortBy = Seq(SortKey("o_orderkey"))),
      Some("""SELECT o_orderkey, o_totalprice, o_orderstatus
             |FROM orders
             |WHERE o_totalprice > 100000 AND o_totalprice < 200000 AND o_orderstatus <> 'F'
             |ORDER BY o_orderkey""".stripMargin)),

    Q("q_find_in",
      (s, d) => Tables.coll(s, d, "customer").find(
        where = Filter.parse(Map(
          "c_mktsegment" -> Map("$in" -> Seq("BUILDING", "AUTOMOBILE")),
          "c_nationkey" -> Map("$nin" -> Seq(1, 2, 3)))),
        selectCols = Seq("c_custkey", "c_name", "c_mktsegment", "c_nationkey"),
        sortBy = Seq(SortKey("c_custkey"))),
      Some("""SELECT c_custkey, c_name, c_mktsegment, c_nationkey
             |FROM customer
             |WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE') AND c_nationkey NOT IN (1,2,3)
             |ORDER BY c_custkey""".stripMargin)),

    Q("q_find_and",
      (s, d) => Tables.coll(s, d, "lineitem").find(
        where = Filter.gte("l_shipdate", "1995-01-01") &&
          Filter.lt("l_shipdate", "1996-01-01") &&
          Filter.parse(Map("l_discount" -> Map("$between" -> Seq(0.05, 0.07)))),
        selectCols = Nil)
        .select(col("l_orderkey"), col("l_linenumber"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_day"),
          col("l_discount"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
             |  strftime(l_shipdate, '%Y-%m-%d') AS ship_day, l_discount
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
             |  AND l_discount >= 0.05 AND l_discount <= 0.07
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    Q("q_find_or",
      (s, d) => Tables.coll(s, d, "orders").find(
        where = Filter.parse(Map("$or" -> Seq(
          Map("o_orderpriority" -> "1-URGENT"),
          Map("o_totalprice" -> Map("$gt" -> 300000.0))))),
        selectCols = Seq("o_orderkey", "o_orderpriority", "o_totalprice"),
        sortBy = Seq(SortKey("o_orderkey"))),
      Some("""SELECT o_orderkey, o_orderpriority, o_totalprice
             |FROM orders
             |WHERE o_orderpriority = '1-URGENT' OR o_totalprice > 300000
             |ORDER BY o_orderkey""".stripMargin)),

    Q("q_select_cols",
      (s, d) => Tables.coll(s, d, "part").find(
        selectCols = Seq("p_partkey", "p_name", "p_retailprice"),
        sortBy = Seq(SortKey("p_partkey")),
        limit = 1000),
      Some("""SELECT p_partkey, p_name, p_retailprice
             |FROM part ORDER BY p_partkey LIMIT 1000""".stripMargin)),

    Q("q_sort_page",
      (s, d) => Tables.coll(s, d, "supplier").find(
        sortBy = Seq(SortKey("s_acctbal", ascending = false), SortKey("s_suppkey")),
        limit = 20, offset = 5),
      Some("""SELECT * FROM supplier
             |ORDER BY s_acctbal DESC, s_suppkey LIMIT 20 OFFSET 5""".stripMargin)),

    Q("q_count",
      (s, d) => Tables.coll(s, d, "lineitem")
        .find(Filter.eq("l_returnflag", "A"))
        .agg(count(lit(1)).as("cnt")),
      Some("SELECT count(*) AS cnt FROM lineitem WHERE l_returnflag = 'A'")),

    Q("q_get_ids",
      (s, d) => Tables.coll(s, d, "customer")
        .get("c_custkey", Seq(1L, 7L, 42L, 99L, 123L))
        .orderBy("c_custkey"),
      Some("""SELECT * FROM customer WHERE c_custkey IN (1,7,42,99,123)
             |ORDER BY c_custkey""".stripMargin)),

    Q("q_distinct",
      (s, d) => Tables.coll(s, d, "orders")
        .distinctValues(Seq("o_orderstatus", "o_orderpriority"))
        .orderBy("o_orderstatus", "o_orderpriority"),
      Some("""SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
             |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)),

    // Flagship: TPC-H Q1-style pruned-scan aggregation.
    Q("q1_agg",
      (s, d) => Tables.df(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 4).as("sum_qty"),
          round(sum("l_extendedprice"), 4).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_extendedprice"), 4).as("avg_price"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity), 4) AS sum_qty,
             |  round(sum(l_extendedprice), 4) AS sum_base_price,
             |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
             |  round(avg(l_quantity), 4) AS avg_qty,
             |  round(avg(l_extendedprice), 4) AS avg_price,
             |  round(avg(l_discount), 4) AS avg_disc,
             |  count(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // Dims are broadcast: no shuffle of the fact side on a 1000-executor
    // cluster; verified via explain (BroadcastHashJoin).
    Q("q_join_broadcast",
      (s, d) => Tables.df(s, d, "customer")
        .join(broadcast(Tables.df(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.df(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("num_customers"), round(avg("c_acctbal"), 4).as("avg_acctbal"))
        .orderBy("r_name"),
      Some("""SELECT r_name, count(*) AS num_customers, round(avg(c_acctbal), 4) AS avg_acctbal
             |FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name ORDER BY r_name""".stripMargin)),

    Q("q_join_multi",
      (s, d) => Tables.df(s, d, "orders")
        .join(Tables.df(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.df(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .filter(col("o_orderstatus") === "O")
        .groupBy(col("n_name"))
        .agg(round(sum("o_totalprice"), 4).as("revenue"), count(lit(1)).as("num_orders"))
        .orderBy("n_name"),
      Some("""SELECT n_name, round(sum(o_totalprice), 4) AS revenue, count(*) AS num_orders
             |FROM orders
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |WHERE o_orderstatus = 'O'
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // Semi-join: "orders having at least one heavy line". LEFT_SEMI
    // never materializes the probe side's columns or duplicates a
    // left row per match — at 100 TB the shuffle carries only the
    // filtered lineitem KEYS, not the 16-column rows an inner-join +
    // distinct would drag through the exchange.
    Q("q_join_semi",
      (s, d) => Tables.df(s, d, "orders")
        .join(
          Tables.df(s, d, "lineitem").filter(col("l_quantity") >= 48),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          // EXACT decimal sum: at sf1 a 1.6e10 double sum's 4th decimal
          // sits at the summation-order noise floor, so partial-agg
          // order vs DuckDB's fold flips it — 2dp money is exact in
          // DECIMAL at any scale (the CorrMatrix rule)
          round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 4)
            .as("revenue"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, count(*) AS n_orders,
             |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS revenue
             |FROM orders
             |WHERE EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Anti-join: "customers with no finished order" — the NOT EXISTS
    // plan. Same keys-only shuffle economics as q_join_semi; the
    // NOT IN subquery formulation would add a null-check cartesian
    // guard, so the operator surface exposes anti-join directly.
    Q("q_join_anti",
      (s, d) => Tables.df(s, d, "customer")
        .join(
          Tables.df(s, d, "orders").filter(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"),
          round(avg("c_acctbal"), 4).as("avg_acctbal"))
        .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, count(*) AS n_customers,
             |  round(avg(c_acctbal), 4) AS avg_acctbal
             |FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // Skew-salted fact-fact join (SkewJoin.saltedInner) in the regime
    // the op documents: the right side is a NARROW slice (urgent
    // orders, ~20% — representative of "much smaller than the fact but
    // too big to broadcast" at 100 TB) and the salt fan-out is s=4, so
    // replication costs ~0.8x the full dim instead of the 8x full-table
    // replication the earlier demo paid (9.4x sf1 growth for no skew
    // benefit). The fact side composes the Bloom tier BEFORE the salted
    // shuffle — with a selective right side that's how the two tiers
    // stack at 100 TB (drop ~80% of the fact map-side, then salt what
    // remains). lineitem's salt still spreads any hot orderkey over 4
    // shuffle tasks. Row-identical to the plain join — the oracle IS
    // the plain join, so correctness of the salting AND the prefilter
    // is oracle-proven, not just spec-asserted.
    Q("q_join_salted",
      (s, d) => {
        val urgent = Tables.df(s, d, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
        val bloom = graft.ops.Sketches.buildBloom(
          urgent, col("o_orderkey"), expectedItems = 400000L)
        val fact = Tables.df(s, d, "lineitem")
        val pre = fact.filter(
          graft.ops.Sketches.mightContain(fact, bloom, col("l_orderkey")))
        graft.ops.SkewJoin.saltedInner(pre, urgent,
          "l_orderkey", "o_orderkey",
          saltOn = struct(col("l_orderkey"), col("l_linenumber")), s = 4)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_lines"),
          // exact DECIMAL money arithmetic (2dp price × 2dp discount =
          // 4dp product, exact sum at any scale — see q_join_semi)
          round(sum(col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1) - col("l_discount").cast("decimal(12,2)")))
            .cast("double"), 4).as("revenue"))
        .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n_lines,
             |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
             |    * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE), 4) AS revenue
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE o_orderpriority = '1-URGENT'
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // Bloom-prefiltered join (SkewJoin.bloomInner): the selective dim
    // (top-balance BUILDING customers) compiles to a ~KB Bloom that
    // drops non-matching orders BEFORE the shuffle; the exact join
    // removes the Bloom's false positives, so the oracle is again the
    // plain join. At 100 TB this is the manual runtime-filter tier for
    // sources where Catalyst's InjectRuntimeFilter can't reach.
    Q("q_join_bloom",
      (s, d) => {
        val dim = Tables.df(s, d, "customer")
          .filter(col("c_mktsegment") === "BUILDING" && col("c_acctbal") > 7500)
        graft.ops.SkewJoin.bloomInner(
            Tables.df(s, d, "orders"), dim,
            "o_custkey", "c_custkey", expectedRightKeys = 100000L)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_orders"),
            round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 4)
              .as("revenue"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS n_orders,
             |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS revenue
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 7500
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Join-key skew report (SkewJoin.keySkew): the diagnostic that
    // DECIDES between the join tiers above — per candidate key, the
    // hot-key load facts (max_cnt, imbalance vs the average key,
    // top-share ppm, >2x-average census) and the derived minimum salt
    // fan-out for saltedInner. Four profiled keys in one pass each
    // (map-side-combined groupBy.count, then two bounded aggregates
    // over the persisted count frame); all derived columns are
    // integer-exact PortableRound forms so both engines agree
    // bit-for-bit. At 100 TB the same probe runs on a sampled slice —
    // relative skew, the salt input, survives uniform sampling.
    Q("q_skew_report",
      (s, d) => Seq(
          ("lineitem", "l_orderkey"), ("lineitem", "l_partkey"),
          ("orders", "o_custkey"), ("events", "user_id"))
        .map { case (t, k) =>
          graft.ops.SkewJoin.keySkew(Tables.df(s, d, t), k, s"$t.$k") }
        .reduce(_ unionByName _)
        .orderBy("tbl_key"),
      Some(Seq(
          ("lineitem", "l_orderkey"), ("lineitem", "l_partkey"),
          ("orders", "o_custkey"), ("events", "user_id"))
        .map { case (t, k) =>
          graft.ops.SkewJoin.keySkewDuckSql(t, k, s"$t.$k") }
        .mkString("", "\nUNION ALL\n", "\nORDER BY tbl_key"))),

    // Per-group argmax WITHOUT a window: max(struct(ord, tie, payload))
    // is a partial (map-side) aggregate — one scan, no per-group sort,
    // the top-1 fast path q_window_topn's two-phase salted sort exists
    // to generalize (k > 1). Deterministic tie-break rides the struct's
    // lexicographic order (acctbal, then custkey). At 100 TB this is
    // the difference between a combiner and a shuffle-sort.
    Q("q_argmax",
      (s, d) => Tables.df(s, d, "customer")
        .groupBy("c_mktsegment")
        .agg(max(struct(col("c_acctbal"), col("c_custkey"))).as("m"))
        .select(col("c_mktsegment"),
          col("m.c_acctbal").as("top_acctbal"),
          col("m.c_custkey").as("top_custkey"))
        .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, c_acctbal AS top_acctbal,
             |  c_custkey AS top_custkey
             |FROM (
             |  SELECT c_mktsegment, c_acctbal, c_custkey,
             |    row_number() OVER (PARTITION BY c_mktsegment
             |      ORDER BY c_acctbal DESC, c_custkey DESC) AS rn
             |  FROM customer) t
             |WHERE rn = 1
             |ORDER BY c_mktsegment""".stripMargin)),

    // TPC-H Q13 shape: orders-per-customer count INCLUDING the
    // zero-order customers (the left join keeps them; an inner join
    // silently drops the most interesting bucket), then the
    // count-of-counts histogram. Two shuffles — the per-customer count
    // keys on the max-cardinality custkey, the histogram on the
    // bounded count domain.
    Q("q_count_distribution",
      (s, d) => Tables.df(s, d, "customer")
        .join(Tables.df(s, d, "orders"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .groupBy("n_orders")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("n_orders"),
      Some("""SELECT n_orders, count(*) AS n_customers FROM (
             |  SELECT c_custkey, count(o_orderkey) AS n_orders
             |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |  GROUP BY c_custkey) t
             |GROUP BY n_orders ORDER BY n_orders""".stripMargin)),

    // Two-phase salted top-k (see WindowOps): identical output to the
    // naive 5-partition window but the heavy sort spreads over
    // keys x salt tasks. Salt on o_orderkey (deterministic).
    Q("q_window_topn",
      (s, d) => graft.ops.WindowOps.topKPerGroup(
        Tables.df(s, d, "orders"),
        groupCols = Seq("o_orderpriority"),
        orderCols = Seq(col("o_totalprice").desc, col("o_orderkey").asc),
        k = 3,
        saltOn = col("o_orderkey"))
        .select("o_orderpriority", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_orderpriority", "rn"),
      Some("""SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
             |  SELECT o_orderpriority, o_orderkey, o_totalprice,
             |    row_number() OVER (PARTITION BY o_orderpriority
             |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
             |  FROM orders) t
             |WHERE rn <= 3
             |ORDER BY o_orderpriority, rn""".stripMargin)),

    // Cumulative / offset windows per customer (running revenue, prior
    // order gap) — partitions on the max-cardinality key, so no skew;
    // sum accumulates in window order in both engines (bit-identical).
    Q("q_window_cume",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        Tables.df(s, d, "orders")
          .filter(col("o_custkey") < 200)
          .select(col("o_custkey"), col("o_orderkey"),
            round(sum("o_totalprice").over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 4)
              .as("run_total"),
            row_number().over(w).as("order_seq"),
            lag(col("o_orderkey"), 1).over(w).as("prev_orderkey"))
          .orderBy("o_custkey", "order_seq")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  round(sum(o_totalprice) OVER w, 4) AS run_total,
             |  CAST(row_number() OVER w AS INT) AS order_seq,
             |  lag(o_orderkey, 1) OVER w AS prev_orderkey
             |FROM orders
             |WHERE o_custkey < 200
             |WINDOW w AS (PARTITION BY o_custkey
             |  ORDER BY o_orderdate ASC, o_orderkey ASC
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |ORDER BY o_custkey, order_seq""".stripMargin)),

    // Multi-level aggregation (ROLLUP): per (flag, status), per flag,
    // grand total in ONE pass — grouping sets expand map-side, still a
    // single shuffle. Spark sorts NULLS FIRST ascending; the oracle
    // says so explicitly (DuckDB defaults NULLS LAST).
    Q("q_rollup",
      (s, d) => Tables.df(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum("l_quantity"), 4).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity), 4) AS sum_qty, count(*) AS n
             |FROM lineitem
             |GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)),

    Q("q_events_window",
      (s, d) => Tables.df(s, d, "events")
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour_bucket"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("sum_value"))
        .orderBy("hour_bucket", "event_type"),
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_bucket,
             |  event_type, count(*) AS n_events, round(sum(value), 4) AS sum_value
             |FROM events
             |GROUP BY 1, 2
             |ORDER BY hour_bucket, event_type""".stripMargin))
  )
}
