package graft.queries

import graft.Tables
import graft.ops.{Diff, SchemaInduce, Validate}
import org.apache.spark.sql.functions._

/** Schema induction, validation, and diff operators (SURVEY §2 rows
  * 48-50). Diff's oracle rebuilds the same derived "dst" collection in
  * SQL and recomputes the patch set independently.
  */
object SchemaQueries extends QuerySet {

  def all: Seq[Q] = Seq(
    Q("q_schema_induce",
      (s, d) => SchemaInduce.induce(Tables.df(s, d, "documents")),
      Some(SchemaInduce.oracleSql("documents", Seq(
        ("doc_id", "bigint", false),
        ("text", "string", false),
        ("lang", "string", false),
        ("source", "string", false),
        ("n_chars", "bigint", false))))),

    // referential integrity as LEFT ANTI joins (the reference loops
    // get_one per value on the driver — database.py:703). The target
    // is deterministically restricted (c_custkey % 3 <> 0) so the
    // check reports REAL orphans, not a vacuous empty set.
    Q("q_ref_integrity",
      (s, d) => Validate.referentialIntegrity(
        Map(
          "orders" -> Tables.df(s, d, "orders"),
          "customer_partial" -> Tables.df(s, d, "customer")
            .filter(col("c_custkey") % 3 =!= 0)),
        Seq(Validate.Ref("orders", "o_custkey", "customer_partial", "c_custkey"))),
      Some(Validate.referentialIntegrityDuckSql(
        "orders", "o_custkey",
        "SELECT c_custkey FROM customer WHERE c_custkey % 3 <> 0",
        "c_custkey", "customer_partial"))),

    Q("q_validate",
      (s, d) => Validate.validate(Tables.df(s, d, "orders"), "o_orderkey", Seq(
        Validate.Required("o_custkey"),
        Validate.Enum("o_orderstatus", Seq("F", "O")),
        Validate.Range("o_totalprice", None, Some(400000.0)),
        Validate.Pattern("o_orderpriority", "^[1-5]-"))),
      Some("""SELECT * FROM (
             |  SELECT o_orderkey AS row_id, 'o_custkey' AS field, 'required' AS code,
             |    CAST(o_custkey AS VARCHAR) AS value
             |  FROM orders WHERE o_custkey IS NULL
             |  UNION ALL
             |  SELECT o_orderkey, 'o_orderstatus', 'enum', CAST(o_orderstatus AS VARCHAR)
             |  FROM orders WHERE o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('F', 'O')
             |  UNION ALL
             |  SELECT o_orderkey, 'o_totalprice', 'range', CAST(o_totalprice AS VARCHAR)
             |  FROM orders WHERE o_totalprice IS NOT NULL AND o_totalprice > 400000
             |  UNION ALL
             |  SELECT o_orderkey, 'o_orderpriority', 'pattern', CAST(o_orderpriority AS VARCHAR)
             |  FROM orders WHERE o_orderpriority IS NOT NULL
             |    AND NOT regexp_matches(o_orderpriority, '^[1-5]-')) t
             |ORDER BY row_id, field, code""".stripMargin)),

    Q("q_diff",
      (s, d) => {
        val src = Tables.df(s, d, "customer")
        val dst = src.filter(col("c_custkey") <= 1400)
          .withColumn("c_mktsegment",
            when(pmod(col("c_custkey"), lit(100)) === 0, lit("PATCHED"))
              .otherwise(col("c_mktsegment")))
          .unionByName(src.filter(col("c_custkey") < 5)
            .withColumn("c_custkey", col("c_custkey") + 100000))
        Diff.diff(src, dst, "c_custkey")
      },
      Some("""WITH dst AS (
             |  SELECT c_custkey, c_name, c_nationkey, c_acctbal,
             |    CASE WHEN c_custkey % 100 = 0 THEN 'PATCHED' ELSE c_mktsegment END AS c_mktsegment
             |  FROM customer WHERE c_custkey <= 1400
             |  UNION ALL
             |  SELECT c_custkey + 100000, c_name, c_nationkey, c_acctbal, c_mktsegment
             |  FROM customer WHERE c_custkey < 5)
             |SELECT * FROM (
             |  SELECT 'remove' AS op, CAST(c_custkey AS VARCHAR) AS key,
             |    CAST(NULL AS VARCHAR) AS field, CAST(NULL AS VARCHAR) AS value
             |  FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM dst)
             |  UNION ALL
             |  SELECT 'add', CAST(c_custkey AS VARCHAR), f.field,
             |    CASE f.field WHEN 'c_name' THEN CAST(c_name AS VARCHAR)
             |                 WHEN 'c_nationkey' THEN CAST(c_nationkey AS VARCHAR)
             |                 WHEN 'c_acctbal' THEN CAST(c_acctbal AS VARCHAR)
             |                 WHEN 'c_mktsegment' THEN CAST(c_mktsegment AS VARCHAR) END
             |  FROM dst, (SELECT unnest(['c_name', 'c_nationkey', 'c_acctbal', 'c_mktsegment']) AS field) f
             |  WHERE c_custkey NOT IN (SELECT c_custkey FROM customer)
             |  UNION ALL
             |  SELECT 'replace', CAST(s.c_custkey AS VARCHAR), 'c_mktsegment',
             |    CAST(d.c_mktsegment AS VARCHAR)
             |  FROM customer s JOIN dst d ON s.c_custkey = d.c_custkey
             |  WHERE s.c_mktsegment IS DISTINCT FROM d.c_mktsegment
             |  UNION ALL
             |  SELECT 'replace', CAST(s.c_custkey AS VARCHAR), 'c_name', CAST(d.c_name AS VARCHAR)
             |  FROM customer s JOIN dst d ON s.c_custkey = d.c_custkey
             |  WHERE s.c_name IS DISTINCT FROM d.c_name
             |  UNION ALL
             |  SELECT 'replace', CAST(s.c_custkey AS VARCHAR), 'c_nationkey', CAST(d.c_nationkey AS VARCHAR)
             |  FROM customer s JOIN dst d ON s.c_custkey = d.c_custkey
             |  WHERE s.c_nationkey IS DISTINCT FROM d.c_nationkey
             |  UNION ALL
             |  SELECT 'replace', CAST(s.c_custkey AS VARCHAR), 'c_acctbal', CAST(d.c_acctbal AS VARCHAR)
             |  FROM customer s JOIN dst d ON s.c_custkey = d.c_custkey
             |  WHERE s.c_acctbal IS DISTINCT FROM d.c_acctbal) t
             |ORDER BY key, op, field""".stripMargin))
  )
}
