package graft.queries

import graft.Tables
import graft.query.Filter
import org.apache.spark.sql.functions._

/** Facet operators (SURVEY §2 rows 11-15). Semantics per reference
  * facet_count_sql (where-exclusion of the facet column, count DESC,
  * limit); batched variant is the 100 TB scale path (one scan for N
  * facets).
  */
object FacetQueries extends QuerySet {

  def all: Seq[Q] = Seq(
    Q("q_facet_single",
      (s, d) => Tables.coll(s, d, "lineitem")
        .facet("l_returnflag", Filter.gt("l_quantity", 25.0)),
      Some("""SELECT l_returnflag, count(*) AS count
             |FROM lineitem WHERE l_quantity > 25
             |GROUP BY l_returnflag
             |ORDER BY count DESC, l_returnflag LIMIT 100""".stripMargin)),

    // Conditions on the facet column itself are excluded from the WHERE:
    // the o_orderstatus='F' condition must NOT constrain the counts.
    Q("q_facet_excl",
      (s, d) => Tables.coll(s, d, "orders")
        .facet("o_orderstatus",
          Filter.eq("o_orderstatus", "F") && Filter.gt("o_totalprice", 150000.0)),
      Some("""SELECT o_orderstatus, count(*) AS count
             |FROM orders WHERE o_totalprice > 150000
             |GROUP BY o_orderstatus
             |ORDER BY count DESC, o_orderstatus LIMIT 100""".stripMargin)),

    Q("q_facet_multi",
      (s, d) => Tables.coll(s, d, "customer")
        .facetTuple(Seq("c_mktsegment", "c_nationkey")),
      Some("""SELECT c_mktsegment, c_nationkey, count(*) AS count
             |FROM customer
             |GROUP BY c_mktsegment, c_nationkey
             |ORDER BY count DESC, c_mktsegment, c_nationkey LIMIT 100""".stripMargin)),

    // Multivalued facet: array column is unnested before counting
    // (reference: sql_utils.facet_count_sql multivalued=True).
    Q("q_facet_mv",
      (s, d) => {
        val docs = Tables.df(s, d, "documents")
          .withColumn("tokens", split(col("text"), " "))
        graft.query.Facets.facetCounts(
          docs, Filter.eq("lang", "en"), "tokens", limit = 25)
          .withColumnRenamed("tokens", "token")
      },
      Some("""SELECT token, count(*) AS count FROM (
             |  SELECT unnest(string_split(text, ' ')) AS token
             |  FROM documents WHERE lang = 'en') t
             |GROUP BY token
             |ORDER BY count DESC, token LIMIT 25""".stripMargin)),

    // Batched: N facet columns, ONE scan + ONE shuffle (scale path).
    Q("q_facet_batched",
      (s, d) => Tables.coll(s, d, "orders")
        .facetsBatched(Seq("o_orderstatus", "o_orderpriority"),
          Filter.gt("o_totalprice", 100000.0)),
      Some("""SELECT facet_field, facet_value, count FROM (
             |  SELECT 'o_orderstatus' AS facet_field,
             |    CAST(o_orderstatus AS VARCHAR) AS facet_value, count(*) AS count
             |  FROM orders WHERE o_totalprice > 100000 GROUP BY 2
             |  UNION ALL
             |  SELECT 'o_orderpriority', CAST(o_orderpriority AS VARCHAR), count(*)
             |  FROM orders WHERE o_totalprice > 100000 GROUP BY 2) t
             |ORDER BY facet_field, count DESC, facet_value""".stripMargin))
  )
}
