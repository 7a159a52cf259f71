package graft.queries

import graft.Tables
import graft.ops.Sessionize
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

    // Semi-structured access: JSON property extraction + typed cast,
    // aggregated — the engine analog of querying nested object fields.
    Q("q_json_extract",
      (s, d) => Tables.df(s, d, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          round(avg("k"), 4).as("avg_k"),
          max("k").as("max_k"))
        .orderBy("event_type"),
      Some("""SELECT event_type, count(*) AS n,
             |  round(avg(k), 4) AS avg_k, max(k) AS max_k
             |FROM (SELECT event_type,
             |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
             |      FROM events) t
             |GROUP BY event_type
             |ORDER BY event_type""".stripMargin)),

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
