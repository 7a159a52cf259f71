package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All registered operator query sets (SURVEY §2). */
  def querySets: Seq[QuerySet] = Seq(
    CoreQueries,
    FacetQueries,
    DedupQueries,
    TextQueries,
    CorpusQueries,
    StatsQueries,
    VectorQueries,
    SchemaQueries,
    EventQueries,
    PipelineQueries,
    SketchQueries)

  // def, not lazy val: oracle SQL may embed model state captured while
  // the queries ran (Pca.lastFit) — Verify calls oracleSql AFTER the
  // query loop, so the registry must be rebuilt at that point.
  private def registry: Seq[Q] = querySets.flatMap(_.all)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val q1 = registry.find(_.name == "q1_agg").get
    q1.fn(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** [[oracleSql]] restricted to `wanted` names, rendering ONLY those
    * thunks — a targeted Verify must not render oracles of queries it
    * never ran (their captured model state is absent and they throw).
    */
  def oracleSqlFiltered(wanted: String => Boolean): Map[String, String] =
    registry.filter(q => wanted(q.name))
      .flatMap(q => q.oracle.map(q.name -> _)).toMap
}
