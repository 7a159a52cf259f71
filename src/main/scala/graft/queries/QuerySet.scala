package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered operator query: Spark implementation + optional DuckDB
  * oracle SQL over the same parquet tables (driver contract — see
  * SparkEntry). The oracle is a THUNK evaluated per-query at dump
  * time, not for the whole registry at construction: several oracles
  * embed model state captured while their query ran (Pca.lastFit,
  * SearchEval.capturedProbes) and fail loudly when that state is
  * absent — a targeted Verify run dumps only the queries it ran, so
  * the unrun queries' oracles must never render.
  */
final class Q(
    val name: String,
    val fn: (SparkSession, String) => DataFrame,
    oracleThunk: () => Option[String]) {
  def oracle: Option[String] = oracleThunk()
}

object Q {
  /** By-name oracle keeps every existing `Q(name, fn, Some(sql))` call
    * site source-compatible while deferring the SQL rendering.
    */
  def apply(name: String, fn: (SparkSession, String) => DataFrame,
      oracle: => Option[String]): Q = new Q(name, fn, () => oracle)
}

trait QuerySet {
  def all: Seq[Q]
}
