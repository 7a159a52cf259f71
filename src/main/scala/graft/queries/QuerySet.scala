package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered operator query: Spark implementation + optional DuckDB
  * oracle SQL over the same parquet tables (driver contract — see
  * SparkEntry).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QuerySet {
  def all: Seq[Q]
}
